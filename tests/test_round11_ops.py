"""Third implementations of the round-11 operators: each query is
recomputed in plain numpy/python from the raw parquet and compared
value-by-value — independent of BOTH Spark and DuckDB (the same
triangulation as tests/test_round10_ops.py)."""

from __future__ import annotations

import math
import os
from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pyarrow.parquet as pq
import pytest

from weather_tools_spark.queries import SPARK

SF = "/root/testdata/sf0.001"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _r6(x: float) -> float:
    return float(Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP))


def _scale6(v: float) -> int:
    # SQL round() is half-up; Python round()/numpy are banker's
    return int(Decimal(repr(v * 1e6)).quantize(Decimal("1"), ROUND_HALF_UP))


def _dsum_py(vals) -> float:
    """Integer-scaled exact sum, mirroring queries.core_sql._dsum."""
    return sum(_scale6(float(v)) for v in vals) / 1e6


def test_heaps_law_fit_matches_python(spark):
    rows = SPARK["text_heaps_law_fit"](spark, SF).collect()
    assert len(rows) == 1
    got = rows[0].asDict()

    tbl = pq.read_table(f"{SF}/documents.parquet").to_pydict()
    docs = sorted(zip(tbl["doc_id"], tbl["text"]))
    n_docs = len(docs)
    stride = max(1, n_docs // 20)
    seen: set[str] = set()
    cum_toks = cum_vocab = 0
    pts = []
    for doc_id, text in docs:
        toks = text.lower().split()
        cum_toks += len(toks)
        for t in toks:
            if t not in seen:
                seen.add(t)
                cum_vocab += 1
        if (doc_id + 1) % stride == 0:
            pts.append((_r6(math.log(cum_toks)), _r6(math.log(cum_vocab)), cum_toks, cum_vocab))
    n = len(pts)
    sx = _dsum_py(p[0] for p in pts)
    sy = _dsum_py(p[1] for p in pts)
    sxx = _dsum_py(p[0] * p[0] for p in pts)
    sxy = _dsum_py(p[0] * p[1] for p in pts)
    beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    k = math.exp((sy - beta * sx) / n)
    assert got["n_checkpoints"] == n
    assert got["total_tokens"] == max(p[2] for p in pts)
    assert got["total_vocab"] == max(p[3] for p in pts)
    assert got["heaps_beta"] == pytest.approx(_r6(beta), abs=2e-6)
    assert got["heaps_k"] == pytest.approx(_r6(k), abs=2e-6)
    # the driver's 31-word corpus SATURATES (vocab constant after the
    # first docs), so the honest fit is beta ~ 0; the growing-vocab
    # (0,1) expectation is asserted on a Heaps-law corpus below
    assert 0.0 <= got["heaps_beta"] < 1.0


def test_heaps_law_fit_on_growing_vocab_corpus(spark, tmp_path_factory):
    """On a Heaps-law corpus (the scale generator's Zipf-tail
    documents) the fitted exponent must land strictly inside (0, 1) —
    the sub-linear vocabulary-growth regime the statistic exists to
    measure."""
    import subprocess
    import sys as _sys

    out = tmp_path_factory.mktemp("heaps_corpus")
    subprocess.run(
        [_sys.executable, "tools/gen_scale_data.py", str(out), "0.01"],
        check=True,
        capture_output=True,
        cwd=REPO,
    )
    got = SPARK["text_heaps_law_fit"](spark, str(out)).collect()[0].asDict()
    assert 0.05 < got["heaps_beta"] < 0.95
    assert got["total_vocab"] > 31  # the tail vocabulary actually grew


def test_runs_test_matches_python(spark):
    rows = SPARK["stats_runs_test"](spark, SF).collect()
    got = rows[0].asDict()

    tbl = pq.read_table(f"{SF}/events.parquet").to_pydict()
    seq = [v for _, v in sorted(zip(tbl["event_id"], tbl["value"]))]
    vals = np.sort(np.array(seq, dtype=np.float64))
    n = len(vals)
    # exact interpolated median (quantile_cont semantics)
    if n % 2:
        med = vals[n // 2]
    else:
        med = (vals[n // 2 - 1] + vals[n // 2]) / 2.0
    above = [1 if v > med else 0 for v in seq]
    n1 = sum(above)
    n2 = n - n1
    runs = 1 + sum(1 for i in range(1, n) if above[i] != above[i - 1])
    mu = 2.0 * n1 * n2 / n + 1
    var = 2.0 * n1 * n2 * (2.0 * n1 * n2 - n) / (1.0 * n * n * (n - 1))
    z = (runs - mu) / math.sqrt(var)
    assert got["n1"] == n1 and got["n2"] == n2 and got["runs"] == runs
    assert got["z_score"] == pytest.approx(_r6(z), abs=2e-6)
    assert got["reject_05"] == (1 if abs(z) > 1.959963984540054 else 0)


def test_hurst_matches_python(spark):
    # sf0.01 (10k events): sf0.001's 1000 events hold ZERO complete
    # 2500-chunks, so the large side is NULL by design there — the
    # parity check needs both chunk sizes populated
    sf = "/root/testdata/sf0.01"
    rows = SPARK["events_hurst_exponent"](spark, sf).collect()
    got = rows[0].asDict()

    tbl = pq.read_table(f"{sf}/events.parquet").to_pydict()
    seq = [v for _, v in sorted(zip(tbl["event_id"], tbl["value"]))]
    n = len(seq)

    def mean_log_rs(cs: int) -> tuple[int, float]:
        lrs = []
        for c0 in range(0, (n // cs) * cs, cs):
            chunk = seq[c0 : c0 + cs]
            mu = _dsum_py(chunk) / cs
            m2 = _dsum_py(v * v for v in chunk) / cs
            varr = m2 - mu * mu
            cum, cmax, cmin, acc = [], -math.inf, math.inf, 0.0
            for v in chunk:
                acc += v - mu
                cmax, cmin = max(cmax, acc), min(cmin, acc)
            if varr > 0 and cmax - cmin > 0:
                lrs.append(_r6(math.log((cmax - cmin) / math.sqrt(varr))))
        return len(lrs), _dsum_py(lrs) / len(lrs)

    k1, y1 = mean_log_rs(250)
    k2, y2 = mean_log_rs(2500)
    assert got["n_chunks_small"] == k1 and got["n_chunks_large"] == k2
    assert got["mean_log_rs_small"] == pytest.approx(_r6(y1), abs=2e-6)
    assert got["mean_log_rs_large"] == pytest.approx(_r6(y2), abs=2e-6)
    h = (y2 - y1) / (math.log(2500) - math.log(250))
    assert got["hurst_h"] == pytest.approx(_r6(h), abs=2e-6)
    # i.i.d. generator values: H should sit near 0.5, far from 1
    assert 0.3 < got["hurst_h"] < 0.75


def test_periodogram_matches_numpy(spark):
    from weather_tools_spark.queries.round11 import _trig_tables

    rows = SPARK["events_spectral_periodogram"](spark, SF).collect()
    got = {r["period_hours"]: r["power_int"] for r in rows}
    assert sorted(got) == [6, 12, 24, 168]

    import pyarrow as pa

    t = pq.read_table(f"{SF}/events.parquet")
    us = t.column("ts").cast(pa.timestamp("us")).cast(pa.int64()).to_pylist()
    hours = [int(x // (3_600 * 10**6)) for x in us]
    vals = [float(v) for v in t.column("value").to_pylist()]
    for p in (6, 12, 24, 168):
        cos, sin = _trig_tables(p)
        c = _dsum_py(v * cos[h % p] for v, h in zip(vals, hours))
        s = _dsum_py(v * sin[h % p] for v, h in zip(vals, hours))
        want = int(Decimal(repr(c * c + s * s)).quantize(Decimal("1"), ROUND_HALF_UP))
        assert got[p] == want, (p, got[p], want)
    # (no dominance assertion: the driver fixture's values are i.i.d.
    # exponential with no planted cycle — spectral peaks are leakage;
    # the value of this query is the parity-checked machinery)


def test_hodges_lehmann_matches_numpy(spark):
    rows = SPARK["stats_hodges_lehmann"](spark, SF).collect()
    got = rows[0].asDict()

    tbl = pq.read_table(f"{SF}/events.parquet").to_pydict()
    vals = [
        int(Decimal(repr(v)).quantize(Decimal("1"), ROUND_HALF_UP))
        for v, t in zip(tbl["value"], tbl["event_type"])
        if t == "click"
    ]
    n = len(vals)
    walsh = sorted(
        (vals[i] + vals[j]) / 2.0 for i in range(n) for j in range(i, n)
    )
    w = len(walsh)
    assert got["n"] == n and got["n_walsh_pairs"] == w == n * (n + 1) // 2
    k1, k2 = (w + 1) // 2, (w + 2) // 2
    want = _r6((walsh[k1 - 1] + walsh[k2 - 1]) / 2.0)
    assert got["hl_pseudo_median"] == pytest.approx(want, abs=1e-6)


def test_local_clustering_matches_python(spark):
    rows = SPARK["graph_local_clustering_brand"](spark, SF).collect()
    got = {r["p_brand"]: r.asDict() for r in rows}

    li = pq.read_table(f"{SF}/lineitem.parquet").to_pydict()
    part = pq.read_table(f"{SF}/part.parquet").to_pydict()
    brand = dict(zip(part["p_partkey"], part["p_brand"]))
    orders: dict[int, set[int]] = {}
    for ok, pk in zip(li["l_orderkey"], li["l_partkey"]):
        orders.setdefault(int(ok), set()).add(int(pk))
    adj: dict[int, set[int]] = {}
    for parts in orders.values():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                adj.setdefault(ps[i], set()).add(ps[j])
                adj.setdefault(ps[j], set()).add(ps[i])
    want: dict[str, list[float]] = {}
    maxdeg: dict[str, int] = {}
    for v, nbrs in adj.items():
        d = len(nbrs)
        t = 0
        for u in nbrs:
            t += len(nbrs & adj[u])
        t //= 2
        c = _r6(2.0 * t / (d * (d - 1))) if d >= 2 else 0.0
        b = brand[v]
        want.setdefault(b, []).append(c)
        maxdeg[b] = max(maxdeg.get(b, 0), d)
    for b, cs in want.items():
        assert got[b]["n_nodes"] == len(cs)
        assert got[b]["max_degree"] == maxdeg[b]
        assert got[b]["avg_local_cc"] == pytest.approx(
            _r6(_dsum_py(cs) / len(cs)), abs=2e-6
        )
