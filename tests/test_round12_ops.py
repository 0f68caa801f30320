"""Third implementations of the round-12 wave-8 operators: each query
recomputed in plain python/Counter arithmetic from the raw parquet and
compared value-by-value — independent of BOTH Spark and DuckDB (the
triangulation contract of test_round10_ops / test_round11_ops /
test_round11b_ops)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pyarrow.parquet as pq
import pytest

from weather_tools_spark.queries import SPARK
from weather_tools_spark.queries.round12 import _LB_CHI2_05, _LB_LAGS, _MRR_K
from weather_tools_spark.queries.stats_ext import _NDCG_TERMS

SF = "/root/testdata/sf0.001"


def _r6(x: float) -> float:
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP))


def _events():
    return pq.read_table(f"{SF}/events.parquet").to_pydict()


def _docs():
    return pq.read_table(f"{SF}/documents.parquet").to_pydict()


def _quantile_cont(vals, q):
    s = sorted(vals)
    pos = (len(s) - 1) * q
    lo = int(math.floor(pos))
    hi = int(math.ceil(pos))
    return s[lo] + (s[hi] - s[lo]) * (pos - lo)


def test_average_precision_matches_python(spark):
    rows = SPARK["ml_average_precision"](spark, SF).collect()
    assert len(rows) == 1
    got = rows[0].asDict()
    d = _docs()
    pairs = [
        (len(t.split()), 1 if lang == "en" else 0)
        for t, lang in zip(d["text"], d["lang"])
    ]
    g = defaultdict(lambda: [0, 0])
    for s, y in pairs:
        g[s][y] += 1  # [n0, n1]
    P = sum(v[1] for v in g.values())
    N = sum(v[0] for v in g.values())
    tp = fp = 0
    ap = 0.0
    for s in sorted(g, reverse=True):
        n0, n1 = g[s]
        tp += n1
        fp += n0
        ap += n1 / P * tp / (tp + fp)
    assert got["n_pos"] == P and got["n_neg"] == N
    assert got["n_distinct_scores"] == len(g)
    assert got["average_precision"] == pytest.approx(_r6(ap), abs=2e-6)
    assert 0.0 <= got["average_precision"] <= 1.0


def test_ljung_box_matches_python(spark):
    rows = {r["lag"]: r.asDict() for r in SPARK["stats_ljung_box"](spark, SF).collect()}
    assert set(rows) == set(range(1, _LB_LAGS + 1))
    ev = _events()
    days = Counter(
        int(t.timestamp() // 86400) if hasattr(t, "timestamp") else int(t // 86400)
        for t in ev["ts"]
    )
    x = dict(days)
    n = len(x)
    s1 = sum(x.values())
    s2 = sum(v * v for v in x.values())
    mu = s1 / n
    den = s2 - mu * s1
    qlb = 0.0
    for k in range(1, _LB_LAGS + 1):
        pairs = [(x[d], x[d + k]) for d in x if d + k in x]
        sxy = sum(a * b for a, b in pairs)
        sh = sum(a for a, _ in pairs)
        st = sum(b for _, b in pairs)
        nk = len(pairs)
        rk = (sxy - mu * (sh + st) + nk * mu * mu) / den
        qlb += rk * rk / (n - k)
        q = n * (n + 2.0) * qlb
        assert rows[k]["acf"] == pytest.approx(_r6(rk), abs=2e-6)
        assert rows[k]["q_lb"] == pytest.approx(_r6(q), abs=2e-6)
        assert rows[k]["chi2_05"] == _LB_CHI2_05[k - 1]
        assert rows[k]["reject_iid"] == (q > _LB_CHI2_05[k - 1])


def _python_edges():
    """Top-3-out-degree nation trade edges (the _sp_edges_df contract)."""
    orders = pq.read_table(f"{SF}/orders.parquet").to_pydict()
    cust = pq.read_table(f"{SF}/customer.parquet").to_pydict()
    li = pq.read_table(f"{SF}/lineitem.parquet").to_pydict()
    supp = pq.read_table(f"{SF}/supplier.parquet").to_pydict()
    c_nat = dict(zip(cust["c_custkey"], cust["c_nationkey"]))
    s_nat = dict(zip(supp["s_suppkey"], supp["s_nationkey"]))
    o_cust = dict(zip(orders["o_orderkey"], orders["o_custkey"]))
    w = Counter()
    for ok, sk in zip(li["l_orderkey"], li["l_suppkey"]):
        w[(c_nat[o_cust[ok]], s_nat[sk])] += 1
    by_src = defaultdict(list)
    for (src, dst), cnt in w.items():
        by_src[src].append((-cnt, dst))
    edges = []
    for src, lst in by_src.items():
        for _, dst in sorted(lst)[:3]:
            edges.append((src, dst))
    return edges


def test_modularity_matches_python(spark):
    rows = {
        r["regionkey"]: r.asDict()
        for r in SPARK["graph_modularity_regions"](spark, SF).collect()
    }
    nat = pq.read_table(f"{SF}/nation.parquet").to_pydict()
    region = dict(zip(nat["n_nationkey"], nat["n_regionkey"]))
    el = [(region[s], region[d]) for s, d in _python_edges()]
    m = len(el)
    ec, dout, din = Counter(), Counter(), Counter()
    for cs, cd in el:
        dout[cs] += 1
        din[cd] += 1
        if cs == cd:
            ec[cs] += 1
    cs_all = set(dout) | set(din)
    assert set(rows) == cs_all
    terms = {c: ec[c] / m - (dout[c] / m) * (din[c] / m) for c in cs_all}
    q = sum(terms.values())
    for c in cs_all:
        assert rows[c]["intra_edges"] == ec[c]
        assert rows[c]["out_degree"] == dout[c]
        assert rows[c]["in_degree"] == din[c]
        assert rows[c]["modularity_term"] == pytest.approx(_r6(terms[c]), abs=2e-6)
        assert rows[c]["modularity_q"] == pytest.approx(_r6(q), abs=2e-6)


def test_lift_gains_matches_python(spark):
    rows = {
        r["decile"]: r.asDict()
        for r in SPARK["ml_lift_gains_deciles"](spark, SF).collect()
    }
    ev = _events()
    vals = [float(v) for v in ev["value"]]
    ys = [1 if t == "purchase" else 0 for t in ev["event_type"]]
    cuts = [_quantile_cont(vals, i / 10.0) for i in range(1, 10)]
    byd = defaultdict(lambda: [0, 0])
    for v, y in zip(vals, ys):
        d = sum(1 for c in cuts if v > c)
        byd[d][0] += 1
        byd[d][1] += y
    N = sum(v[0] for v in byd.values())
    P = sum(v[1] for v in byd.values())
    assert set(rows) == set(byd)
    cum = 0
    for d in sorted(byd, reverse=True):
        n, pos = byd[d]
        cum += pos
        assert rows[d]["n"] == n and rows[d]["pos"] == pos
        assert rows[d]["lift"] == pytest.approx(_r6(pos * N / (n * P)), abs=2e-6)
        assert rows[d]["cum_gain"] == pytest.approx(_r6(cum / P), abs=2e-6)
    # the top decile of a random-ish score shouldn't show lift >> 1 —
    # sanity, not a metric claim
    assert 0.0 < rows[max(byd)]["lift"] < 3.0


def test_brier_decomposition_matches_python(spark):
    rows = SPARK["ml_brier_decomposition"](spark, SF).collect()
    assert len(rows) == 1
    got = rows[0].asDict()
    ev = _events()
    byb = defaultdict(lambda: [0, 0])
    for v, t in zip(ev["value"], ev["event_type"]):
        b = min(int(float(v) // 50), 9)
        byb[b][0] += 1
        byb[b][1] += 1 if t == "purchase" else 0
    N = sum(v[0] for v in byb.values())
    K = sum(v[1] for v in byb.values())
    obar = K / N
    brier = rel = res = 0.0
    for b, (n, k) in byb.items():
        p = (b + 0.5) / 10.0
        brier += k * (p - 1) ** 2 + (n - k) * p * p
        rel += n * (p - k / n) ** 2
        res += n * (k / n - obar) ** 2
    brier, rel, res = brier / N, rel / N, res / N
    unc = obar * (1 - obar)
    assert got["n"] == N and got["n_pos"] == K
    assert got["brier"] == pytest.approx(_r6(brier), abs=2e-6)
    assert got["reliability"] == pytest.approx(_r6(rel), abs=2e-6)
    assert got["resolution"] == pytest.approx(_r6(res), abs=2e-6)
    assert got["uncertainty"] == pytest.approx(_r6(unc), abs=2e-6)
    # Murphy identity holds exactly for binned constant forecasts
    assert got["brier_check"] == pytest.approx(got["brier"], abs=3e-6)


def test_mrr_matches_python(spark):
    rows = {r["term"]: r.asDict() for r in SPARK["ml_mrr_retrieval"](spark, SF).collect()}
    d = _docs()
    for term in _NDCG_TERMS:
        cand = []
        for doc_id, text in zip(d["doc_id"], d["text"]):
            toks = text.strip().split()
            tf = sum(1 for x in toks if x == term)
            if tf > 0:
                cand.append((-round(tf / len(toks), 9), doc_id, tf >= 2))
        cand.sort()
        first = next((i + 1 for i, (_, _, rel) in enumerate(cand) if rel), None)
        got = rows[term]
        assert got["n_candidates"] == len(cand)
        assert got["first_rel_rank"] == first
        want_rr = 0.0 if first is None else _r6(1.0 / first)
        assert got["reciprocal_rank"] == pytest.approx(want_rr, abs=2e-6)
        assert got[f"hit_at_{_MRR_K}"] == (first is not None and first <= _MRR_K)


def _daily_counts():
    ev = _events()
    return Counter(int(t.timestamp() // 86400) for t in ev["ts"])


def test_mann_kendall_matches_python(spark):
    rows = SPARK["stats_mann_kendall"](spark, SF).collect()
    assert len(rows) == 1
    got = rows[0].asDict()
    x = _daily_counts()
    days = sorted(x)
    n = len(days)
    s = 0
    for a in range(n):
        for b in range(a + 1, n):
            d = x[days[b]] - x[days[a]]
            s += (d > 0) - (d < 0)
    ties = Counter(x.values())
    tie_term = sum(tp * (tp - 1) * (2 * tp + 5) for tp in ties.values() if tp > 1)
    var_s = (n * (n - 1) * (2 * n + 5) - tie_term) / 18.0
    z = 0.0 if s == 0 else (s - (1 if s > 0 else -1) * 1) / math.sqrt(var_s)
    assert got["n"] == n and got["s_statistic"] == s
    assert got["var_s"] == pytest.approx(_r6(var_s), abs=2e-6)
    assert got["z"] == pytest.approx(_r6(z), abs=2e-6)
    assert got["trend_detected"] == (abs(z) > 1.959964)


def test_turning_points_matches_python(spark):
    rows = SPARK["events_turning_points"](spark, SF).collect()
    assert len(rows) == 1
    got = rows[0].asDict()
    x = _daily_counts()
    days = sorted(x)
    n = len(days)
    t = sum(
        1
        for k in range(1, n - 1)
        if (x[days[k]] > x[days[k - 1]] and x[days[k]] > x[days[k + 1]])
        or (x[days[k]] < x[days[k - 1]] and x[days[k]] < x[days[k + 1]])
    )
    exp = 2.0 * (n - 2) / 3.0
    var = (16.0 * n - 29) / 90.0
    assert got["n"] == n and got["turning_points"] == t
    assert got["expected"] == pytest.approx(_r6(exp), abs=2e-6)
    assert got["variance"] == pytest.approx(_r6(var), abs=2e-6)
    assert got["z"] == pytest.approx(_r6((t - exp) / math.sqrt(var)), abs=2e-6)


def test_reciprocity_matches_python(spark):
    rows = SPARK["graph_reciprocity"](spark, SF).collect()
    assert len(rows) == 1
    got = rows[0].asDict()
    edges = set(_python_edges())
    nonloop = {(s, d) for s, d in edges if s != d}
    loops = len(edges) - len(nonloop)
    r = sum(1 for s, d in nonloop if (d, s) in nonloop)
    assert got["m_edges"] == len(nonloop)
    assert got["n_self_loops"] == loops
    assert got["n_reciprocated"] == r
    assert got["reciprocity"] == pytest.approx(_r6(r / len(nonloop)), abs=2e-6)
