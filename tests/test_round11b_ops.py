"""Third implementations of the round-11 wave-3 operators: each query
recomputed in plain numpy/python from the raw parquet and compared
value-by-value — independent of BOTH Spark and DuckDB (the same
triangulation as tests/test_round10_ops.py / test_round11_ops.py)."""

from __future__ import annotations

import math
import os
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

import pyarrow.parquet as pq
import pytest

from weather_tools_spark.queries import SPARK
from weather_tools_spark.queries.round11b import _CC_ROUNDS, _G2_TOPK, _JB_CHI2_05

SF = "/root/testdata/sf0.001"


def _r6(x: float) -> float:
    return float(Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP))


def _scale6(v: float) -> int:
    return int(Decimal(repr(v * 1e6)).quantize(Decimal("1"), ROUND_HALF_UP))


def _dsum_py(vals) -> float:
    return sum(_scale6(float(v)) for v in vals) / 1e6


def _events():
    return pq.read_table(f"{SF}/events.parquet").to_pydict()


def _docs_tokens():
    tbl = pq.read_table(f"{SF}/documents.parquet").to_pydict()
    out = []
    for src, text in zip(tbl["source"], tbl["text"]):
        out.append((src, text.lower().split()))
    return out


def test_jarque_bera_matches_python(spark):
    got = {r["event_type"]: r.asDict() for r in SPARK["stats_jarque_bera"](spark, SF).collect()}
    ev = _events()
    by_type: dict[str, list[float]] = defaultdict(list)
    for et, v in zip(ev["event_type"], ev["value"]):
        by_type[et].append(float(v))
    assert set(got) == set(by_type)
    for et, vals in by_type.items():
        n = len(vals)
        mu = _dsum_py(vals) / n
        ex2 = _dsum_py(v * v for v in vals) / n
        sig = math.sqrt(ex2 - mu * mu)
        zs = [(v - mu) / sig for v in vals]
        skw = _dsum_py(z**3 for z in zs) / n
        krt = _dsum_py(z**4 for z in zs) / n
        jb = _r6(n / 6.0 * (skw * skw + (krt - 3) * (krt - 3) / 4.0))
        g = got[et]
        assert g["n"] == n
        assert g["skewness"] == pytest.approx(_r6(skw), abs=2e-6)
        assert g["kurtosis"] == pytest.approx(_r6(krt), abs=2e-6)
        assert g["jarque_bera"] == pytest.approx(jb, abs=2e-6)
        assert g["reject_05"] == (1 if g["jarque_bera"] > _JB_CHI2_05 else 0)


def _source_word_counts():
    sw: dict[str, Counter] = defaultdict(Counter)
    for src, toks in _docs_tokens():
        sw[src].update(toks)
    return sw


def test_yule_k_matches_python(spark):
    got = {r["source"]: r.asDict() for r in SPARK["text_yule_k"](spark, SF).collect()}
    sw = _source_word_counts()
    assert set(got) == set(sw)
    for src, cnt in sw.items():
        n = sum(cnt.values())
        s2 = sum(c * c for c in cnt.values())
        k = _r6(10000.0 * (s2 - n) / (n * n))
        d = _r6(sum(c * (c - 1) for c in cnt.values()) / (n * (n - 1)))
        g = got[src]
        assert g["n_tokens"] == n
        assert g["vocabulary"] == len(cnt)
        assert g["yule_k"] == pytest.approx(k, abs=2e-6)
        assert g["simpson_d"] == pytest.approx(d, abs=2e-6)


def test_dunning_g2_matches_python(spark):
    rows = SPARK["text_dunning_g2_keywords"](spark, SF).collect()
    sw = _source_word_counts()
    wv: Counter = Counter()
    for cnt in sw.values():
        wv.update(cnt)
    n_tot = sum(wv.values())
    expected = []
    for src in sorted(sw):
        ns = sum(sw[src].values())
        scored = []
        for w, a in sw[src].items():
            cw = wv[w]
            b = cw - a
            g2 = a * math.log((a * n_tot) / (cw * ns))
            if b > 0:
                g2 += b * math.log((b * n_tot) / (cw * (n_tot - ns)))
            scored.append((_r6(2.0 * g2), w, a))
        scored.sort(key=lambda t: (-t[0], t[1]))
        for rk, (g2, w, a) in enumerate(scored[:_G2_TOPK], start=1):
            expected.append((src, w, a, g2, rk))
    assert len(rows) == len(expected)
    for r, (src, w, a, g2, rk) in zip(rows, expected):
        assert (r["source"], r["word"], r["occurrences"], r["rank"]) == (src, w, a, rk)
        assert r["g2"] == pytest.approx(g2, abs=2e-6)


def _daily(key):
    ev = _events()
    agg: dict[int, list[float]] = defaultdict(list)
    for ts, v in zip(ev["ts"], ev["value"]):
        day = int(ts.timestamp() // 86400)
        agg[day].append(float(v))
    return agg


def test_max_drawdown_matches_python(spark):
    rows = SPARK["events_max_drawdown"](spark, SF).collect()
    assert len(rows) == 1
    got = rows[0].asDict()
    agg = _daily("value")
    flows = {d: sum(_scale6(v - 250) for v in vs) for d, vs in agg.items()}
    cum = 0
    runmax = None
    mdraw = None
    peak = None
    trough_day = None
    for d in sorted(flows):
        cum += flows[d]
        runmax = cum if runmax is None else max(runmax, cum)
        peak = cum if peak is None else max(peak, cum)
        draw = runmax - cum
        if mdraw is None or draw > mdraw:
            mdraw, trough_day = draw, d
    assert got["n_days"] == len(flows)
    assert got["peak_equity"] == pytest.approx(_r6(peak / 1e6), abs=2e-6)
    assert got["max_drawdown"] == pytest.approx(_r6(mdraw / 1e6), abs=2e-6)
    assert got["trough_day"] == trough_day


def test_durbin_watson_matches_python(spark):
    rows = SPARK["stats_durbin_watson"](spark, SF).collect()
    assert len(rows) == 1
    got = rows[0].asDict()
    agg = _daily("value")
    counts = [(d, len(vs)) for d, vs in sorted(agg.items())]
    n = len(counts)
    xs = list(range(1, n + 1))
    ys = [c for _, c in counts]
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    slope = float(n * sxy - sx * sy) / float(n * sxx - sx * sx)
    icept = (sy - slope * sx) / n
    res = [y - (icept + slope * x) for x, y in zip(xs, ys)]
    sdiff = _dsum_py((b - a) ** 2 for a, b in zip(res, res[1:]))
    sres = _dsum_py(r * r for r in res)
    assert got["n_days"] == n
    assert got["slope"] == pytest.approx(_r6(slope), abs=2e-6)
    assert got["intercept"] == pytest.approx(_r6(icept), abs=2e-6)
    assert got["durbin_watson"] == pytest.approx(_r6(sdiff / sres), abs=2e-6)
    assert got["rho_lag1"] == pytest.approx(_r6(1 - sdiff / sres / 2.0), abs=2e-6)
    # a healthy i.i.d.-count series sits near 2
    assert 0.0 < got["durbin_watson"] < 4.0


def _python_nation_edges():
    """Replay _sp_edges_df in plain python: weighted customer-nation ->
    supplier-nation edges, per-source top-3 by (count desc, dst)."""
    cust = pq.read_table(f"{SF}/customer.parquet").to_pydict()
    c_nat = dict(zip(cust["c_custkey"], cust["c_nationkey"]))
    supp = pq.read_table(f"{SF}/supplier.parquet").to_pydict()
    s_nat = dict(zip(supp["s_suppkey"], supp["s_nationkey"]))
    orders = pq.read_table(f"{SF}/orders.parquet").to_pydict()
    o_cust = dict(zip(orders["o_orderkey"], orders["o_custkey"]))
    li = pq.read_table(f"{SF}/lineitem.parquet").to_pydict()
    w: Counter = Counter()
    for ok, sk in zip(li["l_orderkey"], li["l_suppkey"]):
        w[(c_nat[o_cust[ok]], s_nat[sk])] += 1
    by_src: dict[int, list] = defaultdict(list)
    for (src, dst), cnt in w.items():
        by_src[src].append((-cnt, dst))
    edges = set()
    for src, lst in by_src.items():
        for _, dst in sorted(lst)[:3]:
            edges.add((src, dst))
    return edges


def test_connected_components_matches_python(spark):
    rows = SPARK["graph_connected_components"](spark, SF).collect()
    nat = pq.read_table(f"{SF}/nation.parquet").to_pydict()
    region = dict(zip(nat["n_nationkey"], nat["n_regionkey"]))
    edges = _python_nation_edges()
    und = set()
    for s, d in edges:
        if s != d and region[s] == region[d]:
            und.add((s, d))
            und.add((d, s))
    lbl = {v: v for v in region}
    for _ in range(_CC_ROUNDS):
        nxt = dict(lbl)
        for u, v in und:
            if lbl[u] < nxt[v]:
                nxt[v] = lbl[u]
        lbl = nxt
    # fixpoint: one extra round changes nothing at _CC_ROUNDS
    extra = dict(lbl)
    for u, v in und:
        if lbl[u] < extra[v]:
            extra[v] = lbl[u]
    assert extra == lbl
    sizes = Counter(lbl.values())
    got = {r["nationkey"]: (r["component"], r["csize"]) for r in rows}
    assert got == {v: (c, sizes[c]) for v, c in lbl.items()}
    # components never split a region: every member shares the
    # component root's region
    for v, c in lbl.items():
        assert region[v] == region[c]


# ---------------------------------------------------------------------------
# Wave 4 third implementations
# ---------------------------------------------------------------------------


def test_friedman_matches_python(spark):
    rows = SPARK["stats_friedman_test"](spark, SF).collect()
    assert len(rows) == 1
    got = rows[0].asDict()
    ev = _events()
    cells: Counter = Counter()
    days, types = set(), set()
    for ts, et in zip(ev["ts"], ev["event_type"]):
        d = int(ts.timestamp() // 86400)
        cells[(d, et)] += 1
        days.add(d)
        types.add(et)
    n, k = len(days), len(types)
    rank_sums: dict[str, float] = defaultdict(float)
    for d in days:
        vals = sorted(cells.get((d, t), 0) for t in types)
        for t in types:
            c = cells.get((d, t), 0)
            smaller = sum(1 for v in vals if v < c)
            ties = sum(1 for v in vals if v == c)
            rank_sums[t] += smaller + 1 + (ties - 1) / 2.0
    chi2 = 12.0 / (n * k * (k + 1)) * sum(r * r for r in rank_sums.values()) - 3.0 * n * (k + 1)
    assert got["n_blocks"] == n
    assert got["k_treatments"] == k
    assert got["friedman_chi2"] == pytest.approx(_r6(chi2), abs=2e-6)
    assert got["kendalls_w"] == pytest.approx(_r6(chi2 / (n * (k - 1))), abs=2e-6)
    assert 0.0 <= got["kendalls_w"] <= 1.0


def test_cochran_q_matches_python(spark):
    rows = SPARK["stats_cochran_q"](spark, SF).collect()
    assert len(rows) == 1
    got = rows[0].asDict()
    ev = _events()
    cells: Counter = Counter()
    for u, et in zip(ev["user_id"], ev["event_type"]):
        cells[(u, et)] += 1
    users = {u for u, _ in cells}
    types = {t for _, t in cells}
    k, nu, tot = len(types), len(users), sum(cells.values())
    x = {(u, t) for (u, t), c in cells.items() if c * nu * k > tot}
    ri: Counter = Counter(u for u, _ in x)
    cj: Counter = Counter(t for _, t in x)
    n = sum(ri.values())
    sr2 = sum(v * v for v in ri.values())
    sc2 = sum(v * v for v in cj.values())
    denom = k * n - sr2
    q = 0.0 if denom == 0 else (k - 1) * (k * sc2 - n * n) / denom
    assert got["k_treatments"] == k
    assert got["n_users"] == nu
    assert got["df"] == k - 1
    assert got["cochran_q"] == pytest.approx(_r6(q), abs=2e-6)
    # the over-engagement binarization must not be degenerate here
    assert denom != 0 and got["cochran_q"] != 0.0


def test_good_turing_matches_python(spark):
    rows = SPARK["text_good_turing"](spark, SF).collect()
    wc: Counter = Counter()
    for _, toks in _docs_tokens():
        wc.update(toks)
    spec: Counter = Counter(wc.values())
    n_tok = sum(wc.values())
    expected = [r for r in sorted(spec) if r <= 5]
    assert [r["r"] for r in rows] == expected
    for row in rows:
        r = row["r"]
        assert row["nr"] == spec[r]
        assert row["nr_next"] == spec.get(r + 1, 0)
        assert row["r_star"] == pytest.approx(
            _r6((r + 1) * spec.get(r + 1, 0) / spec[r]), abs=2e-6
        )
        assert row["mass_at_r"] == pytest.approx(_r6(r * spec[r] / n_tok), abs=2e-6)


def test_allan_variance_matches_python(spark):
    rows = SPARK["events_allan_variance"](spark, SF).collect()
    assert len(rows) == 1
    got = rows[0].asDict()
    ev = _events()
    for tau, mkey, akey in ((3600, "m_small", "avar_small_tau"), (21600, "m_large", "avar_large_tau")):
        buckets: dict[int, list[float]] = defaultdict(list)
        for ts, v in zip(ev["ts"], ev["value"]):
            buckets[int(ts.timestamp() // tau)].append(float(v))
        ys = [
            _dsum_py(buckets[b]) / len(buckets[b]) for b in sorted(buckets)
        ]
        m = len(ys)
        avar = _dsum_py((b - a) ** 2 for a, b in zip(ys, ys[1:])) / (2.0 * (m - 1))
        assert got[mkey] == m
        assert got[akey] == pytest.approx(_r6(avar), abs=2e-6)
    slope = (math.log(got["avar_large_tau"]) - math.log(got["avar_small_tau"])) / (
        math.log(21600) - math.log(3600)
    )
    # slope recomputed from the ROUNDED avars can drift slightly from the
    # in-plan value computed on unrounded ones — tolerance widened
    assert got["noise_slope"] == pytest.approx(slope, abs=1e-3)


def test_bartlett_matches_python(spark):
    rows = SPARK["stats_bartlett_test"](spark, SF).collect()
    assert len(rows) == 1
    got = rows[0].asDict()
    ev = _events()
    by_type: dict[str, list[float]] = defaultdict(list)
    for et, v in zip(ev["event_type"], ev["value"]):
        by_type[et].append(float(v))
    k = len(by_type)
    n_tot = sum(len(v) for v in by_type.values())
    terms_pool, terms_ln, terms_inv = [], [], []
    for vals in by_type.values():
        ni = len(vals)
        s1 = _dsum_py(vals)
        s2 = _dsum_py(v * v for v in vals)
        vi = (s2 - s1 * s1 / ni) / (ni - 1)
        terms_pool.append((ni - 1) * vi)
        terms_ln.append((ni - 1) * math.log(vi))
        terms_inv.append(1.0 / (ni - 1))
    pooled = _dsum_py(terms_pool) / (n_tot - k)
    raw = (n_tot - k) * math.log(pooled) - _dsum_py(terms_ln)
    corr = 1 + (_dsum_py(terms_inv) - 1.0 / (n_tot - k)) / (3 * (k - 1))
    assert got["k_groups"] == k
    assert got["n_total"] == n_tot
    assert got["df"] == k - 1
    assert got["bartlett_raw"] == pytest.approx(_r6(raw), abs=2e-6)
    assert got["bartlett_chi2"] == pytest.approx(_r6(raw / corr), abs=2e-6)


def test_assortativity_matches_python(spark):
    rows = SPARK["graph_assortativity"](spark, SF).collect()
    assert len(rows) == 1
    got = rows[0].asDict()
    edges = _python_nation_edges()
    und = set()
    for s, d in edges:
        if s != d:
            und.add((s, d))
            und.add((d, s))
    deg: Counter = Counter(u for u, _ in und)
    m = len(und)
    sjk = sum(deg[u] * deg[v] for u, v in und)
    ssum = sum(deg[u] + deg[v] for u, v in und)
    ssq = sum(deg[u] ** 2 + deg[v] ** 2 for u, v in und)
    mean = ssum / (2 * m)
    r = (sjk / m - mean * mean) / (ssq / (2 * m) - mean * mean)
    assert got["m_directed_pairs"] == m
    assert got["n_nodes"] == len(deg)
    assert got["assortativity"] == pytest.approx(_r6(r), abs=2e-6)
    assert -1.0 <= got["assortativity"] <= 1.0


# ---------------------------------------------------------------------------
# Wave 5 third implementations
# ---------------------------------------------------------------------------


def test_ams_f2_matches_python(spark):
    import hashlib

    rows = SPARK["sketch_ams_f2"](spark, SF).collect()
    assert len(rows) == 1
    got = rows[0].asDict()
    wc: Counter = Counter()
    for _, toks in _docs_tokens():
        wc.update(toks)
    f2 = sum(c * c for c in wc.values())

    def sign(lane: int, w: str) -> int:
        nib = int(hashlib.md5(f"{lane}:{w}".encode()).hexdigest()[0], 16)
        return 1 - 2 * (nib % 2)

    zs = [sum(c * sign(lane, w) for w, c in wc.items()) for lane in range(16)]
    z2 = sorted(z * z for z in zs)
    mean_est = sum(z2) / 16.0
    med = (z2[7] + z2[8]) / 2.0
    assert got["lanes"] == 16
    assert got["f2_exact"] == f2
    assert got["f2_est_mean"] == pytest.approx(_r6(mean_est), abs=2e-6)
    assert got["f2_est_median"] == pytest.approx(_r6(med), abs=2e-6)
    assert got["rel_err_mean"] == pytest.approx(_r6(abs(mean_est - f2) / f2), abs=2e-6)
    assert got["merge_is_lossless"] == 1


def test_page_hinkley_matches_python(spark):
    rows = SPARK["events_page_hinkley"](spark, SF).collect()
    assert len(rows) == 1
    got = rows[0].asDict()
    agg = _daily("value")
    xs = [( d, _dsum_py(vs) / len(vs)) for d, vs in sorted(agg.items())]
    mu = _dsum_py(x for _, x in xs) / len(xs)
    cum = 0
    runmin = 0
    max_ph = None
    alarm = -1
    first = True
    for d, x in xs:
        cum += _scale6(x - mu - 1.0)
        runmin = cum if first else min(runmin, cum)
        first = False
        ph = cum - runmin
        if max_ph is None or ph > max_ph:
            max_ph = ph
        if alarm == -1 and ph > 25.0 * 1e6:
            alarm = d
    assert got["n_days"] == len(xs)
    assert got["max_ph"] == pytest.approx(_r6(max_ph / 1e6), abs=2e-6)
    assert got["first_alarm_day"] == alarm


def test_ngram_novelty_matches_python(spark):
    rows = SPARK["corpus_ngram_novelty"](spark, SF).collect()
    tbl = pq.read_table(f"{SF}/documents.parquet").to_pydict()
    doc_ngrams: dict[int, set] = {}
    doc_source: dict[int, str] = {}
    for doc_id, src, text in zip(tbl["doc_id"], tbl["source"], tbl["text"]):
        t = text.lower().split()
        doc_ngrams[doc_id] = {
            " ".join(t[i : i + 3]) for i in range(len(t) - 2)
        } if len(t) >= 3 else set()
        doc_source[doc_id] = src
    first: dict[str, int] = {}
    for doc_id in sorted(doc_ngrams):
        for g in doc_ngrams[doc_id]:
            if g not in first:
                first[g] = doc_id
    per_src: dict[str, list] = defaultdict(lambda: [0, 0, 0])
    for doc_id, grams in doc_ngrams.items():
        if not grams:
            continue
        e = per_src[doc_source[doc_id]]
        e[0] += 1
        e[1] += len(grams)
        e[2] += sum(1 for g in grams if first[g] == doc_id)
    got = {r["source"]: r.asDict() for r in rows}
    assert set(got) == set(per_src)
    for src, (nd, tot, nov) in per_src.items():
        g = got[src]
        assert g["n_docs"] == nd
        assert g["ngrams"] == tot
        assert g["novel"] == nov
        assert g["novelty_rate"] == pytest.approx(_r6(nov / tot), abs=2e-6)


def test_vocab_jaccard_matches_python(spark):
    rows = SPARK["text_vocab_jaccard_sources"](spark, SF).collect()
    vocab: dict[str, set] = defaultdict(set)
    for src, toks in _docs_tokens():
        vocab[src].update(toks)
    srcs = sorted(vocab)
    expected = {}
    for i, sa in enumerate(srcs):
        for sb in srcs[i + 1 :]:
            inter = len(vocab[sa] & vocab[sb])
            uni = len(vocab[sa] | vocab[sb])
            expected[(sa, sb)] = (inter, uni,
                                  _r6(inter / uni),
                                  _r6(inter / min(len(vocab[sa]), len(vocab[sb]))))
    assert len(rows) == len(expected)
    for r in rows:
        inter, uni, jac, ov = expected[(r["source_a"], r["source_b"])]
        assert r["intersection"] == inter
        assert r["vocab_union"] == uni
        assert r["jaccard"] == pytest.approx(jac, abs=2e-6)
        assert r["overlap_coef"] == pytest.approx(ov, abs=2e-6)


def test_wilcoxon_matches_python(spark):
    rows = SPARK["stats_wilcoxon_signed_rank"](spark, SF).collect()
    assert len(rows) == 1
    got = rows[0].asDict()
    agg = _daily("value")
    cs = [len(v) for _, v in sorted(agg.items())]
    n = len(cs)
    h = (n + 1) // 2
    ds = [cs[t + h] - cs[t] for t in range(n - h)]
    nz = [d for d in ds if d != 0]
    ads = sorted(abs(d) for d in nz)
    wplus = 0.0
    for d in nz:
        ad = abs(d)
        smaller = sum(1 for a in ads if a < ad)
        ties = sum(1 for a in ads if a == ad)
        if d > 0:
            wplus += smaller + 1 + (ties - 1) / 2.0
    np_ = len(nz)
    z = (wplus - np_ * (np_ + 1) / 4.0) / math.sqrt(
        np_ * (np_ + 1) * (2 * np_ + 1) / 24.0
    )
    assert got["n_pairs"] == np_
    assert got["w_plus"] == pytest.approx(_r6(wplus), abs=2e-6)
    assert got["z_score"] == pytest.approx(_r6(z), abs=2e-6)


def test_grubbs_matches_python(spark):
    rows = SPARK["stats_grubbs_statistic"](spark, SF).collect()
    assert len(rows) == 1
    got = rows[0].asDict()
    agg = _daily("value")
    daily = sorted((d, len(v)) for d, v in agg.items())
    n = len(daily)
    s1 = sum(c for _, c in daily)
    s2 = sum(c * c for _, c in daily)
    mu = s1 / n
    sd = math.sqrt((s2 - s1 * s1 / n) / (n - 1))
    best = max(daily, key=lambda dc: (abs(dc[1] - mu) / sd, -dc[0]))
    assert got["n_days"] == n
    assert got["mean_daily"] == pytest.approx(_r6(mu), abs=2e-6)
    assert got["sd_daily"] == pytest.approx(_r6(sd), abs=2e-6)
    assert got["g_max"] == pytest.approx(_r6(abs(best[1] - mu) / sd), abs=2e-6)
    assert got["outlier_day"] == best[0]
    assert got["outlier_count"] == best[1]


# ---------------------------------------------------------------------------
# Wave 6 third implementations
# ---------------------------------------------------------------------------


def test_kruskal_wallis_matches_python(spark):
    rows = SPARK["stats_kruskal_wallis"](spark, SF).collect()
    assert len(rows) == 1
    got = rows[0].asDict()
    ev = _events()
    byv: Counter = Counter()
    groups: dict[str, Counter] = defaultdict(Counter)
    for et, v in zip(ev["event_type"], ev["value"]):
        byv[float(v)] += 1
        groups[et][float(v)] += 1
    n = sum(byv.values())
    k = len(groups)
    # average rank per distinct value from cumulative counts
    rank: dict[float, float] = {}
    cum = 0
    for v in sorted(byv):
        t = byv[v]
        rank[v] = cum + (t + 1) / 2.0
        cum += t
    terms = []
    for et, cnt in groups.items():
        ng = sum(cnt.values())
        rg = sum(c * rank[v] for v, c in cnt.items())
        dev = rg / ng - (n + 1) / 2.0
        terms.append(((dev * dev) * ng) / (1.0 * n * (n + 1)))
    s = sum(int(Decimal(repr(t * 1e9)).quantize(Decimal("1"), ROUND_HALF_UP)) for t in terms) / 1e9
    h = 12.0 * s
    tie3 = sum(t**3 - t for t in byv.values())
    hc = h / (1 - tie3 / (float(n) * n * n - n))
    assert got["n_total"] == n
    assert got["k_groups"] == k
    assert got["df"] == k - 1
    assert got["h_stat"] == pytest.approx(_r6(h), abs=2e-6)
    assert got["h_tie_corrected"] == pytest.approx(_r6(hc), abs=2e-6)


def _quantile_cont(vals, q):
    s = sorted(vals)
    pos = (len(s) - 1) * q
    lo = int(math.floor(pos))
    hi = int(math.ceil(pos))
    return s[lo] + (s[hi] - s[lo]) * (pos - lo)


def test_mood_median_matches_python(spark):
    rows = SPARK["stats_mood_median"](spark, SF).collect()
    assert len(rows) == 1
    got = rows[0].asDict()
    ev = _events()
    vals = [float(v) for v in ev["value"]]
    med = _quantile_cont(vals, 0.5)
    cls: dict[str, list] = defaultdict(lambda: [0, 0])
    for et, v in zip(ev["event_type"], ev["value"]):
        if float(v) > med:
            cls[et][0] += 1
        else:
            cls[et][1] += 1
    ta = sum(a for a, _ in cls.values())
    tb = sum(b for _, b in cls.values())
    n = ta + tb
    terms_a, terms_b = [], []
    for a, b in cls.values():
        ea = (a + b) * ta / n
        eb = (a + b) * tb / n
        terms_a.append((a - ea) ** 2 / ea)
        terms_b.append((b - eb) ** 2 / eb)
    chi = _dsum_py(terms_a) + _dsum_py(terms_b)
    assert got["n_total"] == n
    assert got["k_groups"] == len(cls)
    assert got["mood_chi2"] == pytest.approx(_r6(chi), abs=2e-6)


def test_iqr_outliers_matches_python(spark):
    rows = {r["event_type"]: r.asDict() for r in SPARK["dq_iqr_outliers"](spark, SF).collect()}
    ev = _events()
    by_type: dict[str, list[float]] = defaultdict(list)
    for et, v in zip(ev["event_type"], ev["value"]):
        by_type[et].append(float(v))
    assert set(rows) == set(by_type)
    for et, vals in by_type.items():
        q1 = _quantile_cont(vals, 0.25)
        q3 = _quantile_cont(vals, 0.75)
        lo = q1 - 1.5 * (q3 - q1)
        hi = q3 + 1.5 * (q3 - q1)
        n_out = sum(1 for v in vals if v < lo or v > hi)
        g = rows[et]
        assert g["n"] == len(vals)
        assert g["q1"] == pytest.approx(_r6(q1), abs=2e-6)
        assert g["q3"] == pytest.approx(_r6(q3), abs=2e-6)
        assert g["fence_lo"] == pytest.approx(_r6(lo), abs=2e-6)
        assert g["fence_hi"] == pytest.approx(_r6(hi), abs=2e-6)
        assert g["n_outliers"] == n_out
        assert g["outlier_frac"] == pytest.approx(_r6(n_out / len(vals)), abs=2e-6)


def test_edge_jaccard_matches_python(spark):
    rows = SPARK["graph_edge_jaccard"](spark, SF).collect()
    edges = _python_nation_edges()
    nbr: dict[int, set] = defaultdict(set)
    for s, d in edges:
        if s != d:
            nbr[s].add(d)
            nbr[d].add(s)
    scored = []
    nodes = sorted(nbr)
    for i, x in enumerate(nodes):
        for y in nodes[i + 1 :]:
            c = len(nbr[x] & nbr[y])
            if c == 0:
                continue
            uni = len(nbr[x]) + len(nbr[y]) - c
            scored.append((_r6(c / uni), x, y, c, uni))
    scored.sort(key=lambda t: (-t[0], t[1], t[2]))
    expected = scored[:10]
    assert len(rows) == len(expected)
    for r, (jac, x, y, c, uni) in zip(rows, expected):
        assert (r["node_a"], r["node_b"], r["common_neighbors"], r["neighborhood_union"]) == (x, y, c, uni)
        assert r["jaccard"] == pytest.approx(jac, abs=2e-6)


# ---------------------------------------------------------------------------
# Wave 7 third implementations
# ---------------------------------------------------------------------------


def test_effect_sizes_matches_python(spark):
    rows = SPARK["stats_effect_sizes"](spark, SF).collect()
    assert len(rows) == 1
    got = rows[0].asDict()
    ev = _events()
    samp: dict[str, list[float]] = defaultdict(list)
    for et, v in zip(ev["event_type"], ev["value"]):
        if et in ("purchase", "click"):
            samp[et].append(float(v))

    def mv(vals):
        n = len(vals)
        s1 = _dsum_py(vals)
        s2 = _dsum_py(v * v for v in vals)
        return n, s1 / n, (s2 - s1 * s1 / n) / (n - 1)

    n1, m1, v1 = mv(samp["purchase"])
    n2, m2, v2 = mv(samp["click"])
    diff = m1 - m2
    sp = math.sqrt(((n1 - 1) * v1 + (n2 - 1) * v2) / (n1 + n2 - 2))
    d = diff / sp
    assert got["n1"] == n1 and got["n2"] == n2
    assert got["mean_diff"] == pytest.approx(_r6(diff), abs=2e-6)
    assert got["cohens_d"] == pytest.approx(_r6(d), abs=2e-6)
    assert got["hedges_g"] == pytest.approx(_r6(d * (1 - 3.0 / (4 * (n1 + n2) - 9))), abs=2e-6)
    assert got["glass_delta"] == pytest.approx(_r6(diff / math.sqrt(v2)), abs=2e-6)


def test_honore_sichel_matches_python(spark):
    got = {r["source"]: r.asDict() for r in SPARK["text_honore_sichel"](spark, SF).collect()}
    sw = _source_word_counts()
    assert set(got) == set(sw)
    for src, cnt in sw.items():
        n = sum(cnt.values())
        v = len(cnt)
        v1 = sum(1 for c in cnt.values() if c == 1)
        v2 = sum(1 for c in cnt.values() if c == 2)
        g = got[src]
        assert g["n_tokens"] == n
        assert g["vocabulary"] == v
        assert g["hapax"] == v1
        assert g["dis"] == v2
        if v1 < v:
            assert g["honore_r"] == pytest.approx(
                _r6(100.0 * math.log(n) / (1 - v1 / v)), abs=2e-6
            )
        else:
            assert g["honore_r"] is None
        assert g["sichel_s"] == pytest.approx(_r6(v2 / v), abs=2e-6)


def test_peak_over_threshold_matches_python(spark):
    rows = SPARK["events_peak_over_threshold"](spark, SF).collect()
    assert len(rows) == 1
    got = rows[0].asDict()
    ev = _events()
    vals = [float(v) for v in ev["value"]]
    u = _quantile_cont(vals, 0.95)
    exc = [v - u for v in vals if v > u]
    n = len(exc)
    me = _dsum_py(exc) / n
    me2 = _dsum_py(e * e for e in exc) / n
    var = me2 - me * me
    r = me * me / var
    assert got["threshold"] == pytest.approx(_r6(u), abs=2e-6)
    assert got["n_exceedances"] == n
    assert got["mean_excess"] == pytest.approx(_r6(me), abs=2e-6)
    assert got["gpd_xi"] == pytest.approx(_r6((1 - r) / 2.0), abs=2e-6)
    assert got["gpd_sigma"] == pytest.approx(_r6(me * (1 + r) / 2.0), abs=2e-6)
    # uniform bounded support pulls the fitted tail index negative
    assert got["gpd_xi"] < 0.2


def test_peak_over_threshold_degenerate_empty_exceedance(spark, tmp_path):
    """ADVICE r11 regression: when no value exceeds the 95th-percentile
    threshold (constant values → quantile == max), the query must
    still return ONE row (n_exceedances=0, NULL moments) like the
    oracle's ungrouped aggregate — the old groupBy("u") plan returned
    zero rows in this regime."""
    import datetime as _dt

    import pyarrow as pa

    n = 40
    tbl = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(
                [_dt.datetime(2024, 1, 1, 0, i) for i in range(n)],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([i % 5 for i in range(n)], pa.int64()),
            "event_type": pa.array(["view"] * n),
            "value": pa.array([250.0] * n),
            "props": pa.array(["{}"] * n),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    rows = SPARK["events_peak_over_threshold"](spark, str(tmp_path)).collect()
    assert len(rows) == 1
    got = rows[0].asDict()
    assert got["threshold"] == pytest.approx(250.0)
    assert got["n_exceedances"] == 0
    assert got["mean_excess"] is None
    assert got["gpd_xi"] is None and got["gpd_sigma"] is None
