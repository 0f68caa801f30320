"""Third implementations of the round-12 wave-9 operators: each query
recomputed in plain python arithmetic from the raw parquet and compared
value-by-value — independent of BOTH Spark and DuckDB (the
triangulation contract of test_round10_ops .. test_round12_ops)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pyarrow.parquet as pq
import pytest

from weather_tools_spark.queries import SPARK
from weather_tools_spark.queries.round12b import _AB_A, _AB_B, _HC_LCM, _HC_LEVELS

SF = "/root/testdata/sf0.001"


def _r6(x: float) -> float:
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP))


def _events():
    return pq.read_table(f"{SF}/events.parquet").to_pydict()


def _two_sample_values():
    ev = _events()
    a = [v for v, t in zip(ev["value"], ev["event_type"]) if t == _AB_A]
    b = [v for v, t in zip(ev["value"], ev["event_type"]) if t == _AB_B]
    return a, b


def test_sign_test_matches_python(spark):
    got = SPARK["stats_sign_test"](spark, SF).collect()[0].asDict()
    ev = _events()
    daily = Counter(t.date() for t in ev["ts"])
    days = sorted(daily)
    diffs = [daily[d2] - daily[d1] for d1, d2 in zip(days, days[1:])]
    n_plus = sum(1 for d in diffs if d > 0)
    n_minus = sum(1 for d in diffs if d < 0)
    n = n_plus + n_minus
    assert got["n_days"] == len([d for d in diffs if d != 0])
    assert got["n_plus"] == n_plus and got["n_minus"] == n_minus
    z = (n_plus - n_minus) / math.sqrt(n)
    assert got["z_score"] == pytest.approx(z, abs=2e-6)
    if n_plus != n_minus:
        zc = math.copysign(1, n_plus - n_minus) * (abs(n_plus - n_minus) - 1) / math.sqrt(n)
    else:
        zc = 0.0
    assert got["z_continuity"] == pytest.approx(zc, abs=2e-6)
    assert got["reject_05"] == (1 if abs(z) > 1.959963984540054 else 0)


def _midrank_scores(a, b):
    """Per-element Ansari-Bradley scores (midrank-averaged over ties)
    built DIRECTLY from the sorted pooled sample — independent of the
    closed-form block split the engine uses."""
    pooled = sorted([(v, 0) for v in a] + [(v, 1) for v in b])
    n_tot = len(pooled)
    raw = [min(r, n_tot + 1 - r) for r in range(1, n_tot + 1)]
    scores = [0.0] * n_tot
    i = 0
    while i < n_tot:
        j = i
        while j < n_tot and pooled[j][0] == pooled[i][0]:
            j += 1
        avg = sum(raw[i:j]) / (j - i)
        for k in range(i, j):
            scores[k] = avg
        i = j
    return pooled, scores


def test_ansari_bradley_matches_python(spark):
    got = SPARK["stats_ansari_bradley"](spark, SF).collect()[0].asDict()
    a, b = _two_sample_values()
    pooled, scores = _midrank_scores(a, b)
    n1, n2 = len(a), len(b)
    n = n1 + n2
    t1 = sum(s for (v, which), s in zip(pooled, scores) if which == 0)
    s_tot = sum(scores)
    s2 = sum(s * s for s in scores)
    e1 = n1 * s_tot / n
    var = n1 * n2 * (n * s2 - s_tot * s_tot) / (n * n * (n - 1))
    assert got["n1"] == n1 and got["n2"] == n2 and got["n_total"] == n
    assert got["ab_t1"] == pytest.approx(t1, abs=2e-3)
    assert got["z_score"] == pytest.approx((t1 - e1) / math.sqrt(var), abs=2e-5)


def test_ad_two_sample_matches_python(spark):
    got = SPARK["stats_ad_two_sample"](spark, SF).collect()[0].asDict()
    a, b = _two_sample_values()
    n1, n2 = len(a), len(b)
    n = n1 + n2
    ca, cb = Counter(a), Counter(b)
    vals = sorted(set(a) | set(b))
    a2 = 0.0
    cum1 = cum2 = cumt = 0
    for v in vals:
        t1b, t2b = ca.get(v, 0), cb.get(v, 0)
        tl = t1b + t2b
        ba = cumt + tl / 2.0
        ma1 = cum1 + t1b / 2.0
        ma2 = cum2 + t2b / 2.0
        denom = ba * (n - ba) - n * tl / 4.0
        a2 += (1.0 / n1) * (tl / n) * (n * ma1 - n1 * ba) ** 2 / denom
        a2 += (1.0 / n2) * (tl / n) * (n * ma2 - n2 * ba) ** 2 / denom
        cum1 += t1b
        cum2 += t2b
        cumt += tl
    a2 *= (n - 1.0) / n
    assert got["n1"] == n1 and got["n2"] == n2 and got["n_total"] == n
    assert got["n_blocks"] == len(vals)
    assert got["a2_stat"] == pytest.approx(a2, abs=2e-5)


def test_cramer_von_mises_matches_python(spark):
    got = SPARK["stats_cramer_von_mises"](spark, SF).collect()[0].asDict()
    a, b = _two_sample_values()
    n1, n2 = len(a), len(b)
    n = n1 + n2
    ca, cb = Counter(a), Counter(b)
    t_stat = 0.0
    cum1 = cum2 = 0
    for v in sorted(set(a) | set(b)):
        cum1 += ca.get(v, 0)
        cum2 += cb.get(v, 0)
        gap = cum1 / n1 - cum2 / n2
        t_stat += (ca.get(v, 0) + cb.get(v, 0)) * gap * gap
    t_stat *= n1 * n2 / (n * n)
    mean0 = (n + 1.0) / (6.0 * n)
    var0 = ((n + 1.0) / (45.0 * n * n)
            * (4.0 * n1 * n2 * n - 3.0 * (n1 * n1 + n2 * n2) - 2.0 * n1 * n2)
            / (4.0 * n1 * n2))
    assert got["n1"] == n1 and got["n2"] == n2 and got["n_total"] == n
    assert got["t_stat"] == pytest.approx(t_stat, abs=2e-5)
    assert got["t_null_mean"] == pytest.approx(mean0, abs=2e-6)
    assert got["z_score"] == pytest.approx((t_stat - mean0) / math.sqrt(var0), abs=2e-4)


_MARKERS = {
    "de": {"der", "die", "das", "und", "nicht"},
    "en": {"the", "a", "of", "and", "to"},
    "es": {"el", "los", "las", "y", "no"},
    "fr": {"le", "la", "les", "et", "pas"},
}


def _predict_lang(text: str) -> str:
    toks = text.strip().split()
    s = {k: sum(1 for t in toks if t in v) for k, v in _MARKERS.items()}
    if max(s.values()) == 0:
        return "und"
    for lang in ("de", "en", "es", "fr"):
        if all(s[lang] >= s[o] for o in ("de", "en", "es", "fr")):
            return lang
    raise AssertionError("unreachable")


def test_macro_f1_matches_python(spark):
    rows = {r["class"]: r.asDict()
            for r in SPARK["ml_macro_f1_multiclass"](spark, SF).collect()}
    d = pq.read_table(f"{SF}/documents.parquet").to_pydict()
    conf = Counter(
        (lang, _predict_lang(text)) for lang, text in zip(d["lang"], d["text"])
    )
    classes = {k for pair in conf for k in pair}
    assert set(rows) == classes
    f1s = []
    tp_tot = fp_tot = 0
    for k in sorted(classes):
        tp = conf.get((k, k), 0)
        fp = sum(n for (lg, pd), n in conf.items() if pd == k and lg != k)
        fn = sum(n for (lg, pd), n in conf.items() if lg == k and pd != k)
        got = rows[k]
        assert (got["tp"], got["fp"], got["fn"]) == (tp, fp, fn), k
        prec = tp / (tp + fp) if tp + fp else 0.0
        rec = tp / (tp + fn) if tp + fn else 0.0
        f1 = 2.0 * tp / (2 * tp + fp + fn) if 2 * tp + fp + fn else 0.0
        assert got["precision"] == pytest.approx(prec, abs=2e-6)
        assert got["recall"] == pytest.approx(rec, abs=2e-6)
        assert got["f1"] == pytest.approx(f1, abs=2e-6)
        f1s.append(f1)
        tp_tot += tp
        fp_tot += fp
    any_row = rows[sorted(classes)[0]]
    assert any_row["macro_f1"] == pytest.approx(sum(f1s) / len(f1s), abs=2e-6)
    assert any_row["micro_f1"] == pytest.approx(tp_tot / (tp_tot + fp_tot), abs=2e-6)


def _trade_edges():
    orders = pq.read_table(
        f"{SF}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    ).to_pydict()
    cust = pq.read_table(
        f"{SF}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).to_pydict()
    li = pq.read_table(
        f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_suppkey"]
    ).to_pydict()
    supp = pq.read_table(
        f"{SF}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    ).to_pydict()
    c_nat = dict(zip(cust["c_custkey"], cust["c_nationkey"]))
    s_nat = dict(zip(supp["s_suppkey"], supp["s_nationkey"]))
    o_cust = dict(zip(orders["o_orderkey"], orders["o_custkey"]))
    raw = Counter(
        (c_nat[o_cust[ok]], s_nat[sk])
        for ok, sk in zip(li["l_orderkey"], li["l_suppkey"])
    )
    by_src = defaultdict(list)
    for (src, dst), w in raw.items():
        by_src[src].append((-w, dst))
    edges = []
    for src, lst in by_src.items():
        for _, dst in sorted(lst)[:3]:
            edges.append((src, dst))
    return edges


def test_harmonic_centrality_matches_python(spark):
    rows = {r["nationkey"]: r.asDict()
            for r in SPARK["graph_harmonic_centrality"](spark, SF).collect()}
    edges = _trade_edges()
    adj = defaultdict(list)
    nodes = set()
    for s, d in edges:
        adj[s].append(d)
        nodes.update((s, d))
    assert set(rows) == nodes
    for s in nodes:
        dist = {s: 0}
        frontier = [s]
        for lvl in range(1, _HC_LEVELS + 1):
            nxt = []
            for u in frontier:
                for w in adj.get(u, ()):
                    if w not in dist:
                        dist[w] = lvl
                        nxt.append(w)
            frontier = nxt
        h_scaled = sum(_HC_LCM // d for d in dist.values() if d > 0)
        got = rows[s]
        assert got["n_reached"] == len(dist) - 1
        assert got["h_scaled"] == h_scaled
        assert got["harmonic"] == pytest.approx(h_scaled / _HC_LCM, abs=5.1e-7)


def test_brunner_munzel_matches_python(spark):
    got = SPARK["stats_brunner_munzel"](spark, SF).collect()[0].asDict()
    a, b = _two_sample_values()
    n1, n2 = len(a), len(b)
    n = n1 + n2
    pooled = sorted([(v, 0) for v in a] + [(v, 1) for v in b])
    # combined midranks and within-sample midranks via tie-block scan
    comb = [0.0] * n
    i = 0
    while i < n:
        j = i
        while j < n and pooled[j][0] == pooled[i][0]:
            j += 1
        mid = (i + 1 + j) / 2.0
        for k in range(i, j):
            comb[k] = mid
        i = j
    r1 = [comb[k] for k in range(n) if pooled[k][1] == 0]
    r2 = [comb[k] for k in range(n) if pooled[k][1] == 1]

    def _within(vals):
        out = [0.0] * len(vals)
        i = 0
        while i < len(vals):
            j = i
            while j < len(vals) and vals[j] == vals[i]:
                j += 1
            mid = (i + 1 + j) / 2.0
            for k in range(i, j):
                out[k] = mid
            i = j
        return out

    r1i = _within(sorted(a))
    r2i = _within(sorted(b))
    m1, m2 = sum(r1) / n1, sum(r2) / n2
    v1 = sum((x - y - m1 + (n1 + 1) / 2.0) ** 2
             for x, y in zip(sorted(r1), r1i)) / (n1 - 1)
    v2 = sum((x - y - m2 + (n2 + 1) / 2.0) ** 2
             for x, y in zip(sorted(r2), r2i)) / (n2 - 1)
    p_hat = (m2 - (n2 + 1) / 2.0) / n1
    w = n1 * n2 * (m2 - m1) / (n * math.sqrt(n1 * v1 + n2 * v2))
    nv1, nv2 = n1 * v1, n2 * v2
    df = (nv1 + nv2) ** 2 / (nv1 ** 2 / (n1 - 1) + nv2 ** 2 / (n2 - 1))
    assert got["n1"] == n1 and got["n2"] == n2
    assert got["p_hat"] == pytest.approx(p_hat, abs=2e-6)
    assert got["w_stat"] == pytest.approx(w, abs=2e-4)
    assert got["df_welch"] == pytest.approx(df, rel=1e-4)


def test_poisson_rate_test_matches_python(spark):
    got = SPARK["events_poisson_rate_test"](spark, SF).collect()[0].asDict()
    ev = _events()
    k1 = sum(1 for t in ev["event_type"] if t == _AB_A)
    k2 = sum(1 for t in ev["event_type"] if t == _AB_B)
    n_days = len({t.date() for t in ev["ts"]})
    z = (k1 - k2) / math.sqrt(k1 + k2)
    assert got["k1"] == k1 and got["k2"] == k2 and got["n_days"] == n_days
    assert got["rate_ratio"] == pytest.approx(k1 / k2, abs=2e-6)
    assert got["z_conditional"] == pytest.approx(z, abs=2e-6)
    assert got["reject_05"] == (1 if abs(z) > 1.959963984540054 else 0)


def test_js_divergence_matches_python(spark):
    from weather_tools_spark.queries.round12b import _JS_TOPK_SOURCES

    rows = {(r["s1"], r["s2"]): r.asDict()
            for r in SPARK["text_js_divergence_pairs"](spark, SF).collect()}
    d = pq.read_table(f"{SF}/documents.parquet",
                      columns=["source", "text"]).to_pydict()
    sw = defaultdict(Counter)
    for src, text in zip(d["source"], d["text"]):
        sw[src].update(text.split())
    totals = {s: sum(c.values()) for s, c in sw.items()}
    top = sorted(totals, key=lambda s: (-totals[s], s))[:_JS_TOPK_SOURCES]
    expected_pairs = {(a, b) for a in top for b in top if a < b}
    assert set(rows) == expected_pairs
    for s1, s2 in sorted(expected_pairs):
        p_c, q_c = sw[s1], sw[s2]
        n1, n2 = totals[s1], totals[s2]
        union = set(p_c) | set(q_c)
        js = 0.0
        for w in union:
            p = p_c.get(w, 0) / n1
            q = q_c.get(w, 0) / n2
            if p > 0:
                js += 0.5 * p * math.log(2 * p / (p + q))
            if q > 0:
                js += 0.5 * q * math.log(2 * q / (p + q))
        got = rows[(s1, s2)]
        assert got["vocab_union"] == len(union)
        assert got["js_nats"] == pytest.approx(js, abs=2e-6)
        assert got["js_bits"] == pytest.approx(js / math.log(2), abs=2e-6)
        assert 0.0 <= got["js_bits"] <= 1.0 + 1e-9


def test_jonckheere_terpstra_matches_python(spark):
    got = SPARK["events_jonckheere_terpstra"](spark, SF).collect()[0].asDict()
    ev = _events()
    groups = defaultdict(list)
    for t, v in zip(ev["ts"], ev["value"]):
        groups[(t.day - 1) // 7].append(v)
    ks = sorted(groups)
    n = sum(len(g) for g in groups.values())
    jt2 = 0
    for i_idx, i in enumerate(ks):
        for j in ks[i_idx + 1:]:
            ci, cj = Counter(groups[i]), Counter(groups[j])
            vals = sorted(set(ci) | set(cj))
            cumlt = 0
            for v in vals:
                jt2 += 2 * cj.get(v, 0) * cumlt + cj.get(v, 0) * ci.get(v, 0)
                cumlt += ci.get(v, 0)
    jt = jt2 / 2.0
    sizes = [len(groups[k]) for k in ks]
    e_jt = (n * n - sum(s * s for s in sizes)) / 4.0
    ties = Counter()
    for g in groups.values():
        ties.update(g)
    tv = list(ties.values())
    var_jt = (
        (n * (n - 1) * (2 * n + 5)
         - sum(s * (s - 1) * (2 * s + 5) for s in sizes)
         - sum(t * (t - 1) * (2 * t + 5) for t in tv)) / 72.0
        + (sum(s * (s - 1) * (s - 2) for s in sizes)
           * sum(t * (t - 1) * (t - 2) for t in tv))
        / (36.0 * n * (n - 1) * (n - 2))
        + (sum(s * (s - 1) for s in sizes) * sum(t * (t - 1) for t in tv))
        / (8.0 * n * (n - 1))
    )
    z = (jt - e_jt) / math.sqrt(var_jt)
    assert got["n_total"] == n and got["k_groups"] == len(ks)
    assert got["jt_stat"] == pytest.approx(jt, abs=0.051)
    assert got["jt_null_mean"] == pytest.approx(e_jt, abs=0.051)
    assert got["z_score"] == pytest.approx(z, abs=2e-6)
    assert got["reject_05"] == (1 if abs(z) > 1.959963984540054 else 0)


def test_log_loss_matches_python(spark):
    got = SPARK["ml_log_loss"](spark, SF).collect()[0].asDict()
    ev = _events()
    bins = Counter()
    pos = Counter()
    for v, t in zip(ev["value"], ev["event_type"]):
        b = min(int(v // 50), 9)
        bins[b] += 1
        pos[b] += 1 if t == "purchase" else 0
    n = sum(bins.values())
    kk = sum(pos.values())
    ll = -sum(
        pos[b] / n * math.log((b + 0.5) / 10.0)
        + (bins[b] - pos[b]) / n * math.log(1 - (b + 0.5) / 10.0)
        for b in bins
    )
    ent = -(kk / n * math.log(kk / n) + (n - kk) / n * math.log((n - kk) / n))
    assert got["n"] == n and got["n_pos"] == kk
    assert got["log_loss"] == pytest.approx(ll, abs=2e-6)
    assert got["baseline_entropy"] == pytest.approx(ent, abs=2e-6)
    assert got["skill_score"] == pytest.approx(1 - ll / ent, abs=2e-6)
    assert got["log_loss"] >= 0
