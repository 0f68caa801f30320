"""Property-based tests (hypothesis) — a test style the reference lacks
entirely (SURVEY.md §5 'Absent'). Pure-Python engine functions get
randomized coverage; Spark-side invariants are checked via the already
deterministic operators."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings
from hypothesis import strategies as st

from weather_tools_spark.functions import timeparse as TP
from weather_tools_spark.pipeline import ratelimit as RL


@given(st.integers(min_value=-500, max_value=500), st.integers(min_value=-500, max_value=500),
       st.integers(min_value=1, max_value=17))
@settings(max_examples=200, deadline=None)
def test_mars_int_range_properties(a, b, step):
    vals = [int(v) for v in TP.expand_mars_range(f"{a}/to/{b}/by/{step}")]
    assert vals[0] == a
    assert all(abs(y - x) == step for x, y in zip(vals, vals[1:]))
    if a <= b:
        assert vals == sorted(vals) and vals[-1] <= b and b - vals[-1] < step
    else:
        assert vals == sorted(vals, reverse=True) and vals[-1] >= b and vals[-1] - b < step


@given(st.dates(min_value=dt.date(1950, 1, 2), max_value=dt.date(2100, 12, 31)),
       st.dates(min_value=dt.date(1950, 1, 2), max_value=dt.date(2100, 12, 31)),
       st.integers(min_value=1, max_value=30))
@settings(max_examples=100, deadline=None)
def test_mars_date_range_properties(a, b, step):
    spec = f"{a.isoformat()}/to/{b.isoformat()}/by/{step}"
    out = [dt.date.fromisoformat(v) for v in TP.expand_mars_range(spec)]
    assert out[0] == a
    assert all(abs((y - x).days) == step for x, y in zip(out, out[1:]))
    assert all((a <= v <= b) or (b <= v <= a) for v in out)


@given(st.dates(min_value=dt.date(1950, 1, 1), max_value=dt.date(2100, 12, 31)))
@settings(max_examples=200, deadline=None)
def test_ecmwf_date_roundtrip(d):
    assert TP.parse_ecmwf_date(d.isoformat()) == d
    assert TP.parse_ecmwf_date(d.strftime("%Y%m%d")) == d
    assert TP.parse_ecmwf_date(f"{d.year}-{d.timetuple().tm_yday:03d}") == d


@given(st.dates(min_value=dt.date(1950, 1, 1), max_value=dt.date(2100, 12, 31)),
       st.integers(min_value=1, max_value=40))
@settings(max_examples=100, deadline=None)
def test_hdates_properties(base, years):
    out = TP.hdates(base, years)
    assert len(out) == years
    for i, s in enumerate(out, start=1):
        d = dt.date.fromisoformat(s)
        assert d.year == base.year - i
        assert d.month == base.month
        assert d.day in (base.day, 28)  # Feb-29 fallback only


def test_asof_join_randomized_vs_merge_asof(spark):
    """Randomized equivalence of the union-and-carry as-of join against
    pandas merge_asof (one seeded draw per suite run; hypothesis-style
    coverage without respawning Spark jobs per example)."""
    import numpy as np
    import pandas as pd

    from weather_tools_spark.operators.asof import asof_join_left

    rng = np.random.RandomState(7)
    for trial in range(5):
        nl_, nr = rng.randint(1, 40), rng.randint(1, 40)
        lp = pd.DataFrame({
            "k": rng.randint(0, 5, nl_),
            "t": rng.choice(np.arange(0, 500, 7), nl_, replace=False) if nl_ <= 72 else rng.randint(0, 500, nl_),
            "lid": np.arange(nl_),
        })
        rp = pd.DataFrame({
            "k": rng.randint(0, 5, nr),
            "t": rng.choice(np.arange(3, 500, 11), nr, replace=False) if nr <= 46 else rng.randint(0, 500, nr),
            "payload": np.arange(nr),
        })
        rp = rp.drop_duplicates(["k", "t"])  # unique (by, time) per contract
        left = spark.createDataFrame(lp.astype({"k": "int64", "t": "int64", "lid": "int64"}))
        right = spark.createDataFrame(rp.astype({"k": "int64", "t": "int64", "payload": "int64"}))
        got = (
            asof_join_left(left, right, "t", "t", "k", "k", {"payload": "m"})
            .toPandas().sort_values("lid").reset_index(drop=True)
        )
        want = pd.merge_asof(
            lp.sort_values("t"), rp.sort_values("t"), on="t", by="k", direction="backward"
        ).sort_values("lid").reset_index(drop=True)
        assert list(got["m"].fillna(-1)) == list(want["payload"].fillna(-1)), f"trial {trial}"


@given(st.floats(min_value=0.1, max_value=100), st.floats(min_value=0.01, max_value=10),
       st.integers(min_value=1, max_value=64))
@settings(max_examples=200, deadline=None)
def test_shard_formula_bounds(qps, latency, max_conc):
    n = RL.num_shards(qps, latency, max_conc)
    assert 1 <= n <= max_conc


def test_sanitize_longitude_bounds_batch(spark):
    """Batch-randomized invariant: sanitize_longitude lands in [-180,180)
    and is 360-periodic for any input (one Spark job over 2000 random
    draws instead of a job per hypothesis example)."""
    import numpy as np
    from pyspark.sql import functions as F

    from weather_tools_spark.functions.geo import sanitize_longitude

    rng = np.random.RandomState(11)
    lons = (rng.uniform(-2000, 2000, 2000)).tolist()
    df = spark.createDataFrame([(x,) for x in lons], "lon double")
    out = df.select(
        "lon",
        sanitize_longitude(F.col("lon")).alias("s"),
        sanitize_longitude(F.col("lon") + 360.0).alias("s_shift"),
    ).collect()
    for r in out:
        assert -180.0 <= r.s < 180.0, r
        assert abs(r.s - r.s_shift) < 1e-9 or abs(abs(r.s - r.s_shift) - 360.0) < 1e-9


@given(st.text(alphabet="ab ", min_size=0, max_size=40))
@settings(max_examples=200, deadline=None)
def test_selection_expansion_idempotent(s):
    sel = {"x": [s or "v"]}
    once = TP.expand_selection(sel)
    twice = TP.expand_selection({"x": once["x"]})
    assert once == twice


@given(
    st.integers(min_value=1, max_value=40),   # corpus rows in the batch
    st.integers(min_value=1, max_value=12),   # queries
    st.integers(min_value=1, max_value=8),    # k
    st.integers(min_value=0, max_value=2**31),
)
@settings(max_examples=150, deadline=None)
def test_local_topk_frame_contains_exact_topk(n_rows, n_q, k, seed):
    """The vectorized local top-k kernel (operators/similarity.
    _local_topk_frame — it replaced a per-query Python loop) must emit,
    for every query, a candidate superset of the EXACT top-k by
    (cosine DESC, neighbor_id ASC) with self-matches excluded and at
    most k+1 candidates per query — the contract the global window
    relies on. Scores are drawn from a small discrete set so ties are
    frequent (the argpartition edge case)."""
    import numpy as np
    import pandas as pd

    from weather_tools_spark.operators.similarity import _local_topk_frame

    rng = np.random.RandomState(seed % (2**31 - 1))
    s = rng.randint(0, 4, size=(n_rows, n_q)).astype(float) / 3.0
    c_ids = rng.permutation(1000)[:n_rows].astype("int64")
    q_ids = rng.permutation(np.arange(500, 1500))[:n_q].astype("int64")
    out = _local_topk_frame(pd, s, c_ids, q_ids, k)
    assert (out.groupby("query_id").size() <= k + 1).all()
    for j, q in enumerate(q_ids):
        got = set(out.loc[out.query_id == q, "neighbor_id"])
        assert q not in got  # leave-one-out
        order = sorted(
            (i for i in range(n_rows) if c_ids[i] != q),
            key=lambda i: (-s[i, j], c_ids[i]),
        )
        exact = {int(c_ids[i]) for i in order[:k]}
        assert exact <= got, (q, exact, got)


def test_max_run_count_equals_counter_mode(spark):
    """functions/text.max_run_count (the sorted-run fold behind the r9
    explode-free token-mode statistics) must equal Counter's mode count
    on randomized token arrays — including empties, duplicates-only,
    and single-element arrays. One Spark job over a hypothesis-style
    randomized batch (deterministic seed) instead of per-example jobs."""
    import random
    from collections import Counter

    from pyspark.sql import functions as F

    from weather_tools_spark.functions.text import max_run_count

    rng = random.Random(421)
    vocab = ["a", "b", "c", "dd", "e f"[0:2], "zz"]
    cases: list[list[str]] = [[], ["x"], ["x", "x", "x"]]
    for _ in range(200):
        n = rng.randint(0, 30)
        cases.append([rng.choice(vocab) for _ in range(n)])
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)], "id int, toks array<string>"
    )
    got = {
        r.id: r.m
        for r in df.select("id", max_run_count(F.col("toks")).alias("m")).collect()
    }
    for i, c in enumerate(cases):
        want = max(Counter(c).values()) if c else 0
        assert got[i] == want, (i, c, got[i], want)


def test_max_run_count_non_string_arrays(spark):
    """ADVICE r9: the fold zero used to pin prev to string type, so
    long/double arrays raised AnalysisException. The zero is now seeded
    from the array's own first element — any orderable type works."""
    from collections import Counter

    from pyspark.sql import functions as F

    from weather_tools_spark.functions.text import max_run_count

    longs = [[1, 2, 2, 2, 3], [], [7], [5, 5, 4, 4, 4, 4]]
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(longs)], "id int, arr array<long>"
    )
    got = {
        r.id: r.m
        for r in df.select("id", max_run_count(F.col("arr")).alias("m")).collect()
    }
    for i, c in enumerate(longs):
        assert got[i] == (max(Counter(c).values()) if c else 0)
    dbl = spark.createDataFrame([(0, [1.5, 1.5, 2.0])], "id int, arr array<double>")
    assert dbl.select(max_run_count(F.col("arr")).alias("m")).first().m == 2
