"""Event-stream operators evaluated in batch form over the events table.

The reference's streaming surface is fixed 1-minute windows on event
time plus random-key sharding (weather_mv/loader_pipeline/streaming.py:
44-55, bq.py:421; SURVEY.md §2.9) — no watermarks, sessions or stateful
operators. The Spark build provides the batch-equivalent plans here
(hash-checked against the oracle) and the true Structured Streaming
versions in ``weather_tools_spark.streaming.events`` (exercised in
tests; streaming and batch share the same transformation functions, so
the checked semantics carry over).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from weather_tools_spark.catalog import events_time_between, load_table
from weather_tools_spark.queries import register


@register(
    "events_minute_window_agg",
    oracle="""
    SELECT strftime(date_trunc('minute', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           count(*) AS n,
           round(sum(value), 4) AS sum_value
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-05 00:00:00' AND ts < TIMESTAMP '2024-01-06 00:00:00'
    GROUP BY window_start, event_type
    ORDER BY window_start, event_type
    """,
)
def events_minute_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed 1-minute event-time windows (streaming.py:44-55 semantics).
    Uses Spark's ``window()`` — identical aligned-to-epoch bucketing to
    the streaming plan; batch and stream share this expression. The
    day-range filter pushes to the scan via the ts_ns twin predicate."""
    ev = events_time_between(
        load_table(spark, "events", sf_dir), "2024-01-05 00:00:00", "2024-01-06 00:00:00"
    )
    return (
        ev.groupBy(F.window("ts", "1 minute").alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
        .orderBy("window_start", "event_type")
    )


@register(
    "events_sessionization",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    )
    SELECT user_id,
           CAST(sum(is_new) AS BIGINT) AS n_sessions,
           count(*) AS n_events
    FROM flagged
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (30-minute inactivity gap) via lag + flag-sum — the
    batch form of ``session_window``; an operator the reference lacks
    entirely (SURVEY.md §2.9)."""
    ev = load_table(spark, "events", sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # gap compared at microsecond precision — cast("long") would truncate
    # to whole seconds and disagree with the oracle's INTERVAL comparison
    # for fractional-second gaps straddling the 30-minute boundary
    flagged = ev.withColumn(
        "is_new",
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)) > 1800 * 1_000_000),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    return (
        flagged.groupBy("user_id")
        .agg(F.sum("is_new").alias("n_sessions"), F.count(F.lit(1)).alias("n_events"))
        .orderBy("user_id")
    )


@register(
    "events_json_props_extract",
    oracle="""
    SELECT event_type,
           round(CAST(sum(CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT)) AS DOUBLE)
                 / count(CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT)), 6) AS avg_k,
           count(*) AS n
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def events_json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction from the JSON props column — the engine
    treats JSON payloads as first-class (the reference stores selection
    dicts as JSON, manifest.py:465-466). regexp path keeps both engines
    on identical semantics."""
    ev = load_table(spark, "events", sf_dir)
    k = F.regexp_extract("props", r'"k": (\d+)', 1).cast("bigint")
    return (
        ev.groupBy("event_type")
        .agg(F.round(F.sum(k).cast("double") / F.count(k), 6).alias("avg_k"), F.count(F.lit(1)).alias("n"))
        .orderBy("event_type")
    )


@register(
    "events_type_share_by_day",
    oracle="""
    WITH daily AS (
      SELECT strftime(ts, '%Y-%m-%d') AS d, event_type, count(*) AS n
      FROM events GROUP BY d, event_type
    )
    SELECT d, event_type, n,
           round(n * 1.0 / sum(n) OVER (PARTITION BY d), 6) AS day_share
    FROM daily
    ORDER BY d, event_type
    """,
)
def events_type_share_by_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate + windowed ratio-to-total (partial agg first, then a
    window over the already-small aggregated frame — cheap at any scale)."""
    ev = load_table(spark, "events", sf_dir)
    daily = ev.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("d"), F.col("event_type")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = W.partitionBy("d")
    return (
        daily.select(
            "d",
            "event_type",
            "n",
            F.round(F.col("n") * 1.0 / F.sum("n").over(w), 6).alias("day_share"),
        )
        .orderBy("d", "event_type")
    )


@register(
    "events_lead_lag_trailing_window",
    oracle="""
    SELECT event_id, user_id,
           round(value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 4)
             AS delta_prev,
           round(CAST(sum(CAST(value AS DECIMAL(30,6)))
                        OVER (PARTITION BY user_id ORDER BY ts
                              RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
                      AS DOUBLE), 4) AS trailing_1h_sum
    FROM events
    WHERE user_id < 50
    ORDER BY user_id, event_id
    """,
)
def events_lead_lag_trailing_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag() analytics + an event-time RANGE frame (trailing 1-hour sum
    per user). The range frame orders on unix-microseconds with a
    ±3600e6 bound — exactly DuckDB's INTERVAL RANGE semantics (both ends
    inclusive). The frame sum runs through exact decimal so sliding-
    window accumulation order can't flip a rounded digit."""
    ev = load_table(spark, "events", sf_dir).filter(F.col("user_id") < 50)
    w_lag = W.partitionBy("user_id").orderBy("ts", "event_id")
    w_range = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return (
        ev.select(
            "event_id",
            "user_id",
            F.round(F.col("value") - F.lag("value").over(w_lag), 4).alias("delta_prev"),
            F.round(
                (F.sum(F.round(F.col("value") * 1_000_000, 0).cast("long")).over(w_range)
                 / 1_000_000).cast("double"), 4,
            ).alias("trailing_1h_sum"),
        )
        .orderBy("user_id", "event_id")
    )


@register(
    "events_daily_type_pivot",
    oracle="""
    SELECT strftime(ts, '%Y-%m-%d') AS d,
           CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
           CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
           CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
           CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
    FROM events
    GROUP BY d
    ORDER BY d
    """,
)
def events_daily_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily × event-type count matrix via pivot() — the wide layout a
    dashboard reads; Spark's pivot compiles to the same conditional
    aggregation the oracle spells out."""
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("d"))
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
        .orderBy("d")
    )


@register(
    "events_funnel_conversion",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'signup' THEN ts END) AS first_signup,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
      FROM events GROUP BY user_id
    )
    SELECT count(*) AS n_users,
           CAST(sum(CASE WHEN first_signup IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_signed_up,
           CAST(sum(CASE WHEN first_signup IS NOT NULL AND first_purchase > first_signup
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_converted
    FROM firsts
    """,
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel/sequence analytics: users whose first purchase strictly
    follows their first signup — conditional-min per user then ordered
    comparison (µs-exact timestamps on both engines)."""
    ev = load_table(spark, "events", sf_dir)
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("fs"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("fp"),
    )
    return firsts.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.when(F.col("fs").isNotNull(), 1).otherwise(0)).alias("n_signed_up"),
        F.sum(
            F.when(F.col("fs").isNotNull() & (F.col("fp") > F.col("fs")), 1).otherwise(0)
        ).alias("n_converted"),
    )


@register(
    "events_trailing_7d_active_users",
    oracle="""
    WITH days AS (
      SELECT unnest(generate_series(DATE '2024-01-07', DATE '2024-01-30', INTERVAL 1 DAY)) AS d
    )
    SELECT strftime(d, '%Y-%m-%d') AS day,
           count(DISTINCT user_id) AS active_users_7d
    FROM days JOIN events
      ON ts >= CAST(d AS TIMESTAMP) - INTERVAL 6 DAY
     AND ts <  CAST(d AS TIMESTAMP) + INTERVAL 1 DAY
    GROUP BY day
    ORDER BY day
    """,
)
def events_trailing_7d_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day distinct active users per day. Windowed DISTINCT
    aggregation isn't expressible as a frame (neither engine supports
    count(DISTINCT) over a window) — the relational form is a bounded
    day×events range join (each event lands in ≤7 day buckets) followed
    by an ordinary distinct count: O(7·events) shuffle rows, no n²."""
    ev = load_table(spark, "events", sf_dir)
    days = (
        spark.range(1)
        .coalesce(1)
        .select(
            F.explode(
                F.sequence(
                    F.lit("2024-01-07").cast("date"),
                    F.lit("2024-01-30").cast("date"),
                    F.expr("INTERVAL 1 DAY"),
                )
            ).alias("d")
        )
    )
    joined = ev.join(
        F.broadcast(days),
        (F.col("ts") >= F.col("d").cast("timestamp") - F.expr("INTERVAL 6 DAY"))
        & (F.col("ts") < F.col("d").cast("timestamp") + F.expr("INTERVAL 1 DAY")),
    )
    return (
        joined.groupBy(F.date_format("d", "yyyy-MM-dd").alias("day"))
        .agg(F.countDistinct("user_id").alias("active_users_7d"))
        .orderBy("day")
    )


@register(
    "hypertable_rollup_cascade",
    oracle="""
    WITH hourly AS (
      SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS bucket,
             count(*) AS n,
             CAST(sum(CAST(round((value) * 1000000, 0) AS BIGINT)) AS BIGINT) AS sum_micro
      FROM events GROUP BY bucket
    ),
    daily AS (
      SELECT strftime(CAST(bucket AS TIMESTAMP), '%Y-%m-%d 00:00:00') AS bucket,
             CAST(sum(n) AS BIGINT) AS n, CAST(sum(sum_micro) AS BIGINT) AS sum_micro
      FROM hourly GROUP BY 1
    ),
    monthly AS (
      SELECT strftime(date_trunc('month', CAST(bucket AS TIMESTAMP)), '%Y-%m-%d 00:00:00') AS bucket,
             CAST(sum(n) AS BIGINT) AS n, CAST(sum(sum_micro) AS BIGINT) AS sum_micro
      FROM daily GROUP BY 1
    )
    SELECT 'hour' AS resolution, bucket, n, round(CAST(sum_micro AS DOUBLE) / 1000000, 4) AS sum_value FROM hourly
    UNION ALL
    SELECT 'day', bucket, n, round(CAST(sum_micro AS DOUBLE) / 1000000, 4) FROM daily
    UNION ALL
    SELECT 'month', bucket, n, round(CAST(sum_micro AS DOUBLE) / 1000000, 4) FROM monthly
    ORDER BY resolution, bucket
    """,
)
def hypertable_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style cascading rollup (continuous-aggregate pattern):
    the raw stream aggregates ONCE to hourly buckets; daily re-aggregates
    the hourly frame; monthly re-aggregates daily. Because the partial
    states (count + exact scaled-long sum) re-aggregate losslessly, each
    coarser level costs a shuffle over the already-tiny finer rollup
    instead of another scan of the fact table — the scale pattern for
    serving multi-resolution dashboards off one pass."""
    ev = load_table(spark, "events", sf_dir)
    hourly = (
        ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("b"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 1_000_000, 0).cast("long")).alias("sum_micro"),
        )
    )
    daily = (
        hourly.groupBy(F.date_trunc("day", F.col("b")).alias("b"))
        .agg(F.sum("n").alias("n"), F.sum("sum_micro").alias("sum_micro"))
    )
    monthly = (
        daily.groupBy(F.date_trunc("month", F.col("b")).alias("b"))
        .agg(F.sum("n").alias("n"), F.sum("sum_micro").alias("sum_micro"))
    )

    def fmt(df: DataFrame, res: str) -> DataFrame:
        return df.select(
            F.lit(res).alias("resolution"),
            F.date_format("b", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
            "n",
            F.round(F.col("sum_micro").cast("double") / 1_000_000, 4).alias("sum_value"),
        )

    return (
        fmt(hourly, "hour")
        .unionByName(fmt(daily, "day"))
        .unionByName(fmt(monthly, "month"))
        .orderBy("resolution", "bucket")
    )


@register(
    "events_asof_join_orders",
    oracle="""
    SELECT e.event_id,
           e.user_id,
           o.o_orderkey AS last_orderkey,
           strftime(o.o_shifted, '%Y-%m-%d') AS last_orderdate
    FROM (SELECT * FROM events WHERE event_type = 'purchase') e
    ASOF LEFT JOIN (SELECT max(o_orderkey) AS o_orderkey, o_custkey,
                           o_orderdate + INTERVAL 29 YEAR AS o_shifted
                    FROM orders
                    GROUP BY o_custkey, o_shifted) o
      ON e.user_id = o.o_custkey AND e.ts >= o.o_shifted
    ORDER BY e.event_id
    """,
)
def events_asof_join_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase event picks the latest order of the same
    user at-or-before the event time (order dates shifted into the events'
    epoch so the ranges overlap). Spark lacks a native as-of join
    (SURVEY.md §2.3); implemented as union-tag + window last_value — a
    single shuffle on the join key, no per-row subquery, scales linearly.
    DuckDB's native ASOF JOIN is the oracle.
    """
    ev = load_table(spark, "events", sf_dir).filter(F.col("event_type") == "purchase")
    # De-dup right side on (key, time) so the as-of winner is
    # deterministic on both engines (ties otherwise engine-dependent).
    orders = (
        load_table(spark, "orders", sf_dir)
        .select(
            "o_orderkey",
            "o_custkey",
            (F.col("o_orderdate") + F.expr("INTERVAL 29 YEAR")).alias("o_shifted"),
        )
        .groupBy("o_custkey", "o_shifted")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
    )
    from weather_tools_spark.operators.asof import asof_join_left

    joined = asof_join_left(
        ev.select("event_id", "user_id", "ts"),
        orders,
        left_on="ts",
        right_on="o_shifted",
        left_by="user_id",
        right_by="o_custkey",
        right_payload={"o_orderkey": "last_orderkey", "o_shifted": "last_shifted"},
    )
    return (
        joined.select(
            "event_id",
            "user_id",
            F.col("last_orderkey"),
            F.date_format(F.col("last_shifted"), "yyyy-MM-dd").alias("last_orderdate"),
        )
        .orderBy("event_id")
    )


@register(
    "events_resample_1h_gapfill",
    oracle="""
    WITH agg AS (
      SELECT date_trunc('hour', ts::timestamp) AS bucket, event_type,
             count(*) AS n,
             CAST(sum(CAST(round((value) * 1000000, 0) AS BIGINT)) AS BIGINT) AS sum_micro
      FROM events GROUP BY 1, 2
    ),
    bounds AS (SELECT date_trunc('hour', min(ts::timestamp)) AS lo,
                      date_trunc('hour', max(ts::timestamp)) AS hi FROM events),
    spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket FROM bounds),
    grid AS (SELECT s.bucket, t.event_type
             FROM spine s CROSS JOIN (SELECT DISTINCT event_type FROM events) t),
    filled AS (SELECT g.bucket, g.event_type, coalesce(a.n, 0) AS n, a.sum_micro
               FROM grid g LEFT JOIN agg a ON g.bucket = a.bucket AND g.event_type = a.event_type)
    SELECT strftime(bucket, '%Y-%m-%d %H:00:00') AS bucket, event_type, CAST(n AS BIGINT) AS n,
           round(CAST(last_value(sum_micro IGNORE NULLS) OVER (
                 PARTITION BY event_type ORDER BY bucket
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 1000000, 4) AS sum_value_locf
    FROM filled
    ORDER BY bucket, event_type
    """,
)
def events_resample_1h_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample to a gapless hourly grid with
    last-observation-carried-forward: aggregate once per (hour, type),
    build the full hour spine with ``sequence()`` (driver-free — the
    spine is a one-row explode), broadcast the tiny type dimension,
    left-join and LOCF via last(ignorenulls) over an ordered window —
    the weather/timescale 'gapfill + locf' surface on plain DataFrame
    ops. Empty hours report n=0 and carry the last seen hourly sum."""
    from pyspark.sql import Window as W

    ev = load_table(spark, "events", sf_dir)
    agg = ev.groupBy(F.date_trunc("hour", "ts").alias("bucket"), "event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("value") * 1_000_000, 0).cast("long")).alias("sum_micro"),
    )
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 hour)")).alias("bucket")
    ).crossJoin(F.broadcast(ev.select("event_type").distinct()))
    filled = spine.join(agg, ["bucket", "event_type"], "left").select(
        "bucket",
        "event_type",
        F.coalesce("n", F.lit(0)).alias("n"),
        F.col("sum_micro"),
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return filled.select(
        F.date_format("bucket", "yyyy-MM-dd HH:00:00").alias("bucket"),
        "event_type",
        "n",
        F.round(
            F.last("sum_micro", ignorenulls=True).over(w) / 1_000_000, 4
        ).alias("sum_value_locf"),
    ).orderBy("bucket", "event_type")


@register(
    "events_conversion_window",
    oracle="""
    WITH s AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'signup'),
         p AS (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'),
         per_signup AS (
           SELECT s.event_id, s.user_id,
                  count(p.ts) AS n_purchases,
                  COALESCE(sum(CAST(round((p.value) * 1000000, 0) AS BIGINT)), 0) AS micro_value
           FROM s LEFT JOIN p
             ON p.user_id = s.user_id
            AND p.ts >= s.ts AND p.ts < s.ts + INTERVAL 30 MINUTE
           GROUP BY s.event_id, s.user_id
         )
    SELECT user_id,
           count(*) AS n_signups,
           CAST(sum(CASE WHEN n_purchases > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_converted,
           CAST(sum(n_purchases) AS BIGINT) AS n_purchases,
           round(CAST(sum(micro_value) AS DOUBLE) / 1000000, 4) AS conv_value
    FROM per_signup
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def events_conversion_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion attribution: per user, how many signups saw at least
    one purchase within 30 minutes, and the attributed purchase value.

    The fact-fact **time-band join** runs through the batch/streaming
    shared :func:`~weather_tools_spark.streaming.events.conversion_pairs`
    (left form here to keep unconverted signups); the streaming twin is
    a true stream-stream join with watermark-bounded state, verified
    equivalent in tests/test_streaming.py. Scale shape: hash join on the
    equi key ``user_id`` (no bucketization needed — the band predicate
    is a residual filter), two-level partial agg on (signup, user) then
    user. The oracle runs the naive inequality LEFT JOIN."""
    from weather_tools_spark.streaming.events import conversion_pairs

    ev = load_table(spark, "events", sf_dir)
    pairs = conversion_pairs(
        ev.filter(F.col("event_type") == "signup"),
        ev.filter(F.col("event_type") == "purchase"),
        window="30 minutes",
        how="left",
    )
    per_signup = pairs.groupBy("signup_id", "user_id").agg(
        F.count("p_ts").alias("n_purchases"),
        F.coalesce(
            F.sum(F.round(F.col("p_value") * 1_000_000, 0).cast("long")), F.lit(0)
        ).alias("micro_value"),
    )
    return (
        per_signup.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_signups"),
            F.sum(F.when(F.col("n_purchases") > 0, 1).otherwise(0)).alias("n_converted"),
            F.sum("n_purchases").alias("n_purchases"),
            F.round((F.sum("micro_value") / 1_000_000).cast("double"), 4).alias("conv_value"),
        )
        .orderBy("user_id")
    )


@register(
    "events_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
      FROM events
    ),
    counts AS (
      SELECT event_type, next_type, count(*) AS n
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY event_type, next_type
    )
    SELECT event_type, next_type, n,
           round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY event_type), 6) AS p
    FROM counts
    ORDER BY event_type, next_type
    """,
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences (lead window → pair counts → row-normalized
    probabilities) — the session-flow analysis behind funnel and
    next-action models.

    Scale shape: one shuffle on ``user_id`` for the sequence window,
    then a pair-count aggregate whose output is at most |types|² rows —
    the normalizing window runs on that tiny frame, not the fact. The
    probability is a single bigint/bigint division (deterministic on
    both engines)."""
    ev = load_table(spark, "events", sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    counts = seq.groupBy("event_type", "next_type").agg(F.count(F.lit(1)).alias("n"))
    return counts.select(
        "event_type",
        "next_type",
        "n",
        F.round(
            F.col("n").cast("double") / F.sum("n").over(W.partitionBy("event_type")), 6
        ).alias("p"),
    ).orderBy("event_type", "next_type")


@register(
    "events_hourly_seasonality",
    oracle="""
    SELECT CAST(extract(hour FROM ts) AS BIGINT) AS hour_of_day,
           event_type,
           count(*) AS n,
           round((CAST(sum(CAST(round((value) * 1000000, 0) AS BIGINT)) AS DOUBLE) / 1000000) / count(value), 6) AS avg_value
    FROM events
    GROUP BY hour_of_day, event_type
    ORDER BY hour_of_day, event_type
    """,
)
def events_hourly_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonality profile per event type — the diurnal
    pattern every capacity/anomaly model starts with. Single
    map-combinable aggregate on a 24×|types| key; hour extraction stays
    in codegen."""
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.groupBy(
            F.hour("ts").cast("bigint").alias("hour_of_day"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                (F.sum(F.round(F.col("value") * 1_000_000, 0).cast("long")) / 1_000_000).cast(
                    "double"
                )
                / F.count("value"),
                6,
            ).alias("avg_value"),
        )
        .orderBy("hour_of_day", "event_type")
    )


# ---------------------------------------------------------------------------
# Exponential smoothing over the daily series
# ---------------------------------------------------------------------------

_EWMA_A = 0.3


@register(
    "events_ewma_daily",
    oracle=f"""
    WITH d AS (
      SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
             round((CAST(sum(CAST(round((value) * 1000000, 0) AS BIGINT)) AS DOUBLE) / 1000000) / count(value), 6) AS x
      FROM events GROUP BY event_type, day
    ), idx AS (
      SELECT event_type, day, x,
             CAST(row_number() OVER (PARTITION BY event_type ORDER BY day) AS BIGINT) AS t,
             first_value(x) OVER (PARTITION BY event_type ORDER BY day) AS x1,
             sum(x * pow({1 - _EWMA_A!r}, -t_inner)) OVER (
               PARTITION BY event_type ORDER BY day) AS cum
      FROM (SELECT event_type, day, x,
                   CAST(row_number() OVER (PARTITION BY event_type ORDER BY day) AS BIGINT) AS t_inner
            FROM d)
    )
    SELECT event_type, day, x,
           round(CASE WHEN t = 1 THEN x1
                 ELSE {_EWMA_A!r} * pow({1 - _EWMA_A!r}, t)
                        * (cum - x1 * pow({1 - _EWMA_A!r}, -1))
                      + pow({1 - _EWMA_A!r}, t - 1) * x1 END, 6) AS ewma
    FROM idx
    ORDER BY event_type, day
    """,
)
def events_ewma_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential smoothing (EWMA, α=0.3, s₁=x₁) of each event type's
    daily mean — the sequential recurrence re-expressed as a CLOSED-FORM
    windowed sum so it stays one distributed window pass instead of a
    per-series loop: sₜ = α(1−α)ᵗ·Σ_{{i≤t}} xᵢ(1−α)⁻ⁱ (i≥2 terms)
    + (1−α)ᵗ⁻¹x₁. Exponents are bounded by the series length (30 days),
    so the rescaled cumulative sum stays well-conditioned; the window
    partitions by series key — no global single-partition window. Same
    formula in the oracle."""
    from pyspark.sql import Window
    from weather_tools_spark.queries.core_sql import _davg

    ev = load_table(spark, "events", sf_dir)
    a = _EWMA_A
    d = ev.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.round(_davg(F.col("value")), 6).alias("x"))
    wseq = Window.partitionBy("event_type").orderBy("day")
    idx = d.select(
        "event_type", "day", "x",
        F.row_number().over(wseq).cast("long").alias("t"),
        F.first("x").over(wseq).alias("x1"),
    ).withColumn(
        "cum",
        F.sum(F.col("x") * F.pow(F.lit(1 - a), -F.col("t"))).over(wseq),
    )
    ewma = F.when(F.col("t") == 1, F.col("x1")).otherwise(
        a * F.pow(F.lit(1 - a), F.col("t"))
        * (F.col("cum") - F.col("x1") * F.pow(F.lit(1 - a), F.lit(-1.0)))
        + F.pow(F.lit(1 - a), F.col("t") - 1) * F.col("x1")
    )
    return idx.select(
        "event_type", "day", "x", F.round(ewma, 6).alias("ewma")
    ).orderBy("event_type", "day")


@register(
    "events_linear_trend",
    oracle="""
    WITH d AS (
      SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
             round((CAST(sum(CAST(round((value) * 1000000, 0) AS BIGINT)) AS DOUBLE) / 1000000) / count(value), 6) AS x
      FROM events GROUP BY event_type, day
    ), idx AS (
      SELECT event_type, x,
             CAST(row_number() OVER (PARTITION BY event_type ORDER BY day) AS DOUBLE) AS t
      FROM d
    ), m AS (
      SELECT event_type, count(*) AS n, sum(t) AS st, sum(x) AS sx,
             sum(t * t) AS stt, sum(t * x) AS stx, sum(x * x) AS sxx
      FROM idx GROUP BY event_type
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n_days,
           round((n * stx - st * sx) / (n * stt - st * st), 6) AS slope,
           round((sx - (n * stx - st * sx) / (n * stt - st * st) * st) / n, 6) AS intercept,
           round(pow(n * stx - st * sx, 2) / ((n * stt - st * st) * (n * sxx - sx * sx)), 6) AS r2
    FROM m ORDER BY event_type
    """,
)
def events_linear_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series ordinary-least-squares trend — slope/intercept/R² of
    each event type's daily mean against the day index, computed from
    the five sufficient statistics (n, Σt, Σx, Σtt, Σtx, Σxx) so the
    whole fit is ONE map-combinable aggregate per series: no window
    over the raw series, no collect, closed-form normal equations.
    The same statistic-sums discipline fits 10⁹-row series unchanged."""
    from weather_tools_spark.queries.core_sql import _davg

    ev = load_table(spark, "events", sf_dir)
    d = ev.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.round(_davg(F.col("value")), 6).alias("x"))
    idx = d.select(
        "event_type", "x",
        F.row_number().over(W.partitionBy("event_type").orderBy("day")).cast("double").alias("t"),
    )
    m = idx.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("t").alias("st"), F.sum("x").alias("sx"),
        F.sum(F.col("t") * F.col("t")).alias("stt"),
        F.sum(F.col("t") * F.col("x")).alias("stx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    slope = (F.col("n") * F.col("stx") - F.col("st") * F.col("sx")) / (
        F.col("n") * F.col("stt") - F.col("st") * F.col("st")
    )
    return m.select(
        "event_type",
        F.col("n").cast("long").alias("n_days"),
        F.round(slope, 6).alias("slope"),
        F.round((F.col("sx") - slope * F.col("st")) / F.col("n"), 6).alias("intercept"),
        F.round(
            F.pow(F.col("n") * F.col("stx") - F.col("st") * F.col("sx"), 2)
            / (
                (F.col("n") * F.col("stt") - F.col("st") * F.col("st"))
                * (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
            ),
            6,
        ).alias("r2"),
    ).orderBy("event_type")


@register(
    "events_seasonal_decompose",
    oracle="""
    WITH d AS (
      SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
             CAST(strftime(ts, '%w') AS INT) AS dow,
             round((CAST(sum(CAST(round((value) * 1000000, 0) AS BIGINT)) AS DOUBLE) / 1000000) / count(value), 6) AS x
      FROM events GROUP BY event_type, day, dow
    ), tr AS (
      SELECT event_type, day, dow, x,
             avg(x) OVER (PARTITION BY event_type ORDER BY day
                          ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS trend,
             count(*) OVER (PARTITION BY event_type ORDER BY day
                            ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS wn
      FROM d
    ), detr AS (
      SELECT event_type, dow, x - trend AS detrended, x, trend
      FROM tr WHERE wn = 7
    ), seas AS (
      SELECT event_type, dow, avg(detrended) AS s
      FROM detr GROUP BY event_type, dow
    )
    SELECT d.event_type, d.dow,
           round(s.s, 6) AS seasonal,
           CAST(count(*) AS BIGINT) AS n_days,
           round(avg(abs(d.detrended - s.s)), 6) AS mean_abs_residual
    FROM detr d JOIN seas s ON d.event_type = s.event_type AND d.dow = s.dow
    GROUP BY d.event_type, d.dow, s.s
    ORDER BY d.event_type, d.dow
    """,
)
def events_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical seasonal decomposition (moving-average method, the
    statsmodels ``seasonal_decompose`` algorithm): trend = centered
    7-day moving average (full windows only), seasonal index = mean
    detrended value per day-of-week, residual = what's left — reported
    as per-(series, weekday) seasonal effects with mean absolute
    residual. All windows PARTITION by series key; the seasonal and
    residual passes are map-combinable aggregates."""
    from weather_tools_spark.queries.core_sql import _davg

    ev = load_table(spark, "events", sf_dir)
    d = ev.groupBy(
        "event_type",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.dayofweek("ts").alias("dow_1based"),
    ).agg(F.round(_davg(F.col("value")), 6).alias("x"))
    # DuckDB %w is 0=Sunday; Spark dayofweek is 1=Sunday
    d = d.select(
        "event_type", "day", (F.col("dow_1based") - 1).alias("dow"), "x"
    )
    wma = W.partitionBy("event_type").orderBy("day").rowsBetween(-3, 3)
    tr = d.select(
        "event_type", "dow", "x",
        F.avg("x").over(wma).alias("trend"),
        F.count(F.lit(1)).over(wma).alias("wn"),
    )
    detr = tr.filter(F.col("wn") == 7).select(
        "event_type", "dow", (F.col("x") - F.col("trend")).alias("detrended")
    )
    seas = detr.groupBy("event_type", "dow").agg(F.avg("detrended").alias("s"))
    return (
        detr.join(seas, ["event_type", "dow"])
        .groupBy("event_type", "dow", "s")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.round(F.avg(F.abs(F.col("detrended") - F.col("s"))), 6).alias("mean_abs_residual"),
        )
        .select(
            "event_type", "dow", F.round("s", 6).alias("seasonal"),
            "n_days", "mean_abs_residual",
        )
        .orderBy("event_type", "dow")
    )


@register(
    "events_funnel_steps",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS tv FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS tc
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click'
        AND e.ts > v.tv AND e.ts <= v.tv + INTERVAL 60 MINUTE
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS tp
      FROM events e
      JOIN v ON e.user_id = v.user_id
      JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase'
        AND e.ts > c.tc AND e.ts <= v.tv + INTERVAL 60 MINUTE
      GROUP BY e.user_id
    )
    SELECT CAST(v.tv AS DATE) AS cohort_day,
           CAST(count(*) AS BIGINT) AS n_view,
           CAST(count(c.tc) AS BIGINT) AS n_click,
           CAST(count(p.tp) AS BIGINT) AS n_purchase,
           round(CAST(count(c.tc) AS DOUBLE) / count(*), 6) AS view_to_click,
           round(CAST(count(p.tp) AS DOUBLE) / count(*), 6) AS view_to_purchase
    FROM v LEFT JOIN c ON v.user_id = c.user_id
           LEFT JOIN p ON v.user_id = p.user_id
    GROUP BY cohort_day ORDER BY cohort_day
    """,
)
def events_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch ordered funnel (view -> click -> purchase, strictly
    increasing timestamps, all within 60 minutes of the user's FIRST
    view), cohorted by first-view day — the product-analytics funnel
    operator. Each stage is a per-user min aggregation followed by an
    equi-join on user_id (map-combinable aggs, hash joins on the user
    key; at 100 TB the per-stage frames are one row per user, far
    smaller than the event fact). The strict ordering and the shared
    60-minute deadline make the stage predicates non-commutative — a
    wrong join bound flips the gate.

    Reference parity: no funnel surface in the reference; engine
    addition in the events family (SURVEY.md §2.9 extensions)."""
    ev = load_table(spark, "events", sf_dir)
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("tv"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(
            (F.col("ts") > F.col("tv"))
            & (F.col("ts") <= F.col("tv") + F.expr("INTERVAL 60 MINUTES"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("tc"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .join(c, "user_id")
        .filter(
            (F.col("ts") > F.col("tc"))
            & (F.col("ts") <= F.col("tv") + F.expr("INTERVAL 60 MINUTES"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("tp"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .groupBy(F.col("tv").cast("date").alias("cohort_day"))
        .agg(
            F.count(F.lit(1)).alias("n_view"),
            F.count("tc").alias("n_click"),
            F.count("tp").alias("n_purchase"),
            F.round(F.count("tc").cast("double") / F.count(F.lit(1)), 6).alias(
                "view_to_click"
            ),
            F.round(F.count("tp").cast("double") / F.count(F.lit(1)), 6).alias(
                "view_to_purchase"
            ),
        )
        .orderBy("cohort_day")
    )


@register(
    "events_ab_test_zscore",
    oracle="""
    WITH assigned AS (
      SELECT user_id % 2 AS variant, value FROM events
      WHERE event_type = 'purchase'
    ),
    s AS (
      SELECT variant,
             CAST(count(*) AS BIGINT) AS n,
             avg(value) AS mean_v,
             avg(value * value) - avg(value) * avg(value) AS var_v
      FROM assigned GROUP BY variant
    ),
    wide AS (
      SELECT
        (SELECT n FROM s WHERE variant = 0) AS n_a,
        (SELECT n FROM s WHERE variant = 1) AS n_b,
        (SELECT mean_v FROM s WHERE variant = 0) AS mean_a,
        (SELECT mean_v FROM s WHERE variant = 1) AS mean_b,
        (SELECT var_v FROM s WHERE variant = 0) AS var_a,
        (SELECT var_v FROM s WHERE variant = 1) AS var_b
    )
    SELECT n_a, n_b,
           round(mean_a, 6) AS mean_a,
           round(mean_b, 6) AS mean_b,
           round(mean_b - mean_a, 6) AS lift,
           round(sqrt(var_a / n_a + var_b / n_b), 6) AS se,
           round((mean_b - mean_a) / sqrt(var_a / n_a + var_b / n_b), 6) AS z_score
    FROM wide
    """,
)
def events_ab_test_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout — the two-sample Welch z-test over
    purchase values with a deterministic hash assignment (user_id
    parity): per-variant sufficient statistics (one map-combinable
    aggregation), then lift, pooled standard error, and the z-score on
    the two-row summary. The experiment-analysis primitive every
    product-analytics stack ships; at 100 TB it is one pass with six
    doubles of state per variant."""
    ev = load_table(spark, "events", sf_dir)
    s = (
        ev.filter(F.col("event_type") == "purchase")
        .select((F.col("user_id") % 2).alias("variant"), "value")
        .groupBy("variant")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("value").alias("mean_v"),
            (F.avg(F.col("value") * F.col("value"))
             - F.avg("value") * F.avg("value")).alias("var_v"),
        )
    )
    a = s.filter(F.col("variant") == 0).select(
        F.col("n").alias("n_a"), F.col("mean_v").alias("mean_a"),
        F.col("var_v").alias("var_a"),
    )
    b = s.filter(F.col("variant") == 1).select(
        F.col("n").alias("n_b"), F.col("mean_v").alias("mean_b"),
        F.col("var_v").alias("var_b"),
    )
    wide = a.crossJoin(b)
    se = F.sqrt(F.col("var_a") / F.col("n_a") + F.col("var_b") / F.col("n_b"))
    return wide.select(
        "n_a",
        "n_b",
        F.round("mean_a", 6).alias("mean_a"),
        F.round("mean_b", 6).alias("mean_b"),
        F.round(F.col("mean_b") - F.col("mean_a"), 6).alias("lift"),
        F.round(se, 6).alias("se"),
        F.round((F.col("mean_b") - F.col("mean_a")) / se, 6).alias("z_score"),
    )


@register(
    "events_survival_kaplan_meier",
    oracle="""
    WITH births AS (
      SELECT user_id, min(ts) AS birth FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ),
    deaths AS (
      SELECT e.user_id, min(e.ts) AS death
      FROM events e JOIN births b ON e.user_id = b.user_id
      WHERE e.event_type = 'error' AND e.ts > b.birth
      GROUP BY e.user_id
    ),
    horizon AS (SELECT max(ts) AS h FROM events),
    obs AS (
      SELECT b.user_id,
             CASE WHEN d.death IS NULL THEN 0 ELSE 1 END AS died,
             CAST(floor(epoch(CASE WHEN d.death IS NULL THEN hz.h
                                   ELSE d.death END - b.birth)
                        / 86400.0) AS BIGINT) AS t
      FROM births b LEFT JOIN deaths d ON b.user_id = d.user_id
      CROSS JOIN horizon hz
    ),
    death_days AS (
      SELECT t, CAST(sum(died) AS BIGINT) AS d,
             CAST(count(*) AS BIGINT) AS ending
      FROM obs GROUP BY t
    ),
    risk AS (
      SELECT t, d,
             (SELECT CAST(count(*) AS BIGINT) FROM obs o WHERE o.t >= dd.t)
               AS n_at_risk
      FROM death_days dd WHERE d > 0
    ),
    km AS (
      -- d = n_at_risk would be ln(0): contribute 0 to the log-sum and
      -- zero the curve via the flag instead (identical in Spark)
      SELECT t, d, n_at_risk,
             CASE WHEN sum(CASE WHEN d = n_at_risk THEN 1 ELSE 0 END)
                       OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) > 0
                  THEN 0.0
                  ELSE exp(sum(ln(CASE WHEN d = n_at_risk THEN 1.0
                                       ELSE 1.0 - CAST(d AS DOUBLE) / n_at_risk END))
                           OVER (ORDER BY t ROWS UNBOUNDED PRECEDING))
             END AS survival
      FROM risk
    )
    SELECT t AS day, n_at_risk, d AS n_deaths, round(survival, 6) AS survival
    FROM km ORDER BY day
    """,
)
def events_survival_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival estimator — time from first signup to
    first subsequent error, right-censored at the corpus horizon: the
    standard churn/survival readout. Per-user birth/death are min
    aggregations + one user-key join; the risk set per death day comes
    from a cumulative count (here an explicit >= aggregate on the tiny
    death-day frame, distributed as a broadcast join at scale), and the
    product-limit curve is exp(Σ ln(1 - d/n)) over an ordered window on
    the death-day frame (≤ horizon-days rows — the global window is on
    the TINY frame, never the events fact)."""
    ev = load_table(spark, "events", sf_dir)
    births = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("birth"))
    )
    deaths = (
        ev.filter(F.col("event_type") == "error")
        .join(births, "user_id")
        .filter(F.col("ts") > F.col("birth"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("death"))
    )
    horizon = ev.agg(F.max("ts").alias("h"))
    obs = (
        births.join(deaths, "user_id", "left")
        .crossJoin(F.broadcast(horizon))
        .select(
            "user_id",
            F.when(F.col("death").isNull(), 0).otherwise(1).alias("died"),
            F.floor(
                (
                    (
                        F.unix_micros(
                            F.when(F.col("death").isNull(), F.col("h")).otherwise(
                                F.col("death")
                            )
                        )
                        - F.unix_micros("birth")
                    )
                    / 1_000_000.0  # micros -> seconds, then seconds -> days:
                )
                / 86400.0  # mirrors the oracle's epoch()/86400.0 op order
            ).cast("long").alias("t"),
        )
    )
    death_days = obs.groupBy("t").agg(
        F.sum("died").cast("long").alias("d"),
        F.count(F.lit(1)).cast("long").alias("ending"),
    )
    # risk set: users still under observation at day t (obs_time >= t).
    # The death-day frame is tiny (<= horizon days), so the theta join
    # against per-day counts broadcasts.
    day_counts = obs.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    dd = death_days.filter(F.col("d") > 0).select(
        F.col("t").alias("td"), "d"
    )
    risk = (
        dd.join(F.broadcast(day_counts), F.col("t") >= F.col("td"))
        .groupBy("td", "d")
        .agg(F.sum("c").cast("long").alias("n_at_risk"))
    )
    from pyspark.sql import Window

    w = Window.orderBy("td").rowsBetween(Window.unboundedPreceding, 0)
    term = F.when(F.col("d") == F.col("n_at_risk"), F.lit(1.0)).otherwise(
        1.0 - F.col("d").cast("double") / F.col("n_at_risk")
    )
    dead_flag = F.sum(
        F.when(F.col("d") == F.col("n_at_risk"), 1).otherwise(0)
    ).over(w)
    km = risk.withColumn(
        "survival",
        F.when(dead_flag > 0, F.lit(0.0)).otherwise(F.exp(F.sum(F.log(term)).over(w))),
    )
    return km.select(
        F.col("td").alias("day"),
        "n_at_risk",
        F.col("d").alias("n_deaths"),
        F.round("survival", 6).alias("survival"),
    ).orderBy("day")


@register(
    "events_sliding_window_agg",
    oracle="""
    WITH bounds AS (
      SELECT unnest(generate_series(
        TIMESTAMP '2024-01-05 00:00:00',
        TIMESTAMP '2024-01-05 23:45:00',
        INTERVAL 15 MINUTE
      )) AS ws
    ),
    w AS (
      SELECT ws, ws + INTERVAL 1 HOUR AS we FROM bounds
    ),
    j AS (
      SELECT w.ws, w.we, e.value
      FROM w JOIN events e ON e.ts >= w.ws AND e.ts < w.we
      WHERE e.event_type = 'purchase'
        AND e.ts >= TIMESTAMP '2024-01-05 00:00:00'
        AND e.ts < TIMESTAMP '2024-01-06 00:00:00'
    )
    SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 4) AS sum_value
    FROM j GROUP BY ws ORDER BY window_start
    """,
)
def events_sliding_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding event-time windows (1-hour length, 15-minute slide) over
    one day of purchases — each event lands in up to 4 overlapping
    windows via Spark's native ``window(ts, '1 hour', '15 minutes')``,
    which expands windows map-side (a Generate node) and aggregates
    map-combinably: no self-join, no per-window scan. The oracle builds
    the window spine explicitly and band-joins, so the hash gate proves
    Spark's epoch-aligned slide assignment against the declarative
    window definition. Windows that start before the day but overlap it
    are excluded symmetrically by filtering window_start >= the day
    start."""
    ev = events_time_between(
        load_table(spark, "events", sf_dir),
        "2024-01-05 00:00:00",
        "2024-01-06 00:00:00",
    ).filter(F.col("event_type") == "purchase")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .filter(F.col("w.start") >= F.lit("2024-01-05 00:00:00").cast("timestamp"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n",
            "sum_value",
        )
        .orderBy("window_start")
    )


@register(
    "events_attribution_linear",
    oracle="""
    WITH p AS (
      SELECT event_id AS pid, user_id, ts AS pts,
             CAST(round(value * 100, 0) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ),
    t AS (
      SELECT event_id AS tid, user_id, ts AS tts, event_type AS touch_type
      FROM events WHERE event_type IN ('view', 'click')
    ),
    j AS (
      SELECT p.pid, p.cents, t.tid, t.touch_type, t.tts
      FROM p JOIN t ON p.user_id = t.user_id
        AND t.tts <= p.pts AND t.tts > p.pts - INTERVAL 7 DAY
    ),
    ranked AS (
      SELECT pid, cents, tid, touch_type,
             row_number() OVER (PARTITION BY pid ORDER BY tts, tid) AS rk,
             count(*) OVER (PARTITION BY pid) AS k
      FROM j
    ),
    credit AS (
      SELECT touch_type,
             CAST(floor(cents / k) AS BIGINT)
               + CASE WHEN rk <= cents % k THEN 1 ELSE 0 END AS c
      FROM ranked
    ),
    touched AS (SELECT DISTINCT pid FROM j),
    unattributed AS (
      SELECT 'none' AS touch_type, p.cents AS c
      FROM p WHERE p.pid NOT IN (SELECT pid FROM touched)
    ),
    allc AS (
      SELECT touch_type, c FROM credit
      UNION ALL SELECT touch_type, c FROM unattributed
    )
    SELECT touch_type,
           CAST(count(*) AS BIGINT) AS n_credits,
           CAST(sum(c) AS BIGINT) AS credited_cents
    FROM allc GROUP BY touch_type ORDER BY touch_type
    """,
)
def events_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch marketing attribution, linear model with EXACT cent
    conservation: every purchase's revenue splits equally across its
    view/click touches of the prior 7 days — base share floor(c/k),
    the c mod k remainder cents going one each to the earliest touches
    (the largest-remainder discipline of the finance allocation query,
    here with equal proportions so arrival order breaks the tie).
    Purchases with no touch window report under 'none', so
    sum(credited_cents) over ALL rows equals total purchase cents
    exactly — the reconciliation a revenue pipeline must pass. The
    touch join is a user-key equi-join with a time-band residual (the
    conversion-window topology, hash-joinable at scale); ranking
    windows partition by purchase."""
    ev = load_table(spark, "events", sf_dir)
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("pts"),
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    t = ev.filter(F.col("event_type").isin("view", "click")).select(
        F.col("event_id").alias("tid"),
        F.col("user_id").alias("t_user"),
        F.col("ts").alias("tts"),
        F.col("event_type").alias("touch_type"),
    )
    j = p.join(
        t,
        (F.col("p_user") == F.col("t_user"))
        & (F.col("tts") <= F.col("pts"))
        & (F.col("tts") > F.col("pts") - F.expr("INTERVAL 7 DAY")),
    )
    wk = W.partitionBy("pid")
    ranked = j.withColumn(
        "rk", F.row_number().over(wk.orderBy("tts", "tid"))
    ).withColumn("k", F.count(F.lit(1)).over(wk))
    credit = ranked.select(
        "touch_type",
        (
            F.floor(F.col("cents") / F.col("k")).cast("long")
            + F.when(F.col("rk") <= F.col("cents") % F.col("k"), 1).otherwise(0)
        ).alias("c"),
    )
    unattributed = (
        p.join(j.select("pid").distinct(), "pid", "left_anti")
        .select(F.lit("none").alias("touch_type"), F.col("cents").alias("c"))
    )
    return (
        credit.unionByName(unattributed)
        .groupBy("touch_type")
        .agg(
            F.count(F.lit(1)).alias("n_credits"),
            F.sum("c").cast("long").alias("credited_cents"),
        )
        .orderBy("touch_type")
    )


# ---------------------------------------------------------------------------
# Markov stationary distribution (round 8)
# ---------------------------------------------------------------------------

_MARKOV_STEPS = 20


@register(
    "events_markov_stationary",
    oracle=f"""
    WITH RECURSIVE seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
      FROM events
    ),
    counts AS (
      SELECT event_type, next_type, count(*) AS n
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY event_type, next_type
    ),
    trans AS (
      SELECT event_type, next_type,
             round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY event_type), 9) AS p
      FROM counts
    ),
    types AS (SELECT DISTINCT event_type FROM counts),
    it(step, event_type, prob) AS (
      SELECT 0, event_type,
             CAST(1.0 AS DOUBLE) / (SELECT count(*) FROM types)
      FROM types
      UNION ALL
      SELECT step + 1, t.next_type, sum(i.prob * t.p)
      FROM it i JOIN trans t ON t.event_type = i.event_type
      WHERE step < {_MARKOV_STEPS}
      GROUP BY step + 1, t.next_type
    )
    SELECT event_type, round(prob, 6) AS pi
    FROM it WHERE step = {_MARKOV_STEPS}
    ORDER BY event_type
    """,
)
def events_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the first-order event-type Markov
    chain (events_transition_matrix's matrix) by 20-step
    power iteration from the uniform vector (_MARKOV_STEPS) — "where does a user's
    session settle", the long-run analog of the one-step transition
    view. On this chain (all |types|² transitions observed, hence
    irreducible + aperiodic) 20 steps is far past convergence; the
    result is DEFINED as the 20-step distribution so both engines
    compute the identical iterate.

    Scale split (same schedule as graph_ktruss): the fact-scale work is
    the distributed per-user sequence window + pair-count aggregation;
    the power iteration runs on the collected <=|types|² row summary —
    bounded by construction, never data-sized. Transition probabilities
    are rounded to 9 decimals on BOTH engines before iterating, so the
    iterates can drift only by summation-order ulps (absorbed by the
    final 6-decimal round). The oracle replays the iteration as a
    recursive CTE."""
    ev = load_table(spark, "events", sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    counts = seq.groupBy("event_type", "next_type").agg(F.count(F.lit(1)).alias("n"))
    wt = W.partitionBy("event_type")
    trans = counts.select(
        "event_type",
        "next_type",
        F.round(F.col("n").cast("double") / F.sum("n").over(wt), 9).alias("p"),
    )
    from weather_tools_spark.operators.bounded import bounded_rows

    mat = bounded_rows(
        trans, 400, "event-type transition matrix (<= |types|^2 rows)"
    )
    types = sorted({r.event_type for r in mat})
    p = {(r.event_type, r.next_type): r.p for r in mat}
    x = {t: 1.0 / len(types) for t in types}
    for _ in range(_MARKOV_STEPS):
        nxt = {t: 0.0 for t in types}
        for (src, dst), pij in p.items():
            nxt[dst] += x[src] * pij
        x = nxt
    out = [(t, round(x[t], 6)) for t in types]
    return spark.createDataFrame(out, "event_type string, pi double").orderBy(
        "event_type"
    )


@register(
    "events_interarrival_quantiles",
    oracle="""
    WITH es AS (
      SELECT event_type, user_id, ts, event_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
      FROM events
    ),
    seq AS (
      SELECT event_type,
             ts_s - lag(ts_s) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS gap_s
      FROM es
    )
    SELECT event_type,
           CAST(count(gap_s) AS BIGINT) AS n_gaps,
           round(quantile_cont(gap_s, 0.5), 4) AS p50_s,
           round(quantile_cont(gap_s, 0.9), 4) AS p90_s,
           round(avg(gap_s), 4) AS mean_s
    FROM seq
    WHERE gap_s IS NOT NULL
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def events_interarrival_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival-time profile per event type — the survival-lite
    view of user activity cadence (p50/p90/mean seconds between a
    user's consecutive events, attributed to the later event's type):
    the input to retention models and to the dispersion screen's
    follow-up question "bursty HOW".

    Scale shape: the lag window partitions by user_id (thousands of
    small partitions — never a global window) with the tie-free
    (ts, event_id) order; integer epoch seconds put the exact
    ``percentile`` on the integer lattice where it is bit-equal to
    DuckDB's ``quantile_cont`` (the orders_price_percentiles
    pattern)."""
    ev = load_table(spark, "events", sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        (
            F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
        ).alias("gap_s"),
    ).filter(F.col("gap_s").isNotNull())
    return (
        seq.groupBy("event_type")
        .agg(
            F.count("gap_s").alias("n_gaps"),
            F.round(F.expr("percentile(gap_s, 0.5)"), 4).alias("p50_s"),
            F.round(F.expr("percentile(gap_s, 0.9)"), 4).alias("p90_s"),
            F.round(F.avg("gap_s"), 4).alias("mean_s"),
        )
        .orderBy("event_type")
    )


@register(
    "events_retention_triangle",
    oracle="""
    WITH firsts AS (SELECT user_id, min(date_trunc('week', ts)) AS cohort
                    FROM events GROUP BY user_id),
    act AS (SELECT DISTINCT e.user_id, f.cohort,
                   CAST(datediff('week', f.cohort, date_trunc('week', e.ts)) AS INT)
                     AS week_offset
            FROM events e JOIN firsts f USING (user_id)),
    size_c AS (SELECT cohort, CAST(count(*) AS BIGINT) AS cohort_users FROM firsts
               GROUP BY cohort)
    SELECT CAST(a.cohort AS DATE) AS cohort_week, a.week_offset,
           CAST(count(*) AS BIGINT) AS active_users,
           s.cohort_users,
           round(1.0 * count(*) / s.cohort_users, 6) AS retention
    FROM act a JOIN size_c s USING (cohort)
    WHERE a.week_offset <= 4
    GROUP BY a.cohort, a.week_offset, s.cohort_users
    ORDER BY cohort_week, week_offset
    """,
)
def events_retention_triangle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention triangle on the event stream — the
    product-analytics staple (each row: of the users first seen in
    cohort week W, what fraction was active W+k weeks later, k ≤ 4),
    complementing orders_cohort_retention's monthly order view with
    event-level user activity.

    Scale shape: first-seen is one map-combinable min per user
    (user-keyed shuffle); activity dedup is a distinct on
    (user, cohort, offset) — bounded by users × 5 offsets; cohort
    sizes broadcast back to the ≤ |cohorts|·5 triangle."""
    ev = load_table(spark, "events", sf_dir)
    firsts = ev.groupBy("user_id").agg(
        F.min(F.date_trunc("week", F.col("ts"))).alias("cohort")
    )
    act = (
        ev.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort",
            F.floor(
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort")) / 7
            ).cast("int").alias("week_offset"),
        )
        .distinct()
    )
    size_c = firsts.groupBy("cohort").agg(F.count(F.lit(1)).alias("cohort_users"))
    return (
        act.filter(F.col("week_offset") <= 4)
        .groupBy("cohort", "week_offset")
        .agg(F.count(F.lit(1)).alias("active_users"))
        .join(F.broadcast(size_c), "cohort")
        .select(
            F.col("cohort").cast("date").alias("cohort_week"),
            "week_offset",
            "active_users",
            "cohort_users",
            F.round(
                F.col("active_users") * 1.0 / F.col("cohort_users"), 6
            ).alias("retention"),
        )
        .orderBy("cohort_week", "week_offset")
    )
