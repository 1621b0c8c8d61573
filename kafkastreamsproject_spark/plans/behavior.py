"""Event-behavior analytics over ``events``: ordered funnels, retention
cohorts, and robust (median/MAD) outlier detection.

These are the user-behavior counterparts to the reference's
station-telemetry aggregations (SURVEY.md §2 A1-A7): the same
keyed-aggregation machinery, but with ORDER-dependent semantics
(funnel steps must happen in sequence) and second-pass robust
statistics — the shapes a product-analytics workload runs at 100 TB.

All outputs are integer counts or 6-dp-rounded doubles computed from
identical expressions on both engines, so the oracle compare is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkastreamsproject_spark.plans.registry import register
from kafkastreamsproject_spark.sources.testdata import load_table


@register(
    "funnel_conversion",
    oracle="""
    WITH t1 AS (
      SELECT user_id, MIN(ts) AS ts1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    t2 AS (
      SELECT e.user_id, MIN(e.ts) AS ts2
      FROM events e JOIN t1 ON t1.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts > t1.ts1
      GROUP BY e.user_id
    ),
    t3 AS (
      SELECT e.user_id, MIN(e.ts) AS ts3
      FROM events e JOIN t2 ON t2.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > t2.ts2
      GROUP BY e.user_id
    )
    SELECT * FROM (
      SELECT 1 AS step_order, 'view' AS step,
             CAST((SELECT COUNT(*) FROM t1) AS BIGINT) AS n_users
      UNION ALL
      SELECT 2, 'click', CAST((SELECT COUNT(*) FROM t2) AS BIGINT)
      UNION ALL
      SELECT 3, 'purchase', CAST((SELECT COUNT(*) FROM t3) AS BIGINT)
    )
    """,
    tags=("behavior", "agg"),
    tier="shadow",
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered three-step funnel (view → click → purchase): how many
    users reach each step, where a step only counts if it happens
    STRICTLY AFTER the user's first completion of the previous step.

    The sequential-min recurrence decorrelates into three per-user
    aggregations; all three shuffle on user_id, so under AQE the second
    and third reuse the first exchange's partitioning.  Per-step state
    is one timestamp per user — at 100 TB the intermediate is
    |users| rows, never |events|.  An N-step funnel with large N would
    move to one repartition + per-user sorted scan
    (``applyInPandas``); at 3 steps the declarative form wins because
    every join stays a co-partitioned hash join.
    """
    ev = load_table(spark, "events", sf_dir).select(
        "user_id", "event_type", "ts"
    )
    t1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("ts1"))
    )
    t2 = (
        ev.filter(F.col("event_type") == "click")
        .join(t1, "user_id")
        .filter(F.col("ts") > F.col("ts1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("ts2"))
    )
    t3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(t2, "user_id")
        .filter(F.col("ts") > F.col("ts2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("ts3"))
    )

    def step(order: int, name: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(order).alias("step_order"),
            F.lit(name).alias("step"),
            F.count(F.lit(1)).alias("n_users"),
        )

    return (
        step(1, "view", t1)
        .unionByName(step(2, "click", t2))
        .unionByName(step(3, "purchase", t3))
    )


@register(
    "retention_cohorts",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_start
      FROM events GROUP BY user_id
    )
    SELECT CAST(CAST(f.cohort_start AS DATE) AS VARCHAR) AS cohort_week,
           CAST(floor(date_diff('day', f.cohort_start, e.ts) / 7) AS INT)
             AS week_offset,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users
    FROM events e JOIN first_seen f ON f.user_id = e.user_id
    GROUP BY 1, 2
    """,
    tags=("behavior", "agg"),
    tier="shadow",
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention matrix: users grouped by first-seen week
    (cohort), counted distinct in each subsequent week offset.

    Two shuffles — first-seen per user, then (cohort, offset) distinct
    count — both keyed on bounded domains (|users|, |weeks|²).  The
    events→first_seen join keys on user_id, the same key as the
    first aggregation, so the fact table shuffles once.  Week
    arithmetic is integer (calendar-day difference / 7), so no FP
    tolerance is involved anywhere.
    """
    ev = load_table(spark, "events", sf_dir).select("user_id", "ts")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_start")
    )
    return (
        ev.join(first_seen, "user_id")
        .select(
            "user_id",
            F.col("cohort_start").cast("date").cast("string").alias(
                "cohort_week"
            ),
            F.floor(
                F.datediff(F.col("ts"), F.col("cohort_start")) / 7
            )
            .cast("int")
            .alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


@register(
    "robust_anomaly_mad",
    oracle="""
    WITH med AS (
      SELECT event_type, median(value) AS med FROM events GROUP BY event_type
    ),
    dev AS (
      SELECT e.event_type, m.med, abs(e.value - m.med) AS adev
      FROM events e JOIN med m ON m.event_type = e.event_type
    ),
    mad AS (
      SELECT event_type, median(adev) AS mad FROM dev GROUP BY event_type
    )
    SELECT d.event_type,
           ROUND(MIN(d.med), 6) AS med,
           ROUND(MIN(a.mad), 6) AS mad,
           CAST(SUM(CASE WHEN d.adev > 3 * a.mad THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers
    FROM dev d JOIN mad a ON a.event_type = d.event_type
    GROUP BY d.event_type
    """,
    tags=("behavior", "robust-stats"),
    tier="shadow",
)
def robust_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-type outlier detection: median / MAD (median absolute
    deviation) instead of mean / stddev, flagging values beyond 3 MADs.
    Complements ``anomaly_detect`` (which follows the reference's
    mean-based D% rule) with the estimator a long-tailed 100 TB metric
    stream actually needs — one extreme value cannot drag the threshold.

    Exact medians via two aggregation passes over the fact (Spark's
    ``median`` = exact interpolated percentile, matching DuckDB's);
    the per-type medians are tiny and broadcast back for the deviation
    and outlier passes, so the fact table never shuffles — three scans,
    zero exchanges of event rows.  Both engines interpolate the even-n
    median identically on identical doubles, so the compare is exact.
    """
    ev = load_table(spark, "events", sf_dir).select("event_type", "value")
    med = ev.groupBy("event_type").agg(F.median("value").alias("med"))
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type",
        "med",
        F.abs(F.col("value") - F.col("med")).alias("adev"),
    )
    mad = dev.groupBy("event_type").agg(F.median("adev").alias("mad"))
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.round(F.min("med"), 6).alias("med"),
            F.round(F.min("mad"), 6).alias("mad"),
            F.sum(
                F.when(F.col("adev") > 3 * F.col("mad"), 1).otherwise(0)
            ).alias("n_outliers"),
        )
    )


@register(
    "winsorized_value_stats",
    oracle="""
    WITH bounds AS (
      SELECT event_type,
             quantile_cont(value, 0.05) AS p05,
             quantile_cont(value, 0.95) AS p95
      FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           ROUND(MIN(b.p05), 6) AS p05,
           ROUND(MIN(b.p95), 6) AS p95,
           ROUND(AVG(CASE WHEN e.value < b.p05 THEN b.p05
                          WHEN e.value > b.p95 THEN b.p95
                          ELSE e.value END), 6) AS winsorized_mean,
           CAST(SUM(CASE WHEN e.value < b.p05 OR e.value > b.p95
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped
    FROM events e JOIN bounds b ON b.event_type = e.event_type
    GROUP BY e.event_type
    """,
    tags=("behavior", "robust-stats"),
    tier="shadow",
)
def winsorized_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized per-type mean: exact p05/p95 (linear-interpolated
    percentile — Spark's ``percentile`` and DuckDB's ``quantile_cont``
    share the (n-1)·q definition), values clipped to those bounds,
    then averaged — the standard long-tail-resistant metric summary.

    Same broadcast-back shape as ``robust_anomaly_mad``: the per-type
    bounds are a 5-row table broadcast into the clip pass, so the fact
    never shuffles.  The clipped mean is a double sum whose FP
    accumulation noise (~1e-11 relative) sits far below the 6-dp round;
    the clip counts are exact integers.
    """
    ev = load_table(spark, "events", sf_dir).select("event_type", "value")
    bounds = ev.groupBy("event_type").agg(
        F.percentile("value", 0.05).alias("p05"),
        F.percentile("value", 0.95).alias("p95"),
    )
    clipped = F.when(F.col("value") < F.col("p05"), F.col("p05")).when(
        F.col("value") > F.col("p95"), F.col("p95")
    ).otherwise(F.col("value"))
    return (
        ev.join(F.broadcast(bounds), "event_type")
        .groupBy("event_type")
        .agg(
            F.round(F.min("p05"), 6).alias("p05"),
            F.round(F.min("p95"), 6).alias("p95"),
            F.round(F.avg(clipped), 6).alias("winsorized_mean"),
            F.sum(
                F.when(
                    (F.col("value") < F.col("p05"))
                    | (F.col("value") > F.col("p95")),
                    1,
                ).otherwise(0)
            ).alias("n_clipped"),
        )
    )


@register(
    "session_incident_overlap",
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_id, ts,
             CASE WHEN epoch_us(CAST(ts AS TIMESTAMP))
                       - LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER w
                       > 1800000000
                  OR LAG(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    ),
    sess AS (
      SELECT user_id, session_id,
             MIN(ts) AS s_start, MAX(ts) AS s_end
      FROM numbered GROUP BY user_id, session_id
    ),
    inc AS (
      SELECT CAST(ts AS DATE) AS day, MIN(ts) AS i_start, MAX(ts) AS i_end
      FROM events WHERE event_type = 'error' GROUP BY 1
    )
    SELECT s.user_id,
           CAST(COUNT(*) AS BIGINT) AS n_overlaps,
           CAST(SUM(epoch_ms(CAST(LEAST(s.s_end, i.i_end) AS TIMESTAMP))
                    - epoch_ms(CAST(GREATEST(s.s_start, i.i_start)
                                    AS TIMESTAMP))) AS BIGINT) AS overlap_ms
    FROM sess s JOIN inc i
      ON s.s_start <= i.i_end AND i.i_start <= s.s_end
    GROUP BY s.user_id
    """,
    tags=("behavior", "interval-join"),
    tier="shadow",
)
def session_incident_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join: user activity sessions (30-min-gap
    islands) × daily error-incident windows, with per-user overlap
    counts and total overlapped milliseconds.

    The Spark side runs ``operators/intervaljoin.py:overlap_join`` —
    intervals exploded into daily buckets, equi-joined on the bucket
    id, each pair emitted exactly once in the bucket of the later
    start, then exactly re-checked.  The DuckDB oracle is the plain
    non-equi join, proving the bucketed plan is result-identical while
    replacing the O(n·m) nested loop with a shuffle whose cost is
    per-bucket-local.  Overlap durations are integer microsecond
    arithmetic (epoch millis at the edges) — no FP anywhere.
    """
    from pyspark.sql import Window as W

    from kafkastreamsproject_spark.operators.intervaljoin import overlap_join

    ev = load_table(spark, "events", sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    micros = F.unix_micros(F.col("ts"))
    gap = micros - F.lag(micros).over(w)
    numbered = ev.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1).otherwise(0),
    ).withColumn(
        "session_id",
        F.sum("new_session").over(
            w.rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    sess = numbered.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("s_start"), F.max("ts").alias("s_end")
    )
    inc = (
        ev.filter(F.col("event_type") == "error")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.min("ts").alias("i_start"), F.max("ts").alias("i_end"))
    )
    pairs = overlap_join(
        sess.select("user_id", "s_start", "s_end"),
        inc.select("i_start", "i_end"),
        "s_start",
        "s_end",
        "i_start",
        "i_end",
        bucket_seconds=86_400,
    )
    overlap_ms = F.unix_millis(
        F.least(F.col("s_end"), F.col("i_end"))
    ) - F.unix_millis(F.greatest(F.col("s_start"), F.col("i_start")))
    return pairs.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_overlaps"),
        F.sum(overlap_ms).alias("overlap_ms"),
    )


@register(
    "order_date_gaps",
    oracle="""
    WITH bounds AS (
      SELECT CAST(MIN(o_orderdate) AS DATE) AS lo,
             CAST(MAX(o_orderdate) AS DATE) AS hi
      FROM orders
    ),
    cal AS (
      SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE)
               AS d
      FROM bounds
    ),
    seen AS (SELECT DISTINCT CAST(o_orderdate AS DATE) AS d FROM orders)
    SELECT CAST(c.d AS VARCHAR) AS gap_date
    FROM cal c ANTI JOIN seen s ON s.d = c.d
    """,
    tags=("behavior", "calendar"),
    tier="shadow",
)
def order_date_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar densification + gap detection: every date inside the
    observed order-date range with NO orders — the missing-data audit
    behind any time-series rollup (a gap is invisible to a plain
    groupBy, which only sees days that exist).

    The calendar is generated from the 1-row min/max bounds
    (``sequence`` + explode — rows = range days, never a driver loop),
    then anti-joined against the distinct observed days; both sides are
    day-cardinality, so at 100 TB this costs one distinct over the
    pruned date column plus a broadcast anti join of two tiny day
    tables."""
    orders = load_table(spark, "orders", sf_dir)
    bounds = orders.agg(
        F.min(F.to_date("o_orderdate")).alias("lo"),
        F.max(F.to_date("o_orderdate")).alias("hi"),
    )
    cal = bounds.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias("d")
    )
    seen = orders.select(F.to_date("o_orderdate").alias("d")).distinct()
    return cal.join(seen, "d", "left_anti").select(
        F.col("d").cast("string").alias("gap_date")
    )


@register(
    "streaming_funnel",
    oracle="""
    WITH t1 AS (
      SELECT user_id, MIN(ts) AS ts1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    t2 AS (
      SELECT e.user_id, MIN(e.ts) AS ts2
      FROM events e JOIN t1 ON t1.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts > t1.ts1
      GROUP BY e.user_id
    ),
    t3 AS (
      SELECT e.user_id, MIN(e.ts) AS ts3
      FROM events e JOIN t2 ON t2.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > t2.ts2
      GROUP BY e.user_id
    )
    SELECT * FROM (
      SELECT 1 AS step_order, 'view' AS step,
             CAST((SELECT COUNT(*) FROM t1) AS BIGINT) AS n_users
      UNION ALL
      SELECT 2, 'click', CAST((SELECT COUNT(*) FROM t2) AS BIGINT)
      UNION ALL
      SELECT 3, 'purchase', CAST((SELECT COUNT(*) FROM t3) AS BIGINT)
    )
    """,
    tags=("behavior", "streaming"),
    tier="shadow",
)
def streaming_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The funnel as a STREAM: per-user sequential-step state kept by
    ``streaming/funnel.py`` (applyInPandasWithState, 3 timestamps per
    user), replayed over the events fixture and reduced to the same
    three step-count rows as the batch ``funnel_conversion`` — whose
    oracle this query shares, so the stateful path is hash-checked
    against the declarative one.

    The update-mode memory sink may hold one row per (user, batch);
    ``reached_step`` is monotone per user, so ``max`` over the sink
    recovers the final state under ANY batching — the duplicate-robust
    reduction the r5 contamination-gate advice asked for, by
    construction.  State is 24 bytes/user; no shuffle carries more
    than (user_id, step) pairs.
    """
    import shutil
    import tempfile
    import uuid

    from pyspark.sql import types as T

    from kafkastreamsproject_spark.streaming.funnel import funnel_stream

    raw_schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampNTZType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    per_user = funnel_stream(stream)
    name = f"stream_funnel_{uuid.uuid4().hex[:8]}"
    ckpt = tempfile.mkdtemp(prefix="ckpt_funnel_")
    try:
        q = (
            per_user.writeStream.outputMode("update")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.processAllAvailable()
        q.stop()
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)

    final = spark.table(name).groupBy("user_id").agg(
        F.max("reached_step").alias("reached")
    )

    def step(order: int, label: str) -> DataFrame:
        return final.filter(F.col("reached") >= order).agg(
            F.lit(order).alias("step_order"),
            F.lit(label).alias("step"),
            F.count(F.lit(1)).alias("n_users"),
        )

    return (
        step(1, "view")
        .unionByName(step(2, "click"))
        .unionByName(step(3, "purchase"))
    )


@register(
    "event_transition_matrix",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type AS cur,
             LEAD(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS nxt
      FROM events
    ),
    pairs AS (
      SELECT cur, nxt, CAST(COUNT(*) AS BIGINT) AS n
      FROM ordered WHERE nxt IS NOT NULL GROUP BY cur, nxt
    ),
    tot AS (
      SELECT cur, SUM(n) AS row_n FROM pairs GROUP BY cur
    )
    SELECT p.cur, p.nxt, p.n,
           ROUND(p.n / CAST(t.row_n AS DOUBLE), 6) AS prob
    FROM pairs p JOIN tot t ON t.cur = p.cur
    """,
    tags=("behavior", "sequence"),
    tier="shadow",
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: for each (current, next) event-type pair, the transition
    count and row-normalized probability — the sequence-model summary
    behind next-action prediction and bot detection.

    One shuffle on user_id for the LEAD window; the pair counts then
    reduce to a |types|² table (25 rows here) whose row totals join
    broadcast.  Successor extraction is deterministic ((ts, event_id)
    ordering), counts are exact integers, and only the final
    probability is a rounded double.
    """
    from pyspark.sql import Window as W

    ev = load_table(spark, "events", sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = ev.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    pairs = ordered.groupBy("cur", "nxt").agg(F.count(F.lit(1)).alias("n"))
    tot = pairs.groupBy(F.col("cur").alias("t_cur")).agg(
        F.sum("n").alias("row_n")
    )
    return (
        pairs.join(F.broadcast(tot), pairs.cur == F.col("t_cur"))
        .select(
            "cur",
            "nxt",
            "n",
            F.round(F.col("n") / F.col("row_n").cast("double"), 6).alias(
                "prob"
            ),
        )
    )


@register(
    "funnel_time_to_convert",
    oracle="""
    WITH t1 AS (
      SELECT user_id, MIN(ts) AS ts1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    t2 AS (
      SELECT e.user_id, MIN(e.ts) AS ts2
      FROM events e JOIN t1 ON t1.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts > t1.ts1
      GROUP BY e.user_id
    ),
    t3 AS (
      SELECT e.user_id, MIN(e.ts) AS ts3
      FROM events e JOIN t2 ON t2.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > t2.ts2
      GROUP BY e.user_id
    ),
    conv AS (
      SELECT t1.user_id,
             (epoch_ms(CAST(t3.ts3 AS TIMESTAMP))
              - epoch_ms(CAST(t1.ts1 AS TIMESTAMP))) / 60000.0
               AS minutes_to_convert
      FROM t1 JOIN t3 ON t3.user_id = t1.user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
           ROUND(MIN(minutes_to_convert), 6) AS min_minutes,
           ROUND(median(minutes_to_convert), 6) AS median_minutes,
           ROUND(MAX(minutes_to_convert), 6) AS max_minutes
    FROM conv
    """,
    tags=("behavior", "agg"),
    tier="shadow",
)
def funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-latency distribution: minutes from a user's first
    view to their (ordered) first purchase, summarized as count / min /
    exact median / max — the companion metric to the funnel's step
    counts.

    Reuses the funnel's sequential-min derivation (same three per-user
    aggregations, all co-keyed on user_id); the converted-user table is
    |users|-bounded, so the exact median is cheap.  Latency is integer
    epoch-millisecond arithmetic divided by the literal 60000.0 —
    identical doubles on both engines before the 6-dp round.
    """
    ev = load_table(spark, "events", sf_dir).select(
        "user_id", "event_type", "ts"
    )
    t1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("ts1"))
    )
    t2 = (
        ev.filter(F.col("event_type") == "click")
        .join(t1, "user_id")
        .filter(F.col("ts") > F.col("ts1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("ts2"))
    )
    t3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(t2, "user_id")
        .filter(F.col("ts") > F.col("ts2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("ts3"))
    )
    conv = t1.join(t3, "user_id").select(
        (
            (F.unix_millis("ts3") - F.unix_millis("ts1")) / F.lit(60000.0)
        ).alias("minutes_to_convert")
    )
    return conv.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.round(F.min("minutes_to_convert"), 6).alias("min_minutes"),
        F.round(F.median("minutes_to_convert"), 6).alias("median_minutes"),
        F.round(F.max("minutes_to_convert"), 6).alias("max_minutes"),
    )


@register(
    "value_histogram",
    oracle="""
    WITH rng AS (
      SELECT event_type, MIN(value) AS lo, MAX(value) AS hi
      FROM events GROUP BY event_type
    ),
    bucketed AS (
      SELECT e.event_type,
             CAST(LEAST(9, CAST(floor(
               (e.value - r.lo) / ((r.hi - r.lo) / 10.0)) AS BIGINT))
               AS INT) AS bucket,
             r.lo, r.hi
      FROM events e JOIN rng r ON r.event_type = e.event_type
    )
    SELECT event_type, bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(MIN(lo) + bucket * ((MIN(hi) - MIN(lo)) / 10.0), 6)
             AS bucket_lo
    FROM bucketed
    GROUP BY event_type, bucket
    """,
    tags=("behavior", "profiling"),
    tier="shadow",
)
def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram (10 buckets) of the value column per event
    type, over each type's own [min, max] range — the distribution
    sketch a profiler or query optimizer collects.

    Two scans: the 5-row per-type range table broadcasts back into the
    bucketing pass, so the fact never shuffles raw values — the
    exchange carries (type, bucket) pairs only, 50 groups.  The bucket
    expression is written identically on both engines ((v-lo)/(width)
    with the max value clamped into the top bucket), so bucket
    assignment is IEEE-deterministic and the counts exact.
    """
    ev = load_table(spark, "events", sf_dir).select("event_type", "value")
    rng = ev.groupBy("event_type").agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")
    )
    width = (F.col("hi") - F.col("lo")) / F.lit(10.0)
    bucket = F.least(
        F.lit(9).cast("bigint"),
        F.floor((F.col("value") - F.col("lo")) / width),
    ).cast("int")
    return (
        ev.join(F.broadcast(rng), "event_type")
        .select("event_type", bucket.alias("bucket"), "lo", "hi")
        .groupBy("event_type", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.min("lo")
                + F.col("bucket") * ((F.min("hi") - F.min("lo")) / F.lit(10.0)),
                6,
            ).alias("bucket_lo"),
        )
    )


@register(
    "time_weighted_value",
    oracle="""
    WITH stepped AS (
      SELECT user_id, value,
             epoch_us(CAST(ts AS TIMESTAMP)) AS t_us,
             LEAD(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS next_us
      FROM events
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_intervals,
           ROUND(SUM(value * (next_us - t_us))
                 / CAST(SUM(next_us - t_us) AS DOUBLE), 6) AS twa_value
    FROM stepped
    WHERE next_us IS NOT NULL
    GROUP BY user_id
    """,
    tags=("behavior", "timeseries"),
    tier="shadow",
)
def time_weighted_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of an irregularly-sampled signal: each
    observation holds until the user's next event (step interpolation),
    so the mean weights every value by its holding duration — the
    correct summary for sensor/metric streams where a plain AVG
    over-counts bursts.

    One shuffle on user_id serves both the LEAD window and the
    aggregation.  Durations are exact integer microseconds; the
    weighted sum's FP accumulation error (~1e-14 relative) sits ten
    orders below the 6-dp round of the final ratio.
    """
    from pyspark.sql import Window as W

    ev = load_table(spark, "events", sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    t_us = F.unix_micros(F.col("ts"))
    stepped = ev.select(
        "user_id",
        "value",
        t_us.alias("t_us"),
        F.lead(t_us).over(w).alias("next_us"),
    ).filter(F.col("next_us").isNotNull())
    dur = F.col("next_us") - F.col("t_us")
    return stepped.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.round(
            F.sum(F.col("value") * dur) / F.sum(dur).cast("double"), 6
        ).alias("twa_value"),
    )


@register(
    "daily_type_pivot",
    oracle="""
    SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
           CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                AS BIGINT) AS view_n,
           CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                AS BIGINT) AS click_n,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS BIGINT) AS purchase_n,
           ROUND(AVG(CASE WHEN event_type = 'purchase' THEN value END), 6)
             AS purchase_avg_value
    FROM events
    GROUP BY 1
    """,
    tags=("behavior", "pivot"),
    tier="shadow",
)
def daily_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide daily activity report via PIVOT with mixed aggregates
    (counts per pivoted event type + a per-type average) — the
    long-to-wide reshape every reporting layer runs.

    Spark's ``pivot`` with an EXPLICIT value list compiles to a single
    PivotFirst aggregation — one shuffle, no per-value scans; the
    explicit list is the scale contract (an unlisted pivot triggers a
    driver-side distinct collect — never do that at 100 TB).  The
    oracle is the equivalent conditional aggregation, proving the
    reshape changes the layout, not the numbers."""
    ev = load_table(spark, "events", sf_dir)
    wide = (
        ev.groupBy(F.to_date("ts").cast("string").alias("day"))
        .pivot("event_type", ["view", "click", "purchase"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
    )
    return wide.select(
        "day",
        F.coalesce(F.col("view_n"), F.lit(0)).alias("view_n"),
        F.coalesce(F.col("click_n"), F.lit(0)).alias("click_n"),
        F.coalesce(F.col("purchase_n"), F.lit(0)).alias("purchase_n"),
        F.col("purchase_avg_value"),
    )


@register(
    "hopping_window_counts",
    oracle="""
    WITH starts AS (
      SELECT event_type,
             unnest([
               time_bucket(INTERVAL 30 MINUTE, CAST(ts AS TIMESTAMP)),
               time_bucket(INTERVAL 30 MINUTE, CAST(ts AS TIMESTAMP))
                 - INTERVAL 30 MINUTE
             ]) AS ws
      FROM events
    )
    SELECT CAST(ws AS VARCHAR) AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM starts
    GROUP BY 1, 2
    """,
    tags=("behavior", "window-agg"),
    tier="shadow",
)
def hopping_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HOPPING (sliding) windows — 1-hour windows every 30 minutes, so
    each event contributes to exactly two overlapping windows: the
    smoothing aggregation dashboards use where tumbling windows jitter.
    The only window species (after tumbling, session, and native
    session-stream) not yet pinned in the registry.

    Spark's ``window(ts, '1 hour', '30 minutes')`` plans as a 2-row
    Expand before the aggregation — replication factor =
    length/slide, fixed and explicit, then one shuffle of (window,
    type) keys.  The oracle derives the same two window starts per
    event arithmetically (30-minute time_bucket and its predecessor).
    Session timezone is pinned to UTC for the duration so the NTZ
    fixture timestamps land on identical wall-clock window boundaries
    in both engines."""
    saved = spark.conf.get("spark.sql.session.timeZone", None)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        ev = load_table(spark, "events", sf_dir)
        out = (
            ev.groupBy(
                F.window("ts", "1 hour", "30 minutes").alias("w"),
                "event_type",
            )
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(
                F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias(
                    "window_start"
                ),
                "event_type",
                "n_events",
            )
        )
        # materialize while the UTC conf is in force — the conf is
        # restored before the caller consumes the frame
        out = out.localCheckpoint(eager=True)
    finally:
        if saved is None:
            spark.conf.unset("spark.sql.session.timeZone")
        else:
            spark.conf.set("spark.sql.session.timeZone", saved)
    return out


@register(
    "ewma_recent_value",
    oracle="""
    WITH recent AS (
      SELECT user_id, value,
             ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY ts DESC, event_id DESC) - 1
               AS k
      FROM events
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_used,
           ROUND(SUM(value * (1.0 / CAST(1 << k AS DOUBLE)))
                 / SUM(1.0 / CAST(1 << k AS DOUBLE)), 6) AS ewma_value
    FROM recent WHERE k < 20
    GROUP BY user_id
    """,
    tags=("behavior", "timeseries"),
    tier="shadow",
)
def ewma_recent_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of each user's recent
    signal (α = 0.5 over the last 20 events, normalized) — the
    recency-biased summary a live scoring feature uses where a plain
    mean lags.

    The recursive EWMA definition unrolls to a weighted sum with
    weights (1-α)^k; α = 0.5 makes every weight an exact power of two
    (computed as 1/(1<<k) in INTEGER arithmetic, then one exact double
    division), so both engines see bit-identical weights and products —
    no transcendental pow() whose libm rounding could differ.  One
    shuffle on user_id serves the recency window and the aggregation.
    """
    from pyspark.sql import Window as W

    ev = load_table(spark, "events", sf_dir)
    w = W.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    recent = ev.select(
        "user_id", "value", (F.row_number().over(w) - 1).alias("k")
    ).filter(F.col("k") < 20)
    weight = F.lit(1.0) / F.expr("CAST(shiftleft(1L, k) AS DOUBLE)")
    return recent.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_used"),
        F.round(
            F.sum(F.col("value") * weight) / F.sum(weight), 6
        ).alias("ewma_value"),
    )


@register(
    "peak_concurrency",
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_id, ts,
             CASE WHEN epoch_us(CAST(ts AS TIMESTAMP))
                       - LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER w
                       > 1800000000
                  OR LAG(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    ),
    sess AS (
      SELECT user_id, session_id, MIN(ts) AS s_start, MAX(ts) AS s_end
      FROM numbered GROUP BY user_id, session_id
    ),
    deltas AS (
      SELECT s_start AS t, 1 AS delta FROM sess
      UNION ALL
      SELECT s_end AS t, -1 AS delta FROM sess
    ),
    swept AS (
      SELECT SUM(delta) OVER (
               ORDER BY t, delta ROWS UNBOUNDED PRECEDING) AS live
      FROM deltas
    )
    SELECT CAST((SELECT COUNT(*) FROM sess) AS BIGINT) AS n_sessions,
           CAST(MAX(live) AS BIGINT) AS peak_concurrent
    FROM swept
    """,
    tags=("behavior", "interval"),
    tier="shadow",
)
def peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions via the SWEEP-LINE device: every
    session contributes a +1 at its start and a -1 at its end, and the
    maximum of the running sum over the time-ordered deltas is the
    capacity-planning number ("how many users were ever on at once").
    Ends sort before starts at equal timestamps (ORDER BY t, delta), so
    back-to-back sessions don't double-count — closed-interval
    semantics pinned identically on both engines.

    The sweep partitions by DAY with cross-day boundary carry-in
    (operators/prefixscan.py:bucketed_running_sum): per-day running
    sums scan in parallel, the only single-task step is the exclusive
    prefix-sum over the |days|-row totals table — calendar-bounded, so
    the shape survives any corpus growth (the delta relation itself is
    2×|sessions|, already event-volume-free)."""
    from pyspark.sql import Window as W

    from kafkastreamsproject_spark.operators.prefixscan import (
        bucketed_running_sum,
    )

    ev = load_table(spark, "events", sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    micros = F.unix_micros(F.col("ts"))
    gap = micros - F.lag(micros).over(w)
    numbered = ev.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1).otherwise(0),
    ).withColumn(
        "session_id",
        F.sum("new_session").over(
            w.rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    sess = numbered.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("s_start"), F.max("ts").alias("s_end")
    )
    deltas = sess.select(
        F.col("s_start").alias("t"), F.lit(1).alias("delta")
    ).unionByName(
        sess.select(F.col("s_end").alias("t"), F.lit(-1).alias("delta"))
    )
    swept = bucketed_running_sum(
        deltas.withColumn("__day", F.to_date("t")),
        "__day",
        [F.col("t"), F.col("delta")],
        "delta",
        out_col="live",
    )
    n_sessions = sess.agg(F.count(F.lit(1)).alias("n_sessions"))
    return (
        swept.agg(F.max("live").alias("peak_concurrent"))
        .join(F.broadcast(n_sessions))
        .select("n_sessions", "peak_concurrent")
    )


@register(
    "linear_interpolate_gaps",
    oracle="""
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS d,
             CAST(SUM(CAST(value AS DECIMAL(12,2))) * 100 AS BIGINT) AS vc
      FROM events GROUP BY 1, 2
    ),
    bounds AS (
      SELECT user_id, MIN(d) AS lo, MAX(d) AS hi FROM daily GROUP BY user_id
    ),
    grid AS (
      SELECT user_id, CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY))
                           AS DATE) AS d
      FROM bounds
    ),
    joined AS (
      SELECT g.user_id, g.d, daily.vc
      FROM grid g LEFT JOIN daily ON daily.user_id = g.user_id
                                 AND daily.d = g.d
    ),
    filled AS (
      SELECT user_id, d, vc,
             last_value(vc IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pvc,
             last_value(CASE WHEN vc IS NOT NULL THEN d END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY d
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
             first_value(vc IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY d
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nvc,
             first_value(CASE WHEN vc IS NOT NULL THEN d END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY d
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
      FROM joined
    )
    SELECT user_id, CAST(d AS VARCHAR) AS gap_date,
           CAST(pvc * (date_diff('day', pd, nd) - date_diff('day', pd, d))
                + nvc * date_diff('day', pd, d) AS DOUBLE)
           / (date_diff('day', pd, nd) * 100.0) AS interp_value
    FROM filled WHERE vc IS NULL
    """,
    tags=("behavior", "timeseries"),
    tier="shadow",
)
def linear_interpolate_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling: densify each user's daily-total series
    onto a continuous day grid (inside that user's observed range) and
    LINEARLY INTERPOLATE the missing days between their surrounding
    observations — the resample/upsample operator every downstream
    model-ready feature table needs (a plain groupBy silently skips
    missing days; order_date_gaps only DETECTS them).

    Built from the forward/backward ignore-nulls window pair (Spark
    ``last(ignorenulls)`` looking back, ``first(ignorenulls)`` looking
    forward) — the standard distributed as-of fill, one shuffle on
    user_id, each partition scanned twice in sorted order.

    Exactness contract: daily totals are DECIMAL(12,2) sums carried as
    integer CENTS, the interpolation numerator pvc·(m−k) + nvc·k is
    exact integer arithmetic, and the ONLY floating-point step is one
    final division of that integer by m·100 — bit-identical on both
    engines with NO round() at all.  (The first formulation rounded a
    6-dp mean and interpolated with weight 1/2 — which manufactures
    exact x.xxxxxx5 decimal ties where Spark's BigDecimal rounding and
    DuckDB's x·1e6 rounding disagree in the last digit; keeping every
    intermediate integral removes the tie class instead of papering
    over it.)  Grid rows are |users| × their span — bounded by
    calendar days, not event volume."""
    from pyspark.sql import Window as W

    ev = load_table(spark, "events", sf_dir)
    daily = (
        ev.groupBy("user_id", F.to_date("ts").alias("d"))
        .agg(
            (F.sum(F.col("value").cast("decimal(12,2)")) * 100)
            .cast("long")
            .alias("vc")
        )
    )
    bounds = daily.groupBy("user_id").agg(
        F.min("d").alias("lo"), F.max("d").alias("hi")
    )
    grid = bounds.select(
        "user_id",
        F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias("d"),
    )
    joined = grid.join(daily, ["user_id", "d"], "left")
    wb = (
        W.partitionBy("user_id")
        .orderBy("d")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wf = (
        W.partitionBy("user_id")
        .orderBy("d")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    obs_d = F.when(F.col("vc").isNotNull(), F.col("d"))
    filled = joined.select(
        "user_id",
        "d",
        "vc",
        F.last("vc", ignorenulls=True).over(wb).alias("pvc"),
        F.last(obs_d, ignorenulls=True).over(wb).alias("pd"),
        F.first("vc", ignorenulls=True).over(wf).alias("nvc"),
        F.first(obs_d, ignorenulls=True).over(wf).alias("nd"),
    )
    m = F.datediff("nd", "pd")
    k = F.datediff("d", "pd")
    interp = (
        (F.col("pvc") * (m - k) + F.col("nvc") * k).cast("double")
        / (m * 100.0)
    )
    return filled.filter(F.col("vc").isNull()).select(
        "user_id",
        F.col("d").cast("string").alias("gap_date"),
        interp.alias("interp_value"),
    )


_Z_BITS = 8  # low 8 bits of each dimension interleave into a 16-bit z-value
_Z_BLOCK_SHIFT = 8  # 256 z-values per layout block


def _sql_zvalue(x: str, y: str) -> str:
    """DuckDB z-value: bit-interleave the low 8 bits of x (even
    positions) and y (odd positions)."""
    terms = []
    for i in range(_Z_BITS):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


def _zvalue(x: F.Column, y: F.Column) -> F.Column:
    """Spark twin of :func:`_sql_zvalue` — pure integer bit arithmetic,
    identical on both engines."""
    z = F.lit(0).cast("long")
    for i in range(_Z_BITS):
        z = z + F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        z = z + F.shiftleft(
            F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1
        )
    return z


@register(
    "zorder_layout_audit",
    oracle=f"""
    WITH pts AS (
      SELECT CAST(user_id % 256 AS BIGINT) AS x,
             CAST(((date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                    % 256) + 256) % 256 AS BIGINT) AS y
      FROM events
    ),
    z AS (
      SELECT x, y, CAST({_sql_zvalue("x", "y")} AS BIGINT) AS zv FROM pts
    )
    SELECT CAST(zv >> {_Z_BLOCK_SHIFT} AS BIGINT) AS block_id,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MAX(x) - MIN(x) + 1 AS BIGINT) AS x_span,
           CAST(MAX(y) - MIN(y) + 1 AS BIGINT) AS y_span
    FROM z GROUP BY 1
    """,
    tags=("behavior", "layout"),
    tier="shadow",
)
def zorder_layout_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-curve) layout audit: interleave the low 8 bits
    of (user_id, day-index) into a 16-bit z-value, group rows into
    256-z-value layout blocks, and report each block's row count and
    per-dimension min-max SPAN — the multi-dimensional-clustering
    quality measure behind lakehouse OPTIMIZE-ZORDER: small spans mean
    a point/range predicate on EITHER dimension prunes most blocks via
    their min-max zone maps, which a single-column sort gives only for
    its leading column.

    The z-value is pure integer bit arithmetic (16 shift-mask terms,
    whole-stage-codegen'd, bit-identical across engines); the audit is
    one groupBy over ≤256 blocks.  At 100 TB the same z-value column
    is what you'd ``repartitionByRange`` + sortWithinPartitions on to
    physically write the layout — this query is the measurement half
    that decides whether the rewrite is worth the IO."""
    ev = load_table(spark, "events", sf_dir)
    x = (F.col("user_id") % 256).cast("long")
    # double-mod keeps the day index non-negative even if the fixture
    # ever regenerates with pre-epoch dates (both engines' % follows the
    # dividend's sign, so a single mod could go negative identically —
    # still hash-equal, but a nonsense layout; pin the intended one)
    y = (
        (
            (
                F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
                % 256
            )
            + 256
        )
        % 256
    ).cast("long")
    pts = ev.select(x.alias("x"), y.alias("y"))
    z = pts.select("x", "y", _zvalue(F.col("x"), F.col("y")).alias("zv"))
    return (
        z.groupBy(
            F.shiftright("zv", _Z_BLOCK_SHIFT).cast("long").alias("block_id")
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            (F.max("x") - F.min("x") + 1).alias("x_span"),
            (F.max("y") - F.min("y") + 1).alias("y_span"),
        )
    )


@register(
    "streaming_event_pairs",
    oracle="""
    SELECT v.user_id,
           v.event_id AS view_id,
           p.event_id AS purchase_id,
           (epoch_us(p.ts) - epoch_us(v.ts)) / 60000000.0 AS gap_minutes
    FROM events v
    JOIN events p
      ON p.user_id = v.user_id
     AND v.event_type = 'view'
     AND p.event_type = 'purchase'
     AND p.ts > v.ts
     AND p.ts <= v.ts + INTERVAL 60 MINUTES
    """,
    tags=("behavior", "streaming", "join"),
    tier="shadow",
)
def streaming_event_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM interval join run by Structured Streaming: pair
    every view with the same user's purchases inside the following
    hour, both sides read as file streams — the KStream×KStream
    windowed-join capability class beyond the reference's stream×static
    J1 (streaming/join.py holds the reusable trip-domain operator; this
    query is the oracle-checked events twin).

    Watermarks on BOTH sides plus the time-interval condition bound the
    join state to (rate × watermark + horizon) per side — without them
    a stream-stream join buffers forever; with them Spark evicts rows
    whose match window the watermark has closed (T4's eviction
    discipline applied to two-sided state).  INNER join results emit as
    soon as they match (append mode; the watermark gates only state
    cleanup, not inner-join emission), so after availableNow drains the
    fixture the memory sink holds exactly the batch interval join the
    oracle states.  gap_minutes is an exact integer micros difference
    over 6e7 — one deterministic double division, no rounding."""
    import shutil
    import tempfile
    import uuid

    from pyspark.sql import types as T

    _CONF_KEYS = ("spark.sql.session.timeZone",)
    saved = {k: spark.conf.get(k, None) for k in _CONF_KEYS}
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    raw_schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampNTZType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )

    def stream():
        return (
            spark.readStream.schema(raw_schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
            .withColumn("ts", F.col("ts").cast("timestamp"))
        )

    views = (
        stream()
        .filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("v_ts"),
        )
        .withWatermark("v_ts", "1 day")
    )
    purchases = (
        stream()
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 day")
    )
    cond = (
        (F.col("v_user") == F.col("p_user"))
        & (F.col("p_ts") > F.col("v_ts"))
        & (F.col("p_ts") <= F.col("v_ts") + F.expr("INTERVAL 60 MINUTES"))
    )
    pairs = views.join(purchases, cond, "inner").select(
        F.col("v_user").alias("user_id"),
        "view_id",
        "purchase_id",
        (
            (F.unix_micros("p_ts") - F.unix_micros("v_ts")) / 60_000_000.0
        ).alias("gap_minutes"),
    )
    name = f"stream_pairs_{uuid.uuid4().hex[:8]}"
    ckpt = tempfile.mkdtemp(prefix="ckpt_pairs_")
    try:
        q = (
            pairs.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.processAllAvailable()
        q.stop()
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    return spark.table(name)


@register(
    "streaming_hopping_counts",
    oracle="""
    WITH starts AS (
      SELECT event_type,
             unnest([
               time_bucket(INTERVAL 30 MINUTE, CAST(ts AS TIMESTAMP)),
               time_bucket(INTERVAL 30 MINUTE, CAST(ts AS TIMESTAMP))
                 - INTERVAL 30 MINUTE
             ]) AS ws
      FROM events
    )
    SELECT CAST(ws AS VARCHAR) AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM starts
    GROUP BY 1, 2
    """,
    tags=("behavior", "window-agg", "streaming"),
    tier="shadow",
)
def streaming_hopping_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """hopping_window_counts run by the STREAMING runtime: the same
    1h/30min overlapping windows as a watermarked streaming aggregation
    over the events file stream, complete-mode memory sink — the final
    state must equal the batch hopping aggregation, which the identical
    oracle checks.  Completes the streaming window-species matrix:
    tumbling (streaming_daily_agg), session (streaming_session_windows),
    hopping (this).

    Streaming-specific shape: the 2-row Expand runs BEFORE the stateful
    aggregation, so state is keyed on (window, type) — bounded by
    watermark retention × slide rate, and each event updates exactly
    two state rows per the length/slide replication factor."""
    import shutil
    import tempfile
    import uuid

    from pyspark.sql import types as T

    saved = spark.conf.get("spark.sql.session.timeZone", None)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    raw_schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampNTZType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    agg = (
        stream.withWatermark("ts", "1 day")
        .groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n_events",
        )
    )
    name = f"stream_hop_{uuid.uuid4().hex[:8]}"
    ckpt = tempfile.mkdtemp(prefix="ckpt_hop_")
    try:
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.processAllAvailable()
        q.stop()
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
        if saved is None:
            spark.conf.unset("spark.sql.session.timeZone")
        else:
            spark.conf.set("spark.sql.session.timeZone", saved)
    return spark.table(name)


_PSI_BINS = 10


@register(
    "value_psi_drift",
    oracle=f"""
    WITH vals AS (
      SELECT event_type, value FROM events
      WHERE event_type IN ('view', 'purchase')
    ),
    rng AS (
      SELECT MIN(value) AS lo, MAX(value) AS hi FROM vals
    ),
    binned AS (
      SELECT event_type,
             -- same degenerate-range clamp as the Spark side (ADVICE
             -- r7): both engines must take the guarded path together
             LEAST(CAST(FLOOR((value - rng.lo)
                              / (GREATEST(rng.hi - rng.lo, 1e-9)
                                 / {_PSI_BINS})) AS BIGINT),
                   {_PSI_BINS - 1}) AS bin
      FROM vals CROSS JOIN rng
    ),
    counts AS (
      SELECT bin,
             SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS c_ref,
             SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c_cur
      FROM binned GROUP BY bin
    ),
    tot AS (
      SELECT SUM(c_ref) AS n_ref, SUM(c_cur) AS n_cur FROM counts
    )
    SELECT CAST(bin AS BIGINT) AS bin,
           CAST(c_ref AS BIGINT) AS n_ref,
           CAST(c_cur AS BIGINT) AS n_cur,
           ROUND(((c_cur + 1) / CAST(tot.n_cur + {_PSI_BINS} AS DOUBLE)
                  - (c_ref + 1) / CAST(tot.n_ref + {_PSI_BINS} AS DOUBLE))
                 * ln(((c_cur + 1) / CAST(tot.n_cur + {_PSI_BINS} AS DOUBLE))
                      / ((c_ref + 1) / CAST(tot.n_ref + {_PSI_BINS} AS DOUBLE))),
                 6) AS psi_term
    FROM counts CROSS JOIN tot
    """,
    tags=("behavior", "drift", "mlops"),
    tier="shadow",
)
def value_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population stability index between the 'view' (reference) and
    'purchase' (current) value distributions: 10 equal-width bins over
    the combined range, per-bin Laplace-smoothed PSI terms — the
    standard ML-ops drift monitor (total PSI = Σ terms; > 0.2 is the
    conventional retrain trigger).  Smoothing (+1 per bin) keeps every
    term finite and deterministic however the fixture regenerates.

    One scan bins both populations (bin bounds are a 1-row broadcast),
    one ≤10-group aggregation counts them, and the PSI arithmetic runs
    on the 10-row result with a second 1-row totals broadcast — at
    100 TB the cost is the single fact scan; everything after is
    constant-size.  ln() on identical count-ratio doubles matches
    across engines (the tfidf_top_terms precedent), rounded at 6 dp."""
    ev = load_table(spark, "events", sf_dir).filter(
        F.col("event_type").isin("view", "purchase")
    ).select("event_type", "value")
    rng = ev.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    # greatest() guards the degenerate all-equal-values fixture: a
    # zero width would floor(inf) and overflow the BIGINT cast
    width = F.greatest(F.col("hi") - F.col("lo"), F.lit(1e-9)) / _PSI_BINS
    bin_col = F.least(
        F.floor((F.col("value") - F.col("lo")) / width).cast("long"),
        F.lit(_PSI_BINS - 1),
    )
    counts = (
        ev.crossJoin(F.broadcast(rng))
        .select(bin_col.alias("bin"), "event_type")
        .groupBy("bin")
        .agg(
            F.sum((F.col("event_type") == "view").cast("long")).alias("c_ref"),
            F.sum((F.col("event_type") == "purchase").cast("long")).alias(
                "c_cur"
            ),
        )
    )
    tot = counts.agg(
        F.sum("c_ref").alias("n_ref"), F.sum("c_cur").alias("n_cur")
    )
    p = (F.col("c_cur") + 1) / (F.col("n_cur") + _PSI_BINS).cast("double")
    q = (F.col("c_ref") + 1) / (F.col("n_ref") + _PSI_BINS).cast("double")
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "bin",
            F.col("c_ref").alias("n_ref"),
            F.col("c_cur").alias("n_cur"),
            F.round((p - q) * F.log(p / q), 6).alias("psi_term"),
        )
    )


@register(
    "event_trigram_patterns",
    oracle="""
    WITH seq AS (
      SELECT event_type AS a,
             LEAD(event_type, 1) OVER w AS b,
             LEAD(event_type, 2) OVER w AS c
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    tri AS (
      SELECT a || '>' || b || '>' || c AS trigram, COUNT(*) AS n
      FROM seq WHERE b IS NOT NULL AND c IS NOT NULL
      GROUP BY 1
    )
    SELECT trigram, CAST(n AS BIGINT) AS n_occurrences,
           CAST(rn AS INT) AS rnk
    FROM (
      SELECT trigram, n,
             ROW_NUMBER() OVER (ORDER BY n DESC, trigram) AS rn
      FROM tri
    ) WHERE rn <= 10
    """,
    tags=("behavior", "sequence"),
    tier="shadow",
)
def event_trigram_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 sequential behavior trigrams: per user, every run of
    three consecutive events (ordered by time with an event_id
    tie-break) becomes an a>b>c pattern; corpus-wide counts rank the
    dominant flows — the sequence-mining readout product analytics
    derives funnels FROM (event_transition_matrix is the first-order
    view; this is the order-3 extension).

    One shuffle on user_id for the per-user ordered scan (the two
    LEADs share one window sort), one patterns aggregation bounded by
    |event_types|³ groups, and a 10-row ranked result — at 100 TB the
    sort is per-user within partitions, never global, and the pattern
    table is constant-sized."""
    from pyspark.sql import Window as W

    ev = load_table(spark, "events", sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("a"),
        F.lead("event_type", 1).over(w).alias("b"),
        F.lead("event_type", 2).over(w).alias("c"),
    )
    tri = (
        seq.filter(F.col("b").isNotNull() & F.col("c").isNotNull())
        .select(
            F.concat_ws(">", "a", "b", "c").alias("trigram")
        )
        .groupBy("trigram")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    wr = W.orderBy(F.col("n_occurrences").desc(), F.col("trigram"))
    return (
        tri.withColumn("rnk", F.row_number().over(wr))
        .filter(F.col("rnk") <= 10)
        .select("trigram", "n_occurrences", "rnk")
    )


_ATTR_WINDOW_US = 7 * 86400 * 1_000_000  # 7-day lookback, microseconds


@register(
    "purchase_attribution",
    oracle=f"""
    SELECT event_id AS purchase_id,
           user_id,
           purchase_us,
           first_touch_us,
           last_touch_us,
           n_touches,
           CAST((purchase_us - last_touch_us) // 1000000 AS BIGINT)
             AS last_touch_lag_s
    FROM (
      SELECT event_id, user_id, event_type,
             epoch_us(CAST(ts AS TIMESTAMP)) AS purchase_us,
             MIN(CASE WHEN event_type = 'view'
                      THEN epoch_us(CAST(ts AS TIMESTAMP)) END) OVER w
               AS first_touch_us,
             MAX(CASE WHEN event_type = 'view'
                      THEN epoch_us(CAST(ts AS TIMESTAMP)) END) OVER w
               AS last_touch_us,
             CAST(COUNT(CASE WHEN event_type = 'view' THEN 1 END) OVER w
                  AS BIGINT) AS n_touches
      FROM events
      WINDOW w AS (PARTITION BY user_id
                   ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
                   RANGE BETWEEN {_ATTR_WINDOW_US} PRECEDING
                             AND 1 PRECEDING)
    ) WHERE event_type = 'purchase' AND n_touches > 0
    """,
    tags=("behavior", "attribution"),
    tier="shadow",
)
def purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing-style touch attribution: for every purchase, the
    FIRST- and LAST-touch view inside a 7-day lookback window and the
    touch count — the first-/last-click attribution primitive every
    conversion report is built from (purchases with zero prior views
    are unattributable and excluded).

    One RANGE-framed window per user over event-time microseconds —
    the frame ends at 1 PRECEDING so a view at the purchase's exact
    timestamp never attributes to itself; conditional aggregates
    (CASE inside MIN/MAX/COUNT) pick out views without a second scan
    or a self-join.  Epoch-microsecond outputs keep the compare
    integer-exact; the lag is integer division.

    Scale shape: one shuffle on user_id serves the single window pass
    — per-user state is the 7-day frame, never the history; the
    classic alternative (events self-joined to events on a time-range
    predicate) is quadratic per hot user and never appears in the
    plan."""
    from pyspark.sql import Window as W

    ev = load_table(spark, "events", sf_dir)
    us = F.unix_micros(F.col("ts"))
    w = (
        W.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-_ATTR_WINDOW_US, -1)
    )
    is_view = F.col("event_type") == "view"
    enriched = ev.select(
        "event_id",
        "user_id",
        "event_type",
        us.alias("purchase_us"),
        F.min(F.when(is_view, us)).over(w).alias("first_touch_us"),
        F.max(F.when(is_view, us)).over(w).alias("last_touch_us"),
        F.count(F.when(is_view, 1)).over(w).alias("n_touches"),
    )
    return (
        enriched.filter(
            (F.col("event_type") == "purchase") & (F.col("n_touches") > 0)
        )
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            "purchase_us",
            "first_touch_us",
            "last_touch_us",
            "n_touches",
            F.floor(
                (F.col("purchase_us") - F.col("last_touch_us")) / 1_000_000
            ).alias("last_touch_lag_s"),
        )
    )


@register(
    "streaming_unmatched_views",
    oracle="""
    WITH mx AS (
      SELECT LEAST(
        (SELECT MAX(CAST(ts AS TIMESTAMP)) FROM events
          WHERE event_type = 'view'),
        (SELECT MAX(CAST(ts AS TIMESTAMP)) FROM events
          WHERE event_type = 'purchase')
      ) AS m
    ),
    v AS (
      SELECT user_id, event_id AS view_id, CAST(ts AS TIMESTAMP) AS vts
      FROM events WHERE event_type = 'view'
    ),
    p AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS pts
      FROM events WHERE event_type = 'purchase'
    )
    SELECT v.user_id, v.view_id,
           CAST(v.vts AS VARCHAR) AS view_ts
    FROM v CROSS JOIN mx
    WHERE NOT EXISTS (
        SELECT 1 FROM p
        WHERE p.user_id = v.user_id
          AND p.pts > v.vts
          AND p.pts <= v.vts + INTERVAL 60 MINUTES
      )
      AND v.vts + INTERVAL 60 MINUTES < mx.m - INTERVAL 1 MINUTE
    """,
    tags=("behavior", "streaming", "join"),
    tier="shadow",
)
def streaming_unmatched_views(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER stream-stream join — the state-EVICTION emission path
    streaming_event_pairs' inner join never exercises: views with no
    same-user purchase in the following hour emit exactly once, with a
    NULL purchase side, only when the watermark closes their match
    window (outer-join rows cannot emit eagerly — a match might still
    arrive — so Spark emits them from the state-cleanup pass).  This is
    the abandoned-cart / unanswered-event detector in pure Structured
    Streaming, the streaming twin of the NOT EXISTS anti-join.

    Determinism contract (what the oracle states): the final emitted
    set after an availableNow drain is every unmatched view whose
    horizon the FINAL watermark strictly passed — and the query-global
    watermark is the MIN over both watermark operators (measured here:
    the purchase side's max event time trails the view side's by ~32
    minutes, and Spark held exactly the two boundary views an
    all-events max would have predicted evicted), so the cutoff is
    v_ts + 60 min < least(max view ts, max purchase ts) − 1 min (the
    1-minute delay); later views stay in state at shutdown and are NOT
    emitted.  Intermediate batching only affects WHEN a row emits,
    never whether — eviction is monotone in the watermark — so the
    no-data micro-batch that availableNow runs after the last file
    makes the drained result batch-structure-independent.

    Scale shape: two-sided watermarked join state bounded by
    (rate × (watermark + horizon)) per side, identical to the inner
    twin; the post-join IS NULL filter is stateless."""
    import shutil
    import tempfile
    import uuid

    from pyspark.sql import types as T

    _CONF_KEYS = ("spark.sql.session.timeZone",)
    saved = {k: spark.conf.get(k, None) for k in _CONF_KEYS}
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    raw_schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampNTZType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )

    def stream():
        return (
            spark.readStream.schema(raw_schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
            .withColumn("ts", F.col("ts").cast("timestamp"))
        )

    views = (
        stream()
        .filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("v_ts"),
        )
        .withWatermark("v_ts", "1 minute")
    )
    purchases = (
        stream()
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 minute")
    )
    cond = (
        (F.col("v_user") == F.col("p_user"))
        & (F.col("p_ts") > F.col("v_ts"))
        & (F.col("p_ts") <= F.col("v_ts") + F.expr("INTERVAL 60 MINUTES"))
    )
    unmatched = (
        views.join(purchases, cond, "left_outer")
        .filter(F.col("purchase_id").isNull())
        .select(
            F.col("v_user").alias("user_id"),
            "view_id",
            F.col("v_ts").cast("string").alias("view_ts"),
        )
    )
    name = f"stream_unmatched_{uuid.uuid4().hex[:8]}"
    ckpt = tempfile.mkdtemp(prefix="ckpt_unmatched_")
    try:
        q = (
            unmatched.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.processAllAvailable()
        q.stop()
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    return spark.table(name).localCheckpoint(eager=True)


@register(
    "streaming_scd2_enrich",
    oracle="""
    WITH u AS (SELECT DISTINCT user_id FROM events),
    dim AS (
      SELECT user_id, 'base' AS tier,
             TIMESTAMP '2024-01-01 00:00:00' AS vf,
             CASE WHEN user_id % 3 = 0
                  THEN TIMESTAMP '2024-01-15 00:00:00' END AS vt
      FROM u
      UNION ALL
      SELECT user_id, 'plus', TIMESTAMP '2024-01-15 00:00:00', NULL
      FROM u WHERE user_id % 3 = 0
    )
    SELECT e.event_id, e.user_id, d.tier,
           CAST(CAST(e.ts AS TIMESTAMP) AS VARCHAR) AS event_ts
    FROM events e JOIN dim d
      ON e.user_id = d.user_id
     AND CAST(e.ts AS TIMESTAMP) >= d.vf
     AND (d.vt IS NULL OR CAST(e.ts AS TIMESTAMP) < d.vt)
    """,
    tags=("behavior", "streaming", "join", "cdc"),
    tier="shadow",
)
def streaming_scd2_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POINT-IN-TIME-CORRECT stream enrichment: each event joins the
    version of its user's SCD2 dimension row that was valid AT THE
    EVENT'S OWN TIMESTAMP — ts ∈ [valid_from, valid_to) — not the
    current version.  This is the temporal generalization of the
    reference's J1 stream×static equi-join (CustomTransformer.kt's
    station lookup never versions its dimension), and the device that
    prevents feature leakage in a training-data pipeline: enriching
    historical events with TODAY's dimension silently teaches the model
    the future.  Every user whose id % 3 == 0 upgrades base→plus at
    Jan 15; their January events must split tiers on that boundary.

    Streaming-specific shape: the SCD2 side is STATIC (broadcast), so
    the interval condition rides the stream-static join stencil — a
    stateless per-row lookup, no watermark, no join state; the
    dimension re-broadcasts per micro-batch, which is exactly how a
    slowly-changing dimension stays fresh mid-stream.  Append sink;
    availableNow drain equals the batch interval join the oracle
    states."""
    import shutil
    import tempfile
    import uuid
    import datetime as _dt

    from pyspark.sql import types as T

    _CONF_KEYS = ("spark.sql.session.timeZone",)
    saved = {k: spark.conf.get(k, None) for k in _CONF_KEYS}
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    raw_schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampNTZType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    users = (
        load_table(spark, "events", sf_dir).select("user_id").distinct()
    )
    jan1 = F.lit(_dt.datetime(2024, 1, 1)).cast("timestamp")
    jan15 = F.lit(_dt.datetime(2024, 1, 15)).cast("timestamp")
    upgraded = F.col("user_id") % 3 == 0
    v_base = users.select(
        "user_id",
        F.lit("base").alias("tier"),
        jan1.alias("vf"),
        F.when(upgraded, jan15).otherwise(
            F.lit(None).cast("timestamp")
        ).alias("vt"),
    )
    v_plus = users.filter(upgraded).select(
        "user_id",
        F.lit("plus").alias("tier"),
        jan15.alias("vf"),
        F.lit(None).cast("timestamp").alias("vt"),
    )
    dim = v_base.unionByName(v_plus)

    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .select("event_id", F.col("user_id").alias("e_user"), "ts")
    )
    cond = (
        (F.col("e_user") == dim.user_id)
        & (F.col("ts") >= F.col("vf"))
        & (F.col("vt").isNull() | (F.col("ts") < F.col("vt")))
    )
    enriched = stream.join(F.broadcast(dim), cond, "inner").select(
        "event_id",
        F.col("e_user").alias("user_id"),
        "tier",
        F.col("ts").cast("string").alias("event_ts"),
    )
    name = f"scd2_enrich_{uuid.uuid4().hex[:8]}"
    ckpt = tempfile.mkdtemp(prefix="ckpt_scd2_")
    try:
        q = (
            enriched.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.processAllAvailable()
        q.stop()
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    return spark.table(name).localCheckpoint(eager=True)


@register(
    "streaming_exact_dedup",
    oracle="""
    SELECT event_id, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_emitted
    FROM (SELECT DISTINCT event_id, event_type FROM events)
    GROUP BY event_id, event_type
    """,
    tags=("behavior", "streaming", "dedup"),
    tier="shadow",
)
def streaming_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACTLY-ONCE emission over an at-least-once stream: the events
    fixture is read as TWO unioned file streams (every event delivered
    twice — the reference's cleanUp()-and-reprocess startup, T6,
    guarantees exactly this duplication) and
    ``dropDuplicatesWithinWatermark`` on event_id must emit each event
    ONCE — n_emitted is pinned to 1 per event by the oracle's GROUP BY
    over the distinct relation.  This registers streaming/dedup.py's
    operator (pytest-only until now) as an oracle-checked query.

    Why WithinWatermark and not a global dropDuplicates: the global
    form keys state forever (corpus-sized at 100 TB); the watermarked
    form retires a key's state once the watermark passes its event
    time + delay — state bounded by (rate × horizon).  Both copies of
    an event share one timestamp, so dedup within the horizon is
    GUARANTEED regardless of how availableNow batches the two
    sources."""
    import shutil
    import tempfile
    import uuid

    from pyspark.sql import types as T

    _CONF_KEYS = ("spark.sql.session.timeZone",)
    saved = {k: spark.conf.get(k, None) for k in _CONF_KEYS}
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    raw_schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampNTZType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )

    def stream():
        return (
            spark.readStream.schema(raw_schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .select("event_id", "event_type", "ts")
        )

    from kafkastreamsproject_spark.streaming.dedup import dedup_stream

    doubled = stream().unionByName(stream())
    deduped = dedup_stream(
        doubled, ["event_id"], "ts", watermark="1 hour"
    ).select("event_id", "event_type")
    name = f"stream_dedup_{uuid.uuid4().hex[:8]}"
    ckpt = tempfile.mkdtemp(prefix="ckpt_dedup_")
    try:
        q = (
            deduped.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.processAllAvailable()
        q.stop()
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    return (
        spark.table(name)
        .groupBy("event_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n_emitted"))
        .localCheckpoint(eager=True)
    )
