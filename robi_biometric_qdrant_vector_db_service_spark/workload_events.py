"""Event-log operators (SURVEY §2.10 batch analogues + F9 JSON payloads).

The reference's only "state over time" is its running stats dict
(qdrant_client.py:52-58) and the 24 h metric-retention sweep
(utils/performance.py:499-511).  These queries give those semantics a
proper event-time treatment over the `events` table; streaming twins live
in `streaming.stats` (same aggregations as a Structured Streaming job).

Scale: every query groups or windows on keys carried by one shuffle; the
JSON parse is a codegen'd expression (no UDF).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .sources.catalog import load_table
from .workload import register


@register(
    "events_json_extract",
    """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(CAST(json_extract_string(props, '$.k') AS INTEGER) AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(max(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS INT) AS max_k
FROM events
GROUP BY event_type
""",
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9: dynamic JSON payload access (the reference's open ``Dict[str,Any]``
    payload, src/api/schemas.py:19) via ``get_json_object`` — a pure Catalyst
    expression, no UDF in the hot path."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(k.cast("bigint")).cast("bigint").alias("sum_k"),
        F.max(k).cast("int").alias("max_k"),
    )


@register(
    "events_hourly_rollup",
    """
SELECT date_trunc('hour', ts) AS hour, event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
""",
)
def events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time tumbling rollup — the batch twin of the streaming windowed
    agg (§2.10: flush_interval/metrics-bucket semantics).  At scale the
    input is partitioned by date, so the group-by shuffles within partition
    pruning bounds."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), F.col("event_type")
    ).agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
    )


@register(
    "events_retention_24h",
    """
WITH cutoff AS (SELECT max(ts) - INTERVAL 24 HOUR AS c FROM events)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_recent
FROM events, cutoff
WHERE ts > cutoff.c
GROUP BY event_type
""",
)
def events_retention_24h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's 24 h metric-retention sweep
    (utils/performance.py:499-511, ``record.timestamp > cutoff``) as an
    event-time predicate — in streaming this is exactly watermark-based
    state eviction (`streaming.stats`)."""
    ev = load_table(spark, sf_dir, "events")
    cutoff = ev.agg((F.max("ts") - F.expr("INTERVAL 24 HOURS")).alias("c"))
    return (
        ev.crossJoin(F.broadcast(cutoff))
        .filter(F.col("ts") > F.col("c"))
        .groupBy("event_type")
        .agg(F.count("*").cast("bigint").alias("n_recent"))
    )


@register(
    "sessionization",
    """
WITH ordered AS (
  SELECT user_id, ts, value,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
),
flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS is_new
  FROM ordered
),
sessions AS (
  SELECT user_id, ts, value,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       CAST(count(*) AS BIGINT) AS n_events,
       min(ts) AS session_start,
       max(ts) AS session_end,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM sessions
GROUP BY user_id, session_id
""",
)
def sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (pyspark_guide 'common OLAP patterns'):
    lag + cumulative flag sum.  One shuffle on user_id serves both windows
    and the final group-by (same partitioning reused across stages)."""
    ev = load_table(spark, sf_dir, "events")
    w_lag = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_cum = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # exact-microsecond gap comparison, matching the oracle's
    # `ts - prev_ts > INTERVAL 30 MINUTE` on sub-second timestamps too
    # (a second-truncated cast('long') delta would split/merge differently)
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.col("prev_ts"))
    flagged = ev.withColumn("prev_ts", F.lag("ts").over(w_lag)).withColumn(
        "is_new",
        F.when(F.col("prev_ts").isNull() | (gap_us > 1800 * 1_000_000), 1).otherwise(0),
    )
    sessions = flagged.withColumn("session_id", F.sum("is_new").over(w_cum))
    return sessions.groupBy("user_id", F.col("session_id").cast("bigint").alias("session_id")).agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
    )


@register(
    "session_window_rollup",
    """
WITH ordered AS (
  SELECT user_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
),
flagged AS (
  -- > : session_window MERGES touching windows — an event at EXACTLY
  -- prev+30min lands on the previous window's exclusive end [start,
  -- start+gap) and still merges (sessions split only when the gap
  -- EXCEEDS 30min; pinned against engine behavior by the exact-gap
  -- fuzz in tests/test_session_fuzz.py — the r15 fuzz caught this
  -- oracle documenting >= while the engine merges)
  SELECT user_id, ts,
         CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS is_new
  FROM ordered
),
sessions AS (
  SELECT user_id, ts,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
)
SELECT user_id, min(ts) AS session_start, CAST(count(*) AS BIGINT) AS n_events
FROM sessions
GROUP BY user_id, session_id
""",
)
def session_window_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessions via Spark's NATIVE ``session_window`` aggregation
    (one merging hash-agg, no window-function pass) — checked against the
    hand-rolled lag+cumsum construction, which is what the oracle runs.
    Session windows MERGE when they overlap OR TOUCH: an event at exactly
    prev + gap merges into the previous session, so the split rule is
    strictly ``gap > 30min`` (identical to ``sessionization``'s) — the r15
    exact-gap fuzz corrected this oracle from ``>=``.  In streaming the
    identical expression is watermark-managed state."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count("*").cast("bigint").alias("n_events"), F.min("ts").alias("session_start"))
        .select("user_id", "session_start", "n_events")
    )


@register(
    "running_ops_stats",
    """
SELECT event_type, event_id,
       CAST(count(*) OVER w AS BIGINT) AS ops_so_far,
       CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS cum_value
FROM events
WHERE user_id < 20
WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
""",
)
def running_ops_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 as a time series (SURVEY §2.6): the reference's per-op running
    counters (qdrant_client.py:52-58,229-233,389-392) re-expressed as
    running windows over the ops log; exact DECIMAL prefix sums."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_type",
        "event_id",
        F.count("*").over(w).cast("bigint").alias("ops_so_far"),
        F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double").alias("cum_value"),
    )


@register(
    "purchase_attribution_asof",
    """
WITH clicks AS (
  SELECT user_id, ts AS click_ts, max(event_id) AS click_id,
         arg_max(value, event_id) AS click_value
  FROM events WHERE event_type = 'click' GROUP BY user_id, ts
),
p AS (
  SELECT event_id AS purchase_id, user_id, ts AS purchase_ts, value AS purchase_value
  FROM events WHERE event_type = 'purchase'
)
SELECT p.purchase_id, p.user_id, p.purchase_ts, p.purchase_value,
       c.click_id, c.click_ts, c.click_value,
       epoch_us(p.purchase_ts) - epoch_us(c.click_ts) AS gap_us
FROM p ASOF LEFT JOIN clicks c
  ON p.user_id = c.user_id AND p.purchase_ts >= c.click_ts
""",
)
def purchase_attribution_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF JOIN (last-touch attribution): each purchase matched to the
    latest click by the same user at-or-before the purchase — the canonical
    point-in-time join Spark has no native operator for.  The oracle runs
    DuckDB's native ``ASOF LEFT JOIN``; the Spark plan is the scalable
    union-tag construction: tag both sides, ONE shuffle+sort per user
    partition, then a carry-forward ``last(ignorenulls)`` running window —
    no per-row range probe, no row explosion, cost O(events) regardless of
    click density.  Clicks are first deduped per (user, ts) with a
    ``max_by`` tiebreak (= DuckDB ``arg_max``) so equal-timestamp matches
    are deterministic on both engines.  At equal click/purchase timestamps
    the click sorts first (tag 0 < 1), giving the same >= inclusive
    semantics as the oracle's inequality."""
    ev = load_table(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(
            F.max("event_id").alias("click_id"),
            F.expr("max_by(value, event_id)").alias("click_value"),
        )
    )
    purchases = ev.filter(F.col("event_type") == "purchase")
    c = clicks.select(
        "user_id",
        "ts",
        F.lit(0).alias("tag"),
        F.lit(None).cast("bigint").alias("purchase_id"),
        F.lit(None).cast("double").alias("purchase_value"),
        F.struct(
            F.col("click_id"), F.col("ts").alias("click_ts"), F.col("click_value")
        ).alias("click"),
    )
    p = purchases.select(
        "user_id",
        "ts",
        F.lit(1).alias("tag"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
        F.lit(None).cast("struct<click_id:bigint,click_ts:timestamp,click_value:double>").alias("click"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tagged = c.union(p).withColumn("attr", F.last("click", ignorenulls=True).over(w))
    return tagged.filter(F.col("tag") == 1).select(
        "purchase_id",
        "user_id",
        F.col("ts").alias("purchase_ts"),
        "purchase_value",
        F.col("attr.click_id").alias("click_id"),
        F.col("attr.click_ts").alias("click_ts"),
        F.col("attr.click_value").alias("click_value"),
        (F.unix_micros("ts") - F.unix_micros("attr.click_ts")).alias("gap_us"),
    )


@register(
    "funnel_stages",
    """
WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'signup' GROUP BY 1),
s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN s1 USING (user_id)
       WHERE e.event_type = 'view' AND e.ts > s1.t1 GROUP BY 1),
s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN s2 USING (user_id)
       WHERE e.event_type = 'click' AND e.ts > s2.t2 GROUP BY 1),
s4 AS (SELECT e.user_id, min(e.ts) AS t4 FROM events e JOIN s3 USING (user_id)
       WHERE e.event_type = 'purchase' AND e.ts > s3.t3 GROUP BY 1)
SELECT * FROM (
  SELECT 1 AS stage_idx, 'signup' AS stage, CAST(count(*) AS BIGINT) AS n_users FROM s1
  UNION ALL SELECT 2, 'view', CAST(count(*) AS BIGINT) FROM s2
  UNION ALL SELECT 3, 'click', CAST(count(*) AS BIGINT) FROM s3
  UNION ALL SELECT 4, 'purchase', CAST(count(*) AS BIGINT) FROM s4
)
""",
)
def funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel analysis: users whose event history contains the
    SUBSEQUENCE signup < view < click < purchase (strict event-time order),
    counted per stage reached.  Earliest-occurrence greedy chaining — min
    ts of stage k after stage k-1's chosen ts — is provably optimal for
    subsequence matching, and expresses as k-1 co-partitioned user_id
    equi-joins + min aggregates: every shuffle is on user_id, reused across
    stages, no windows, no per-user sequence materialization."""
    ev = load_table(spark, sf_dir, "events")

    def stage(prev: DataFrame, etype: str, tcol: str, prev_t: str) -> DataFrame:
        return (
            ev.filter(F.col("event_type") == etype)
            .join(prev, "user_id")
            .filter(F.col("ts") > F.col(prev_t))
            .groupBy("user_id")
            .agg(F.min("ts").alias(tcol))
        )

    s1 = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = stage(s1, "view", "t2", "t1")
    s3 = stage(s2, "click", "t3", "t2")
    s4 = stage(s3, "purchase", "t4", "t3")
    rows = None
    for idx, (name, df) in enumerate(
        [("signup", s1), ("view", s2), ("click", s3), ("purchase", s4)], start=1
    ):
        c = df.agg(F.count("*").cast("bigint").alias("n_users")).select(
            F.lit(idx).alias("stage_idx"), F.lit(name).alias("stage"), "n_users"
        )
        rows = c if rows is None else rows.unionAll(c)
    return rows
