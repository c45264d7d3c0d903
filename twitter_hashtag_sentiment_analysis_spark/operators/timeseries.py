"""Time-series operators over the `events` table: batch sessionization
and gap-filled resampling.

These are the batch twins of the streaming window family
(streaming/queries.py): identical semantics computed over data at rest.
Both are window/agg shapes whose shuffles are keyed by the natural
entity (user, event_type) — the partitioning a 100 TB event store is
already bucketed by, so in production these run shuffle-free on
bucketed tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import table
from ..registry import register

#: Session gap: a pause longer than this starts a new session (micros).
SESSION_GAP_US = 30 * 60 * 1_000_000


@register(
    "ts_sessionize",
    sql=f"""
        WITH marked AS (
            SELECT user_id, ts, value,
                   CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w
                             > {SESSION_GAP_US}
                        OR lag(ts) OVER w IS NULL
                        THEN 1 ELSE 0 END AS is_new
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sessions AS (
            SELECT user_id, ts, value,
                   sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS session_idx
            FROM marked
        )
        SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
               CAST(count(*) AS BIGINT) AS n_events,
               min(ts) AS session_start, max(ts) AS session_end,
               round(sum(value), 4) AS session_value
        FROM sessions
        GROUP BY user_id, session_idx
    """,
)
def ts_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: per user, a gap > 30 min starts a new
    session (the classic lag -> flag -> running-sum pattern; the exact
    batch semantics of `session_window` in the streaming suite). One
    shuffle on user_id serves both windows AND the final per-session
    aggregate. Gap compare is in integer micros (unix_micros/epoch_us)
    — bit-identical across engines, no float time arithmetic."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.select(
        "user_id",
        "ts",
        "value",
        F.when(
            (
                F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
                > SESSION_GAP_US
            )
            | F.lag("ts").over(w).isNull(),
            1,
        )
        .otherwise(0)
        .alias("is_new"),
    )
    wrun = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = marked.withColumn("session_idx", F.sum("is_new").over(wrun).cast("long"))
    return sess.groupBy("user_id", "session_idx").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.round(F.sum("value"), 4).alias("session_value"),
    )


@register(
    "ts_resample_gapfill",
    sql="""
        WITH bounds AS (
            SELECT event_type,
                   date_trunc('hour', min(ts)) AS lo,
                   date_trunc('hour', max(ts)) AS hi
            FROM events GROUP BY event_type
        ),
        spine AS (
            SELECT event_type, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
            FROM bounds
        ),
        hourly AS (
            SELECT event_type, date_trunc('hour', ts) AS bucket,
                   CAST(count(*) AS BIGINT) AS n, round(sum(value), 4) AS total
            FROM events GROUP BY 1, 2
        )
        SELECT s.event_type, s.bucket,
               COALESCE(h.n, 0) AS n,
               COALESCE(h.total, 0.0) AS total
        FROM spine s LEFT JOIN hourly h
          ON s.event_type = h.event_type AND s.bucket = h.bucket
    """,
)
def ts_resample_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly resample with gap filling: aggregate events into 1-hour
    buckets per type, then LEFT-join against a generated dense bucket
    spine so silent hours appear as explicit zeros (what every
    monitoring/training-curriculum rollup needs — absent rows are
    invisible to downstream averages). The spine is sequence() over
    [min, max] per type: ~24*days rows per type, trivially broadcast;
    the only data-sized shuffle is the hourly pre-aggregate, which
    partial-aggregates map-side first."""
    ev = table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("bucket")
    ).agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total"))
    bounds = ev.groupBy("event_type").agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = bounds.select(
        "event_type",
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("bucket"),
    )
    return (
        spine.join(hourly, ["event_type", "bucket"], "left")
        .select(
            "event_type",
            "bucket",
            F.coalesce("n", F.lit(0)).alias("n"),
            F.coalesce("total", F.lit(0.0)).alias("total"),
        )
    )
