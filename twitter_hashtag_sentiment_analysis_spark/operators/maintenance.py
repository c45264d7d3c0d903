"""Table-maintenance operators: incremental refresh patterns a corpus
pipeline runs between training snapshots (MERGE-style upsert,
keep-latest compaction). Plain Spark has no transactional MERGE (that
is a table-format feature — Delta/Iceberg); the RELATIONAL semantics
are a full outer join, which is exactly what those formats execute
underneath, so this is the honest engine-level form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import table
from ..registry import register


@register(
    "merge_upsert",
    sql="""
        WITH updates AS (
            SELECT doc_id, upper(text) AS text, lang, source
            FROM documents WHERE doc_id % 7 = 0
            UNION ALL
            SELECT doc_id + 1000000, text, lang, source
            FROM documents WHERE doc_id < 50
        )
        SELECT coalesce(u.doc_id, b.doc_id) AS doc_id,
               coalesce(u.text, b.text) AS text,
               coalesce(u.lang, b.lang) AS lang,
               coalesce(u.source, b.source) AS source,
               CASE WHEN u.doc_id IS NULL THEN 'kept'
                    WHEN b.doc_id IS NULL THEN 'inserted'
                    ELSE 'updated' END AS merge_action
        FROM documents b
        FULL OUTER JOIN updates u ON b.doc_id = u.doc_id
    """,
)
def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE (upsert) as a full outer join: a deterministic updates
    batch (every 7th doc re-texted + 50 brand-new ids) merged into the
    base corpus — matched rows take the update, unmatched keep the
    base, new ids insert. At scale the join shuffles on the merge key
    exactly like Delta/Iceberg's MERGE rewrite; with a bucketed base
    table (see sink_bucketed) the shuffle drops to the updates side
    only. merge_action is emitted so the row-level decision is part of
    the verified contract."""
    base = table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    updates = (
        base.filter(F.col("doc_id") % 7 == 0)
        .withColumn("text", F.upper("text"))
        .unionAll(
            base.filter(F.col("doc_id") < 50).withColumn(
                "doc_id", F.col("doc_id") + 1000000
            )
        )
    )
    u, b = updates.alias("u"), base.alias("b")
    return b.join(u, F.col("b.doc_id") == F.col("u.doc_id"), "full").select(
        F.coalesce("u.doc_id", "b.doc_id").alias("doc_id"),
        F.coalesce("u.text", "b.text").alias("text"),
        F.coalesce("u.lang", "b.lang").alias("lang"),
        F.coalesce("u.source", "b.source").alias("source"),
        F.when(F.col("u.doc_id").isNull(), "kept")
        .when(F.col("b.doc_id").isNull(), "inserted")
        .otherwise("updated")
        .alias("merge_action"),
    )


@register(
    "dedup_keep_latest",
    sql="""
        SELECT event_id, user_id, event_type, ts
        FROM (
            SELECT event_id, user_id, event_type, ts,
                   row_number() OVER (
                       PARTITION BY user_id, event_type
                       ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        )
        WHERE rn = 1
    """,
)
def dedup_keep_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-latest compaction: one surviving row per (user_id,
    event_type), newest ts wins, event_id breaks ts ties — the CDC /
    snapshot-compaction shape (latest crawl per URL, newest label per
    example). One shuffle on the key; Spark executes the rn=1 filter
    as WindowGroupLimit, maintaining a single top-1 heap per key
    instead of sorting whole partitions (plan-asserted in
    tests/test_plans.py)."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        ev.select("event_id", "user_id", "event_type", "ts")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
