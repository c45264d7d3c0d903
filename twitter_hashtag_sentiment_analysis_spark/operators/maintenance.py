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


@register(
    "scd2_intervals",
    sql="""
        WITH ordered AS (
            SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
                   CASE WHEN lag(o_orderpriority) OVER w IS NULL
                             OR lag(o_orderpriority) OVER w <> o_orderpriority
                        THEN 1 ELSE 0 END AS chg
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey
                         ORDER BY o_orderdate, o_orderkey)
        ),
        islands AS (
            SELECT o_custkey, o_orderpriority, o_orderdate,
                   sum(chg) OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND CURRENT ROW) AS island
            FROM ordered
        ),
        runs AS (
            SELECT o_custkey, island,
                   min(o_orderpriority) AS o_orderpriority,
                   min(o_orderdate) AS valid_from,
                   CAST(count(*) AS BIGINT) AS n_orders
            FROM islands GROUP BY o_custkey, island
        )
        SELECT o_custkey,
               CAST(island AS BIGINT) AS version,
               o_orderpriority,
               valid_from,
               lead(valid_from) OVER wv AS valid_to,
               lead(valid_from) OVER wv IS NULL AS is_current,
               n_orders
        FROM runs
        WINDOW wv AS (PARTITION BY o_custkey ORDER BY island)
    """,
)
def scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 dimension history: each customer's order-priority
    timeline compressed into validity intervals — consecutive orders
    with the SAME priority collapse into one version row carrying
    [valid_from, valid_to) and an is_current flag (the change-capture
    shape every warehouse dimension load emits; Delta/Iceberg MERGEs
    write exactly these rows). Gaps-and-islands: lag -> change flag ->
    running sum = version id, then one aggregate per island and a lead
    for the closing bound. All four windows/aggregates share the ONE
    o_custkey shuffle; every value is exact (timestamps, strings,
    counts), so the oracle hash-matches bit-for-bit."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_orderpriority").over(w)
    flagged = o.select(
        "o_custkey",
        "o_orderpriority",
        "o_orderdate",
        "o_orderkey",
        F.when(
            prev.isNull() | (prev != F.col("o_orderpriority")), 1
        ).otherwise(0).alias("chg"),
    )
    islands = flagged.withColumn(
        "island",
        F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    runs = islands.groupBy("o_custkey", "island").agg(
        F.min("o_orderpriority").alias("o_orderpriority"),
        F.min("o_orderdate").alias("valid_from"),
        F.count("*").alias("n_orders"),
    )
    wv = Window.partitionBy("o_custkey").orderBy("island")
    nxt = F.lead("valid_from").over(wv)
    return runs.select(
        "o_custkey",
        F.col("island").cast("long").alias("version"),
        "o_orderpriority",
        "valid_from",
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
        "n_orders",
    )


@register(
    "snapshot_diff",
    sql="""
        WITH v1 AS (
            SELECT o_orderkey, o_orderstatus, o_totalprice
            FROM orders WHERE o_orderkey % 11 != 0
        ),
        v2 AS (
            SELECT o_orderkey,
                   CASE WHEN o_orderkey % 7 = 0 THEN 'X'
                        ELSE o_orderstatus END AS o_orderstatus,
                   o_totalprice
            FROM orders WHERE o_orderkey % 13 != 0
        ),
        classified AS (
            SELECT
                CASE
                    WHEN v1.o_orderkey IS NULL THEN 'added'
                    WHEN v2.o_orderkey IS NULL THEN 'removed'
                    WHEN v1.o_orderstatus != v2.o_orderstatus
                         OR v1.o_totalprice != v2.o_totalprice
                        THEN 'changed'
                    ELSE 'unchanged'
                END AS change
            FROM v1 FULL OUTER JOIN v2 ON v1.o_orderkey = v2.o_orderkey
        )
        SELECT change, CAST(count(*) AS BIGINT) AS n
        FROM classified GROUP BY change
    """,
)
def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff — the data-diff audit between two versions of a
    keyed table (the check a pipeline runs after a backfill or before
    promoting a rewrite: how many rows appeared, vanished, changed?).
    Two deterministic versions are derived from orders (v2 drops the
    %13 keys, mutates the %7 statuses; v1 drops the %11 keys), then a
    single FULL OUTER join on the key classifies every row into
    added / removed / changed / unchanged and aggregates the census.
    One co-partitioned shuffle on the key serves join AND census; on
    bucketed snapshot storage it is shuffle-free, and at 100 TB the
    value-compare side can swap the column list for a precomputed row
    hash (same plan, narrower shuffle). NULL-safe by construction:
    classification branches on key presence before any value
    compare."""
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    v1 = o.filter(F.col("o_orderkey") % 11 != 0)
    v2 = o.filter(F.col("o_orderkey") % 13 != 0).withColumn(
        "o_orderstatus",
        F.when(F.col("o_orderkey") % 7 == 0, F.lit("X")).otherwise(
            F.col("o_orderstatus")
        ),
    )
    j = v1.alias("a").join(
        v2.alias("b"),
        F.col("a.o_orderkey") == F.col("b.o_orderkey"),
        "full_outer",
    )
    change = (
        F.when(F.col("a.o_orderkey").isNull(), "added")
        .when(F.col("b.o_orderkey").isNull(), "removed")
        .when(
            (F.col("a.o_orderstatus") != F.col("b.o_orderstatus"))
            | (F.col("a.o_totalprice") != F.col("b.o_totalprice")),
            "changed",
        )
        .otherwise("unchanged")
    )
    return (
        j.select(change.alias("change"))
        .groupBy("change")
        .agg(F.count("*").cast("long").alias("n"))
    )
