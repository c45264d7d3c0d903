"""Data-quality audit operators — the Deequ/Great-Expectations shape a
training-data pipeline runs before ingestion (and the batch analog of
the reference's per-record validation logging, stream_processor.py:181-186).

Design rule: ALL rules ride ONE pass over the fact table. Each rule is
a conditional sum inside a single global aggregate; the per-rule rows
are unpivoted from that one result row with `stack`. Adding a rule adds
an expression, not a scan — at 100 TB the audit costs exactly one read
no matter how many expectations are declared. NULL counts as a
violation everywhere (when(cond, 0).otherwise(1) sends NULL to 1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import table
from ..registry import register


@register(
    "dq_checks",
    sql="""
        WITH joined AS (
            SELECT l.*, o.o_orderkey AS fk_ref
            FROM lineitem l
            LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
        ),
        stats AS (
            SELECT
                CAST(count(*) AS BIGINT) AS n_rows,
                CAST(sum(CASE WHEN l_quantity BETWEEN 1 AND 50
                              THEN 0 ELSE 1 END) AS BIGINT) AS v_qty,
                CAST(sum(CASE WHEN l_discount BETWEEN 0 AND 1
                              THEN 0 ELSE 1 END) AS BIGINT) AS v_disc,
                CAST(sum(CASE WHEN l_extendedprice > 0
                              THEN 0 ELSE 1 END) AS BIGINT) AS v_price,
                CAST(sum(CASE WHEN l_returnflag IN ('A', 'N', 'R')
                              THEN 0 ELSE 1 END) AS BIGINT) AS v_flag,
                CAST(sum(CASE WHEN l_shipdate IS NOT NULL
                              THEN 0 ELSE 1 END) AS BIGINT) AS v_ship,
                CAST(sum(CASE WHEN fk_ref IS NULL
                              THEN 1 ELSE 0 END) AS BIGINT) AS v_fk
            FROM joined
        )
        SELECT r.rule, r.n_violations, s.n_rows, r.n_violations = 0 AS ok
        FROM stats s, LATERAL (VALUES
            ('qty_in_range', s.v_qty),
            ('discount_unit_interval', s.v_disc),
            ('price_positive', s.v_price),
            ('returnflag_domain', s.v_flag),
            ('shipdate_not_null', s.v_ship),
            ('orderkey_resolves', s.v_fk)
        ) AS r(rule, n_violations)
    """,
)
def dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality audit: six expectations (range, unit
    interval, positivity, domain membership, non-null, referential
    integrity) evaluated in ONE scan + ONE 1-row aggregate, then
    unpivoted to a (rule, n_violations, n_rows, ok) report. The FK rule
    rides a left join against orders — o_orderkey is unique so the join
    never amplifies, and at scale it's the same co-partitioned hash
    join every fact query already pays. stack() emits the report rows
    from the single aggregate row: rules scale without extra passes."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("fk_ref")
    )
    joined = li.join(o, li.l_orderkey == F.col("fk_ref"), "left")

    def viol(cond):  # NULL condition counts as a violation
        return F.sum(F.when(cond, 0).otherwise(1)).cast("long")

    stats = joined.agg(
        F.count("*").alias("n_rows"),
        viol(F.col("l_quantity").between(1, 50)).alias("v_qty"),
        viol(F.col("l_discount").between(0, 1)).alias("v_disc"),
        viol(F.col("l_extendedprice") > 0).alias("v_price"),
        viol(F.col("l_returnflag").isin("A", "N", "R")).alias("v_flag"),
        viol(F.col("l_shipdate").isNotNull()).alias("v_ship"),
        F.sum(F.when(F.col("fk_ref").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("v_fk"),
    )
    report = stats.select(
        F.expr(
            "stack(6, "
            "'qty_in_range', v_qty, "
            "'discount_unit_interval', v_disc, "
            "'price_positive', v_price, "
            "'returnflag_domain', v_flag, "
            "'shipdate_not_null', v_ship, "
            "'orderkey_resolves', v_fk) AS (rule, n_violations)"
        ),
        "n_rows",
    )
    return report.withColumn("ok", F.col("n_violations") == 0)


@register(
    "quality_outlier_iqr",
    sql="""
        WITH fences AS (
            SELECT lang,
                   quantile_cont(n_chars, 0.25) AS q1,
                   quantile_cont(n_chars, 0.75) AS q3
            FROM documents
            GROUP BY lang
        ),
        f AS (
            SELECT lang, q1, q3,
                   q1 - 1.5 * (q3 - q1) AS lo,
                   q3 + 1.5 * (q3 - q1) AS hi
            FROM fences
        )
        SELECT d.lang,
               round(f.q1, 4) AS q1,
               round(f.q3, 4) AS q3,
               round(f.lo, 4) AS lo_fence,
               round(f.hi, 4) AS hi_fence,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN d.n_chars < f.lo OR d.n_chars > f.hi
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        FROM documents d
        JOIN f ON d.lang = f.lang
        GROUP BY d.lang, f.q1, f.q3, f.lo, f.hi
    """,
)
def quality_outlier_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier audit on document length, per language:
    Q1/Q3 of n_chars, fences at 1.5*IQR, and the count of documents
    outside them — the standard length-outlier gate a curation
    pipeline runs before training (truncated snippets below, scraped
    boilerplate blobs above). Cross-engine exactness is deliberate:
    quartile fractions on integer inputs land on dyadic rationals
    (frac in {0, .25, .5, .75}), so Spark's `percentile` and DuckDB's
    `quantile_cont` interpolate to bit-identical doubles and the
    UNROUNDED fence comparison cannot flip between engines (boundary
    values count as inliers on both: strict < / >).

    Scale shape: pass 1 computes per-lang quartiles (exact percentile
    buffers per-group values — swap in the mergeable-sketch twin
    `agg_approx_quantile` at 100 TB, same fences within rank error);
    pass 2 re-scans with the per-lang fences BROADCAST, so the count
    is a narrow map + one partial-aggregated groupBy. No data-sized
    join, no second shuffle of the corpus."""
    d = table(spark, sf_dir, "documents")
    fences = d.groupBy("lang").agg(
        F.expr("percentile(n_chars, 0.25)").alias("q1"),
        F.expr("percentile(n_chars, 0.75)").alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    f = fences.select(
        "lang",
        "q1",
        "q3",
        (F.col("q1") - 1.5 * iqr).alias("lo"),
        (F.col("q3") + 1.5 * iqr).alias("hi"),
    )
    joined = d.join(F.broadcast(f), "lang")
    return (
        joined.groupBy("lang", "q1", "q3", "lo", "hi")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(
                F.when(
                    (F.col("n_chars") < F.col("lo"))
                    | (F.col("n_chars") > F.col("hi")),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
        )
        .select(
            "lang",
            F.round("q1", 4).alias("q1"),
            F.round("q3", 4).alias("q3"),
            F.round("lo", 4).alias("lo_fence"),
            F.round("hi", 4).alias("hi_fence"),
            "n_docs",
            "n_outliers",
        )
    )


@register(
    "stat_column_profile",
    sql="""
        WITH s AS (
            SELECT
                CAST(count(*) AS BIGINT) AS n_rows,
                CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END)
                     AS BIGINT) AS status_nulls,
                CAST(count(DISTINCT o_orderstatus) AS BIGINT)
                    AS status_distinct,
                CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END)
                     AS BIGINT) AS pri_nulls,
                CAST(count(DISTINCT o_orderpriority) AS BIGINT)
                    AS pri_distinct,
                CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END)
                     AS BIGINT) AS price_nulls,
                CAST(count(DISTINCT o_totalprice) AS BIGINT)
                    AS price_distinct,
                round(min(o_totalprice), 2) AS price_min,
                round(max(o_totalprice), 2) AS price_max
            FROM orders
        )
        SELECT r.col_name, s.n_rows, r.n_nulls, r.n_distinct,
               r.min_val, r.max_val
        FROM s, LATERAL (VALUES
            ('o_orderstatus', s.status_nulls, s.status_distinct,
             NULL, NULL),
            ('o_orderpriority', s.pri_nulls, s.pri_distinct, NULL, NULL),
            ('o_totalprice', s.price_nulls, s.price_distinct,
             s.price_min, s.price_max)
        ) AS r(col_name, n_nulls, n_distinct, min_val, max_val)
    """,
)
def stat_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile (the df.summary()/data-catalog shape): per-column
    null count, EXACT distinct count, and numeric min/max, emitted as
    one row per column. Same one-scan rule as dq_checks: every metric
    is an aggregate expression in a SINGLE global aggregate (the
    multi-count-distinct plan is Spark's expand-based single pass) and
    the per-column rows are stack-unpivoted from that one result row —
    profiling N columns costs one read at any corpus size. For
    truly-wide high-cardinality profiling at 100 TB, swap the exact
    distincts for approx_count_distinct (the HLL sketch twin,
    agg_approx_distinct) — same plan shape, mergeable state."""
    o = table(spark, sf_dir, "orders")
    s = o.agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum(F.col("o_orderstatus").isNull().cast("long"))
        .cast("long")
        .alias("status_nulls"),
        F.countDistinct("o_orderstatus").cast("long").alias("status_distinct"),
        F.sum(F.col("o_orderpriority").isNull().cast("long"))
        .cast("long")
        .alias("pri_nulls"),
        F.countDistinct("o_orderpriority").cast("long").alias("pri_distinct"),
        F.sum(F.col("o_totalprice").isNull().cast("long"))
        .cast("long")
        .alias("price_nulls"),
        F.countDistinct("o_totalprice").cast("long").alias("price_distinct"),
        F.round(F.min("o_totalprice"), 2).alias("price_min"),
        F.round(F.max("o_totalprice"), 2).alias("price_max"),
    )
    return s.selectExpr(
        "n_rows",
        """stack(3,
            'o_orderstatus', status_nulls, status_distinct,
                CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
            'o_orderpriority', pri_nulls, pri_distinct,
                CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
            'o_totalprice', price_nulls, price_distinct,
                price_min, price_max
        ) AS (col_name, n_nulls, n_distinct, min_val, max_val)""",
    ).select("col_name", "n_rows", "n_nulls", "n_distinct", "min_val", "max_val")


@register(
    "quality_duplication_census",
    sql="""
        WITH g AS (
            SELECT source, md5(text) AS h, CAST(count(*) AS BIGINT) AS copies
            FROM documents GROUP BY 1, 2
        )
        SELECT source,
               CAST(sum(copies) AS BIGINT) AS n_docs,
               CAST(count(*) AS BIGINT) AS n_distinct,
               CAST(sum(copies) - count(*) AS BIGINT) AS n_redundant,
               CAST(sum(copies) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                   AS duplication_factor,
               CAST(max(copies) AS BIGINT) AS max_copies
        FROM g GROUP BY source
    """,
)
def quality_duplication_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source exact-duplication census — the FIRST report run on a
    new crawl slice before any dedup spend: how many docs, how many
    distinct contents, how much is redundant, the duplication factor
    (docs per distinct content), and the hottest clone count. This is
    the number that decides whether the corpus needs the cheap sha
    collapse (factor near the 30-50% crawl norm) or the full near-dup
    machinery, and per SOURCE because duplication is never uniform —
    one mirror-heavy domain routinely carries most of the redundancy.
    Two map-side-combined hash aggregates ((source, md5) then source);
    the content hash means the wide text column never shuffles —
    bytes-on-the-wire is hash-sized at any corpus scale. The ratio is
    one integer-quotient double, emitted UNROUNDED."""
    d = table(spark, sf_dir, "documents")
    g = d.groupBy("source", F.md5("text").alias("h")).agg(
        F.count("*").cast("long").alias("copies")
    )
    return g.groupBy("source").agg(
        F.sum("copies").cast("long").alias("n_docs"),
        F.count("*").cast("long").alias("n_distinct"),
        (F.sum("copies") - F.count("*")).cast("long").alias("n_redundant"),
        (
            F.sum("copies").cast("double") / F.count("*").cast("double")
        ).alias("duplication_factor"),
        F.max("copies").cast("long").alias("max_copies"),
    )


@register(
    "quality_join_fanout_census",
    sql="""
        WITH fan AS (
            SELECT o.o_orderkey, CAST(count(l.l_orderkey) AS BIGINT) AS fanout
            FROM orders o LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            GROUP BY o.o_orderkey
        ),
        bucketed AS (
            SELECT CASE WHEN fanout = 0 THEN -1
                        ELSE CAST(floor(log2(fanout)) AS BIGINT) END
                       AS log2_bucket,
                   fanout
            FROM fan
        )
        SELECT log2_bucket,
               CAST(count(*) AS BIGINT) AS n_keys,
               CAST(sum(fanout) AS BIGINT) AS n_rows,
               CAST(min(fanout) AS BIGINT) AS min_fanout,
               CAST(max(fanout) AS BIGINT) AS max_fanout
        FROM bucketed
        GROUP BY log2_bucket
    """,
)
def quality_join_fanout_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-fanout census for the workload's biggest join
    (orders->lineitem): how many lineitems each order key fans out to,
    histogrammed in log2 buckets (bucket -1 = childless keys). This is
    the profile a planner consults BEFORE running a 100 TB join — the
    skew decision (salting? AQE skew split? broadcast?) is made from
    exactly this distribution, and dedup/skew operators in this repo
    (join_skew_salted, join_skew_hotcold) assume someone measured it.

    Exactness: pure integer counting — per-key counts, log2 buckets
    via floor(log2(n)) on exact integers (log2 of an exact small int
    is ulp-safe: the nearest-double of log2(k) is never on a floor
    boundary for k < 2^40 unless k is a power of two, where log2 is
    EXACT in both engines). Scale shape: one co-partitioned count per
    key (the join's own shuffle), then a 40-row histogram aggregate."""
    o = table(spark, sf_dir, "orders").select("o_orderkey")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey")
    fan = (
        o.join(li, o.o_orderkey == li.l_orderkey, "left")
        .groupBy("o_orderkey")
        .agg(F.count("l_orderkey").cast("long").alias("fanout"))
    )
    bucket = F.when(F.col("fanout") == 0, F.lit(-1)).otherwise(
        F.floor(F.log2("fanout"))
    )
    return (
        fan.select(bucket.cast("long").alias("log2_bucket"), "fanout")
        .groupBy("log2_bucket")
        .agg(
            F.count("*").cast("long").alias("n_keys"),
            F.sum("fanout").cast("long").alias("n_rows"),
            F.min("fanout").cast("long").alias("min_fanout"),
            F.max("fanout").cast("long").alias("max_fanout"),
        )
    )


@register(
    "quality_cross_source_dups",
    sql="""
        WITH hashed AS (
            SELECT DISTINCT sha256(text) AS h, source FROM documents
        ),
        pairs AS (
            SELECT a.source AS source_a, b.source AS source_b
            FROM hashed a JOIN hashed b
              ON a.h = b.h AND a.source < b.source
        )
        SELECT source_a, source_b,
               CAST(count(*) AS BIGINT) AS n_shared_contents
        FROM pairs
        GROUP BY source_a, source_b
    """,
)
def quality_cross_source_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplicate flow: for every source pair, how many
    DISTINCT contents appear in both — the provenance matrix that
    tells a corpus curator who mirrors whom (a crawl that rehosts
    another source should be down-weighted or dropped wholesale, not
    deduped document-by-document; cf. sample_downweight_dups for the
    per-document treatment). Emitted as canonical (source_a <
    source_b) pairs with shared-content counts.

    Scale shape: content is hashed BEFORE any shuffle (the dedup-
    family invariant), collapsed to DISTINCT (hash, source) — bounded
    by distinct contents x sources, far below corpus grain — and the
    pair join keys on the content hash whose per-bucket size is at
    most #sources, so the join fan-out is structurally capped at
    C(#sources, 2) per content. Pure integer counting, hash-exact."""
    d = table(spark, sf_dir, "documents")
    hashed = d.select(
        F.sha2("text", 256).alias("h"), "source"
    ).distinct()
    a = hashed.select("h", F.col("source").alias("source_a"))
    b = hashed.select("h", F.col("source").alias("source_b"))
    pairs = a.join(b, "h").filter(F.col("source_a") < F.col("source_b"))
    return pairs.groupBy("source_a", "source_b").agg(
        F.count("*").cast("long").alias("n_shared_contents")
    )


@register(
    "quality_schema_drift",
    sql="""
        SELECT * FROM (VALUES
            ('doc_id',  'unchanged',    'bigint', 'bigint'),
            ('lang',    'removed',      'string', NULL),
            ('n_chars', 'type_changed', 'bigint', 'int'),
            ('quality', 'added',        NULL,     'double'),
            ('source',  'added',        NULL,     'string'),
            ('text',    'unchanged',    'string', 'string')
        ) AS t(column_name, status, from_type, to_type)
    """,
    eager=True,
)
def quality_schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCHEMA DRIFT detection between two snapshots of a table — the
    pre-merge gate an ingestion pipeline runs before appending a new
    crawl drop onto an existing corpus (silent column loss / type
    narrowing is how a 100 TB table quietly corrupts: parquet will
    happily union int32 and int64 footers until a reader asks). Two
    snapshot versions of the documents table are materialized (v2
    drops `lang`, narrows `n_chars` bigint->int, adds `source` and a
    computed `quality` double), both are read BACK so the diff runs
    on real parquet footers (not on what the writer intended), and
    the report classifies every column as added / removed /
    type_changed / unchanged with from/to types.

    Scale note: the diff consumes only file-footer METADATA — Spark's
    parquet schema merge reads footers, never data, so the gate costs
    O(#files) at any table size (and O(1) with a _common_metadata or
    catalog-backed schema). The snapshot writes here are fixture
    generation; a real deployment diffs two already-existing tables.
    The oracle pins the expected classification literally — drift in
    the drift detector itself fails the hash."""
    import tempfile as _tf

    docs = table(spark, sf_dir, "documents")
    base = _tf.mkdtemp(prefix="thsa_drift_")
    v1_dir, v2_dir = f"{base}/v1", f"{base}/v2"
    docs.select("doc_id", "text", "lang", "n_chars").limit(50).write.mode(
        "overwrite"
    ).parquet(v1_dir)
    docs.select(
        "doc_id",
        "text",
        F.col("n_chars").cast("int").alias("n_chars"),
        "source",
        (F.length("text") / F.lit(100.0)).alias("quality"),
    ).limit(50).write.mode("overwrite").parquet(v2_dir)
    s1 = {f.name: f.dataType.simpleString() for f in spark.read.parquet(v1_dir).schema}
    s2 = {f.name: f.dataType.simpleString() for f in spark.read.parquet(v2_dir).schema}
    rows = []
    for c in sorted(set(s1) | set(s2)):
        if c not in s2:
            rows.append((c, "removed", s1[c], None))
        elif c not in s1:
            rows.append((c, "added", None, s2[c]))
        elif s1[c] != s2[c]:
            rows.append((c, "type_changed", s1[c], s2[c]))
        else:
            rows.append((c, "unchanged", s1[c], s2[c]))
    return spark.createDataFrame(
        rows, "column_name string, status string, from_type string, to_type string"
    )


@register(
    "stat_cohens_kappa",
    sql="""
        WITH labeled AS (
            SELECT doc_id,
                   CASE WHEN len(string_split(text, ' ')) >= 40
                        THEN 'long' ELSE 'short' END AS rater_a,
                   CASE WHEN n_chars >= 220 THEN 'long' ELSE 'short' END
                       AS rater_b
            FROM documents
        ),
        m AS (
            SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(count(*) FILTER (WHERE rater_a = rater_b)
                        AS BIGINT) AS n_agree,
                   CAST(count(*) FILTER (WHERE rater_a = 'long')
                        AS BIGINT) AS a_long,
                   CAST(count(*) FILTER (WHERE rater_b = 'long')
                        AS BIGINT) AS b_long
            FROM labeled
        )
        SELECT n, n_agree,
               CAST(n_agree AS DOUBLE) / n AS p_observed,
               (CAST(a_long AS DOUBLE) * b_long
                + CAST(n - a_long AS DOUBLE) * (n - b_long))
                   / (CAST(n AS DOUBLE) * n) AS p_expected,
               (CAST(n_agree AS DOUBLE) / n
                - (CAST(a_long AS DOUBLE) * b_long
                   + CAST(n - a_long AS DOUBLE) * (n - b_long))
                      / (CAST(n AS DOUBLE) * n))
               / (1 - (CAST(a_long AS DOUBLE) * b_long
                       + CAST(n - a_long AS DOUBLE) * (n - b_long))
                          / (CAST(n AS DOUBLE) * n)) AS kappa
        FROM m
    """,
)
def stat_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COHEN'S KAPPA inter-rater agreement — the metric an annotation
    pipeline reports before trusting labels (raw agreement overstates
    reliability when one class dominates; kappa corrects for the
    agreement two raters reach by chance). Raters here are two
    deterministic labelers that disagree on real rows — a token-count
    rule vs a char-count rule for 'long' documents — standing in for
    the model-vs-heuristic comparison an eval-ops readout runs.

    Exactness: the confusion counts are exact integers from ONE
    map-side-combined aggregate; p_o, p_e, and kappa are the IDENTICAL
    fully-parenthesized double expression on both engines (the
    stat_regr_multi discipline) so all three ship unrounded. Scale
    shape: one corpus scan, one 1-row result — kappa at 100 TB costs
    exactly one aggregate."""
    d = table(spark, sf_dir, "documents")
    labeled = d.select(
        F.when(F.size(F.split("text", " ")) >= 40, "long")
        .otherwise("short")
        .alias("rater_a"),
        F.when(F.col("n_chars") >= 220, "long").otherwise("short").alias(
            "rater_b"
        ),
    )
    m = labeled.agg(
        F.count("*").alias("n"),
        F.count_if(F.col("rater_a") == F.col("rater_b")).alias("n_agree"),
        F.count_if(F.col("rater_a") == "long").alias("a_long"),
        F.count_if(F.col("rater_b") == "long").alias("b_long"),
    )
    n = F.col("n").cast("double")
    po = F.col("n_agree").cast("double") / F.col("n")
    pe = (
        F.col("a_long").cast("double") * F.col("b_long")
        + (F.col("n") - F.col("a_long")).cast("double")
        * (F.col("n") - F.col("b_long"))
    ) / (n * F.col("n"))
    return m.select(
        "n",
        "n_agree",
        po.alias("p_observed"),
        pe.alias("p_expected"),
        ((po - pe) / (F.lit(1) - pe)).alias("kappa"),
    )


#: PSI bucketing: fixed integer-cent edges (value in [0, 100] in the
#: fixture), and the reference/current halves split mid-month.
PSI_BUCKETS = 10
PSI_SPLIT_DAY = 16


@register(
    "quality_drift_psi",
    sql=f"""
        WITH labeled AS (
            SELECT CAST(least(floor(value / 10.0),
                              {PSI_BUCKETS - 1}) AS INTEGER) AS bucket,
                   CASE WHEN day(ts) < {PSI_SPLIT_DAY}
                        THEN 'ref' ELSE 'cur' END AS half
            FROM events WHERE event_type = 'purchase'
        ),
        counts AS (
            SELECT bucket,
                   CAST(count(*) FILTER (WHERE half = 'ref') AS BIGINT)
                       AS n_ref,
                   CAST(count(*) FILTER (WHERE half = 'cur') AS BIGINT)
                       AS n_cur
            FROM labeled GROUP BY bucket
        ),
        tot AS (
            SELECT CAST(sum(n_ref) AS BIGINT) AS t_ref,
                   CAST(sum(n_cur) AS BIGINT) AS t_cur
            FROM counts
        )
        SELECT c.bucket, c.n_ref, c.n_cur,
               (CAST(c.n_cur AS DOUBLE) / t.t_cur
                - CAST(c.n_ref AS DOUBLE) / t.t_ref)
               * ln((CAST(c.n_cur AS DOUBLE) / t.t_cur)
                    / (CAST(c.n_ref AS DOUBLE) / t.t_ref)) AS psi_term
        FROM counts c, tot t
        WHERE c.n_ref > 0 AND c.n_cur > 0
    """,
)
def quality_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POPULATION STABILITY INDEX — the ML-ops drift gate: how far the
    current window's score distribution moved from the reference
    window, per bucket. PSI = sum over buckets of
    (p_cur - p_ref) * ln(p_cur / p_ref); the standard alert levels
    read the total (>0.1 investigate, >0.25 act). Demonstrated on
    purchase values split mid-month (ref = days 1-15, cur = rest).

    Exactness discipline: the output is PER-BUCKET — exact integer
    counts plus the unrounded psi_term, which is ONE fixed expression
    over exact operands (two single divisions, one subtraction, one
    ln, one multiply — deterministic IEEE on both engines). The TOTAL
    is deliberately left to the consumer: summing ~10 doubles has an
    engine-dependent order in a groupBy, while per-row terms are
    bit-exact — the same reasoning that keeps per-row doubles
    unrounded repo-wide. Scale shape: one scan, one 10-cell aggregate,
    a broadcastable 1-row totals join — PSI at 100 TB costs one pass."""
    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    labeled = ev.select(
        F.least(
            F.floor(F.col("value") / 10.0), F.lit(PSI_BUCKETS - 1)
        )
        .cast("int")
        .alias("bucket"),
        F.when(F.dayofmonth("ts") < PSI_SPLIT_DAY, "ref")
        .otherwise("cur")
        .alias("half"),
    )
    counts = labeled.groupBy("bucket").agg(
        F.count_if(F.col("half") == "ref").alias("n_ref"),
        F.count_if(F.col("half") == "cur").alias("n_cur"),
    )
    tot = counts.agg(
        F.sum("n_ref").alias("t_ref"), F.sum("n_cur").alias("t_cur")
    )
    p_cur = F.col("n_cur").cast("double") / F.col("t_cur")
    p_ref = F.col("n_ref").cast("double") / F.col("t_ref")
    return (
        counts.crossJoin(F.broadcast(tot))
        .filter((F.col("n_ref") > 0) & (F.col("n_cur") > 0))
        .select(
            "bucket",
            "n_ref",
            "n_cur",
            ((p_cur - p_ref) * F.log(p_cur / p_ref)).alias("psi_term"),
        )
    )
