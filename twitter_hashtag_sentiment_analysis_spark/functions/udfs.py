"""UDF / UDAF / UDTF surface (SURVEY §2B).

The reference's only "UDF" is the per-record Lambda transform
(ProcessStreamData.py:12-33) — one Comprehend HTTPS call per record.
Spark-first, the Python boundary is Arrow-batched (pandas_udf /
applyInPandas): one columnar batch per partition instead of one call
per row — the 10-100x difference SURVEY §3.1 points at.

Every entry here still ships a DuckDB oracle: the UDFs are
deterministic column math, so SQL can replicate them — which is exactly
what proves the Arrow path computes the same thing the JVM path would.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import table
from ..registry import register


def round_half_away(s: "pd.Series", digits: int) -> "pd.Series":
    """Spark/DuckDB ROUND semantics: half away from zero. numpy rounds
    half to even, and floor(v + 0.5) rounds negative halves toward
    +infinity — both would mismatch the oracle on an exact .5."""
    import numpy as np

    scale = 10.0 ** digits
    v = s * scale
    return np.copysign(np.floor(np.abs(v) + 0.5), v) / scale


@register(
    "udf_pandas_scalar",
    sql="""
        SELECT doc_id,
               round(n_chars / (len(string_split(text, ' ')) + 1.0), 4) AS density
        FROM documents
    """,
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized Series->Series scorer via Arrow (chars per token).
    One Arrow batch per partition crosses the Python boundary; the
    pandas ops inside are C-speed. This is the mandated shape for any
    Python logic on a 100 TB hot path."""
    @F.pandas_udf("double")
    def density(n_chars: pd.Series, text: pd.Series) -> pd.Series:
        d = n_chars / (text.str.split(" ").str.len() + 1.0)
        return round_half_away(d, 4)

    d = table(spark, sf_dir, "documents")
    return d.select("doc_id", density("n_chars", "text").alias("density"))


@register(
    "udf_grouped_map",
    sql="""
        SELECT o_orderkey, o_orderstatus,
               round((o_totalprice - avg(o_totalprice) OVER (PARTITION BY o_orderstatus))
                     / stddev_samp(o_totalprice) OVER (PARTITION BY o_orderstatus), 4) AS z_score
        FROM orders
    """,
)
def udf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group normalization via applyInPandas (grouped-map): each
    group becomes one pandas DataFrame in a Python worker. Groups are
    o_orderstatus (3 values) — fine here, but the docstring caveat for
    100 TB: grouped-map materializes a whole group per worker, so keys
    must be chosen with bounded group size (or use window functions,
    which stream)."""
    o = table(spark, sf_dir, "orders")

    def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
        mean = pdf["o_totalprice"].mean()
        std = pdf["o_totalprice"].std(ddof=1)
        z = (pdf["o_totalprice"] - mean) / std
        pdf = pdf[["o_orderkey", "o_orderstatus"]].copy()
        pdf["z_score"] = round_half_away(z, 4)
        return pdf

    return o.groupBy("o_orderstatus").applyInPandas(
        normalize, schema="o_orderkey long, o_orderstatus string, z_score double"
    )


@register(
    "udf_grouped_agg",
    sql="""
        SELECT l_returnflag,
               round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4) AS weighted_avg_price
        FROM lineitem
        GROUP BY l_returnflag
    """,
)
def udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom UDAF via pandas_udf GROUPED_AGG: quantity-weighted mean
    price. Arrow-batched partial aggregation per group."""

    @F.pandas_udf("double")
    def weighted_mean(price: pd.Series, qty: pd.Series) -> float:
        return float((price * qty).sum() / qty.sum())

    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(weighted_mean("l_extendedprice", "l_quantity"), 4).alias(
            "weighted_avg_price"
        )
    )


@register(
    "udtf_explode_tokens",
    sql="""
        SELECT doc_id,
               unnest(string_split(text, ' ')) AS token,
               CAST(generate_subscripts(string_split(text, ' '), 1) AS INTEGER) AS pos
        FROM documents
    """,
)
def udtf_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1->N expansion (tokenizer as a table function): posexplode over
    split. Pure built-in — no Python worker despite being the 'UDTF'
    surface; Spark's generator expressions run inside codegen."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "token")
    ).select("doc_id", "token", (F.col("pos0") + 1).cast("int").alias("pos"))


#: Sliding-window chunking constants: CHUNK tokens per chunk, starts
#: every STRIDE tokens, stop after the first chunk that reaches EOD.
CHUNK_TOKENS = 32
CHUNK_STRIDE = 16


@register(
    "udtf_chunk_text",
    sql=f"""
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS toks,
                   len(string_split(text, ' ')) AS n
            FROM documents WHERE doc_id < 1000
        ),
        starts AS (
            SELECT doc_id, toks, n, unnest(range(0, n, {CHUNK_STRIDE})) AS s
            FROM t
        )
        SELECT doc_id,
               CAST(s / {CHUNK_STRIDE} AS INTEGER) AS chunk_idx,
               CAST(least(s + {CHUNK_TOKENS}, n) - s AS INTEGER) AS n_tokens,
               array_to_string(toks[s + 1 : least(s + {CHUNK_TOKENS}, n)], ' ')
                   AS chunk
        FROM starts
        WHERE s = 0 OR s - {CHUNK_STRIDE} + {CHUNK_TOKENS} < n
    """,
)
def udtf_chunk_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL Python UDTF (Spark 4 ``@udtf`` + LATERAL): sliding-window
    token chunking — the LLM-training prep step that turns documents
    into overlapping context windows (32 tokens, stride 16, stop once
    a chunk reaches end-of-doc). A generator expression could emit
    fixed windows, but the data-dependent stop rule is exactly the
    imperative 1->N logic the UDTF surface exists for. Pickled rows,
    NOT Arrow (r15): eval() is per-row either way (guide §4.1) and the
    Arrow wrapper's per-row pandas conversion measured ~5x slower on
    the sibling udtf_polymorphic_csv at sf0.1; the lateral join keeps
    the expansion partition-local — no shuffle.
    Exact oracle: the same windows via range/unnest in DuckDB."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx int, n_tokens int, chunk string")
    class ChunkText:
        def eval(self, text: str):
            toks = text.split(" ")
            i, idx = 0, 0
            while i < len(toks):
                c = toks[i : i + CHUNK_TOKENS]
                yield idx, len(c), " ".join(c)
                if i + CHUNK_TOKENS >= len(toks):
                    break
                idx += 1
                i += CHUNK_STRIDE

    spark.udtf.register("chunk_text", ChunkText)
    table(spark, sf_dir, "documents").createOrReplaceTempView("_chunk_docs")
    return spark.sql(
        """
        SELECT doc_id, chunk_idx, n_tokens, chunk
        FROM _chunk_docs, LATERAL chunk_text(text)
        WHERE doc_id < 1000
        """
    )


@register(
    "udtf_polymorphic_csv",
    sql="""
        SELECT event_id, event_type,
               floor(value * 100 + 0.5) / 100 AS value2
        FROM events
        WHERE event_id % 7 = 0
    """,
)
def udtf_polymorphic_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POLYMORPHIC Python UDTF (Spark 4 ``analyze()``): the output
    schema is not declared statically — it is computed at plan time
    from the DDL string passed as the first argument, the
    schema-on-read pattern (a CSV/log parser whose caller names the
    columns) that static UDTFs cannot express. ``analyze`` receives
    the constant argument and returns AnalyzeResult(DDL schema), so
    Catalyst plans column pruning/downstream ops against the dynamic
    shape like any other relation. The eval path parses each line to
    the declared types (int/string/double here). Lines are built
    deterministically from the events table and values pre-rounded
    with the engine-identical floor form so the float survives the
    string roundtrip exactly; the oracle recomputes the same
    projection relationally. Pickled rows, NOT Arrow (r15 — see the
    @udtf comment below); the lateral expansion is partition-local
    (no shuffle)."""
    from pyspark.sql.functions import lit, udtf
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    # analyze() runs in a session-less Python process, so the DDL is
    # assembled textually ("name type, ..."), not via StructType.fromDDL
    _TYPES = {
        "bigint": LongType(),
        "int": IntegerType(),
        "string": StringType(),
        "double": DoubleType(),
    }

    # NOT Arrow-serialized (r15): a measured A/B at sf0.1 put the
    # Arrow UDTF path at 3.4 s against 0.64 s for the default pickled
    # path on this 14k-row lateral join — per-row eval() dominates a
    # UDTF either way (guide §4.1), and the Arrow wrapper adds a
    # pandas conversion per row on top. Values are identical: eval
    # returns exactly the declared types, so pickle/Arrow coercion
    # differences never engage.
    @udtf
    class ParseCsv:
        @staticmethod
        def analyze(
            schema: AnalyzeArgument, line: AnalyzeArgument
        ) -> AnalyzeResult:
            fields = []
            for part in schema.value.split(","):
                name, typ = part.strip().rsplit(" ", 1)
                fields.append(StructField(name, _TYPES[typ]))
            return AnalyzeResult(StructType(fields))

        def __init__(self):
            self._fields = None

        def eval(self, schema: str, line: str):
            if self._fields is None:
                # no SparkSession exists on the worker, so the DDL is
                # split textually ("name type, ..."), not via fromDDL
                self._fields = [
                    part.strip().rsplit(" ", 1)[1]
                    for part in schema.split(",")
                ]
            parts = line.split(",")
            row = []
            for typ, raw in zip(self._fields, parts):
                if typ in ("bigint", "int"):
                    row.append(int(raw))
                elif typ == "double":
                    row.append(float(raw))
                else:
                    row.append(raw)
            yield tuple(row)

    ev = table(spark, sf_dir, "events").filter(F.col("event_id") % 7 == 0)
    lines = ev.select(
        F.concat_ws(
            ",",
            F.col("event_id"),
            F.col("event_type"),
            (F.floor(F.col("value") * 100 + 0.5) / 100).cast("string"),
        ).alias("line")
    )
    ddl = "event_id bigint, event_type string, value2 double"
    return lines.lateralJoin(
        ParseCsv(lit(ddl), F.col("line").outer())
    ).drop("line")


@register(
    "udf_grouped_arrow",
    sql="""
        SELECT doc_id, lang,
               CAST(n_chars - min(n_chars) OVER (PARTITION BY lang)
                    AS BIGINT) AS chars_above_min,
               CAST(count(*) OVER (PARTITION BY lang) AS BIGINT)
                   AS group_n
        FROM documents
    """,
)
def udf_grouped_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map via ``applyInArrow`` (Spark 4.1): each group arrives
    as a pyarrow.Table and the kernel runs pyarrow.compute — NO pandas
    boxing at all, the same zero-copy win mapInArrow (mm_arrow_batch)
    gives the ungrouped path. For integer/fixed-width kernels this
    skips pandas' object-boxing entirely and keeps null semantics
    exact (pandas silently promotes int64-with-null to float64; Arrow
    does not — the classic grouped-map dtype corruption this API
    closes). The kernel subtracts the per-group minimum doc length —
    exact integer arithmetic, so the oracle is a plain window.

    Same 100 TB caveat as every grouped-map: one whole group
    materializes per worker call, so the key must bound group size
    (lang: 5 groups here; a production run keys by (lang, shard)).
    Where a window function CAN express the kernel — like this
    demonstrator — the window is the better plan; applyInArrow earns
    its place when the per-group logic needs real Python (tokenizers,
    per-group model inference) over fixed-width batches."""
    import pyarrow as pa
    import pyarrow.compute as pc

    d = table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")

    def rebase(tbl: pa.Table) -> pa.Table:
        mn = pc.min(tbl["n_chars"])
        return pa.table(
            {
                "doc_id": tbl["doc_id"],
                "lang": tbl["lang"],
                "chars_above_min": pc.subtract(tbl["n_chars"], mn),
                "group_n": pa.array(
                    [tbl.num_rows] * tbl.num_rows, type=pa.int64()
                ),
            }
        )

    return d.groupBy("lang").applyInArrow(
        rebase,
        schema="doc_id long, lang string, chars_above_min long, group_n long",
    )


@register(
    "udf_cogrouped_map",
    sql="""
        WITH o AS (
            SELECT o_custkey,
                   CAST(count(*) AS BIGINT) AS n_orders,
                   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS order_cents
            FROM orders GROUP BY o_custkey
        )
        SELECT c.c_custkey,
               CAST(coalesce(o.n_orders, 0) AS BIGINT) AS n_orders,
               CAST(coalesce(o.order_cents, 0) AS BIGINT) AS order_cents,
               CAST(round(c.c_acctbal * 100) AS BIGINT) AS acctbal_cents
        FROM customer c LEFT JOIN o ON c.c_custkey = o.o_custkey
        WHERE c.c_custkey % 50 = 0
    """,
)
def udf_cogrouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COGROUPED map (``groupBy(...).cogroup(...).applyInPandas``) —
    the two-sided grouped-map API: both relations shuffle on the key
    and the kernel receives each key's TWO group slices as separate
    pandas frames, letting Python express join-like per-key logic no
    single-input UDF can (custom as-of matching, per-key
    reconciliation, model-vs-actual diffs). Kernel here: reconcile a
    customer's profile slice with their order slice into exact
    integer-cents totals — chosen so a plain LEFT JOIN + aggregate is
    the oracle and every cent hash-checks; keys with an EMPTY side
    still invoke the kernel (pinned by the zero-fill rows the oracle's
    LEFT JOIN reproduces — the semantic a real reconciliation needs).

    Scale: one co-partitioned shuffle per side (the same exchange a
    join would plan); per-key slices must be bounded like any
    grouped-map. The honest COST note (measured): the kernel is
    invoked once per key, so tiny groups pay per-call Python dispatch
    (~2 ms/key measured at 5x) — near-linear in KEY count. Where the
    per-key logic is expressible as a join+agg (like this
    demonstrator), the join is the production plan; cogroup earns its
    dispatch cost only when each key needs real Python over its two
    slices. The deterministic 1-in-50 customer slice keeps the fixture
    group count civil without changing the shape."""
    import pandas as pd

    cust = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 50 == 0)
        .select("c_custkey", "c_acctbal")
    )
    # r15 (guide §2.4, remove shuffles outright): the order side used a
    # left-semi join against the customer slice to prefilter — a whole
    # extra join for a predicate the key already encodes. The modulo
    # filter is pushed into the scan instead; an o_custkey % 50 == 0
    # absent from customer (none exist under FK integrity, but the
    # kernel doesn't rely on that) reaches reconcile() with an empty
    # customer slice and returns zero rows — exactly what the semi-join
    # produced by dropping it earlier.
    orders = table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    ).filter(F.col("o_custkey") % 50 == 0)

    def reconcile(cpdf: pd.DataFrame, opdf: pd.DataFrame) -> pd.DataFrame:
        if cpdf.empty:  # order-side-only key: outside the slice
            return pd.DataFrame(
                columns=["c_custkey", "n_orders", "order_cents", "acctbal_cents"]
            )
        cents = (opdf["o_totalprice"] * 100).round().astype("int64")
        return pd.DataFrame(
            {
                "c_custkey": [int(cpdf["c_custkey"].iloc[0])],
                "n_orders": [len(opdf)],
                "order_cents": [int(cents.sum()) if len(opdf) else 0],
                "acctbal_cents": [
                    int(round(float(cpdf["c_acctbal"].iloc[0]) * 100))
                ],
            }
        )

    return (
        cust.groupBy("c_custkey")
        .cogroup(orders.groupBy("o_custkey"))
        .applyInPandas(
            reconcile,
            schema=(
                "c_custkey long, n_orders long, order_cents long,"
                " acctbal_cents long"
            ),
        )
    )
