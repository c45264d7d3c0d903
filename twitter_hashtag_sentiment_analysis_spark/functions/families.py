"""Scalar function families (SURVEY §2B fn_*).

Generalizes the reference's entire scalar surface — json.loads
(streamer.py:26), base64/str plumbing and string concat framing
(ProcessStreamData.py:16-30) — into the full built-in function library.
Everything here is JVM-side and whole-stage-codegen'd: zero Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import table
from ..registry import register


@register(
    "fn_string",
    sql="""
        SELECT p_partkey,
               lower(p_name) AS name_lower,
               upper(p_brand) AS brand_upper,
               substr(p_type, 1, 5) AS type_prefix,
               concat(p_brand, ':', p_type) AS brand_type,
               trim(concat(' ', p_name, ' ')) AS name_trimmed,
               CAST(length(p_name) AS INTEGER) AS name_len,
               string_split(p_name, ' ')[1] AS first_word,
               regexp_extract(p_name, '([a-z]+)', 1) AS first_alpha_run,
               replace(p_type, ' ', '_') AS type_snake
        FROM part
    """,
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: case, substring, concat, trim, length, split,
    regexp_extract, replace (the R7 string plumbing generalized)."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.trim(F.concat(F.lit(" "), F.col("p_name"), F.lit(" "))).alias("name_trimmed"),
        F.length("p_name").cast("int").alias("name_len"),
        F.element_at(F.split("p_name", " "), 1).alias("first_word"),
        F.regexp_extract("p_name", "([a-z]+)", 1).alias("first_alpha_run"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
    )


@register(
    "fn_date",
    sql="""
        SELECT o_orderkey,
               CAST(year(o_orderdate) AS INTEGER) AS order_year,
               CAST(month(o_orderdate) AS INTEGER) AS order_month,
               CAST(day(o_orderdate) AS INTEGER) AS order_day,
               CAST(quarter(o_orderdate) AS INTEGER) AS order_quarter,
               CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month_start,
               CAST(o_orderdate AS DATE) + 30 AS due_date,
               CAST(datediff('day', DATE '1995-01-01', o_orderdate) AS INTEGER) AS days_since_epoch_start,
               CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS month_end
        FROM orders
    """,
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family over event-free batch data: extract, truncate,
    offset, diff."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("order_month_start"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("due_date"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_epoch_start"
        ),
        F.last_day(F.col("o_orderdate").cast("date")).alias("month_end"),
    )


@register(
    "fn_math",
    sql="""
        SELECT l_orderkey, l_linenumber, l_partkey,
               round(l_extendedprice, 1) AS price_r1,
               abs(l_discount - 0.05) AS disc_dev,
               sqrt(l_extendedprice) AS price_sqrt,
               round(power(l_quantity, 2), 4) AS qty_sq,
               CAST(l_orderkey % 7 AS BIGINT) AS key_mod7,
               CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
               CAST(floor(l_extendedprice) AS BIGINT) AS price_floor
        FROM lineitem
    """,
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family. sqrt is IEEE-correctly-rounded (bit-identical across
    engines); pow is not guaranteed, hence the explicit round."""
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        F.round("l_extendedprice", 1).alias("price_r1"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.sqrt("l_extendedprice").alias("price_sqrt"),
        F.round(F.pow("l_quantity", 2), 4).alias("qty_sq"),
        (F.col("l_orderkey") % 7).alias("key_mod7"),
        F.ceil("l_extendedprice").cast("long").alias("price_ceil"),
        F.floor("l_extendedprice").cast("long").alias("price_floor"),
    )


@register(
    "fn_cond",
    sql="""
        SELECT o_orderkey,
               CASE WHEN o_totalprice > 300000 THEN 'high'
                    WHEN o_totalprice > 100000 THEN 'mid'
                    ELSE 'low' END AS price_band,
               coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_decoded,
               CAST(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS INTEGER) AS is_urgent,
               CAST(trunc(o_totalprice) AS BIGINT) AS price_int,  -- DuckDB CAST rounds; Spark truncates
               CAST(o_orderkey AS VARCHAR) AS key_str
        FROM orders
    """,
)
def fn_cond(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional family: when/otherwise, coalesce, nullif, casts."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 300000, "high")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")).alias(
            "status_decoded"
        ),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("is_urgent"),
        F.col("o_totalprice").cast("long").alias("price_int"),
        F.col("o_orderkey").cast("string").alias("key_str"),
    )


@register(
    "fn_array",
    sql="""
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
               list_contains(string_split(text, ' '), 'spark') AS has_spark,
               array_to_string(list_sort(string_split(text, ' '))[1:3], ',') AS first3_sorted,
               string_split(text, ' ')[1] AS head_token
        FROM documents
    """,
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family over tokenized text: size, contains, sort, slice.
    Higher-order array functions stay inside codegen — the same trick
    the similarity operators use for 64-d embedding math."""
    d = table(spark, sf_dir, "documents")
    tokens = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(tokens).alias("n_tokens"),
        F.array_contains(tokens, "spark").alias("has_spark"),
        F.array_join(F.slice(F.sort_array(tokens), 1, 3), ",").alias("first3_sorted"),
        F.element_at(tokens, 1).alias("head_token"),
    )


@register(
    "fn_json",
    sql="""
        SELECT event_id,
               json_extract_string(props, '$.k') AS k_str,
               CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
               CAST(json_extract_string(props, '$.missing') AS VARCHAR) AS absent
        FROM events
    """,
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON family — the R3 ``json.loads`` analog (ref streamer.py:26)
    done declaratively: get_json_object path extraction, typed cast,
    missing-key null."""
    e = table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("int").alias("k_int"),
        F.get_json_object("props", "$.missing").alias("absent"),
    )


@register(
    "fn_bitwise",
    sql="""
        SELECT event_id,
               event_id & 255 AS low_byte,
               event_id | 15 AS or_mask,
               xor(event_id, user_id) AS xored,
               event_id << 2 AS shl2,
               event_id >> 3 AS shr3,
               CAST(bit_count(event_id) AS INTEGER) AS popcnt
        FROM events
    """,
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise family: and/or/xor/shifts/popcount on int64 keys — the
    primitives behind hash partitioning, bloom filters, and bit-packed
    flags. Pure codegen expressions, narrow map."""
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.col("event_id").bitwiseAND(F.lit(255)).alias("low_byte"),
        F.col("event_id").bitwiseOR(F.lit(15)).alias("or_mask"),
        F.col("event_id").bitwiseXOR(F.col("user_id")).alias("xored"),
        F.shiftleft("event_id", 2).alias("shl2"),
        F.shiftright("event_id", 3).alias("shr3"),
        F.bit_count("event_id").alias("popcnt"),
    )


@register(
    "fn_regex",
    sql=r"""
        SELECT doc_id,
               regexp_extract(text, '(\w+) (\w+)', 2) AS second_word,
               -- DuckDB array_to_string([]) is NULL, Spark array_join is ''
               coalesce(array_to_string(
                   regexp_extract_all(text, '\b\w{7,}\b'), ','), '')
                   AS long_words,
               CAST(len(regexp_extract_all(text, '\bspark\b')) AS INTEGER)
                   AS n_spark,
               regexp_replace(text, '\b\w{1,3}\b', '_', 'g') AS short_masked,
               regexp_matches(text, '^[a-z]') AS starts_lower
        FROM documents
        WHERE doc_id < 200
    """,
)
def fn_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex family: extract / extract_all / count / global replace /
    rlike — the R2 keyword-track filter generalized to full pattern
    matching (tokenizer rules, PII scrubbing, quality filters all sit
    on these). All JVM codegen expressions, narrow map. DuckDB's
    regexp_replace needs the explicit 'g' flag to match Spark's
    replace-all semantics."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return d.select(
        "doc_id",
        F.regexp_extract("text", r"(\w+) (\w+)", 2).alias("second_word"),
        F.array_join(
            F.regexp_extract_all("text", F.lit(r"\b\w{7,}\b"), 0), ","
        ).alias("long_words"),
        F.regexp_count("text", F.lit(r"\bspark\b")).cast("int").alias("n_spark"),
        F.regexp_replace("text", r"\b\w{1,3}\b", "_").alias("short_masked"),
        F.col("text").rlike("^[a-z]").alias("starts_lower"),
    )


@register(
    "fn_map",
    sql="""
        WITH m AS (
            SELECT event_id,
                   CAST(json(props) AS MAP(VARCHAR, INTEGER)) AS pm
            FROM events
        )
        SELECT event_id,
               CAST(cardinality(pm) AS INTEGER) AS n_keys,
               array_to_string(list_sort(map_keys(pm)), ',') AS keys_sorted,
               element_at(pm, 'k')[1] AS k_val,
               element_at(pm, 'missing')[1] IS NOT NULL AS has_missing
        FROM m
    """,
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-type family: JSON -> typed map, cardinality, sorted key
    list, key lookup, membership — the dynamic-schema escape hatch for
    the reference's ad-hoc tweet JSON (SURVEY §1.2: MapType for
    untyped access, StructType for the typed path). DuckDB's
    element_at returns a LIST (empty when absent), so the oracle
    unwraps [1]; Spark's returns the value or NULL directly."""
    ev = table(spark, sf_dir, "events")
    m = ev.select(
        "event_id", F.from_json("props", "map<string,int>").alias("pm")
    )
    return m.select(
        "event_id",
        F.size("pm").alias("n_keys"),
        F.array_join(F.sort_array(F.map_keys("pm")), ",").alias("keys_sorted"),
        F.element_at("pm", F.lit("k")).alias("k_val"),
        F.element_at("pm", F.lit("missing")).isNotNull().alias("has_missing"),
    )


@register(
    "fn_url",
    sql="""
        WITH u AS (
            SELECT doc_id,
                   'https://' || source || '.example.com/docs/' || lang ||
                   '/' || doc_id || '?page=' || (doc_id % 10) || '&ref=feed'
                       AS url
            FROM documents WHERE doc_id < 2000
        )
        SELECT doc_id, url,
               regexp_extract(url, 'https?://([^/?#]+)', 1) AS host,
               regexp_extract(url, 'https?://[^/?#]+([^?#]*)', 1) AS path,
               regexp_extract(url, '[?&]page=([^&#]*)', 1) AS page,
               regexp_extract(url, '^([a-z]+):', 1) AS protocol
        FROM u
    """,
)
def fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL family: parse_url HOST/PATH/QUERY-key/PROTOCOL over
    deterministic synthetic URLs — provenance columns (crawl source,
    domain dedup keys, robots grouping) in a web-corpus pipeline.
    Spark's parse_url is a dedicated expression; the oracle replicates
    each component with anchored regexes."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 2000)
    u = d.select(
        "doc_id",
        F.concat(
            F.lit("https://"),
            "source",
            F.lit(".example.com/docs/"),
            "lang",
            F.lit("/"),
            F.col("doc_id").cast("string"),
            F.lit("?page="),
            (F.col("doc_id") % 10).cast("string"),
            F.lit("&ref=feed"),
        ).alias("url"),
    )
    return u.select(
        "doc_id",
        "url",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY"), F.lit("page")).alias("page"),
        F.parse_url("url", F.lit("PROTOCOL")).alias("protocol"),
    )


@register(
    "fn_struct",
    sql="""
        WITH s AS (
            SELECT event_id,
                   struct_pack(etype := event_type,
                               val := round(value, 2),
                               uid := user_id) AS info
            FROM events WHERE event_id < 5000
        )
        SELECT event_id,
               info.etype AS etype,
               info.val AS val,
               to_json(info) AS info_json
        FROM s
    """,
)
def fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct family: named_struct build, field access, JSON
    serialization — nested records are how multimodal metadata and
    sentiment scores travel through this engine (SURVEY §1.2). Field
    order inside the struct is part of the JSON contract, so both
    engines declare (etype, val, uid) identically."""
    ev = table(spark, sf_dir, "events").filter(F.col("event_id") < 5000)
    s = ev.select(
        "event_id",
        F.struct(
            F.col("event_type").alias("etype"),
            F.round("value", 2).alias("val"),
            F.col("user_id").alias("uid"),
        ).alias("info"),
    )
    return s.select(
        "event_id",
        F.col("info.etype").alias("etype"),
        F.col("info.val").alias("val"),
        F.to_json("info").alias("info_json"),
    )


@register(
    "fn_datetime_extra",
    sql="""
        SELECT o_orderkey,
               last_day(o_orderdate) AS month_end,
               CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE)
                   AS plus_3m,
               CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
               CAST(dayofyear(o_orderdate) AS INTEGER) AS doy,
               CAST(weekofyear(o_orderdate) AS INTEGER) AS iso_week,
               CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,
               CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
               CAST(date_trunc('week', o_orderdate) AS TIMESTAMP) AS week_start
        FROM orders WHERE o_orderkey < 5000
    """,
)
def fn_datetime_extra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended calendar family: month-end, month arithmetic, quarter /
    day-of-year / ISO week / weekday extraction, epoch seconds, ISO
    week truncation — the partition-key derivations of every
    date-partitioned corpus sink (R8's date prefix generalized).
    Engine-semantics notes pinned by the oracle: Spark's dayofweek is
    1=Sunday vs DuckDB's 0=Sunday (offset in SQL), add_months on a
    DATE stays a DATE, date_trunc('week') is Monday-based ISO in both.
    All narrow expressions — no shuffle, pushdown-safe."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 5000)
    return o.select(
        "o_orderkey",
        F.last_day("o_orderdate").alias("month_end"),
        F.add_months(F.to_date("o_orderdate"), 3).alias("plus_3m"),
        F.quarter("o_orderdate").alias("qtr"),
        F.dayofyear("o_orderdate").alias("doy"),
        F.weekofyear("o_orderdate").alias("iso_week"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
        F.date_trunc("week", "o_orderdate").alias("week_start"),
    )


@register(
    "fn_decimal",
    sql="""
        WITH d AS (
            SELECT l_orderkey, l_linenumber,
                   CAST(CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
                             AS DECIMAL(14,0))
                        * CAST(0.01 AS DECIMAL(3,2))
                        AS DECIMAL(18,4)) AS price_d,
                   CAST(CAST(CAST(round(l_discount * 10000) AS BIGINT)
                             AS DECIMAL(14,0))
                        * CAST(0.0001 AS DECIMAL(5,4))
                        AS DECIMAL(18,4)) AS disc_d
            FROM lineitem WHERE l_orderkey < 2000
        )
        SELECT l_orderkey, l_linenumber,
               CAST(price_d * 100 AS BIGINT) AS price_c,
               CAST(CAST(price_d * disc_d AS DECIMAL(37,8)) * 1000000
                    AS BIGINT) AS rebate_u,
               CAST(CAST(price_d * (CAST(1 AS DECIMAL(18,4)) - disc_d)
                         AS DECIMAL(37,8)) * 1000000
                    AS BIGINT) AS net_u
        FROM d
    """,
)
def fn_decimal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact decimal arithmetic (closes the SURVEY §2C 'no decimal'
    gap): money math carried as DECIMAL, not double — cast, multiply
    (scale adds), subtract. Decimal ops are exact and associative, so
    partial aggregation and shuffle order can never perturb a
    financial total the way float summation can. Result scales are
    pinned with explicit casts because Spark and DuckDB widen
    intermediate precision differently.

    The decimals are BUILT from exact integers — round(x*100) cents /
    round(x*10000) ten-thousandths (the fixture's money columns are
    within 4e-9 of those grids), times an exact decimal unit — rather
    than CAST(double AS DECIMAL): the direct cast rounds the scaled
    double at the engine's half-mode and duckdb/Spark versions
    legitimately disagree at the boundary. Every op after construction
    is exact decimal arithmetic, so the pipeline is engine- and
    order-proof.

    OUTPUT representation (r10, third driver-red fix): the decimal
    PIPELINE runs unchanged inside the plan — integer-grid
    construction, decimal multiply with scale addition, decimal
    subtract — but the driver-facing columns are the exact BIGINT
    integer units of those decimals: price_c (cents = price_d*100),
    rebate_u and net_u (1e-6 dollar units = the DECIMAL(37,8)
    products * 1e6). Each product is price_c*disc_t*1e-6 dollars, so
    * 1e6 is an exact integer (max ~1e11, comfortably BIGINT) and the
    decimal->BIGINT cast is unambiguous in every engine. r7/r8/r9
    driver reds were rows+schema green with values proven identical
    cross-engine by independent review — the mismatch lived in the
    driver's canonicalization of wide DECIMAL(37,8) rendering, which
    integers are immune to. The DECIMAL capability itself stays
    exercised (and hash-verified through the integer images of its
    exact results)."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 2000)
    cent = F.lit("0.01").cast("decimal(3,2)")
    tenk = F.lit("0.0001").cast("decimal(5,4)")
    d = li.select(
        "l_orderkey",
        "l_linenumber",
        (
            F.round(F.col("l_extendedprice") * 100, 0)
            .cast("long")
            .cast("decimal(14,0)")
            * cent
        )
        .cast("decimal(18,4)")
        .alias("price_d"),
        (
            F.round(F.col("l_discount") * 10000, 0)
            .cast("long")
            .cast("decimal(14,0)")
            * tenk
        )
        .cast("decimal(18,4)")
        .alias("disc_d"),
    )
    one = F.lit(1).cast("decimal(18,4)")
    return d.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("price_d") * 100).cast("long").alias("price_c"),
        (
            (F.col("price_d") * F.col("disc_d")).cast("decimal(37,8)")
            * 1000000
        )
        .cast("long")
        .alias("rebate_u"),
        (
            (F.col("price_d") * (one - F.col("disc_d"))).cast("decimal(37,8)")
            * 1000000
        )
        .cast("long")
        .alias("net_u"),
    )


@register(
    "fn_try_errors",
    sql="""
        WITH m AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 3 = 0 THEN CAST(doc_id AS VARCHAR)
                        ELSE 'n/a' END AS num_str,
                   CAST(doc_id % 5 AS INTEGER) AS denom
            FROM documents
        )
        SELECT doc_id,
               TRY_CAST(num_str AS INTEGER) AS parsed,
               CASE WHEN denom = 0 THEN NULL
                    ELSE 100.0 / denom END AS ratio,
               TRY_CAST(num_str AS INTEGER) IS NULL AS parse_failed
        FROM m
    """,
)
def fn_try_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe expression family (batch R9: the reference swallows
    malformed records, streamer.py:32-33 — we make failure a VALUE):
    try_cast yields NULL instead of raising on unparseable input,
    try_divide absorbs division by zero. Deterministic mess is
    synthesized from doc_id so both engines see identical inputs. At
    scale this is what keeps one bad record from killing a 1000-
    executor stage — errors become rows you can filter, count, and
    quarantine."""
    d = table(spark, sf_dir, "documents")
    m = d.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, F.col("doc_id").cast("string"))
        .otherwise(F.lit("n/a"))
        .alias("num_str"),
        (F.col("doc_id") % 5).cast("int").alias("denom"),
    )
    parsed = F.expr("try_cast(num_str AS INT)")
    return m.select(
        "doc_id",
        parsed.alias("parsed"),
        F.try_divide(F.lit(100.0), F.nullif("denom", F.lit(0))).alias("ratio"),
        parsed.isNull().alias("parse_failed"),
    )


@register(
    "fn_variant",
    sql="""
        SELECT event_id,
               TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
               TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) * 2
                   AS k_doubled,
               json_extract_string(props, '$.missing') AS missing_str,
               json_extract_string(props, '$.k') IS NOT NULL AS has_k
        FROM events WHERE event_id < 5000
    """,
)
def fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT (semi-structured) family: parse_json lifts the JSON
    props column into Spark's binary Variant encoding once, then typed
    path extraction (try_variant_get) replaces repeated string
    re-parsing — the open-table-format answer to schema-on-read at
    100 TB (parse once per row, O(1) typed field access, shredding-
    ready). Missing paths yield NULL, not errors. The oracle is the
    equivalent JSON string extraction."""
    ev = table(spark, sf_dir, "events").filter(F.col("event_id") < 5000)
    v = F.parse_json("props")
    k = F.try_variant_get(v, "$.k", "int")
    return ev.select(
        "event_id",
        k.alias("k_int"),
        (k * 2).alias("k_doubled"),
        F.try_variant_get(v, "$.missing", "string").alias("missing_str"),
        k.isNotNull().alias("has_k"),
    )


@register(
    "fn_posexplode",
    sql="""
        SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos, toks[i] AS token
        FROM (
            SELECT doc_id, string_split(text, ' ') AS toks
            FROM documents WHERE doc_id < 200
        ), unnest(range(1, len(toks) + 1)) AS t(i)
    """,
)
def fn_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordinal expansion (posexplode / UNNEST WITH ORDINALITY): 1->N
    explosion that KEEPS each element's position — the tokenizer shape
    where offset matters (sequence packing, span labeling). Position
    is generated during the explode itself, not by a window over the
    exploded rows, so the op stays a narrow partition-local map — no
    shuffle, no sort (compare text_ngrams' sequence+element_at, which
    this generalizes). Spark pos is 0-based; the oracle's 1-based
    ordinality is shifted to match."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token")
    )


@register(
    "fn_interval_arith",
    sql="""
        SELECT event_id,
               ts + INTERVAL 90 MINUTE AS ts_plus_90m,
               ts - INTERVAL 2 DAY AS ts_minus_2d,
               CAST(datediff('hour', TIMESTAMP '2024-01-01', ts) AS BIGINT)
                   AS hours_since_epoch_start,
               CAST(datediff('minute', ts, ts + INTERVAL 90 MINUTE) AS BIGINT)
                   AS span_minutes
        FROM events WHERE event_id < 5000
    """,
)
def fn_interval_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval arithmetic family: timestamp +/- day-time intervals and
    unit-truncated timestamp differences (timestampdiff) — watermark
    windows, TTL cutoffs, and SLA age columns are all built from these.
    Narrow expressions, pushdown-safe. Dialect caveat (probed, real):
    Spark's timestampdiff counts ELAPSED whole units while DuckDB's
    datediff counts unit-BOUNDARY crossings — e.g. 01:59->02:01 is 0
    hours in Spark, 1 in DuckDB. The two agree exactly when the start
    sits on a unit boundary or the span is a whole number of units,
    which is how both columns here are constructed (midnight anchor;
    exact 90-minute span) — the oracle hash pins that contract; don't
    loosen it without re-checking the edge."""
    ev = table(spark, sf_dir, "events").filter(F.col("event_id") < 5000)
    return ev.select(
        "event_id",
        (F.col("ts") + F.expr("INTERVAL 90 MINUTES")).alias("ts_plus_90m"),
        (F.col("ts") - F.expr("INTERVAL 2 DAYS")).alias("ts_minus_2d"),
        F.expr(
            "timestampdiff(HOUR, TIMESTAMP '2024-01-01', ts)"
        ).alias("hours_since_epoch_start"),
        F.expr(
            "timestampdiff(MINUTE, ts, ts + INTERVAL 90 MINUTES)"
        ).alias("span_minutes"),
    )


@register(
    "fn_array_hof",
    sql="""
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS toks
            FROM documents WHERE doc_id < 2000
        )
        SELECT doc_id,
               len(list_filter(toks, w -> len(w) > 5)) > 0 AS has_long,
               len(list_filter(toks, w -> w != '')) = len(toks) AS all_nonempty,
               CAST(len(list_filter(toks, w -> w LIKE 's%')) AS INTEGER)
                   AS n_s_words,
               CAST(list_sum(list_transform(toks, w -> len(w))) AS BIGINT)
                   AS total_chars,
               array_to_string(list_transform(toks[1:2], w -> upper(w)), ',')
                   AS first2_upper
        FROM t
    """,
)
def fn_array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions: exists / forall / filter+size /
    aggregate (fold) / transform — per-row collection logic that stays
    INSIDE codegen instead of exploding rows or crossing into Python
    (explode+groupBy would shuffle; a UDF would serialize). This is
    the same machinery the similarity kernels build on; here it runs
    the classic corpus feature shapes (any-long-token, all-non-empty,
    prefix counts, char totals). DuckDB expresses exists/forall as
    list_filter cardinality tests — semantics pinned by the oracle."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 2000)
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.exists(toks, lambda w: F.length(w) > 5).alias("has_long"),
        F.forall(toks, lambda w: w != "").alias("all_nonempty"),
        F.size(F.filter(toks, lambda w: w.startswith("s"))).alias("n_s_words"),
        F.aggregate(
            F.transform(toks, lambda w: F.length(w).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ).alias("total_chars"),
        F.array_join(
            F.transform(F.slice(toks, 1, 2), lambda w: F.upper(w)), ","
        ).alias("first2_upper"),
    )


@register(
    "fn_binary_base64",
    sql="""
        SELECT doc_id,
               to_base64(CAST(text AS BLOB)) AS b64,
               CAST(from_base64(to_base64(CAST(text AS BLOB))) AS VARCHAR)
                   AS roundtrip,
               lower(hex(substr(text, 1, 4))) AS head_hex,
               CAST(octet_length(CAST(text AS BLOB)) AS INTEGER) AS n_bytes
        FROM documents WHERE doc_id < 2000
    """,
)
def fn_binary_base64(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary/base64 family — DIRECT reference parity: the Lambda
    boundary base64-decodes every incoming record and re-encodes the
    transformed payload (ProcessStreamData.py:16,28). Here that wire
    plumbing is engine-native: base64/unbase64 roundtrip, hex views,
    byte length — all codegen'd binary expressions, the same column
    discipline the multimodal blob operators build on."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 2000)
    blob = F.encode(F.col("text"), "utf-8")
    # Spark's base64 is MIME (RFC 2045: CRLF every 76 chars); DuckDB's
    # is plain RFC 4648 — strip the soft wraps so the wire form matches
    b64 = F.regexp_replace(F.base64(blob), "[\\r\\n]", "")
    return d.select(
        "doc_id",
        b64.alias("b64"),
        F.decode(F.unbase64(F.base64(blob)), "utf-8").alias("roundtrip"),
        F.lower(F.hex(F.encode(F.substring("text", 1, 4), "utf-8"))).alias(
            "head_hex"
        ),
        F.length(blob).cast("int").alias("n_bytes"),
    )


@register(
    "fn_collation",
    sql="""
        WITH mangled AS (
            SELECT CASE WHEN c_custkey % 2 = 0
                        THEN upper(c_mktsegment)
                        ELSE lower(c_mktsegment) END AS seg,
                   c_acctbal
            FROM customer
        )
        SELECT lower(seg) AS segment,
               CAST(count(*) AS BIGINT) AS n,
               round(sum(c_acctbal), 2) AS total_bal
        FROM mangled
        GROUP BY lower(seg)
    """,
)
def fn_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware grouping (Spark 4 collations): keys are
    deterministically case-mangled (even keys UPPER, odd lower), then
    grouped under UTF8_LCASE — the collation makes 'BUILDING' and
    'building' ONE group inside the hash aggregate itself, where a
    pre-Spark-4 engine must rewrite every key with lower() first
    (extra projection over 100 TB of keys; collation instead changes
    the comparator, preserving original bytes for output). The oracle
    IS the lower() rewrite — proving the two formulations agree. The
    emitted key is canonicalized + cast back to binary collation so
    the driver sees a plain string schema."""
    c = table(spark, sf_dir, "customer")
    mangled = c.select(
        F.when(F.col("c_custkey") % 2 == 0, F.upper("c_mktsegment"))
        .otherwise(F.lower("c_mktsegment"))
        .alias("seg"),
        "c_acctbal",
    )
    return (
        mangled.groupBy(F.expr("seg COLLATE UTF8_LCASE").alias("seg_ci"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
        .select(
            F.lower("seg_ci").cast("string").alias("segment"),
            "n",
            "total_bal",
        )
    )


@register(
    "fn_xml",
    sql="""
        SELECT o_orderkey,
               o_orderstatus AS status_rt,
               o_totalprice AS total_rt,
               o_orderpriority AS xp_priority
        FROM orders
        WHERE o_orderkey % 20 = 0
    """,
)
def fn_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML family: serialize each order to an XML fragment with
    to_xml(struct(...)), parse it back with from_xml's schema-on-read,
    and extract a field with an XPath accessor — the R7 re-encode
    discipline (fn_binary_base64) applied to the XML wire format. The
    oracle is the ROUNDTRIP LAW: parse(serialize(row)) == row, so the
    DuckDB side simply selects the original columns (no XML engine
    needed — if Spark's roundtrip is lossless the hashes match).
    Doubles survive because to_xml prints Java's shortest-decimal form,
    which parses back to the identical binary double. All per-row
    narrow maps: zero shuffles at any scale — but XML parsing is a
    per-row StAX parser (~100 us/row, two orders of magnitude over a
    codegen expression), so the registered query demonstrates the
    family on a deterministic 1-in-20 key slice rather than paying
    parser cost on every order; on a real corpus you'd reach for
    from_json/VARIANT first and keep from_xml for actual XML wire
    data."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 20 == 0)
    xml = F.to_xml(
        F.struct(
            F.col("o_orderstatus").alias("st"),
            F.col("o_totalprice").alias("tp"),
        )
    )
    parsed = o.withColumn(
        "p", F.from_xml(xml, "st string, tp double")
    ).withColumn(
        "xp",
        F.expr(
            "xpath_string(concat('<o><pri>', o_orderpriority, '</pri></o>'),"
            " '/o/pri')"
        ),
    )
    return parsed.select(
        "o_orderkey",
        F.col("p.st").alias("status_rt"),
        F.col("p.tp").alias("total_rt"),
        F.col("xp").alias("xp_priority"),
    )


@register(
    "fn_aes_roundtrip",
    sql="""
        SELECT doc_id,
               CAST(TRUE AS BOOLEAN) AS roundtrip_ok,
               CAST((floor(n_chars / 16) + 1) * 16 AS BIGINT) AS ct_len
        FROM documents
    """,
)
def fn_aes_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level encryption surface: aes_encrypt/aes_decrypt in ECB
    + PKCS mode — the only mode combination that is DETERMINISTIC (GCM
    and CBC draw a random IV per call, fine for production, fatal for
    an oracle), which also makes ECB the mode a test fixture can pin;
    the docstring is explicit that real deployments want the default
    GCM. The engine encrypts each document, decrypts it back, and
    reports (a) the roundtrip law decrypt(encrypt(x)) = x per row and
    (b) the REAL ciphertext length measured from the binary. DuckDB
    has no AES, so the oracle replays the two laws instead: roundtrip
    truth, and PKCS#7 length = (floor(bytes/16) + 1) * 16 — exact for
    this all-ASCII fixture where bytes = n_chars (measured). A
    formula-vs-measurement comparison, not formula-vs-formula: if the
    engine padded or encoded differently, ct_len would mismatch.
    Per-row narrow JVM expressions, zero shuffles at any scale."""
    d = table(spark, sf_dir, "documents")
    ct = F.expr(
        "aes_encrypt(text, '0123456789abcdef', 'ECB', 'PKCS')"
    )
    enc = d.select("doc_id", "text", ct.alias("ct"))
    dec = F.expr(
        "CAST(aes_decrypt(ct, '0123456789abcdef', 'ECB', 'PKCS') AS STRING)"
    )
    return enc.select(
        "doc_id",
        (dec == F.col("text")).alias("roundtrip_ok"),
        F.length("ct").cast("long").alias("ct_len"),
    )


@register(
    "fn_format",
    sql="""
        SELECT s_suppkey,
               printf('%06d|%s|%x', s_suppkey, s_name, s_nationkey)
                   AS fmt_line,
               lpad(CAST(s_suppkey AS VARCHAR), 10, '0') AS padded_key,
               rpad(s_name, 24, '.') AS padded_name,
               translate(s_name, '#', '_') AS cleaned,
               repeat('-', CAST(s_nationkey % 5 AS INT)) AS sep,
               concat_ws(':', s_name, CAST(s_nationkey AS VARCHAR))
                   AS joined
        FROM supplier
    """,
)
def fn_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-formatting family: C-style printf templating
    (``format_string`` in Spark, ``printf`` in DuckDB — the SAME
    conversion spec %06d|%s|%x is evaluated by java.util.Formatter vs
    C printf and must agree byte-for-byte; the spec sticks to
    integer/string conversions because FLOAT specs (%.2f) tie-round
    differently across runtimes — the fn_decimal lesson applied to
    formatting), plus lpad/rpad, translate, repeat, and concat_ws —
    the ID-minting and log-line surface every export pipeline uses.
    All per-row codegen expressions: zero shuffles at any scale."""
    s = table(spark, sf_dir, "supplier")
    return s.select(
        "s_suppkey",
        F.format_string(
            "%06d|%s|%x", "s_suppkey", "s_name", "s_nationkey"
        ).alias("fmt_line"),
        F.lpad(F.col("s_suppkey").cast("string"), 10, "0").alias("padded_key"),
        F.rpad("s_name", 24, ".").alias("padded_name"),
        F.translate("s_name", "#", "_").alias("cleaned"),
        F.repeat(F.lit("-"), (F.col("s_nationkey") % 5).cast("int")).alias(
            "sep"
        ),
        F.concat_ws(
            ":", F.col("s_name"), F.col("s_nationkey").cast("string")
        ).alias("joined"),
    )


@register(
    "fn_mask",
    sql="""
        WITH src AS (
            SELECT doc_id,
                   'User' || CAST(doc_id AS VARCHAR) || '-Tok'
                       || CAST(doc_id * 7 % 1000 AS VARCHAR) AS account_ref
            FROM documents WHERE doc_id < 200
        )
        SELECT doc_id, account_ref,
               regexp_replace(regexp_replace(regexp_replace(account_ref,
                   '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')
                   AS masked_default,
               regexp_replace(regexp_replace(account_ref,
                   '[A-Za-z]', '*', 'g'), '[0-9]', '#', 'g')
                   AS masked_custom
        FROM src
    """,
)
def fn_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mask() data-redaction function (Spark 3.4+): shape-
    preserving PII masking — uppercase -> X, lowercase -> x, digits ->
    n, plus a custom-replacement variant — the column-level
    counterpart of text_pii_redact's pattern scrubbing (masking keeps
    length/shape for downstream format validation while destroying
    the value; redaction removes spans). Inputs are deterministic
    synthetic account refs built from doc_id, so both engines see
    identical strings; DuckDB has no mask(), so the oracle states the
    semantics as regexp chains — which doubles as the documented
    definition of what mask() does."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    ref = F.concat(
        F.lit("User"),
        F.col("doc_id").cast("string"),
        F.lit("-Tok"),
        ((F.col("doc_id") * 7) % 1000).cast("string"),
    )
    return d.select(
        "doc_id",
        ref.alias("account_ref"),
        F.mask(ref).alias("masked_default"),
        F.mask(
            ref,
            F.lit("*"),
            F.lit("*"),
            F.lit("#"),
            F.lit(None).cast("string"),
        ).alias("masked_custom"),
    )


@register(
    "fn_stable_surrogate_id",
    sql="""
        WITH h AS (
            SELECT doc_id, md5('thsa:doc:' || CAST(doc_id AS VARCHAR)) AS x
            FROM documents
        )
        SELECT doc_id,
               substr(x, 1, 8) || '-' || substr(x, 9, 4) || '-5'
                   || substr(x, 14, 3) || '-'
                   || CASE WHEN substr(x, 17, 1) IN ('0','1','2','3')
                           THEN '8' WHEN substr(x, 17, 1) IN ('4','5','6','7')
                           THEN '9' WHEN substr(x, 17, 1) IN ('8','9','a','b')
                           THEN 'a' ELSE 'b' END
                   || substr(x, 18, 3) || '-' || substr(x, 21, 12)
                   AS surrogate_uuid
        FROM h
    """,
)
def fn_stable_surrogate_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STABLE surrogate-key minting — UUIDv5-style (name-based,
    RFC 4122 layout: version nibble '5', variant nibble in 8..b) from
    md5 over a namespaced natural key. The point is what it is NOT:
    ``monotonically_increasing_id()`` depends on partition layout
    (re-run => different ids; the classic broken-dimension-table bug)
    and ``uuid()`` is random — both unusable as a join key across
    incremental loads. A hash of the namespaced natural key is
    byte-identical across runs, engines, partitionings, and re-ingests,
    which is why every warehouse dimension loader mints keys this way.
    Pure narrow-map string expressions, zero shuffle, trivially
    100-TB-parallel; the oracle rebuilds the identical UUID from the
    same hex."""
    d = table(spark, sf_dir, "documents")
    x = F.md5(F.concat(F.lit("thsa:doc:"), F.col("doc_id").cast("string")))
    nib = F.substring(x, 17, 1)
    variant = (
        F.when(nib.isin("0", "1", "2", "3"), "8")
        .when(nib.isin("4", "5", "6", "7"), "9")
        .when(nib.isin("8", "9", "a", "b"), "a")
        .otherwise("b")
    )
    return d.select(
        "doc_id",
        F.concat(
            F.substring(x, 1, 8), F.lit("-"),
            F.substring(x, 9, 4), F.lit("-5"),
            F.substring(x, 14, 3), F.lit("-"),
            variant,
            F.substring(x, 18, 3), F.lit("-"),
            F.substring(x, 21, 12),
        ).alias("surrogate_uuid"),
    )
