"""Deterministic sampling & sequence-packing operators for the
training-data pipeline (BASELINE.json north-star: curating LLM
pretraining corpora).

Everything here is HASH-deterministic, not RNG-based: assignment is a
pure function of the row key, so (a) reruns and retried tasks give
byte-identical samples (Spark's `df.sample` does not survive partition
reshuffling), (b) the DuckDB oracle can reproduce the exact split, and
(c) at 100 TB the sample of a table is stable across incremental
re-ingests — the property every train/eval split actually needs.
The hash is md5 of the key, compared on its hex-prefix: portable
across engines (murmur/xxhash seeds differ between Spark and DuckDB;
md5 is bit-identical everywhere) and uniform enough for split ratios.
All ops are narrow maps or single-window shapes — no extra shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import table
from ..registry import register

# hex-prefix thresholds on md5(doc_id): 2 hex chars = 256 buckets.
# 'cd' = 205/256 ~ 80% train; 'e6' = 230/256 => ~10% val; rest test.
_TRAIN_HI = "cd"
_VAL_HI = "e6"


@register(
    "sample_hash_split",
    sql=f"""
        SELECT doc_id,
               CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{_TRAIN_HI}'
                    THEN 'train'
                    WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{_VAL_HI}'
                    THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    """,
)
def sample_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment (~80/10/10) by md5
    hex-prefix of the document key. Pure narrow map — no shuffle, no
    state; the split of any document is decided by its id alone, so
    adding data never moves existing docs between splits (critical for
    eval-set hygiene across corpus versions)."""
    d = table(spark, sf_dir, "documents")
    prefix = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    return d.select(
        "doc_id",
        F.when(prefix < _TRAIN_HI, "train")
        .when(prefix < _VAL_HI, "val")
        .otherwise("test")
        .alias("split"),
    )


#: Max documents kept per source in the quota sample.
QUOTA_PER_SOURCE = 20


@register(
    "sample_quota_per_source",
    sql=f"""
        SELECT doc_id, source, n_chars FROM (
            SELECT doc_id, source, n_chars,
                   row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
            FROM documents
        ) WHERE rn <= {QUOTA_PER_SOURCE}
    """,
)
def sample_quota_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain quota sampling: cap each source at K documents — the
    standard defense against one crawl domain dominating the training
    mixture. row_number over (source, doc_id) with rank<=K compiles to
    Spark's WindowGroupLimit, which pushes the limit BELOW the shuffle:
    each map task keeps only K rows per source before exchanging, so
    the shuffle is bounded by K x n_sources regardless of input size."""
    d = table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("doc_id")
    return (
        d.select("doc_id", "source", "n_chars")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= QUOTA_PER_SOURCE)
        .drop("rn")
    )


#: Per-language sampling rates for the mixture (hex-prefix thresholds:
#: '80' = 128/256 = 50% for English, '1a' = 26/256 ~ 10% for the rest).
_MIX_EN_HI = "80"
_MIX_OTHER_HI = "1a"


@register(
    "sample_mixture_weighted",
    sql=f"""
        SELECT doc_id, lang
        FROM documents
        WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <
              CASE WHEN lang = 'en' THEN '{_MIX_EN_HI}' ELSE '{_MIX_OTHER_HI}' END
    """,
)
def sample_mixture_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted data mixture: keep 50% of English documents and ~10%
    of every other language — the per-domain/per-language reweighting
    step of corpus curation, as one deterministic hash filter. A single
    narrow map (no per-group sampling jobs, no RNG): the rate lives in
    the threshold expression, so changing mixture weights is a constant
    edit, not a replan."""
    d = table(spark, sf_dir, "documents")
    prefix = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    thresh = F.when(F.col("lang") == "en", _MIX_EN_HI).otherwise(_MIX_OTHER_HI)
    return d.filter(prefix < thresh).select("doc_id", "lang")


#: Token budget per packed training sequence.
PACK_BUDGET = 512


@register(
    "pack_sequences",
    sql=f"""
        WITH toks AS (
            SELECT doc_id, source,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
            FROM documents
        ),
        packed AS (
            SELECT doc_id, source, n_tokens,
                   CAST(floor((sum(n_tokens) OVER (
                            PARTITION BY source ORDER BY doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                        ) - n_tokens) / {PACK_BUDGET}) AS BIGINT) AS pack_id
            FROM toks
        )
        SELECT source, pack_id,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS pack_tokens,
               CAST(min(doc_id) AS BIGINT) AS first_doc_id
        FROM packed
        GROUP BY source, pack_id
    """,
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy contiguous sequence packing: concatenate documents (in
    doc_id order within each source) into training sequences of ~BUDGET
    tokens — the step that turns a deduped corpus into fixed-length
    pretraining examples. pack_id = floor(exclusive-prefix-sum(tokens)
    / budget): one running-sum window per source partition, then a hash
    agg for per-pack stats. The window and the agg share the `source`
    partitioning, so Spark plans ONE shuffle for both. Deterministic
    and SQL-expressible — unlike bin-packing heuristics, contiguous
    packing is reproducible across engines and incremental runs."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.size(F.split("text", " ")).cast("long").alias("n_tokens")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = d.withColumn(
        "pack_id",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / PACK_BUDGET),
    )
    return packed.groupBy("source", "pack_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("pack_tokens"),
        F.min("doc_id").alias("first_doc_id"),
    )


@register(
    "corpus_curation_pipeline",
    sql=f"""
        WITH quality AS (
            SELECT doc_id, text, source,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
            FROM documents
            WHERE len(string_split(text, ' ')) >= 30
              AND len(list_distinct(string_split(text, ' '))) * 1.0
                  / len(string_split(text, ' ')) >= 0.3
        ),
        deduped AS (
            SELECT doc_id, source, n_tokens
            FROM (
                SELECT doc_id, source, n_tokens,
                       row_number() OVER (PARTITION BY sha256(text)
                                          ORDER BY doc_id) AS rn
                FROM quality
            ) WHERE rn = 1
        ),
        split AS (
            SELECT doc_id, source, n_tokens,
                   CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{_TRAIN_HI}'
                        THEN 'train'
                        WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{_VAL_HI}'
                        THEN 'val'
                        ELSE 'test' END AS split
            FROM deduped
        )
        SELECT doc_id, source, split, n_tokens,
               CAST(floor((sum(n_tokens) OVER (
                        PARTITION BY split, source ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                    ) - n_tokens) / {PACK_BUDGET}) AS BIGINT) AS pack_id
        FROM split
    """,
)
def corpus_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole training-data pipeline as ONE declarative program:
    quality gate (length + repetition, text_quality's keep band) ->
    exact dedup (min-doc_id keeper per content hash) -> deterministic
    train/val/test split -> token-budget sequence packing per (split,
    source). Output is row-level (doc_id, source, split, n_tokens,
    pack_id) — the manifest a trainer would consume — and fully
    SQL-expressible, so the end-to-end composition is exact-hash
    checked, not just each stage in isolation.

    Scale shape: one narrow scan computes tokens + quality + hash; the
    dedup is one shuffle on the content hash (window rank, not a
    groupBy+join-back); split is a free narrow map; packing reuses one
    shuffle on (split, source). Total: two data-sized shuffles for the
    entire pipeline — each stage composes into Catalyst's plan, which
    is the argument for declaring curation as DataFrame ops instead of
    chaining materialized intermediate datasets."""
    d = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n = F.size(toks)
    quality = d.filter(
        (n >= 30) & (F.size(F.array_distinct(toks)) / n >= 0.3)
    ).select(
        "doc_id", "text", "source", F.size(F.split("text", " ")).cast("long").alias("n_tokens")
    )
    wdup = Window.partitionBy(F.sha2("text", 256)).orderBy("doc_id")
    deduped = (
        quality.withColumn("rn", F.row_number().over(wdup))
        .filter(F.col("rn") == 1)
        .select("doc_id", "source", "n_tokens")
    )
    prefix = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    split = deduped.withColumn(
        "split",
        F.when(prefix < _TRAIN_HI, "train")
        .when(prefix < _VAL_HI, "val")
        .otherwise("test"),
    )
    wpack = (
        Window.partitionBy("split", "source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return split.select(
        "doc_id",
        "source",
        "split",
        "n_tokens",
        F.floor(
            (F.sum("n_tokens").over(wpack) - F.col("n_tokens")) / PACK_BUDGET
        ).alias("pack_id"),
    )


#: Exact stratified sampling rate (per-language fraction kept).
STRATIFIED_FRAC = 0.2


@register(
    "sample_stratified",
    sql=f"""
        SELECT doc_id, lang
        FROM (
            SELECT doc_id, lang,
                   row_number() OVER (
                       PARTITION BY lang
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
                   count(*) OVER (PARTITION BY lang) AS n_lang
            FROM documents
        )
        WHERE rn <= ceil({STRATIFIED_FRAC} * n_lang)
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT stratified sampling: precisely ceil(20%) of each language
    stratum — not Bernoulli's approximate-fraction df.sample — with a
    deterministic, shuffle-free choice of WHICH rows (md5 of the key as
    the random order; any engine reproduces it). df.sample can't
    guarantee per-stratum counts, and at corpus scale class balance IS
    the contract for mixture training. One shuffle on lang; the rank
    and the stratum size come from the same window partitioning."""
    d = table(spark, sf_dir, "documents").select("doc_id", "lang")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    wl = Window.partitionBy("lang")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .withColumn("n_lang", F.count("*").over(wl))
        .filter(F.col("rn") <= F.ceil(STRATIFIED_FRAC * F.col("n_lang")))
        .select("doc_id", "lang")
    )


#: Fixed-size deterministic sample: exactly K rows, chosen by hash
#: priority (the distributed reservoir-sampling equivalent).
SAMPLE_K = 1000


@register(
    "sample_fixed_k",
    sql=f"""
        SELECT doc_id, lang, source
        FROM documents
        ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
        LIMIT {SAMPLE_K}
    """,
)
def sample_fixed_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-K uniform sample without replacement: rank every row by a
    hash priority (md5 of the key) and keep the global top K — the
    deterministic, single-pass form of reservoir sampling. Spark
    executes ORDER BY + LIMIT as TakeOrderedAndProject: each partition
    keeps a local K-heap and only K rows per partition reach the
    driver-side merge, so no global sort and no shuffle of the corpus
    ever happens — the same property a reservoir gives, but
    reproducible across engines and reruns. K rows regardless of
    corpus size; priorities are uniform because md5 is."""
    d = table(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id",
            "lang",
            "source",
            F.md5(F.col("doc_id").cast("string")).alias("_pri"),
        )
        .orderBy("_pri", "doc_id")
        .limit(SAMPLE_K)
        .drop("_pri")
    )


#: Temperature for the data-driven mixture: q_l ∝ p_l^alpha with
#: alpha = 0.5 — the standard multilingual rebalancing exponent.
#: Max-utilization acceptance rates reduce to rate_l = sqrt(n_min/n_l)
#: (rarest language keeps 100%), which is BIT-EXACT across engines:
#: one integer ratio, one IEEE sqrt — no cross-language float
#: accumulation whose summation order could flip a boundary document.
TEMP_HASH_SPACE = 2**32


@register(
    "sample_temperature",
    sql=f"""
        WITH counts AS (
            SELECT lang, count(*) AS n_l FROM documents GROUP BY lang
        ),
        rates AS (
            SELECT lang, n_l,
                   sqrt((SELECT min(n_l) FROM counts) * 1.0 / n_l) AS rate
            FROM counts
        )
        SELECT d.doc_id, d.lang, round(r.rate, 6) AS rate
        FROM documents d JOIN rates r ON d.lang = r.lang
        WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))
                   AS UBIGINT) * 1.0 / {TEMP_HASH_SPACE} < r.rate
    """,
)
def sample_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled language mixture (q_l ∝ p_l^0.5): the
    data-DRIVEN rebalancing step of multilingual corpus curation —
    rates come from the corpus's own language distribution, unlike
    sample_mixture_weighted's fixed thresholds. Max-utilization
    acceptance keeps 100% of the rarest language and sqrt(n_min/n_l)
    of the rest. Two stages at any scale: a language-count aggregate
    (rows = #languages, broadcast back onto the corpus) and one narrow
    hash-acceptance map — acceptance is md5-deterministic per doc_id,
    so retries, re-ingests, and the DuckDB oracle reproduce the exact
    sample byte for byte."""
    d = table(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count("*").alias("n_l"))
    n_min = counts.agg(F.min("n_l").alias("n_min"))
    rates = counts.join(F.broadcast(n_min)).select(
        "lang",
        F.sqrt(F.col("n_min") * F.lit(1.0) / F.col("n_l")).alias("rate"),
    )
    frac = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("double")
        / F.lit(float(TEMP_HASH_SPACE))
    )
    return (
        d.join(F.broadcast(rates), "lang")
        .filter(frac < F.col("rate"))
        .select("doc_id", "lang", F.round("rate", 6).alias("rate"))
    )


@register(
    "sample_downweight_dups",
    sql="""
        WITH sized AS (
            SELECT source,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                   count(*) OVER (PARTITION BY sha256(text)) AS csize
            FROM documents
        ), pre AS (
            SELECT source, CAST(csize AS BIGINT) AS csize,
                   CAST(count(*) AS BIGINT) AS cnt,
                   CAST(sum(n_tokens) AS BIGINT) AS tok
            FROM sized GROUP BY 1, 2
        ), folded AS (
            SELECT source,
                   CAST(sum(cnt) AS BIGINT) AS n_docs,
                   CAST(sum(tok) AS BIGINT) AS raw_tokens,
                   reduce(
                       list_transform(
                           list_sort(list([csize, cnt, tok])),
                           g -> CAST(g[2] AS DOUBLE) / g[1]),
                       (a, b) -> a + b) AS eff_docs_raw,
                   reduce(
                       list_transform(
                           list_sort(list([csize, cnt, tok])),
                           g -> CAST(g[3] AS DOUBLE) / g[1]),
                       (a, b) -> a + b) AS eff_tok_raw
            FROM pre GROUP BY 1
        )
        SELECT source, n_docs,
               round(eff_docs_raw, 4) AS effective_docs,
               raw_tokens,
               round(eff_tok_raw, 4) AS effective_tokens,
               round(1.0 - eff_docs_raw / n_docs, 4) AS dup_discount
        FROM folded
    """,
)
def sample_downweight_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft dedup: token accounting that down-weights duplicates
    instead of dropping them. Every document in an exact-duplicate
    cluster of size c carries weight 1/c, so each distinct text
    contributes exactly one document-equivalent (and its tokens once)
    no matter how many copies exist — the corpus-mixture bookkeeping a
    trainer needs when upstream sources overlap but hard deletion is
    too blunt (repeated high-quality text keeps its one vote; spam
    reposted 10,000x collapses to weight 1). Output per source: raw vs
    effective doc/token counts and the dup discount rate.

    Scale shape: cluster size is a COUNT() window over the content
    hash — one shuffle on sha2(text), no join-back — then one hash
    aggregate on source; partial aggregation applies map-side. Both
    shuffles are key-balanced (content hashes are uniform), so the
    plan survives 1000 executors unchanged.

    Value-determinism (the r7 driver red): `sum(1.0/csize)` is an
    order-dependent double aggregation — different partial-agg merge
    orders flip round(x, 4) at a tie boundary. The fractional sums are
    therefore computed from EXACT integers: first an (source, csize)
    pre-aggregate (count/sum over longs — associative, order-proof),
    then a fold over the csize-sorted group array (F.aggregate /
    DuckDB reduce) so both engines add the identical doubles in the
    identical sequence — bit-identical results by IEEE determinism.
    The pre-aggregate is tiny (#sources x #distinct cluster sizes),
    so the array per source is bounded regardless of corpus size."""
    d = table(spark, sf_dir, "documents").select(
        "source",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        F.sha2("text", 256).alias("h"),
    )
    csize = F.count("*").over(Window.partitionBy("h"))
    sized = d.withColumn("csize", csize).drop("h")
    pre = sized.groupBy("source", "csize").agg(
        F.count("*").alias("cnt"), F.sum("n_tokens").alias("tok")
    )
    folded = pre.groupBy("source").agg(
        F.sum("cnt").alias("n_docs"),
        F.sum("tok").alias("raw_tokens"),
        F.sort_array(F.collect_list(F.struct("csize", "cnt", "tok"))).alias(
            "groups"
        ),
    ).select(
        "source",
        "n_docs",
        "raw_tokens",
        F.aggregate(
            "groups",
            F.lit(0.0),
            lambda acc, g: acc + g.cnt.cast("double") / g.csize,
        ).alias("eff_docs_raw"),
        F.aggregate(
            "groups",
            F.lit(0.0),
            lambda acc, g: acc + g.tok.cast("double") / g.csize,
        ).alias("eff_tok_raw"),
    )
    return folded.select(
        "source",
        "n_docs",
        F.round("eff_docs_raw", 4).alias("effective_docs"),
        "raw_tokens",
        F.round("eff_tok_raw", 4).alias("effective_tokens"),
        F.round(
            F.lit(1.0) - F.col("eff_docs_raw") / F.col("n_docs"), 4
        ).alias("dup_discount"),
    )


#: Poisson(1) inverse-CDF thresholds over the first 4 md5 hex chars
#: (u ~ Uniform{0..65535} as a lowercase hex string; cum pmf x 65536,
#: floor): the deterministic per-row bootstrap draw.  Salted so draws
#: decorrelate from `sample_hash_split`'s prefix.  The tail is
#: TRUNCATED at k = 5: the ~0.37% of mass at k >= 5 all lands on 5
#: repeats, so the draw is min(Poisson(1), 5) — mean bias ~ -0.0009
#: (negligible for epoch mixing) and the max per-doc fanout is a
#: declared constant instead of an unbounded tail.
_BOOT_SALT = ":boot"
_POISSON1_CUM_HEX = ("5e2d", "bc5a", "eb71", "fb23", "ff10")  # k=0..4


@register(
    "sample_poisson_repeat",
    sql=f"""
        WITH u AS (
            SELECT doc_id,
                   substr(md5(CAST(doc_id AS VARCHAR) || '{_BOOT_SALT}'),
                          1, 4) AS u4
            FROM documents
        ),
        k AS (
            SELECT doc_id,
                   CASE WHEN u4 < '{_POISSON1_CUM_HEX[0]}' THEN 0
                        WHEN u4 < '{_POISSON1_CUM_HEX[1]}' THEN 1
                        WHEN u4 < '{_POISSON1_CUM_HEX[2]}' THEN 2
                        WHEN u4 < '{_POISSON1_CUM_HEX[3]}' THEN 3
                        WHEN u4 < '{_POISSON1_CUM_HEX[4]}' THEN 4
                        ELSE 5 END AS repeats
            FROM u
        )
        SELECT doc_id,
               CAST(repeats AS BIGINT) AS repeats,
               CAST(unnest(range(1, repeats + 1)) AS BIGINT) AS copy
        FROM k WHERE repeats > 0
    """,
)
def sample_poisson_repeat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Poisson(1) bootstrap resample — the epoch-mixing
    primitive of a training-data pipeline (fractional dataset repeat
    factors, bagging, bootstrap confidence intervals): each document
    draws k ~ min(Poisson(1), 5) via inverse-CDF over a salted md5
    uniform (tail truncated at 5 — see _POISSON1_CUM_HEX) and
    is emitted k times with a copy index.  E[rows] ~= corpus size, and
    the draw depends on doc_id alone, so resamples are reproducible
    across runs AND stable under corpus growth (same property as
    `sample_hash_split`).

    Narrow map + explode, zero shuffle, zero state — at 100 TB each
    executor draws for its own partitions; the hex-string threshold
    compare replays bit-identically in any engine with md5, hence the
    exact oracle."""
    d = table(spark, sf_dir, "documents")
    u4 = F.substring(
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(_BOOT_SALT))), 1, 4
    )
    repeats = (
        F.when(u4 < _POISSON1_CUM_HEX[0], 0)
        .when(u4 < _POISSON1_CUM_HEX[1], 1)
        .when(u4 < _POISSON1_CUM_HEX[2], 2)
        .when(u4 < _POISSON1_CUM_HEX[3], 3)
        .when(u4 < _POISSON1_CUM_HEX[4], 4)
        .otherwise(5)
    )
    return (
        d.select("doc_id", repeats.cast("long").alias("repeats"))
        .filter(F.col("repeats") > 0)
        .select(
            "doc_id",
            "repeats",
            F.explode(
                F.sequence(F.lit(1).cast("long"), F.col("repeats"))
            ).alias("copy"),
        )
    )


@register(
    "corpus_token_budget",
    sql="""
        WITH t AS (
            SELECT source, lang,
                   len(string_split(text, ' ')) AS n_toks
            FROM documents
        ),
        g AS (
            SELECT source, lang,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(n_toks) AS BIGINT) AS n_tokens
            FROM t GROUP BY source, lang
        )
        SELECT source, lang, n_docs, n_tokens,
               round(n_tokens * 1.0 / sum(n_tokens) OVER (), 6)
                   AS token_share,
               round(sum(n_tokens) OVER (
                         ORDER BY n_tokens DESC, source, lang
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                     ) * 1.0 / sum(n_tokens) OVER (), 6) AS cum_share
        FROM g
    """,
)
def corpus_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The data-recipe audit: per (source, language) document and
    token counts, token share of the corpus, and cumulative share in
    descending-share order — the table a mixture designer reads before
    setting `sample_mixture_weighted` / `sample_temperature` rates,
    and the one a training run logs as its recipe of record.

    One data-sized shuffle (the per-slice aggregate, with map-side
    partial combine); the share/cumulative windows then run over the
    SLICE relation (|sources| x |langs| rows — hundreds at any corpus
    size), so the single-partition ordered cumsum is bounded by the
    recipe's cardinality, never the corpus.  Integer token cumsum =>
    engine-exact; only the final ratios are rounded."""
    d = table(spark, sf_dir, "documents")
    g = (
        d.select("source", "lang", F.size(F.split("text", " ")).alias("n_toks"))
        .groupBy("source", "lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_toks").cast("long").alias("n_tokens"),
        )
    )
    wtot = Window.partitionBy()
    wcum = (
        Window.partitionBy()
        .orderBy(F.desc("n_tokens"), F.asc("source"), F.asc("lang"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = F.sum("n_tokens").over(wtot)
    return g.select(
        "source",
        "lang",
        "n_docs",
        "n_tokens",
        F.round(F.col("n_tokens") / tot, 6).alias("token_share"),
        F.round(F.sum("n_tokens").over(wcum) / tot, 6).alias("cum_share"),
    )


#: Weighted reservoir geometry: K docs per language, weight = n_chars
#: (sample probability proportional to size, the unit a char/token
#: budget actually spends). Efraimidis-Spirakis A-ES keys
#: -ln(u)/w with a DETERMINISTIC uniform u from the first 8 md5 hex
#: chars of the salted doc id, so the "reservoir" is reproducible
#: across engines and reruns. Keys are rounded to 10 dp before
#: ranking with a doc_id tie-break: two draws within 1e-10 resolve
#: deterministically instead of by last-ulp libm differences.
RESERVOIR_K = 16
_RESERVOIR_SALT = ":resv"
_RESERVOIR_HASH_SPACE = 2**32


@register(
    "sample_weighted_reservoir",
    sql=f"""
        WITH keyed AS (
            SELECT doc_id, lang, n_chars,
                   round(
                       -ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                                                      || '{_RESERVOIR_SALT}'),
                                                  1, 8)) AS UBIGINT) + 1.0)
                           / {_RESERVOIR_HASH_SPACE + 1}.0)
                       / n_chars, 10) AS k_key
            FROM documents WHERE n_chars > 0
        ),
        ranked AS (
            SELECT doc_id, lang, n_chars, k_key,
                   row_number() OVER (
                       PARTITION BY lang ORDER BY k_key, doc_id
                   ) AS rk
            FROM keyed
        )
        SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars,
               k_key, CAST(rk AS BIGINT) AS rk
        FROM ranked WHERE rk <= {RESERVOIR_K}
    """,
)
def sample_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement, K per language, inclusion
    probability proportional to document size — the Efraimidis-Spirakis
    A-ES reservoir (key = u^(1/w), kept as the equivalent min-key form
    -ln(u)/w), which is how a training pipeline draws a size-weighted
    eval/calibration slice per language in one pass.  The uniform is
    hash-derived (salted md5 of doc_id), so unlike a true reservoir the
    sample is REPRODUCIBLE and engine-portable — same discipline as
    `sample_fixed_k`, generalized to weights.

    Scale shape: narrow map for the key, then rank-limit per language.
    Spark compiles the row_number <= K filter to WindowGroupLimit
    (plan-asserted): each partition keeps a local K-heap per language
    BEFORE the shuffle, so the exchange carries at most
    K x |languages| x partitions rows, never the corpus — the
    distributed reservoir property, from a declarative plan.  Docs
    with n_chars = 0 carry zero weight and are excluded on both
    engines (-ln(u)/0 is a division by zero, not a draw)."""
    d = table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    h32 = F.conv(
        F.substring(
            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(_RESERVOIR_SALT))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    u = (h32 + F.lit(1.0)) / F.lit(float(_RESERVOIR_HASH_SPACE + 1))
    keyed = d.select(
        "doc_id",
        "lang",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.round(-F.log(u) / F.col("n_chars"), 10).alias("k_key"),
    )
    rk = F.row_number().over(Window.partitionBy("lang").orderBy("k_key", "doc_id"))
    return (
        keyed.withColumn("rk", rk.cast("long"))
        .filter(F.col("rk") <= RESERVOIR_K)
    )


#: Mixture-allocation geometry: a declared per-source target weight
#: (curated sources src0-src4 get 2x the weight of the long tail) and
#: a fixed char budget. Allocation is the single-pass capped fill:
#: each source gets min(availability, its target share of the budget)
#: — saturated sources report their shortfall rather than silently
#: re-spreading it (re-spread is a second pass over this table, a
#: planner decision, not an engine one).
MIX_BUDGET_CHARS = 100_000
_MIX_CURATED = ("src0", "src1", "src2", "src3", "src4")


@register(
    "corpus_mix_allocate",
    sql=f"""
        WITH avail AS (
            SELECT source,
                   CAST(sum(n_chars) AS BIGINT) AS avail_chars,
                   CASE WHEN source IN {_MIX_CURATED!r} THEN 2 ELSE 1 END
                       AS weight
            FROM documents GROUP BY source
        ),
        shared AS (
            SELECT source, avail_chars, CAST(weight AS BIGINT) AS weight,
                   CAST(floor(weight * {MIX_BUDGET_CHARS}.0
                              / sum(weight) OVER ()) AS BIGINT)
                       AS target_chars
            FROM avail
        )
        SELECT source, avail_chars, weight, target_chars,
               CAST(least(avail_chars, target_chars) AS BIGINT)
                   AS allocated_chars,
               CASE WHEN target_chars > 0
                    THEN round(least(avail_chars, target_chars) * 1.0
                               / target_chars, 6) END AS fill_rate,
               CASE WHEN avail_chars > 0
                    THEN round(least(avail_chars, target_chars) * 1.0
                               / avail_chars, 6) END AS accept_rate,
               CAST(greatest(target_chars - avail_chars, 0) AS BIGINT)
                   AS unmet_chars
        FROM shared
    """,
)
def corpus_mix_allocate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mixture PLANNER between `corpus_token_budget`'s audit and
    `sample_mixture_weighted`'s filter: declared per-source target
    weights plus a fixed char budget become a per-source allocation,
    capped by what each source actually has.  Emits the acceptance
    rate a downstream hash filter would apply (allocated/available —
    plug directly into the `sample_mixture_weighted` threshold), the
    fill rate against target, and the unmet shortfall for saturated
    sources — the numbers a data-recipe review reads.

    Scale shape: one map-side-combined aggregate collapses the corpus
    to the |sources| relation; shares and caps are window/scalar
    arithmetic on that tiny table.  Integer char arithmetic
    throughout (floor before compare), ratios rounded once at the
    edge."""
    d = table(spark, sf_dir, "documents")
    avail = d.groupBy("source").agg(
        F.sum("n_chars").cast("long").alias("avail_chars")
    ).withColumn(
        "weight",
        F.when(F.col("source").isin(*_MIX_CURATED), 2).otherwise(1).cast("long"),
    )
    w_all = Window.partitionBy()
    shared = avail.withColumn(
        "target_chars",
        F.floor(
            F.col("weight") * F.lit(float(MIX_BUDGET_CHARS)) / F.sum("weight").over(w_all)
        ).cast("long"),
    )
    alloc = F.least("avail_chars", "target_chars")
    return shared.select(
        "source",
        "avail_chars",
        "weight",
        "target_chars",
        alloc.cast("long").alias("allocated_chars"),
        # agreed-NULL gate (same discipline as stat_ab_ttest): a
        # zero-char source or a floor()=0 target must yield NULL on
        # both engines, not Spark non-ANSI NULL vs DuckDB inf/NaN
        F.when(
            F.col("target_chars") > 0, F.round(alloc / F.col("target_chars"), 6)
        ).alias("fill_rate"),
        F.when(
            F.col("avail_chars") > 0, F.round(alloc / F.col("avail_chars"), 6)
        ).alias("accept_rate"),
        F.greatest(F.col("target_chars") - F.col("avail_chars"), F.lit(0))
        .cast("long")
        .alias("unmet_chars"),
    )


#: Epoch scheduler inputs: the training run's total token budget and
#: the per-source repeat ceiling (4 epochs, the empirical point where
#: repetition stops paying — Muennighoff et al. 2023's "scaling data-
#: constrained language models" finding), in milli-epochs.
EPOCH_BUDGET_TOKENS = 5_000_000
EPOCH_CAP_MILLI = 4_000


@register(
    "corpus_epoch_schedule",
    sql=f"""
        WITH src AS (
            SELECT source,
                   CAST(sum(len(string_split(text, ' '))) AS BIGINT)
                       AS tokens
            FROM documents GROUP BY source
        ),
        tot AS (SELECT count(*) AS n_sources FROM src),
        plan AS (
            SELECT source, tokens,
                   CAST({EPOCH_BUDGET_TOKENS} // n_sources AS BIGINT)
                       AS target_tokens,
                   CAST(least(({EPOCH_BUDGET_TOKENS} // n_sources)
                              * 1000 // tokens,
                              {EPOCH_CAP_MILLI}) AS BIGINT)
                       AS epochs_milli
            FROM src, tot
        )
        SELECT source, tokens, target_tokens, epochs_milli,
               CAST(tokens * epochs_milli // 1000 AS BIGINT)
                   AS scheduled_tokens,
               epochs_milli = {EPOCH_CAP_MILLI} AS capped
        FROM plan
    """,
)
def corpus_epoch_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch scheduler for a data-constrained training run: given a
    total token budget split uniformly across sources, compute how
    many epochs (repeats) of each source fill its allocation, capped
    at 4 epochs — past which repeated data stops improving loss
    (the data-constrained scaling result), so a capped source simply
    under-fills and the budget gap surfaces in scheduled_tokens
    rather than being silently over-repeated.

    All arithmetic is integer (milli-epochs via DIV), so the schedule
    is byte-identical on both engines and — more importantly — on
    every executor of a 1000-node run: the scheduler output is a
    BROADCASTABLE contract, computed from one map-side-combined
    aggregate over the corpus (per-source token counts) and a handful
    of scalar ops on the #sources-row relation.

    Cross-engine integer-division idiom: Spark's DIV truncates toward
    zero; DuckDB's // negative-operand rounding is an engine detail
    that has differed across releases (floor vs truncate). The pairing
    is proven ONLY on non-negative operands — which every operand here
    is (token counts, budgets, and caps are all >= 0; least() of
    non-negatives is non-negative). Do NOT copy this paired idiom to
    signed values; pinned in tests/test_llm_ops.py."""
    d = table(spark, sf_dir, "documents")
    src = d.groupBy("source").agg(
        F.sum(F.size(F.split("text", " "))).cast("long").alias("tokens")
    )
    tot = src.agg(F.count("*").alias("n_sources"))
    plan = src.crossJoin(F.broadcast(tot)).select(
        "source",
        "tokens",
        F.expr(f"CAST({EPOCH_BUDGET_TOKENS} DIV n_sources AS BIGINT)").alias(
            "target_tokens"
        ),
        F.expr(
            f"CAST(least(({EPOCH_BUDGET_TOKENS} DIV n_sources) * 1000"
            f" DIV tokens, {EPOCH_CAP_MILLI}) AS BIGINT)"
        ).alias("epochs_milli"),
    )
    return plan.select(
        "source",
        "tokens",
        "target_tokens",
        "epochs_milli",
        F.expr("CAST(tokens * epochs_milli DIV 1000 AS BIGINT)").alias(
            "scheduled_tokens"
        ),
        (F.col("epochs_milli") == EPOCH_CAP_MILLI).alias("capped"),
    )


#: Epochs materialized by the deterministic training-order shuffle.
SHUFFLE_EPOCHS = 2


@register(
    "sample_epoch_shuffle",
    sql=f"""
        WITH assigned AS (
            SELECT e.epoch, d.doc_id,
                   CAST(len(string_split(d.text, ' ')) AS BIGINT)
                       AS n_tokens,
                   substr(md5(CAST(e.epoch AS VARCHAR) || ':'
                              || CAST(d.doc_id AS VARCHAR)), 1, 2)
                       AS chunk
            FROM documents d,
                 (SELECT unnest(range({SHUFFLE_EPOCHS})) AS epoch) e
        )
        SELECT CAST(epoch AS BIGINT) AS epoch, chunk,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS chunk_tokens,
               CAST(min(doc_id) AS BIGINT) AS min_doc_id,
               CAST(max(doc_id) AS BIGINT) AS max_doc_id
        FROM assigned
        GROUP BY 1, 2
    """,
)
def sample_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-epoch training-order shuffle: each epoch
    assigns every document to one of 256 chunks by md5(epoch:doc_id)
    hex prefix — a different pseudorandom permutation per epoch with
    NO RNG state, so any worker (or a re-run, or a resumed job) can
    recompute exactly which chunk serves which document at which
    epoch. This is how large training runs shuffle 100 TB: a global
    sort per epoch is unpayable, but hash-chunking is a narrow map,
    and reading chunks in order while shuffling only within the
    (memory-sized) chunk gives the standard two-level approximate
    shuffle. Output is the per-(epoch, chunk) manifest a loader
    consumes: doc/token counts per chunk plus id bounds.

    Everything is integer/string-exact (hex chunk labels, token
    counts), and chunk membership of a doc changes across epochs with
    P=255/256 — the reshuffling property the pinned test asserts.
    Scale shape: the epoch explode is a constant fan-out; one
    map-side-combined aggregate on (epoch, chunk); no sort, no window,
    no skew (md5 is uniform)."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    epochs = spark.range(SHUFFLE_EPOCHS).select(F.col("id").alias("epoch"))
    assigned = d.crossJoin(F.broadcast(epochs)).select(
        "epoch",
        "doc_id",
        "n_tokens",
        F.substring(
            F.md5(
                F.concat_ws(
                    ":",
                    F.col("epoch").cast("string"),
                    F.col("doc_id").cast("string"),
                )
            ),
            1,
            2,
        ).alias("chunk"),
    )
    return assigned.groupBy("epoch", "chunk").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("chunk_tokens"),
        F.min("doc_id").cast("long").alias("min_doc_id"),
        F.max("doc_id").cast("long").alias("max_doc_id"),
    )


#: Total sample size the Neyman allocator distributes across strata.
NEYMAN_TOTAL_N = 1_000


@register(
    "sample_neyman_allocation",
    sql=f"""
        WITH c AS (
            SELECT o_orderpriority AS stratum,
                   CAST(round(o_totalprice * 100) AS BIGINT) AS x
            FROM orders
        ),
        m AS (
            SELECT stratum,
                   CAST(count(*) AS BIGINT) AS n_pop,
                   CAST(sum(x) AS BIGINT) AS s1,
                   sum(CAST(x AS DECIMAL(18,0)) * x) AS s2
            FROM c GROUP BY stratum
        ),
        sd AS (
            SELECT stratum, n_pop,
                   sqrt(CAST(s2 AS DOUBLE) / n_pop
                        - (CAST(s1 AS DOUBLE) / n_pop)
                          * (CAST(s1 AS DOUBLE) / n_pop)) AS sigma
            FROM m
        ),
        tot AS (SELECT sum(n_pop * sigma) AS w FROM sd)
        SELECT stratum, n_pop, round(sigma / 100, 4) AS sigma_dollars,
               CAST(round({NEYMAN_TOTAL_N} * n_pop * sigma / w) AS BIGINT)
                   AS n_alloc
        FROM sd, tot
    """,
)
def sample_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal stratified sample allocation: n_h proportional to
    N_h * sigma_h — the sampling-theory answer to 'how many rows from
    each stratum', minimizing the estimator variance of a stratified
    mean under a fixed total budget (proportional allocation ignores
    within-stratum spread; Neyman samples volatile strata harder).
    Output per order-priority stratum: population size, within-stratum
    sigma, and the allocated sample size out of NEYMAN_TOTAL_N.

    Exactness: population moments are exact integer/decimal sums (the
    stat_skew_kurtosis recipe); sigma and the allocation render in one
    fixed expression each, rounded identically. The w normalizer sums
    5 doubles via one aggregation over the 5-row stratum relation —
    at that cardinality both engines add in the same single-partition
    order. Scale shape: one map-side-combined aggregate over the fact
    table; everything after is 5-row scalar math — the allocator
    output is the broadcastable contract the actual sampler
    (sample_stratified) consumes."""
    o = table(spark, sf_dir, "orders")
    c = o.select(
        F.col("o_orderpriority").alias("stratum"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("x"),
    )
    m = c.groupBy("stratum").agg(
        F.count("*").cast("long").alias("n_pop"),
        F.sum("x").cast("long").alias("s1"),
        F.sum(F.col("x").cast("decimal(18,0)") * F.col("x")).alias("s2"),
    )
    n = F.col("n_pop").cast("double")
    mu = F.col("s1").cast("double") / n
    sd = m.select(
        "stratum",
        "n_pop",
        F.sqrt(F.col("s2").cast("double") / n - mu * mu).alias("sigma"),
    )
    tot = sd.agg(F.sum(F.col("n_pop") * F.col("sigma")).alias("w"))
    return sd.crossJoin(F.broadcast(tot)).select(
        "stratum",
        "n_pop",
        F.round(F.col("sigma") / 100, 4).alias("sigma_dollars"),
        F.round(
            NEYMAN_TOTAL_N * F.col("n_pop") * F.col("sigma") / F.col("w"), 0
        )
        .cast("long")
        .alias("n_alloc"),
    )


@register(
    "corpus_filter_funnel",
    sql="""
        WITH staged AS (
            SELECT doc_id,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                   len(string_split(text, ' ')) >= 30 AS pass_len,
                   len(list_distinct(string_split(text, ' '))) * 1.0
                       / len(string_split(text, ' ')) >= 0.3 AS pass_rep,
                   row_number() OVER (PARTITION BY sha256(text)
                                      ORDER BY doc_id) = 1 AS pass_dedup
            FROM documents WHERE text <> ''
        ),
        flags AS (
            SELECT n_tokens,
                   pass_len,
                   pass_len AND pass_rep AS thru_rep,
                   pass_len AND pass_rep AND pass_dedup AS thru_dedup
            FROM staged
        ),
        stages AS (
            SELECT 'S0_input' AS stage, CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(n_tokens) AS BIGINT) AS n_tokens FROM flags
            UNION ALL
            SELECT 'S1_length', count(*), sum(n_tokens)
            FROM flags WHERE pass_len
            UNION ALL
            SELECT 'S2_repetition', count(*), sum(n_tokens)
            FROM flags WHERE thru_rep
            UNION ALL
            SELECT 'S3_dedup', count(*), sum(n_tokens)
            FROM flags WHERE thru_dedup
        )
        SELECT stage, CAST(n_docs AS BIGINT) AS n_docs,
               CAST(n_tokens AS BIGINT) AS n_tokens
        FROM stages
    """,
)
def corpus_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation attrition funnel: how many documents (and tokens)
    survive each cumulative stage of the corpus_curation_pipeline
    gauntlet — input -> length gate -> repetition gate -> exact dedup.
    The report every data-curation review opens with ('we dropped 40%
    at the repetition filter — is that filter or fixture?'), and the
    audit twin of corpus_curation_pipeline, which emits the survivors
    but not the attrition.

    One scan computes every stage flag (the dedup flag is the same
    content-hash window the pipeline uses), so the funnel costs ONE
    corpus pass + a 4-row aggregate — never one job per stage.
    Counts/token sums are exact integers; stages are cumulative by
    construction (monotone non-increasing, the pinned test)."""
    d = table(spark, sf_dir, "documents").filter(F.col("text") != "")
    toks = F.split("text", " ")
    w = Window.partitionBy(F.sha2("text", 256)).orderBy("doc_id")
    staged = d.select(
        F.size(toks).cast("long").alias("n_tokens"),
        (F.size(toks) >= 30).alias("pass_len"),
        (
            F.size(F.array_distinct(toks)) * 1.0 / F.size(toks) >= 0.3
        ).alias("pass_rep"),
        (F.row_number().over(w) == 1).alias("pass_dedup"),
    )
    flags = staged.select(
        "n_tokens",
        "pass_len",
        (F.col("pass_len") & F.col("pass_rep")).alias("thru_rep"),
        (
            F.col("pass_len") & F.col("pass_rep") & F.col("pass_dedup")
        ).alias("thru_dedup"),
    )
    agg = flags.agg(
        F.count("*").alias("n0"),
        F.sum("n_tokens").alias("t0"),
        F.sum(F.col("pass_len").cast("long")).alias("n1"),
        F.sum(F.when(F.col("pass_len"), F.col("n_tokens")).otherwise(0)).alias(
            "t1"
        ),
        F.sum(F.col("thru_rep").cast("long")).alias("n2"),
        F.sum(F.when(F.col("thru_rep"), F.col("n_tokens")).otherwise(0)).alias(
            "t2"
        ),
        F.sum(F.col("thru_dedup").cast("long")).alias("n3"),
        F.sum(
            F.when(F.col("thru_dedup"), F.col("n_tokens")).otherwise(0)
        ).alias("t3"),
    )
    stages = F.array(
        F.struct(
            F.lit("S0_input").alias("stage"),
            F.col("n0").cast("long").alias("n_docs"),
            F.col("t0").cast("long").alias("n_tokens"),
        ),
        F.struct(
            F.lit("S1_length").alias("stage"),
            F.col("n1").cast("long").alias("n_docs"),
            F.col("t1").cast("long").alias("n_tokens"),
        ),
        F.struct(
            F.lit("S2_repetition").alias("stage"),
            F.col("n2").cast("long").alias("n_docs"),
            F.col("t2").cast("long").alias("n_tokens"),
        ),
        F.struct(
            F.lit("S3_dedup").alias("stage"),
            F.col("n3").cast("long").alias("n_docs"),
            F.col("t3").cast("long").alias("n_tokens"),
        ),
    )
    return agg.select(F.explode(stages).alias("s")).select(
        "s.stage", "s.n_docs", "s.n_tokens"
    )


@register(
    "sample_split_by_content",
    sql=f"""
        SELECT doc_id,
               CASE WHEN substr(md5(sha256(text)), 1, 2) < '{_TRAIN_HI}'
                    THEN 'train'
                    WHEN substr(md5(sha256(text)), 1, 2) < '{_VAL_HI}'
                    THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    """,
)
def sample_split_by_content(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-keyed train/val/test split: the hash key is the
    DOCUMENT CONTENT (sha256 of the text), not the row id — so exact
    duplicates always land in the SAME split, closing the eval-
    leakage hole sample_hash_split's id-keyed form leaves open (two
    copies of one document split across train and test is
    memorization measured as generalization; cf. text_decontaminate
    for the near-match version). Same ~80/10/10 hex-prefix thresholds
    as the id-keyed split; same narrow-map scale shape — the extra
    sha256 is the only cost, and it is the same digest the dedup
    family already computes (one shared scan in a fused pipeline).
    The pinned test plants cross-split duplicates and asserts they
    co-locate."""
    d = table(spark, sf_dir, "documents")
    prefix = F.substring(F.md5(F.sha2("text", 256)), 1, 2)
    return d.select(
        "doc_id",
        F.when(prefix < _TRAIN_HI, "train")
        .when(prefix < _VAL_HI, "val")
        .otherwise("test")
        .alias("split"),
    )


#: Fold count for content-keyed cross-validation assignment.
KFOLD_K = 5


@register(
    "sample_kfold_assign",
    sql=f"""
        SELECT doc_id,
               CAST(CAST('0x' || substr(md5(sha256(text)), 1, 15)
                         AS BIGINT) % {KFOLD_K} AS INTEGER) AS fold
        FROM documents
    """,
)
def sample_kfold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-keyed K-FOLD assignment for cross-validation over the
    corpus: fold = md5(sha256(text)) mod K — keyed on CONTENT like
    sample_split_by_content, so exact duplicates always share a fold
    and no eval fold ever holds a copy of a training document (the
    k-fold version of the eval-leakage hole). The hash-to-int uses the
    repo's portable idiom (15 hex chars of md5 parsed base-16 — fits
    int64, verified bit-identical Spark conv vs DuckDB '0x' cast, see
    dedup_minhash); mod K of a uniform 60-bit integer gives folds
    balanced to ~1/sqrt(n) without any shuffle — the assignment is a
    NARROW MAP, embarrassingly parallel at 100 TB, and stable under
    any repartitioning or re-run (no rand(), no row_number).
    Fold-balance and duplicate-colocation are property-tested."""
    d = table(spark, sf_dir, "documents")
    h = F.conv(
        F.substring(F.md5(F.sha2("text", 256)), 1, 15), 16, 10
    ).cast("long")
    return d.select("doc_id", (h % KFOLD_K).cast("int").alias("fold"))


#: End-to-end corpus build constants (quality gate as in
#: corpus_curation_pipeline; decon bench slice as in
#: text_decontaminate; pack budget as in pack_sequences).
BUILD_MIN_TOKENS = 30
BUILD_DISTINCT_RATIO = 0.3
BUILD_BENCH_MOD = 97
BUILD_SHINGLE_K = 5
BUILD_OVERLAP_MIN = 2
BUILD_PACK_BUDGET = 512


@register(
    "corpus_pretrain_build",
    sql=f"""
        WITH toks AS (
            SELECT doc_id, source, text, string_split(text, ' ') AS ts
            FROM documents
        ),
        quality AS (
            SELECT doc_id, source, text, ts,
                   CAST(len(ts) AS BIGINT) AS n_tokens
            FROM toks
            WHERE len(ts) >= {BUILD_MIN_TOKENS}
              AND len(list_distinct(ts)) * 1.0 / len(ts)
                  >= {BUILD_DISTINCT_RATIO}
        ),
        deduped AS (
            SELECT doc_id, source, text, ts, n_tokens FROM (
                SELECT *, row_number() OVER (PARTITION BY sha256(text)
                                             ORDER BY doc_id) AS rn
                FROM quality
            ) WHERE rn = 1
        ),
        bench_sh AS (
            SELECT DISTINCT
                   unnest(list_transform(
                       range(1, len(ts) - {BUILD_SHINGLE_K} + 2),
                       i -> array_to_string(ts[i:i + {BUILD_SHINGLE_K} - 1],
                                            ' ')
                   )) AS sh
            FROM toks
            WHERE doc_id % {BUILD_BENCH_MOD} = 0
              AND len(ts) >= {BUILD_SHINGLE_K}
        ),
        doc_sh AS (
            SELECT doc_id,
                   unnest(list_transform(
                       range(1, len(ts) - {BUILD_SHINGLE_K} + 2),
                       i -> array_to_string(ts[i:i + {BUILD_SHINGLE_K} - 1],
                                            ' ')
                   )) AS sh
            FROM deduped
            WHERE len(ts) >= {BUILD_SHINGLE_K}
        ),
        contaminated AS (
            SELECT s.doc_id
            FROM doc_sh s JOIN bench_sh b ON s.sh = b.sh
            GROUP BY s.doc_id
            HAVING count(DISTINCT s.sh) >= {BUILD_OVERLAP_MIN}
        ),
        clean AS (
            SELECT d.doc_id, d.source, d.text, d.n_tokens
            FROM deduped d
            WHERE d.doc_id % {BUILD_BENCH_MOD} != 0
              AND d.doc_id NOT IN (SELECT doc_id FROM contaminated)
        ),
        split_assigned AS (
            SELECT doc_id, source, n_tokens,
                   CASE WHEN substr(md5(sha256(text)), 1, 2) < 'cd'
                        THEN 'train'
                        WHEN substr(md5(sha256(text)), 1, 2) < 'e6'
                        THEN 'val'
                        ELSE 'test' END AS split
            FROM clean
        ),
        packed AS (
            SELECT split, source, doc_id, n_tokens,
                   CAST(floor((sum(n_tokens) OVER (
                            PARTITION BY split, source ORDER BY doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                        ) - n_tokens) / {BUILD_PACK_BUDGET}) AS BIGINT)
                       AS pack_id
            FROM split_assigned
        )
        SELECT split, source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
               CAST(count(DISTINCT pack_id) AS BIGINT) AS n_packs
        FROM packed
        GROUP BY split, source
    """,
)
def corpus_pretrain_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WHOLE pretraining-corpus build as ONE declarative pipeline —
    the operators a curation run chains, fused so Catalyst plans them
    together instead of as checkpointed stages: quality gate (length +
    distinct-token ratio) -> exact content dedup (min-doc_id keeper)
    -> benchmark decontamination (5-gram overlap vs the held-out
    bench slice, bench docs themselves excluded) -> content-keyed
    train/val/test assignment (duplicates cannot straddle splits) ->
    contiguous sequence packing per (split, source) -> the per-cell
    build report (docs, tokens, packs) a training launch reads.

    This is the batch thesis artifact next to stream_curation_pipe's
    streaming one: a reference user's end-to-end job expressed as one
    DataFrame expression with an exact single-statement SQL twin.
    Scale shape: every stage is a shape this repo has already
    plan-pinned in isolation — narrow-map gates, one content-hash
    window, the capped inverted-index decon join, a hash split, ONE
    (split, source) shuffle shared by the packing window and the
    final aggregate. Nothing quadratic, nothing driver-sized."""
    # Tokenize ONCE into a materialized column (r15): `ts` as a bare
    # expression re-ran split(text) inside every consumer expression of
    # every branch (quality gate x3, n_tokens, both shingle branches) —
    # A/B at sf0.1/local[32]: 3.37 s -> 1.71 s min-of-3 just from
    # carrying the array instead of the recipe. (A localCheckpoint of
    # the deduped stage was also measured: no further gain, rejected.)
    d = table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text", F.split("text", " ").alias("toks")
    )
    ts = F.col("toks")
    quality = d.filter(
        (F.size(ts) >= BUILD_MIN_TOKENS)
        & (
            F.size(F.array_distinct(ts)) / F.size(ts)
            >= BUILD_DISTINCT_RATIO
        )
    ).select(
        "doc_id",
        "source",
        "text",
        "toks",
        F.size(ts).cast("long").alias("n_tokens"),
    )
    wdup = Window.partitionBy(F.sha2("text", 256)).orderBy("doc_id")
    deduped = (
        quality.withColumn("rn", F.row_number().over(wdup))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    shingle = lambda df: df.filter(F.size(ts) >= BUILD_SHINGLE_K).select(  # noqa: E731
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size(ts) - BUILD_SHINGLE_K + 1),
                lambda i: F.array_join(F.slice(ts, i, BUILD_SHINGLE_K), " "),
            )
        ).alias("sh"),
    )
    bench_sh = (
        shingle(d.filter(F.col("doc_id") % BUILD_BENCH_MOD == 0))
        .select("sh")
        .distinct()
    )
    doc_sh = shingle(deduped.select("doc_id", "toks"))
    contaminated = (
        doc_sh.join(bench_sh, "sh")
        .groupBy("doc_id")
        .agg(F.countDistinct("sh").alias("n_shared"))
        .filter(F.col("n_shared") >= BUILD_OVERLAP_MIN)
        .select("doc_id")
    )
    clean = (
        deduped.filter(F.col("doc_id") % BUILD_BENCH_MOD != 0)
        .join(contaminated, "doc_id", "left_anti")
    )
    prefix = F.substring(F.md5(F.sha2("text", 256)), 1, 2)
    assigned = clean.select(
        "doc_id",
        "source",
        "n_tokens",
        F.when(prefix < "cd", "train")
        .when(prefix < "e6", "val")
        .otherwise("test")
        .alias("split"),
    )
    wpack = (
        Window.partitionBy("split", "source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = assigned.withColumn(
        "pack_id",
        F.floor(
            (F.sum("n_tokens").over(wpack) - F.col("n_tokens"))
            / BUILD_PACK_BUDGET
        ),
    )
    return packed.groupBy("split", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.countDistinct("pack_id").alias("n_packs"),
    )


@register(
    "sample_contrastive_pairs",
    sql="""
        WITH h AS (
            SELECT doc_id, sha256(text) AS chash FROM documents
        ),
        keepers AS (
            SELECT chash, min(doc_id) AS keeper FROM h GROUP BY chash
        ),
        positives AS (
            SELECT k.keeper AS anchor_id, h.doc_id AS other_id,
                   1 AS label
            FROM h JOIN keepers k ON h.chash = k.chash
            WHERE h.doc_id <> k.keeper
        ),
        shuffled AS (
            SELECT doc_id, chash,
                   row_number() OVER (
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                   ) AS rn
            FROM h
        ),
        negatives AS (
            SELECT a.doc_id AS anchor_id, b.doc_id AS other_id, 0 AS label
            FROM shuffled a JOIN shuffled b ON b.rn = a.rn + 1
            WHERE a.rn % 2 = 1 AND a.chash <> b.chash
        )
        SELECT anchor_id, other_id, CAST(label AS INTEGER) AS label
        FROM positives
        UNION ALL
        SELECT anchor_id, other_id, CAST(label AS INTEGER) AS label
        FROM negatives
    """,
)
def sample_contrastive_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONTRASTIVE training-pair generation — the (anchor, other,
    label) examples an embedding model trains on: POSITIVES are
    exact-duplicate pairs (each non-keeper paired with its content
    group's keeper — real paraphrase mining would swap in the MinHash
    candidates, same plumbing), NEGATIVES are a deterministic
    hash-shuffle pairing (order by md5(doc_id), pair odd rank with its
    successor, drop the cryptographically-unlikely same-content
    collision) — the standard "random negatives" recipe made
    reproducible: no RNG, so re-runs, retried tasks, and the oracle
    all see byte-identical pairs (the repo's sampling discipline).

    Scale shape: positives are one content-hash groupBy + join-back;
    negatives are one rank window + a self-join on rank+1 (both sides
    range-partitioned by rn — a co-partitioned merge at any size).
    Output is linear in corpus size. At 100 TB the global rank window
    would become a per-partition rank + partition-offset add (the
    sample_epoch_shuffle pattern); at fixture scale the single window
    is the clearer plan."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.sha2("text", 256).alias("chash")
    )
    keepers = d.groupBy("chash").agg(F.min("doc_id").alias("keeper"))
    positives = (
        d.join(keepers, "chash")
        .filter(F.col("doc_id") != F.col("keeper"))
        .select(
            F.col("keeper").alias("anchor_id"),
            F.col("doc_id").alias("other_id"),
            F.lit(1).alias("label"),
        )
    )
    w = Window.orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
    shuffled = d.select(
        "doc_id", "chash", F.row_number().over(w).alias("rn")
    )
    a = shuffled.filter(F.col("rn") % 2 == 1).select(
        F.col("doc_id").alias("anchor_id"),
        F.col("chash").alias("chash_a"),
        F.col("rn").alias("rn_a"),
    )
    b = shuffled.select(
        F.col("doc_id").alias("other_id"),
        F.col("chash").alias("chash_b"),
        F.col("rn").alias("rn_b"),
    )
    negatives = (
        a.join(b, a.rn_a + 1 == b.rn_b)
        .filter(F.col("chash_a") != F.col("chash_b"))
        .select("anchor_id", "other_id", F.lit(0).alias("label"))
    )
    return positives.unionAll(negatives).select(
        "anchor_id", "other_id", F.col("label").cast("int").alias("label")
    )
