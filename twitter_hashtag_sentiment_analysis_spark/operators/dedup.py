"""Deduplication operators (BASELINE.json north-star: the LLM-training-
data pipeline surface).

Five levels, cheap to expensive, all distributed:

* exact          — content hash + groupBy (one shuffle on the hash)
* minhash LSH    — MLlib MinHashLSH banding join (candidate pairs only)
* simhash        — 32-bit sign-aggregated token hashes, banded join
* n-gram jaccard — shingle inverted-index self-join with hot-shingle cap
* embedding      — cosine near-dup, see similarity.py (shared kernel)

Scale notes: every operator here is join/agg-shaped — no driver-side
loops, no collect. The O(n^2) baselines are bounded by banding (LSH,
simhash bytes) or by document-frequency caps (shingle join), which is
exactly how the published MinHash/SimHash pipelines bound the pair
space at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import table
from ..registry import register


@register(
    "dedup_exact",
    sql="""
        SELECT sha256(text) AS content_hash,
               CAST(min(doc_id) AS BIGINT) AS keeper_doc_id,
               CAST(count(*) AS BIGINT) AS n_copies
        FROM documents
        GROUP BY sha256(text)
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash: deterministic keeper = min doc_id.
    One hash-shuffle; the keeper rule avoids dropDuplicates' arbitrary
    'first arrival wins' nondeterminism."""
    d = table(spark, sf_dir, "documents")
    return d.groupBy(F.sha2("text", 256).alias("content_hash")).agg(
        F.min("doc_id").alias("keeper_doc_id"),
        F.count("*").alias("n_copies"),
    )


@register("dedup_minhash", sql=None)  # murmur minhash not replicable in DuckDB
def dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash near-dup candidates via MLlib MinHashLSH over HashingTF
    token vectors (seeded — deterministic). approxSimilarityJoin only
    compares documents sharing an LSH band bucket: the pair space is
    bounded by bucket collisions, not n^2. Output: candidate pairs with
    estimated Jaccard distance <= 0.3."""
    from pyspark.ml.feature import HashingTF, MinHashLSH, Tokenizer

    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    tokens = Tokenizer(inputCol="text", outputCol="tokens").transform(d)
    tf = HashingTF(inputCol="tokens", outputCol="features", numFeatures=1 << 14)
    feats = tf.transform(tokens).filter(F.col("text") != "")
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=8, seed=42)
    model = lsh.fit(feats)
    pairs = model.approxSimilarityJoin(feats, feats, 0.3, distCol="jaccard_dist")
    return (
        pairs.filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
            F.round("jaccard_dist", 4).alias("jaccard_dist"),
        )
    )


@register("dedup_simhash", sql=None)  # murmur token hash not replicable in DuckDB
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup: 32-bit signature = sign of per-bit vote sums
    over murmur3 token hashes — entirely built-in expressions (explode,
    bitwise ops, groupBy), zero Python. Candidate generation bands the
    signature into 4 bytes and self-joins on (band_index, band_value):
    hamming-close docs share >=1 band with high probability. Output:
    candidate pairs with exact hamming distance <= 3."""
    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    h = tok.withColumn("th", F.hash("token"))
    votes = h.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.col("th").bitwiseAND(F.lit(1 << b)) != 0, 1).otherwise(-1)
            ).alias(f"v{b}")
            for b in range(32)
        ]
    )
    sig = votes.select(
        "doc_id",
        sum(
            [F.when(F.col(f"v{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0)) for b in range(32)],
            F.lit(0),
        ).cast("long").alias("simhash"),
    )
    bands = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_idx"),
                        F.shiftright("simhash", 8 * i).bitwiseAND(F.lit(0xFF)).alias("band_val"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "simhash", "band.band_idx", "band.band_val")
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cand.withColumn("hamming", hamming.cast("int"))
        .filter(F.col("hamming") <= 3)
        .select("doc_a", "doc_b", "hamming")
    )


# 3-token shingles as a DuckDB expression (1-based list indexing)
_SHINGLES_SQL = (
    "list_transform(range(1, len(string_split(text, ' ')) - 1), "
    "i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1] "
    "|| ' ' || string_split(text, ' ')[i+2])"
)


@register(
    "dedup_ngram_jaccard",
    sql=f"""
        WITH shingled AS (
            SELECT doc_id, unnest(list_distinct({_SHINGLES_SQL})) AS shingle
            FROM documents
        ),
        sizes AS (
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh FROM shingled GROUP BY doc_id
        ),
        common AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS n_common
            FROM shingled a JOIN shingled b
              ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT c.doc_a, c.doc_b,
               round(c.n_common * 1.0 / (sa.n_sh + sb.n_sh - c.n_common), 4) AS jaccard
        FROM common c
        JOIN sizes sa ON c.doc_a = sa.doc_id
        JOIN sizes sb ON c.doc_b = sb.doc_id
        WHERE c.n_common * 1.0 / (sa.n_sh + sb.n_sh - c.n_common) >= 0.2
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram (3-token shingle) Jaccard over candidate pairs from
    a shingle inverted-index self-join — the classic exact-verify stage
    behind MinHash. Pair space = docs sharing >=1 shingle; at corpus
    scale, shingles with document frequency above a cap are dropped
    first (a stopword-shingle cap), which bounds join fanout. Fully
    SQL-expressible => exact oracle."""
    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    tokens = F.split("text", " ")
    shingles_expr = F.expr(
        "transform(sequence(1, size(split(text, ' ')) - 2), "
        "i -> concat_ws(' ', element_at(split(text, ' '), i), "
        "element_at(split(text, ' '), i+1), element_at(split(text, ' '), i+2)))"
    )
    shingled = d.select(
        "doc_id", F.explode(F.array_distinct(shingles_expr)).alias("shingle")
    )
    sizes = shingled.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a, b = shingled.alias("a"), shingled.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("n_common") / (F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("n_common"))
    return (
        common.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .filter(jac >= 0.2)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
    )
