"""Multimodal column plumbing (beyond-reference tier).

Images/audio/video are opaque ``binary`` columns with typed metadata. The
Spark-side machinery — schema, Arrow-batched ``mapInPandas``, partition-safe
batch iteration — is real and oracle-verified; the actual codec calls are
STUBBED (this container has no image/audio libraries) behind
``NotImplementedError`` or a clearly-marked deterministic fake.

Design for 100 TB: binary payloads stay in Parquet (or are pointers into an
object store); decode/feature-extract runs as ``mapInPandas`` over Arrow
batches so each task streams batches without materializing a partition;
repartition by content size class upstream if payloads are skewed.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from skinnerdb_spark.queries.util import read_table
from skinnerdb_spark.registry import register

#: canonical multimodal record: payload + typed metadata
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("media_type", T.StringType()),  # image | audio | video
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("content_md5", T.StringType()),
        T.StructField("fake_width", T.LongType()),
        T.StructField("fake_height", T.LongType()),
        T.StructField("channels", T.LongType()),
    ]
)


def decode_image(content: bytes) -> object:
    """Real image decode — NOT AVAILABLE in this container (no PIL/cv2).

    The deterministic fake used by the verified pipeline is
    :func:`fake_decode_meta`; swap this in when a codec library exists.
    """
    raise NotImplementedError(
        "image codecs are not installed in this environment; "
        "use fake_decode_meta (deterministic stub) or install pillow/cv2"
    )


def sample_video_frames(content: bytes, every_n: int = 30) -> list[bytes]:
    """Real frame sampling — NOT AVAILABLE (no ffmpeg/av). Stub."""
    raise NotImplementedError("video codecs are not installed in this environment")


def fake_decode_meta(content: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for a decoder: derives (width, height, channels)
    from the content's md5 — stable across engines and runs."""
    h = hashlib.md5(content).hexdigest()
    return 64 + int(h[0:2], 16), 64 + int(h[2:4], 16), 3


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via mapInPandas.

    The Spark plumbing (batch iteration, schema contract, column pruning into
    the scan) is production-shaped; only the decode internals are fake.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf["content"]
            meta = [fake_decode_meta(bytes(c)) for c in content]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "byte_len": [len(bytes(c)) for c in content],
                    "content_md5": [hashlib.md5(bytes(c)).hexdigest() for c in content],
                    "fake_width": [m[0] for m in meta],
                    "fake_height": [m[1] for m in meta],
                    "channels": [m[2] for m in meta],
                }
            )

    return media.mapInPandas(gen, schema=FEATURE_SCHEMA)


# hex-digit -> int, portable SQL (both engines: strpos/instr is 1-based)
def _hexval_sql(ch: str) -> str:
    return f"(STRPOS('0123456789abcdef', {ch}) - 1)"


_FEATURE_ORACLE = f"""
    SELECT doc_id AS media_id,
           CAST(OCTET_LENGTH(CAST(text AS BLOB)) AS BIGINT) AS byte_len,
           md5(text) AS content_md5,
           CAST(64 + 16 * {_hexval_sql("SUBSTR(md5(text), 1, 1)")}
                   + {_hexval_sql("SUBSTR(md5(text), 2, 1)")} AS BIGINT) AS fake_width,
           CAST(64 + 16 * {_hexval_sql("SUBSTR(md5(text), 3, 1)")}
                   + {_hexval_sql("SUBSTR(md5(text), 4, 1)")} AS BIGINT) AS fake_height,
           CAST(3 AS BIGINT) AS channels
    FROM documents
"""


@register("multimodal_features", _FEATURE_ORACLE, tags=("multimodal", "pipeline"))
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end multimodal pipeline on real data: documents.text encoded to
    a binary payload column, then Arrow/mapInPandas feature extraction.

    The oracle recomputes the deterministic fake decode in pure SQL (md5 of
    the same UTF-8 bytes), so the whole Python-side batch path — Arrow
    transfer, schema contract, per-batch iteration — is value-verified.
    """
    d = read_table(spark, sf_dir, "documents")
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.col("text").cast("binary").alias("content"),
        F.lit("image").alias("media_type"),
    )
    return extract_features(media)
