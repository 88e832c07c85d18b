"""Multimodal-column queries (BASELINE.json north star): binary media blobs
with typed metadata, decode / feature-extract / frame-sample over
mapInPandas.  The blob payload is the document text bytes, so the decode
output is fully determined by `documents` — the decode oracle checks the
whole binary round-trip (pack header JVM-side -> Arrow -> numpy parse)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.multimodal import (
    byte_histogram_features,
    decode_media,
    sample_frames,
    synth_media,
)
from .queries import query, t
from .queries_textml import _spread


@query(
    "q_multimodal_decode",
    oracle="""
SELECT doc_id AS media_id,
       CASE WHEN doc_id % 3 = 0 THEN 'image'
            WHEN doc_id % 3 = 1 THEN 'audio'
            ELSE 'video' END AS kind,
       CAST(n_chars % 64 + 1 AS BIGINT) AS width,
       CAST(8 AS BIGINT) AS height,
       CAST(1 AS BIGINT) AS channels,
       CAST(octet_length(encode(text)) // ((n_chars % 64 + 1) * 8) AS BIGINT) AS n_frames,
       CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes,
       true AS valid
FROM documents
""",
)
def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode metadata from packed binary blobs: widths/frames recomputed by
    the oracle straight from n_chars proves the header round-trip."""
    media = synth_media(t(spark, sf_dir, "documents"))
    return decode_media(media).drop("mean_byte")  # byte-mean not SQL-expressible


@query("q_multimodal_features")  # rows-only: numpy histogram vector
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-histogram feature vectors (array<float>) per media blob."""
    media = synth_media(_spread(t(spark, sf_dir, "documents"), spark))
    return byte_histogram_features(media, bins=16)


@query("q_multimodal_frames")  # rows-only: UDTF fan-out
def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every 4th 'video frame' sampled: 1 blob -> N frame rows."""
    media = synth_media(_spread(t(spark, sf_dir, "documents"), spark)).where(
        F.col("kind") == "video"
    )
    return sample_frames(media, every_k=4)
