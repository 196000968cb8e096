"""Multimodal-column plans: binary metadata (oracle-checked) and the
mapInPandas feature-extraction plumbing (rows-only check — the decode
is a deterministic stub, not SQL-expressible)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import multimodal
from ..session import read_table


def binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    with_bin = multimodal.attach_binary(docs)
    return with_bin.select(
        "doc_id",
        F.col("meta.mime").alias("mime"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.sha").alias("sha"),
    )


def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    feats = multimodal.extract_features(multimodal.attach_binary(docs))
    return feats.select(
        "doc_id", "n_bytes", F.round(F.element_at("features", 1), 6).alias("f0")
    )


def media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-resize plumbing (stubbed codec): fixed-shape binary out."""
    docs = read_table(spark, sf_dir, "documents")
    return multimodal.resize_images(
        multimodal.attach_binary(docs), width=16, height=16
    )


def media_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing (stubbed codec): row-expanding UDF."""
    docs = read_table(spark, sf_dir, "documents")
    return multimodal.sample_frames(
        multimodal.attach_binary(docs), n_frames=4, frame_bytes=64
    )


ORACLE = {
    "binary_meta": """
        SELECT doc_id, 'text/plain' AS mime,
               CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
               md5(text) AS sha
        FROM documents
    """,
    # media_features / media_resize / media_frames: pandas-UDF codec
    # stubs -> rows-only checks (unit tests pin their determinism)
}

QUERIES = {
    "binary_meta": binary_meta,
    "media_features": media_features,
    "media_resize": media_resize,
    "media_frames": media_frames,
}
