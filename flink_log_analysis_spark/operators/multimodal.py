"""Multimodal (image/audio/video) column plumbing.

Media lives in DataFrames as **opaque binary columns + typed metadata**
(the pattern used by large-scale multimodal training pipelines):

    content  BINARY                 -- raw encoded bytes
    meta     STRUCT<mime: STRING, n_bytes: INT, sha: STRING>

Decode / feature-extraction runs as Arrow-batched ``mapInPandas`` so
bytes never round-trip per row. The actual codec step needs image/audio
libraries that are NOT in this container — it is STUBBED: with
``fake=True`` (default) a deterministic byte-statistics "decode" stands
in so the Spark-side plumbing (schema, batching, partitioning) is real
and tested; ``fake=False`` raises NotImplementedError where a real
pillow/librosa call would go.

Scale notes: binary payloads dominate row size — keep media tables
separate from text/metadata tables and join on id; decode stages should
``repartition`` by id to right-size Arrow batches, and feature outputs
(small, fixed-width) should be written to their own table so downstream
training-data queries never rescan the media bytes.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

if TYPE_CHECKING:
    import pandas as pd

FEATURE_DIM = 8

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", IntegerType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)

RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("content", BinaryType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)


def attach_binary(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Materialize the binary-column convention from a text column
    (stand-in for reading real media files at ingest)."""
    blob = F.encode(F.col(text_col), "utf-8")
    return df.withColumn("content", blob).withColumn(
        "meta",
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.octet_length(blob).alias("n_bytes"),
            F.md5(blob).alias("sha"),
        ),
    )


def extract_features(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "doc_id",
    fake: bool = True,
) -> DataFrame:
    """Arrow-batched feature extraction over binary media.

    Real decode path is stubbed (no media libs in this container); the
    mapInPandas contract — batch iterator in, fixed schema out — is the
    production shape either way.
    """
    if not fake:
        raise NotImplementedError(
            "real media decode needs pillow/librosa (not installed); "
            "run with fake=True for the deterministic byte-stats stand-in"
        )

    # Self-contained closure: everything the worker runs is captured by
    # value (no reference to this module), so externally-launched
    # sessions whose Python workers lack this package on PYTHONPATH
    # still execute it.
    feature_dim = FEATURE_DIM

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        def decode(buf: bytes) -> list[float]:
            # Deterministic stand-in for a real image/audio decode:
            # fixed-width byte-statistics vector (mean per stripe).
            n = max(len(buf), 1)
            stripe = max(n // feature_dim, 1)
            out = []
            for i in range(feature_dim):
                chunk = buf[i * stripe : (i + 1) * stripe] or b"\x00"
                out.append(round(sum(chunk) / len(chunk) / 255.0, 6))
            return out

        for pdf in it:
            # NULL media payloads (failed fetch, tombstone rows) must
            # degrade to the empty-payload vector, not kill the job.
            content = pdf[content_col].map(lambda b: b if b is not None else b"")
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": content.map(len).astype("int32"),
                    "features": content.map(decode),
                }
            )

    from ..session import ensure_min_partitions, udf_partition_target

    # Wide partitioning -> parallel Python workers + right-sized Arrow
    # batches (a single-partition input would serialize the UDF).
    return ensure_min_partitions(
        df.select(id_col, content_col), udf_partition_target(df)
    ).mapInPandas(batches, FEATURE_SCHEMA)


def resize_images(
    df: DataFrame,
    width: int = 64,
    height: int = 64,
    content_col: str = "content",
    id_col: str = "doc_id",
    fake: bool = True,
) -> DataFrame:
    """Arrow-batched image resize over binary media.

    Real path (``fake=False``) is where a pillow ``Image.resize`` call
    goes — stubbed (no media libs in this container). The fake path is
    a deterministic byte resample: the payload is stretched/shrunk to
    ``width*height`` bytes by index scaling, preserving the contract
    that output size is shape-determined, not input-determined — which
    is what downstream batch/memory planning relies on.
    """
    if not fake:
        raise NotImplementedError(
            "real image resize needs pillow (not installed); "
            "run with fake=True for the deterministic byte resample"
        )

    from ..session import ensure_min_partitions, udf_partition_target

    out_len = width * height
    w, h = width, height

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        def resample(buf: bytes) -> bytes:
            n = max(len(buf), 1)
            return bytes(buf[(i * n) // out_len] if buf else 0
                         for i in range(out_len))

        for pdf in it:
            content = pdf[content_col].map(lambda b: b if b is not None else b"")
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "width": w,
                    "height": h,
                    "content": content.map(resample),
                }
            )

    return ensure_min_partitions(
        df.select(id_col, content_col), udf_partition_target(df)
    ).mapInPandas(batches, RESIZE_SCHEMA)


def sample_frames(
    df: DataFrame,
    n_frames: int = 4,
    frame_bytes: int = 256,
    content_col: str = "content",
    id_col: str = "doc_id",
    fake: bool = True,
) -> DataFrame:
    """Arrow-batched video frame sampling: one input row -> n_frames
    output rows (the row-expanding mapInPandas shape).

    Real path is where an ffmpeg/pyav keyframe extraction goes —
    stubbed. The fake path slices the payload into n_frames evenly
    spaced windows, which exercises the real contract: row explosion,
    stable frame indexing, bounded per-frame size.
    """
    if not fake:
        raise NotImplementedError(
            "real frame sampling needs pyav/ffmpeg (not installed); "
            "run with fake=True for the deterministic byte windows"
        )

    from ..session import ensure_min_partitions, udf_partition_target

    nf, fb = n_frames, frame_bytes

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            ids, idxs, frames = [], [], []
            for doc_id, buf in zip(pdf[id_col], pdf[content_col]):
                buf = buf if buf is not None else b""
                n = len(buf)
                stride = max(n // nf, 1)
                for i in range(nf):
                    start = min(i * stride, max(n - 1, 0))
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(bytes(buf[start : start + fb]))
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return ensure_min_partitions(
        df.select(id_col, content_col), udf_partition_target(df)
    ).mapInPandas(batches, FRAME_SCHEMA)
