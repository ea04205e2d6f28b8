"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with
a metadata struct; decode/feature-extraction runs as Arrow-batched
``mapInPandas`` (the pattern that scales: one Python worker per
partition, columnar transfer, bounded batches).  The actual media
codecs are NOT available in this environment, so the decode step is a
deterministic fake behind ``decode_stub`` — the Spark-side plumbing
(schema, batching, partitioning) is real and tested.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .relational import load


def binarize_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Create a multimodal-shaped table from documents: payload =
    utf-8 bytes, plus typed metadata (size, content hash, media
    type).  All JVM-side."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.octet_length(F.encode("text", "utf-8")).cast("long").alias("n_bytes"),
        F.sha2("text", 256).alias("content_sha256"),
        F.lit("text/plain").alias("media_type"),
    )


FEATURE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("n_bytes", LongType()),
    StructField("mean_byte", DoubleType()),
    StructField("head_bytes", ArrayType(LongType())),
    StructField("media_type", StringType()),
])


def decode_stub(payload: bytes, media_type: str) -> dict:
    """Deterministic fake decoder.  A real deployment swaps this for
    PIL/librosa/ffmpeg; the container has none of them, so raise for
    genuinely binary media and compute byte-level features for text.
    """
    if media_type.startswith(("image/", "audio/", "video/")):
        raise NotImplementedError(
            f"media codec for {media_type} not available in this environment"
        )
    return {
        "n_bytes": len(payload),
        "mean_byte": (sum(payload) / len(payload)) if payload else 0.0,
        "head_bytes": list(payload[:8]),
    }


def extract_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.  The
    UDF boundary is per-partition ``mapInPandas`` — batch shape
    (pandas DataFrame of payload bytes), not per-row Python calls."""

    # NOTE: the closure must not reference module-level symbols —
    # cloudpickle serializes top-level functions by module reference,
    # and executors may not have this repo on PYTHONPATH (the driver
    # adding it to sys.path at runtime does not propagate to workers)
    def _decode(payload: bytes, media_type: str) -> dict:
        if media_type.startswith(("image/", "audio/", "video/")):
            raise NotImplementedError(
                f"media codec for {media_type} not available"
            )
        return {
            "n_bytes": len(payload),
            "mean_byte": (sum(payload) / len(payload)) if payload else 0.0,
            "head_bytes": list(payload[:8]),
        }

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode(p, m)
                for p, m in zip(pdf["payload"], pdf["media_type"])
            ]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "n_bytes": [f["n_bytes"] for f in feats],
                "mean_byte": [f["mean_byte"] for f in feats],
                "head_bytes": [f["head_bytes"] for f in feats],
                "media_type": pdf["media_type"],
            })

    return df.mapInPandas(_extract, FEATURE_SCHEMA)


def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checkable metadata slice of the multimodal table."""
    return binarize_documents(spark, sf_dir).select(
        "doc_id", "n_bytes", "content_sha256", "media_type"
    )


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end binary pipeline: binarize -> mapInPandas feature
    extraction (deterministic, so repeat runs hash identically)."""
    return extract_features(binarize_documents(spark, sf_dir)).select(
        "doc_id", "n_bytes", "mean_byte",
        F.expr("head_bytes[0]").alias("first_byte"),
    )


RESIZED_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("payload", BinaryType()),
    StructField("n_bytes", LongType()),
    StructField("media_type", StringType()),
])


def resize_stub(payload: bytes, media_type: str, target_bytes: int) -> bytes:
    """Deterministic stand-in for an image/audio resample: truncate or
    zero-pad the payload to ``target_bytes``.  A real deployment swaps
    in PIL.Image.resize / librosa.resample; the Spark-side contract
    (binary in, binary out, bounded batch memory) is identical."""
    if media_type.startswith(("image/", "audio/", "video/")):
        raise NotImplementedError(
            f"media codec for {media_type} not available in this environment"
        )
    if len(payload) >= target_bytes:
        return bytes(payload[:target_bytes])
    return bytes(payload) + b"\x00" * (target_bytes - len(payload))


def resize_payloads(df: DataFrame, target_bytes: int = 64) -> DataFrame:
    """Arrow-batched 'resize' over the binary column via mapInPandas
    (one Python worker per partition; no driver involvement)."""

    def _do_resize(payload: bytes, media_type: str) -> bytes:
        # self-contained for worker-side pickling (see extract_features)
        if media_type.startswith(("image/", "audio/", "video/")):
            raise NotImplementedError(
                f"media codec for {media_type} not available"
            )
        if len(payload) >= target_bytes:
            return bytes(payload[:target_bytes])
        return bytes(payload) + b"\x00" * (target_bytes - len(payload))

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = [
                _do_resize(p, m)
                for p, m in zip(pdf["payload"], pdf["media_type"])
            ]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "payload": resized,
                "n_bytes": [len(r) for r in resized],
                "media_type": pdf["media_type"],
            })

    return df.mapInPandas(_resize, RESIZED_SCHEMA)


def frame_sample_plan(
    df: DataFrame, every_n_bytes: int = 64, max_frames: int = 4
) -> DataFrame:
    """'Frame sampling' over the opaque payload: take a byte every
    ``every_n_bytes`` as a stand-in for video frame extraction —
    demonstrates slicing binary columns without leaving the JVM."""
    return df.select(
        "doc_id",
        F.expr(
            f"transform(sequence(0, least(int(n_bytes / {every_n_bytes}), "
            f"{max_frames - 1})), i -> substring(payload, i * {every_n_bytes} + 1, 1))"
        ).alias("frames"),
    ).withColumn("n_frames", F.size("frames"))
