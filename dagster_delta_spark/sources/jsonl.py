"""JSON-lines corpus source/sink.

LLM training corpora commonly arrive as JSONL shards; this maps them
onto the engine with the same schema discipline as the parquet path.
The reference has no JSON surface (its sources are Delta + LakeFS
objects) — additive capability, Spark-first.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: Optional[StructType] = None,
    *,
    multiline: bool = False,
) -> DataFrame:
    """Read a JSONL corpus.

    Pass ``schema`` in production: schema inference runs a full extra
    scan over the data before the real job — at 100 TB that doubles
    the read.  Inference is allowed (schema=None) for exploration.
    Corrupt lines land in ``_corrupt_record`` (PERMISSIVE mode) instead
    of failing the job — filter or count them explicitly.  The column
    is appended to an explicit schema automatically: without it Spark
    silently converts corrupt lines to all-null rows that flow into
    the corpus as data."""
    from pyspark.sql.types import StringType, StructField

    reader = spark.read.option("multiLine", str(multiline).lower())
    if schema is not None:
        if "_corrupt_record" not in schema.fieldNames():
            # build a COPY — StructType.add appends in place and would
            # leave a phantom column in the caller's schema object
            schema = StructType(
                list(schema.fields)
                + [StructField("_corrupt_record", StringType(), True)]
            )
        reader = reader.schema(schema)
    return reader.json(path)


def write_jsonl(
    df: DataFrame,
    path: str,
    *,
    compression: str = "gzip",
    mode: str = "overwrite",
) -> None:
    """Export a DataFrame as compressed JSONL shards (one file per
    partition — repartition upstream to control shard count)."""
    df.write.mode(mode).option("compression", compression).json(path)
