"""Structured Streaming ingest — continuous arrival of poi_images files.

The reference is strictly batch (SURVEY.md §2.9: import CLI + request/
response); its closest analogue is the incremental re-import (S5/S6).  This
module adds the Spark-native continuous form: new raw files landing in a
directory are drained through the SAME derivation pipeline (prepare.derive —
one code path for batch and streaming) into the prepared layout, with the
streaming checkpoint providing exactly-once file-sink semantics (the
streaming counterpart of the lineage-table resume).

`trigger(availableNow=True)` gives batch-drain semantics: each invocation
processes everything new and stops — the cron-style operational shape of
the reference's re-import (reference manage.py:59-99), but incremental and
idempotent out of the box.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from . import prepare

RAW_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("caption", T.StringType()),
        T.StructField("phash", T.LongType()),
    ]
)


def stream_prepare(spark: SparkSession, raw_dir: str, prepared_dir: str,
                   checkpoint_dir: str, max_files_per_trigger: int | None = None):
    """Drain new raw files into the prepared table; returns the query after
    it has finished the available data (availableNow trigger)."""
    reader = spark.readStream.schema(RAW_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    raw = reader.parquet(raw_dir)
    derived = prepare.derive(raw)
    q = (
        derived.writeStream.format("parquet")
        .option("path", prepare.data_path(prepared_dir))
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("pcell")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
