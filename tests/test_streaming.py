"""Streaming ingest: incremental drain + exactly-once via checkpoint."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from openpoiservice_spark import fixtures, prepare, streaming
from openpoiservice_spark.api import PoiEngine


def _write_chunk(df, path):
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), path)


def test_stream_prepare_incremental_and_exactly_once(spark, tmp_path):
    raw_dir = str(tmp_path / "raw")
    prepared = str(tmp_path / "prepared")
    cp = str(tmp_path / "cp")
    os.makedirs(raw_dir)

    curated = fixtures.curated_frame(include_nocat=True)
    _write_chunk(curated.iloc[:30], os.path.join(raw_dir, "chunk0.parquet"))

    streaming.stream_prepare(spark, raw_dir, prepared, cp)
    n1 = prepare.read_prepared(spark, prepared).count()
    # NOCAT rows must be dropped by the shared derivation (none in first 30)
    assert 0 < n1 <= 30

    # second chunk arrives; re-run drains ONLY the new file
    _write_chunk(curated.iloc[30:], os.path.join(raw_dir, "chunk1.parquet"))
    streaming.stream_prepare(spark, raw_dir, prepared, cp)
    n2 = prepare.read_prepared(spark, prepared).count()
    assert n2 == 38  # all curated minus the 10 NOCAT rejects

    # idempotence: a third drain with nothing new must not duplicate
    streaming.stream_prepare(spark, raw_dir, prepared, cp)
    assert prepare.read_prepared(spark, prepared).count() == n2

    # the streamed table answers the golden query like the batch import
    eng = PoiEngine(spark, prepared)
    fc = eng.request({"request": "pois",
                      "geometry": {"geojson": {"type": "Point",
                                               "coordinates": list(fixtures.POINT_P)},
                                   "buffer": 50}})
    assert len(fc["features"]) == fixtures.GOLDEN_COUNTS["point_buffer50"]
