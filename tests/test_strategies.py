"""Join-strategy switching, quirk Q5, and salting invariance."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from openpoiservice_spark import config, fixtures, prepare

P = list(fixtures.POINT_P)
BBOX1 = [[8.807054, 53.075024], [8.807533, 53.075363]]


def _ids(engine, geometry):
    fc = engine.request({"request": "pois", "geometry": geometry})
    return {f["properties"]["osm_id"] for f in fc["features"]}


def test_q5_distance_is_measured_to_last_geometry(engine):
    """Quirk Q5: bbox-only queries measure distance to the bbox envelope
    (0 inside it); geojson queries measure to the geojson geometry."""
    fc_bbox = engine.request({"request": "pois", "geometry": {"bbox": BBOX1}})
    assert fc_bbox["features"]
    assert all(f["properties"]["distance"] == 0.0 for f in fc_bbox["features"])

    fc_pt = engine.request({
        "request": "pois",
        "geometry": {"geojson": {"type": "Point", "coordinates": P},
                     "bbox": BBOX1, "buffer": 50},
    })
    assert fc_pt["features"]
    assert all(f["properties"]["distance"] > 0.0 for f in fc_pt["features"])


def test_cover_join_strategies_agree(engine, monkeypatch):
    """J7 strategy matrix: IN-literal, broadcast-hash, and shuffle cover
    joins must return identical row sets (reference misc.sql:113-143 shows
    what a 33x join-strategy mistake looks like — here all paths are
    correct-by-construction and tested equal)."""
    geometry = {"geojson": {"type": "Point", "coordinates": P}, "buffer": 400}
    baseline = _ids(engine, geometry)
    assert len(baseline) == fixtures.GOLDEN_COUNTS["point_buffer400"]

    monkeypatch.setattr(config, "ISIN_COVER_THRESHOLD", 0)  # force join path
    broadcast_ids = _ids(engine, geometry)
    assert broadcast_ids == baseline

    monkeypatch.setattr(config, "SHUFFLE_COVER_THRESHOLD", 0)  # force shuffle
    shuffle_ids = _ids(engine, geometry)
    assert shuffle_ids == baseline


def test_salting_invariance(spark, tmp_path, monkeypatch):
    """Adaptive salting must not change results — only task spread.  A tiny
    rows-per-task target forces hot pcells onto many salt buckets; counts
    and golden membership stay identical."""
    monkeypatch.setattr(prepare, "SALT_TARGET_ROWS", 50)
    monkeypatch.setattr(prepare, "SALT_MAX", 16)
    raw = str(tmp_path / "raw.parquet")
    prepared = str(tmp_path / "prepared")
    fixtures.build_sf_test(raw, n_filler=500)
    stats = prepare.prepare(spark, raw, prepared)
    # all raw rows survive except the 10 category-less NOCAT rejects
    assert stats["rows"] == spark.read.parquet(raw).count() - 10
    df = prepare.read_prepared(spark, prepared)
    assert df.count() == stats["rows"]
    # goldens still hold on the salted table
    from openpoiservice_spark.api import PoiEngine

    eng = PoiEngine(spark, prepared)
    fc = eng.request({"request": "pois",
                      "geometry": {"geojson": {"type": "Point", "coordinates": P},
                                   "buffer": 50}})
    assert len(fc["features"]) == fixtures.GOLDEN_COUNTS["point_buffer50"]
