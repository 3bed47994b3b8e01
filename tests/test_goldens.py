"""Frozen full-response goldens: entire FeatureCollections / stats JSON,
byte-compared against checked-in files (tests/goldens/*.json).

The reference's golden suite asserts counts and spot properties; this module
freezes the COMPLETE responses (every feature, every property, coordinate
truncation, collection bbox, category objects) so any row-level drift in the
assembly path fails loudly.

Regenerate after an intentional output change with:
    REGEN_GOLDENS=1 python -m pytest tests/test_goldens.py -q
then review the diff like any other code change.
"""

import json
import os

import pytest

from openpoiservice_spark import fixtures, prepare

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")

P = list(fixtures.POINT_P)
BBOX1 = [[8.807054, 53.075024], [8.807533, 53.075363]]
BBOX2 = [[8.808345, 53.075677], [8.808781, 53.076031]]
POLY = [fixtures.POLYGON]
LINE = fixtures.LINESTRING

#: canonical request per golden file (mirrors reference test_pois.py /
#: test_stats.py / test_category_list.py request bodies)
REQUESTS = {
    "pois_point_buffer50": {
        "request": "pois",
        "geometry": {"geojson": {"type": "Point", "coordinates": P}, "buffer": 50},
    },
    "pois_point_bbox_buffer50": {
        "request": "pois",
        "geometry": {"geojson": {"type": "Point", "coordinates": P},
                     "bbox": BBOX1, "buffer": 50},
    },
    "pois_polygon": {
        "request": "pois",
        "geometry": {"geojson": {"type": "Polygon", "coordinates": POLY}, "buffer": 0},
    },
    "pois_polygon_bbox": {
        "request": "pois",
        "geometry": {"geojson": {"type": "Polygon", "coordinates": POLY},
                     "bbox": BBOX2, "buffer": 0},
    },
    "pois_linestring_buffer10": {
        "request": "pois",
        "geometry": {"geojson": {"type": "LineString", "coordinates": LINE},
                     "buffer": 10},
    },
    "pois_linestring_bbox_buffer50": {
        "request": "pois",
        "geometry": {"geojson": {"type": "LineString", "coordinates": LINE},
                     "bbox": BBOX1, "buffer": 50},
    },
    "pois_bbox_only": {"request": "pois", "geometry": {"bbox": BBOX1}},
    "pois_point_buffer400": {
        "request": "pois",
        "geometry": {"geojson": {"type": "Point", "coordinates": P}, "buffer": 400},
    },
    "pois_custom_wheelchair": {
        "request": "pois",
        "geometry": {"geojson": {"type": "Point", "coordinates": P}, "buffer": 400},
        "filters": {"wheelchair": ["yes"]},
    },
    "pois_category564": {
        "request": "pois",
        "geometry": {"geojson": {"type": "Point", "coordinates": P}, "buffer": 220},
        "filters": {"category_ids": [564]},
    },
    "stats_cat621_buffer50": {
        "request": "stats",
        "geometry": {"geojson": {"type": "Point", "coordinates": P}, "buffer": 50},
        "filters": {"category_ids": [621]},
    },
    "stats_group620_buffer50": {
        "request": "stats",
        "geometry": {"geojson": {"type": "Point", "coordinates": P}, "buffer": 50},
        "filters": {"category_group_ids": [620]},
    },
    "taxonomy_list": {"request": "list"},
}


def _normalize(resp):
    """Strip the only non-deterministic field (information.timestamp)."""
    if isinstance(resp, list):
        return [_normalize(r) for r in resp]
    if isinstance(resp, dict):
        out = {}
        for k, v in resp.items():
            if k == "information":
                v = {kk: vv for kk, vv in v.items() if kk != "timestamp"}
            out[k] = v
        return out
    return resp


def _canon_json(resp) -> str:
    return json.dumps(_normalize(resp), sort_keys=True, indent=1)


def _check(name: str, resp) -> None:
    path = os.path.join(GOLDEN_DIR, f"{name}.json")
    got = _canon_json(resp)
    if os.environ.get("REGEN_GOLDENS"):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        with open(path, "w") as f:
            f.write(got + "\n")
        return
    with open(path) as f:
        want = f.read()
    assert got + "\n" == want, f"golden drift in {name} (see {path})"


@pytest.mark.parametrize("name", sorted(REQUESTS))
def test_full_response_matches_golden(engine, name):
    _check(name, engine.request(REQUESTS[name]))


def test_post_merge_full_response_matches_golden(spark, tmp_path_factory):
    """The 38-feature post-merge collection (reference test_update.py flow),
    frozen byte-for-byte."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from openpoiservice_spark.api import PoiEngine

    root = tmp_path_factory.mktemp("golden_merge")
    raw = str(root / "raw.parquet")
    prepared = str(root / "prepared")
    fixtures.build_sf_test(raw, n_filler=500)
    prepare.prepare(spark, raw, prepared)
    ups, dels, _ = fixtures.merge_patch_frame()
    up_path = str(root / "ups.parquet")
    pq.write_table(pa.Table.from_pandas(ups, preserve_index=False), up_path)
    prepare.merge(spark, prepared, spark.read.parquet(up_path),
                  [(1, d) for d in dels])
    eng = PoiEngine(spark, prepared)
    resp = eng.request({"request": "pois",
                        "geometry": {"geojson": {"type": "Point", "coordinates": P},
                                     "buffer": 400}})
    _check("pois_post_merge_buffer400", resp)
