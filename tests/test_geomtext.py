"""WKT / GeoJSON -> gspec ingestion (geomtext.py): pure-parser unit tests +
the distributed bridge feeding batch_spatial_join (round-4 verdict item 7)."""

import json

import pytest

from openpoiservice_spark import batchjoin as BJ
from openpoiservice_spark import geo, geomtext as GT


def test_parse_wkt_point_linestring():
    assert GT.parse_wkt("POINT (8.5 53.1)") == [("point", [(8.5, 53.1)], [])]
    assert GT.parse_wkt("  point(8.5  53.1) ") == [("point", [(8.5, 53.1)], [])]
    k, pts, holes = GT.parse_wkt("LINESTRING (8 52, 8.5 52.5, 9 52.4)")[0]
    assert k == "linestring" and len(pts) == 3 and holes == []


def test_parse_wkt_polygon_with_hole():
    wkt = ("POLYGON ((8 52, 9 52, 9 53, 8 53, 8 52), "
           "(8.4 52.4, 8.6 52.4, 8.6 52.6, 8.4 52.6, 8.4 52.4))")
    [(k, shell, holes)] = GT.parse_wkt(wkt)
    assert k == "polygon" and len(shell) == 5 and len(holes) == 1
    assert holes[0][0] == holes[0][-1] == (8.4, 52.4)


def test_parse_wkt_multipolygon_fans_out():
    wkt = ("MULTIPOLYGON (((8 52, 9 52, 9 53, 8 52)), "
           "((10 52, 11 52, 11 53, 10 52)))")
    parts = GT.parse_wkt(wkt)
    assert [p[0] for p in parts] == ["polygon", "polygon"]
    assert parts[0][1][0] == (8.0, 52.0) and parts[1][1][0] == (10.0, 52.0)


def test_parse_wkt_rejects_garbage():
    for bad in ("POINT(8.5)", "POLYGON ((8 52, 9 52))",  # unclosed/short ring
                "POLYGON ((8 52, 9 52, 9 53, 8 53))",    # not closed
                "CIRCLE (8 52, 5)", "", "POINT Z (8 52 1)",
                "GEOMETRYCOLLECTION (POINT (8 52))",
                "POLYGON ((8 52, 9 52, 9 53, 8 52)"):    # unbalanced
        with pytest.raises(GT.GeomParseError):
            GT.parse_wkt(bad)
    assert GT.parse_wkt("POLYGON EMPTY") == []


def test_parse_geojson_variants():
    assert GT.parse_geojson({"type": "Point", "coordinates": [8.5, 53.1]}) \
        == [("point", [(8.5, 53.1)], [])]
    feat = json.dumps({"type": "Feature", "properties": {"name": "x"},
                       "geometry": {"type": "LineString",
                                    "coordinates": [[8, 52], [9, 53]]}})
    assert GT.parse_geojson(feat)[0][0] == "linestring"
    poly = {"type": "Polygon",
            "coordinates": [[[8, 52], [9, 52], [9, 53], [8, 52]],
                            [[8.2, 52.1], [8.4, 52.1], [8.4, 52.2], [8.2, 52.1]]]}
    [(k, shell, holes)] = GT.parse_geojson(poly)
    assert k == "polygon" and len(holes) == 1
    mp = {"type": "MultiPolygon",
          "coordinates": [[[[8, 52], [9, 52], [9, 53], [8, 52]]],
                          [[[10, 52], [11, 52], [11, 53], [10, 52]]]]}
    assert len(GT.parse_geojson(mp)) == 2
    for bad in ({"type": "Polygon", "coordinates": [[[8, 52], [9, 52]]]},
                {"type": "GeometryCollection", "geometries": []},
                "not json", 42, {"type": "Point"}):
        with pytest.raises(GT.GeomParseError):
            GT.parse_geojson(bad)


def test_wkt_layer_feeds_batch_join(spark):
    """A WKT text layer through wkt_to_gspec joins identically to the same
    geometries built driver-side with geoms_to_df."""
    pts = spark.createDataFrame(
        [(1, 8.5, 52.5), (2, 10.5, 52.5), (3, 8.45, 52.45), (4, 0.0, 0.0)],
        "poi_id long, lon double, lat double")
    layer = spark.createDataFrame(
        [(0, "POLYGON ((8 52, 9 52, 9 53, 8 53, 8 52))", 0.0),
         (1, "POINT (10.5 52.5)", 5000.0),
         (2, "LINESTRING (8.4 52.4, 8.5 52.5)", 2000.0)],
        "geom_id long, wkt string, buffer double")
    gdf = GT.wkt_to_gspec(layer, buffer_col="buffer")
    got = {(r.geom_id, r.poi_id)
           for r in BJ.batch_spatial_join(pts, gdf, res=10).collect()}
    items = [(0, geo.GeomSpec("polygon",
                              [(8, 52), (9, 52), (9, 53), (8, 53), (8, 52)]), 0.0),
             (1, geo.GeomSpec("point", [(10.5, 52.5)]), 5000.0),
             (2, geo.GeomSpec("linestring", [(8.4, 52.4), (8.5, 52.5)]), 2000.0)]
    want = {(r.geom_id, r.poi_id)
            for r in BJ.batch_spatial_join(
                pts, BJ.geoms_to_df(spark, items), res=10).collect()}
    assert got == want
    # point 1 lies exactly on the linestring's endpoint -> (2, 1) matches
    assert got == {(0, 1), (0, 3), (1, 2), (2, 1), (2, 3)}


def test_wkt_layer_on_error_modes(spark):
    layer = spark.createDataFrame(
        [(0, "POINT (8.5 52.5)"), (1, "POINT (oops)")],
        "geom_id long, wkt string")
    ok = GT.wkt_to_gspec(layer, on_error="skip").collect()
    assert [r.geom_id for r in ok] == [0]
    with pytest.raises(Exception, match="geom_id 1"):
        GT.wkt_to_gspec(layer).collect()
    with pytest.raises(ValueError):
        GT.wkt_to_gspec(layer, on_error="quarantine")


def test_geojson_layer_multipolygon_parts(spark):
    """MultiPolygon fans out one GEOM_SCHEMA row per part (same geom_id) —
    the documented Q7 convention."""
    mp = json.dumps({"type": "MultiPolygon",
                     "coordinates": [[[[8, 52], [9, 52], [9, 53], [8, 52]]],
                                     [[[10, 52], [11, 52], [11, 53], [10, 52]]]]})
    layer = spark.createDataFrame([(5, mp)], "geom_id long, geojson string")
    rows = GT.geojson_to_gspec(layer).collect()
    assert [r.geom_id for r in rows] == [5, 5]
    assert rows[0].gspec != rows[1].gspec


def test_parse_multi_point_and_linestring():
    # both legal MULTIPOINT spellings
    for wkt in ("MULTIPOINT (1 2, 3 4)", "MULTIPOINT ((1 2), (3 4))"):
        parts = GT.parse_wkt(wkt)
        assert [(k, pts) for k, pts, _ in parts] == [
            ("point", [(1.0, 2.0)]), ("point", [(3.0, 4.0)])]
    parts = GT.parse_wkt("MULTILINESTRING ((1 2, 3 4), (5 6, 7 8, 9 10))")
    assert [p[0] for p in parts] == ["linestring", "linestring"]
    assert len(parts[1][1]) == 3
    with pytest.raises(GT.GeomParseError):
        GT.parse_wkt("MULTILINESTRING ((1 2))")
    gj = {"type": "MultiPoint", "coordinates": [[1, 2], [3, 4]]}
    assert len(GT.parse_geojson(gj)) == 2
    gj = {"type": "MultiLineString",
          "coordinates": [[[1, 2], [3, 4]], [[5, 6], [7, 8]]]}
    assert [p[0] for p in GT.parse_geojson(gj)] == ["linestring"] * 2


def test_wkt_roundtrip_property():
    """Property: format-then-parse over randomized geometries of every
    supported kind recovers the exact structure (hypothesis-style sweep
    with a seeded generator — text formatting is the inverse under test)."""
    import numpy as np

    rng = np.random.default_rng(97)

    def fmt(c):
        return f"{c[0]!r} {c[1]!r}"

    for trial in range(200):
        kind = ["point", "linestring", "polygon", "multipolygon"][trial % 4]
        def pts(n):
            return [(float(x), float(y)) for x, y in
                    np.round(rng.uniform(-179, 179, (n, 2)), 6)]
        if kind == "point":
            p = pts(1)
            wkt = f"POINT ({fmt(p[0])})"
            want = [("point", p, [])]
        elif kind == "linestring":
            p = pts(int(rng.integers(2, 6)))
            wkt = "LINESTRING (" + ", ".join(map(fmt, p)) + ")"
            want = [("linestring", p, [])]
        elif kind == "polygon":
            ring = pts(int(rng.integers(3, 6)))
            ring = ring + [ring[0]]
            hole = pts(3)
            hole = hole + [hole[0]]
            wkt = ("POLYGON ((" + ", ".join(map(fmt, ring)) + "), ("
                   + ", ".join(map(fmt, hole)) + "))")
            want = [("polygon", ring, [hole])]
        else:
            r1 = pts(3); r1 += [r1[0]]
            r2 = pts(4); r2 += [r2[0]]
            wkt = ("MULTIPOLYGON (((" + ", ".join(map(fmt, r1)) + ")), (("
                   + ", ".join(map(fmt, r2)) + ")))")
            want = [("polygon", r1, []), ("polygon", r2, [])]
        assert GT.parse_wkt(wkt) == want, wkt
