"""Unit tests for the Spark-free kernels: geodesy, cells, taxonomy, captions,
imaging.  These run without a JVM (the reference has no operator-level unit
tests — SURVEY.md §5 calls this out as an addition)."""

import numpy as np
import pytest

from openpoiservice_spark import captions, cells, geo, imaging, taxonomy


# ------------------------------------------------------------------ geo

def test_haversine_known_distance():
    # Bremen Hauptbahnhof -> Bremen Marktplatz is about 1 km
    d = geo.haversine_m(8.8137, 53.0833, 8.8072, 53.0758)
    assert 900 < d < 1000


def test_haversine_zero_and_symmetry():
    assert geo.haversine_m(8.8, 53.0, 8.8, 53.0) == 0.0
    a = geo.haversine_m(8.0, 50.0, 9.0, 51.0)
    b = geo.haversine_m(9.0, 51.0, 8.0, 50.0)
    assert np.isclose(a, b)


def test_destination_roundtrip():
    lon, lat = geo.destination(8.8075, 53.0753, 37.0, 250.0)
    d = geo.haversine_m(8.8075, 53.0753, lon, lat)
    assert abs(d - 250.0) < 0.01


def test_point_in_ring_square():
    ring = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], dtype=float)
    px = np.array([5.0, 15.0, -1.0, 9.9])
    py = np.array([5.0, 5.0, 5.0, 9.9])
    assert geo.point_in_ring(px, py, ring).tolist() == [True, False, False, True]


def test_dist_to_segments():
    line = np.array([[0, 0], [10, 0]], dtype=float)
    d = geo.dist_to_segments_m([5, -3, 13], [4, 4, 0], line)
    assert np.allclose(d, [4.0, 5.0, 3.0])


def test_geomspec_polygon_distance_zero_inside():
    ring = [[8.80, 53.07], [8.81, 53.07], [8.81, 53.08], [8.80, 53.08], [8.80, 53.07]]
    g = geo.GeomSpec("polygon", ring)
    d = g.distance_m([8.805], [53.075])
    assert d[0] == 0.0
    d_out = g.distance_m([8.82], [53.075])
    assert d_out[0] > 500


def test_geomspec_polygon_with_hole():
    """PostGIS semantics: a point inside a hole is OUTSIDE the polygon and
    its distance is the distance to the nearest ring boundary."""
    ring = [[8.80, 53.07], [8.82, 53.07], [8.82, 53.09], [8.80, 53.09], [8.80, 53.07]]
    hole = [[8.807, 53.077], [8.813, 53.077], [8.813, 53.083], [8.807, 53.083],
            [8.807, 53.077]]
    g = geo.GeomSpec("polygon", ring, holes=[hole])
    # centre of the hole: excluded, distance = dist to hole boundary (> 0)
    d_hole = g.distance_m([8.810], [53.080])
    assert d_hole[0] > 100  # hole is ~600 m wide -> centre ~200+ m from edge
    assert not g.within_m([8.810], [53.080], 0.0)[0]
    # ...but within a 400 m buffer of the polygon (hole boundary is boundary)
    assert g.within_m([8.810], [53.080], 400.0)[0]
    # between the rings: inside, distance 0
    assert g.distance_m([8.802], [53.071])[0] == 0.0
    # outside the outer ring: unchanged by the hole
    assert g.distance_m([8.83], [53.080])[0] > 500
    # area subtracts the hole (shapely .area semantics)
    no_hole = geo.GeomSpec("polygon", ring)
    assert g.planar_area_m2() < no_hole.planar_area_m2()
    # rtol: the standalone hole projects in ITS OWN local plane (different
    # cos(lat0) scale than the donut's outer-centroid plane)
    approx_hole = geo.GeomSpec("polygon", hole).planar_area_m2()
    assert np.isclose(no_hole.planar_area_m2() - g.planar_area_m2(), approx_hole,
                      rtol=1e-3)
    # holes rejected on non-polygon kinds
    with pytest.raises(ValueError):
        geo.GeomSpec("linestring", ring, holes=[hole])


def test_geomspec_point_matches_haversine():
    g = geo.GeomSpec("point", [[8.8075, 53.0753]])
    d = g.distance_m([8.81], [53.08])
    assert np.isclose(d[0], geo.haversine_m(8.81, 53.08, 8.8075, 53.0753))


def test_bbox_spec_area_and_membership():
    b = geo.bbox_spec(8.807054, 53.075024, 8.807533, 53.075363)
    assert b.within_m([8.8073], [53.0752], 0.0)[0]
    assert not b.within_m([8.8080], [53.0752], 0.0)[0]
    # ~32m x ~38m -> ~1200 m2
    assert 1000 < b.planar_area_m2() < 1500


# ------------------------------------------------------------------ cells

def test_cell_roundtrip_bounds():
    c = int(cells.cell_of(8.8075, 53.0753, 18))
    mnx, mny, mxx, mxy = cells.cell_bounds(c)
    assert mnx <= 8.8075 < mxx and mny <= 53.0753 < mxy
    assert cells.cell_res(c) == 18


def test_cell_parent_contains_child():
    c = int(cells.cell_of(8.8075, 53.0753, 18))
    p = int(cells.cell_parent(c, 7))
    mnx, mny, mxx, mxy = cells.cell_bounds(p)
    assert mnx <= 8.8075 < mxx and mny <= 53.0753 < mxy
    assert cells.cell_res(p) == 7


def test_cover_bbox_contains_all_member_cells():
    rng = np.random.default_rng(1)
    lon = rng.uniform(8.80, 8.82, 500)
    lat = rng.uniform(53.07, 53.09, 500)
    cover = set(cells.cover_bbox(8.80, 53.07, 8.82, 53.09, 16).tolist())
    member = cells.cell_of(lon, lat, 16)
    assert set(member.tolist()) <= cover


def test_cover_geometry_is_superset_of_matches():
    """Core prefilter invariant: every point satisfying the exact predicate
    lies in a covered cell (cover may over-include, never under-include)."""
    g = geo.GeomSpec("point", [[8.8075, 53.0753]])
    rng = np.random.default_rng(2)
    lon = rng.uniform(8.79, 8.83, 2000)
    lat = rng.uniform(53.06, 53.09, 2000)
    for buf in (50.0, 500.0, 1900.0):
        res = cells.pick_cover_res(g, buf)
        cover = set(cells.cover_geometry(g, buf, res).tolist())
        inside = g.within_m(lon, lat, buf)
        cs = cells.cell_of(lon, lat, res)
        assert set(cs[inside].tolist()) <= cover


def test_cover_linestring_and_polygon():
    line = geo.GeomSpec(
        "linestring",
        [[8.807132, 53.075746], [8.807514, 53.075685], [8.807866, 53.075593]],
    )
    cover = cells.cover_geometry(line, 10.0, 18)
    assert 1 <= len(cover) <= 64
    poly = geo.bbox_spec(8.80, 53.07, 8.81, 53.08)
    cover2 = cells.cover_geometry(poly, 0.0, 14)
    assert len(cover2) >= 1


def test_ring_cells_disk():
    c = int(cells.cell_of(8.8075, 53.0753, 18))
    disk0 = cells.ring_cells(c, 0)
    assert disk0.tolist() == [c]
    disk2 = cells.ring_cells(c, 2)
    assert len(disk2) == 25 and c in disk2.tolist()


# ------------------------------------------------------------------ taxonomy

def test_taxonomy_lookup():
    assert taxonomy.categories_of_tags({"amenity": "cafe"}) == [564]
    assert taxonomy.categories_of_tags({"tourism": "artwork", "name": "x"}) == [621]
    assert taxonomy.categories_of_tags({"foo": "bar"}) == []
    assert taxonomy.categories_of_tags({"amenity": "cafe", "tourism": "hotel"}) == [108, 564]


def test_group_expansion():
    ids = taxonomy.expand_group_ids([620], [564])
    assert ids == [564, 621, 622, 623, 624, 625, 626, 627]
    with pytest.raises(ValueError):
        taxonomy.expand_group_ids([999], [])


def test_group_of_category_and_listing():
    assert taxonomy.group_of_category(621) == 620
    assert taxonomy.group_of_category(208) == 200
    listing = taxonomy.taxonomy_listing()
    # reference golden: listing contains 'accomodation' and 'animals'
    # (reference tests/test_category_list.py:12-17)
    assert "accomodation" in listing and "animals" in listing
    assert listing["accomodation"]["id"] == 100
    assert listing["tourism"]["children"]["tourism"]["artwork"] == 621


def test_taxonomy_full_parity():
    # full reference-hierarchy coverage: 16 groups / 333 leaf mappings
    # (reference categories.yml:1-428), every group expandable
    group_index, _, cat_ids_index, cat_to_group = taxonomy.indices()
    assert len(group_index) == 16
    assert len(cat_ids_index) == 333
    assert taxonomy.expand_group_ids(sorted(group_index), []) == sorted(cat_ids_index)
    # ids previously missing/misnumbered in the round-2 subset table
    assert taxonomy.categories_of_tags({"amenity": "cinema"}) == [299]
    assert taxonomy.categories_of_tags({"shop": "kiosk"}) == [488]
    assert taxonomy.categories_of_tags({"amenity": "recycling"}) == [172]
    assert taxonomy.categories_of_tags({"emergency": "defibrillator"}) == [165]
    # duplicate (amenity, drinking_water) resolves to the LATER group (565,
    # sustenance) exactly like the reference's dict.update order
    # (reference categories.py:47-51)
    assert taxonomy.categories_of_tags({"amenity": "drinking_water"}) == [565]
    # request=list payload carries the full hierarchy
    listing = taxonomy.taxonomy_listing()
    n = sum(len(v) for g in listing.values() for v in g["children"].values())
    assert n == 333


# ------------------------------------------------------------------ captions

def test_caption_roundtrip():
    tags = {"name": "Ein Impfzentrum; 100%", "amenity": "cafe", "k=v": "a;b"}
    c = captions.encode_caption(1, 2134315509, tags)
    t, i, back = captions.decode_caption(c)
    assert (t, i) == (1, 2134315509)
    assert back == tags


def test_phash_roundtrip_precision():
    rng = np.random.default_rng(3)
    lon = rng.uniform(-180, 180, 10000)
    lat = rng.uniform(-90, 90, 10000)
    p = captions.encode_phash(lon, lat)
    lon2, lat2 = captions.decode_phash(p)
    assert np.abs(lon2 - lon).max() < 1e-6
    assert np.abs(lat2 - lat).max() < 1e-6


def test_truncate6_formats_not_rounds():
    # format(".6f") rounds-half-even at the 6th decimal like the reference
    assert captions.truncate6(8.8074990912) == 8.807499
    assert captions.truncate6(53.07528723347236) == 53.075287


# ------------------------------------------------------------------ imaging

def test_png_roundtrip_exact():
    pixels, _ = imaging.synth_pixels("img-1-1001")
    data = imaging.encode_png(pixels)
    back = imaging.decode_png(data)
    assert np.array_equal(back, pixels)


def test_qjpg_roundtrip_psnr():
    pixels, _ = imaging.synth_pixels("img-1-1004")
    data = imaging.encode_qjpg(pixels)
    back = imaging.decode_qjpg(data)
    assert back.shape == pixels.shape
    assert imaging.psnr(pixels, back) >= 40.0


def test_synth_determinism():
    a, fa = imaging.synth_pixels("img-1-42")
    b, fb = imaging.synth_pixels("img-1-42")
    assert np.array_equal(a, b) and fa == fb


def test_tile_of_known_values():
    # lon=0, lat=0 at z=1 -> tile (1, 1) boundary: xn=0.5 -> tx=1, yn=0.5 -> ty=1
    tx, ty = imaging.tile_of(0.0, 0.0, 1)
    assert (int(tx), int(ty)) == (1, 1)
    # cross-check against an independent stdlib-math implementation
    import math

    lon, lat, z = 8.8075, 53.0753, 14
    tx, ty = imaging.tile_of(lon, lat, z)
    exp_tx = math.floor((lon + 180.0) / 360.0 * 2**z)
    exp_ty = math.floor((1.0 - math.asinh(math.tan(math.radians(lat))) / math.pi) / 2.0 * 2**z)
    assert (int(tx), int(ty)) == (exp_tx, exp_ty)


def test_tile_pixel_counts_conserve_pixels():
    rng = np.random.default_rng(4)
    lon = rng.uniform(-170, 170, 300)
    lat = rng.uniform(-60, 60, 300)
    w = rng.choice([16, 32, 64], 300)
    h = rng.choice([16, 32, 64], 300)
    out = imaging.tile_pixel_counts(lon, lat, w, h, 14)
    # every pixel lands in exactly one tile
    per_row = np.bincount(out[:, 0].astype(int), weights=out[:, 3], minlength=300)
    assert np.array_equal(per_row.astype(np.int64), (w * h).astype(np.int64))
    # at most 4 tiles per image
    counts = np.bincount(out[:, 0].astype(int), minlength=300)
    assert counts.max() <= 4


# ------------------------------------------------------------------ geodesic

def test_vincenty_equator_and_meridian_exact():
    """Independent oracles for the WGS84 inverse: the equator is a circle of
    radius a (arc length exact in closed form), and the meridian arc is a
    1-D elliptic integral we evaluate here by high-resolution Simpson
    quadrature — no geodesic library involved."""
    a, f = geo.WGS84_A, geo.WGS84_F
    e2 = f * (2 - f)
    # equator: 1 deg and 90 deg arcs
    for deg in (1.0, 90.0):
        d = float(geo.vincenty_m(0.0, 0.0, deg, 0.0)[0])
        assert abs(d - a * np.radians(deg)) < 1e-3, (deg, d)
    # meridian: M(phi) = a(1-e2) * int dphi / (1 - e2 sin^2 phi)^(3/2)
    for deg in (1.0, 45.0, 89.0):
        phi = np.linspace(0.0, np.radians(deg), 200001)
        integrand = (1 - e2 * np.sin(phi) ** 2) ** -1.5
        h = phi[1] - phi[0]
        simpson = h / 3 * (integrand[0] + integrand[-1]
                           + 4 * integrand[1:-1:2].sum() + 2 * integrand[2:-1:2].sum())
        expect = a * (1 - e2) * simpson
        d = float(geo.vincenty_m(12.34, 0.0, 12.34, deg)[0])
        assert abs(d - expect) < 1e-3, (deg, d, expect)


def test_vincenty_properties():
    rng = np.random.default_rng(17)
    lon1 = rng.uniform(-180, 180, 500)
    lat1 = rng.uniform(-89, 89, 500)
    lon2 = rng.uniform(-180, 180, 500)
    lat2 = rng.uniform(-89, 89, 500)
    d12 = geo.vincenty_m(lon1, lat1, lon2, lat2)
    d21 = geo.vincenty_m(lon2, lat2, lon1, lat1)
    np.testing.assert_allclose(d12, d21, rtol=0, atol=1e-6)  # symmetry
    assert float(geo.vincenty_m(7.1, 51.2, 7.1, 51.2)[0]) == 0.0  # identity
    # near-antipodal convergence guard: finite, sane magnitude
    d = float(geo.vincenty_m(0.0, 0.0, 179.7, 0.3)[0])
    assert 1.9e7 < d < 2.1e7


def test_haversine_vs_spheroid_bound():
    """The documented error bound of the engine's haversine distances vs
    PostGIS's WGS84 spheroid: < 0.6% relative (worst case ~0.56%, hit by
    this sample at high latitude), measured
    over the admitted request envelope (city-scale 2 km buffers up to
    500 km corridors, all latitudes)."""
    rng = np.random.default_rng(23)
    lon1 = rng.uniform(-180, 180, 2000)
    lat1 = rng.uniform(-85, 85, 2000)
    # admitted-scale displacements: 50 m .. 500 km
    dist = 10 ** rng.uniform(np.log10(50), np.log10(500_000), 2000)
    bear = rng.uniform(0, 360, 2000)
    lon2 = np.empty_like(lon1)
    lat2 = np.empty_like(lat1)
    for i in range(len(lon1)):
        lon2[i], lat2[i] = geo.destination(lon1[i], lat1[i], bear[i], dist[i])
    hav = geo.haversine_m(lon1, lat1, lon2, lat2)
    vin = geo.vincenty_m(lon1, lat1, lon2, lat2)
    rel = np.abs(hav - vin) / np.maximum(vin, 1.0)
    assert float(rel.max()) < 0.006, float(rel.max())


def test_fuzz_png_qjpg_decode_raise_cleanly():
    """Corrupt/truncated PNG and QJPG payloads raise ValueError or
    NotImplementedError — never zlib.error/struct.error/TypeError (the
    ingest's decode operators must error-path corrupt files cleanly)."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    for fmt, data in (("png", imaging.encode_png(img)),
                      ("jpeg", imaging.encode_qjpg(img))):
        data = bytearray(data)
        for trial in range(800):
            mutated = bytearray(data)
            op = trial % 3
            if op == 0:
                mutated = mutated[:rng.integers(1, len(data))]
            elif op == 1:
                mutated[rng.integers(0, len(data))] = rng.integers(0, 256)
            else:
                for _ in range(5):
                    mutated[rng.integers(0, len(data))] = rng.integers(0, 256)
            try:
                imaging.decode_image(bytes(mutated), fmt)
            except (ValueError, NotImplementedError):
                pass
