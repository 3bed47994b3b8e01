"""Tile assignment (graft axis B) + kNN extension tests."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from openpoiservice_spark import fixtures, imaging, knn, prepare, tiles
from openpoiservice_spark.captions import decode_phash


def _pois(spark, fixture_paths):
    return prepare.read_prepared(spark, fixture_paths["prepared"])


def test_assign_tiles_matches_numpy_oracle(spark, fixture_paths):
    df = _pois(spark, fixture_paths).select("image_id", "lon", "lat", "w", "h")
    for z in (10, 14):
        got = (
            tiles.assign_tiles(df, z)
            .select("image_id", "tx", "ty", "px_count")
            .toPandas()
            .sort_values(["image_id", "tx", "ty"])
            .reset_index(drop=True)
        )
        pdf = df.toPandas().sort_values("image_id").reset_index(drop=True)
        oracle = imaging.tile_pixel_counts(
            pdf["lon"].to_numpy(), pdf["lat"].to_numpy(),
            pdf["w"].to_numpy(), pdf["h"].to_numpy(), z,
        )
        exp = pd.DataFrame(
            {
                "image_id": pdf["image_id"].to_numpy()[oracle[:, 0].astype(int)],
                "tx": oracle[:, 1],
                "ty": oracle[:, 2],
                "px_count": oracle[:, 3],
            }
        ).sort_values(["image_id", "tx", "ty"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_tile_pixel_conservation(spark, fixture_paths):
    """Every pixel of every image lands in exactly one tile."""
    df = _pois(spark, fixture_paths).select("image_id", "lon", "lat", "w", "h")
    z = 14
    per_image = (
        tiles.assign_tiles(df, z)
        .groupBy("image_id")
        .agg(F.sum("px_count").alias("px"), F.count("*").alias("n_tiles"))
    )
    joined = per_image.join(df, "image_id")
    bad = joined.filter(
        (F.col("px") != F.col("w") * F.col("h")) | (F.col("n_tiles") > 4)
    ).count()
    assert bad == 0


def test_tile_pixel_stats_decode(spark, fixture_paths):
    """Decode path: per-tile intensity sums must equal the regenerated-pixel
    oracle (exact for png; jpeg rows decode to their quantized payload so
    sums match the decoded array exactly too)."""
    df = (
        _pois(spark, fixture_paths)
        .filter(F.col("osm_id").between(1001, 1070))
        .select("image_id", "bytes", "fmt", "lon", "lat", "w", "h")
    )
    got = tiles.tile_pixel_stats(df, 14).toPandas()
    pdf = df.select("image_id", "bytes", "fmt", "w", "h").toPandas()
    total_by_image = got.groupby("image_id")[["px_count", "sum_intensity"]].sum()
    for _, r in pdf.iterrows():
        px = imaging.decode_image(bytes(r["bytes"]), r["fmt"]).astype(np.float64)
        exp_sum = float(px.mean(axis=2).sum())
        assert abs(total_by_image.loc[r["image_id"], "sum_intensity"] - exp_sum) < 1e-6
        assert total_by_image.loc[r["image_id"], "px_count"] == r["w"] * r["h"]


def test_decoded_pixels_psnr_invariant(spark, fixture_paths):
    """BASELINE.json input_hint invariant: decoded pixels allclose vs the
    regenerated array (exact for png, PSNR >= 40 dB for lossy fmt), caption
    untouched end-to-end."""
    rows = (
        _pois(spark, fixture_paths)
        .filter(F.col("osm_id").between(1001, 1010))
        .select("image_id", "bytes", "fmt", "caption")
        .collect()
    )
    assert rows
    for r in rows:
        regen, fmt = imaging.synth_pixels(r.image_id)
        assert fmt == r.fmt
        decoded = imaging.decode_image(bytes(r.bytes), r.fmt)
        if r.fmt == "png":
            assert np.array_equal(decoded, regen)
        else:
            assert imaging.psnr(regen, decoded) >= 40.0
        assert r.caption.startswith("osm_type=")


def test_knn_matches_brute_force(spark, fixture_paths):
    df = _pois(spark, fixture_paths)
    lon0, lat0 = fixtures.POINT_P
    for k in (1, 5, 25):
        got = knn.knn(df, lon0, lat0, k).select("osm_id", "distance").collect()
        assert len(got) == k
        # brute force over the full table
        pdf = df.select("osm_id", "lon", "lat").toPandas()
        from openpoiservice_spark import geo

        d = geo.haversine_m(pdf["lon"].to_numpy(), pdf["lat"].to_numpy(), lon0, lat0)
        brute = pdf.assign(d=d).nsmallest(k, "d")
        assert {r.osm_id for r in got} == set(brute["osm_id"])
        np.testing.assert_allclose(
            sorted(r.distance for r in got), np.sort(brute["d"].to_numpy()), rtol=1e-9
        )


def test_knn_far_from_data_expands(spark, fixture_paths):
    """Query point in an empty region: ring expansion must still find the
    true nearest rows (exercises the doubling loop + correctness fence)."""
    df = _pois(spark, fixture_paths)
    lon0, lat0 = 8.5, 52.6  # inside the filler bbox but away from clusters
    got = knn.knn(df, lon0, lat0, 3).select("osm_id", "distance").collect()
    assert len(got) == 3
    pdf = df.select("osm_id", "lon", "lat").toPandas()
    from openpoiservice_spark import geo

    d = geo.haversine_m(pdf["lon"].to_numpy(), pdf["lat"].to_numpy(), lon0, lat0)
    brute = set(pdf.assign(d=d).nsmallest(3, "d")["osm_id"])
    assert {r.osm_id for r in got} == brute


def test_tile_pyramid_features_consistency(spark, fixture_paths):
    """Pyramid operator: per-zoom pixel conservation + features equal the
    single-zoom operators' output."""
    df = (
        _pois(spark, fixture_paths)
        .filter(F.col("osm_id").between(1001, 1033))
        .select("image_id", "bytes", "fmt", "lon", "lat", "w", "h")
    )
    pyr = tiles.tile_pyramid_features(df, (10, 14)).toPandas()
    base = df.select("image_id", "w", "h").toPandas()
    for z in (10, 14):
        got = pyr[pyr.z == z].groupby("image_id")["px_count"].sum()
        for _, r in base.iterrows():
            assert got[r["image_id"]] == r["w"] * r["h"]
    # features match the dedicated decode oracle
    import numpy as np

    from openpoiservice_spark import imaging

    one = pyr[pyr.image_id == "img-1-1001"].iloc[0]
    regen, fmt = imaging.synth_pixels("img-1-1001")
    lum = regen.astype(np.float64).mean(axis=2)
    assert abs(one["std_lum"] - lum.std()) < 1e-9
    hist, _ = np.histogram(lum, bins=8, range=(0.0, 256.0))
    assert one["hist0"] == hist[0]


def test_knn_polar_fence(spark):
    """High-latitude fence: lon cell width shrinks poleward inside a tall
    disk, so the old query-latitude bound (r * min_dim(lat_q)) could certify
    a top-k that misses a closer point sitting just outside the disk.  A
    synthetic 86-88N fixture is compared against the numpy brute force."""
    import pandas as pd

    from openpoiservice_spark import cells, geo
    from openpoiservice_spark.functions import cell_expr, cell_parent_expr
    from pyspark.sql import functions as F

    rng = np.random.default_rng(11)
    n = 4000
    lon = rng.uniform(-30.0, 50.0, n)
    lat = rng.uniform(86.0, 88.0, n)
    pdf = pd.DataFrame({"osm_id": np.arange(n, dtype=np.int64),
                        "lon": lon, "lat": lat})
    df = spark.createDataFrame(pdf)
    res = 12
    cell = cell_expr(F.col("lon"), F.col("lat"), res)
    df = df.withColumn("cell", cell).withColumn(
        "pcell", cell_parent_expr(F.col("cell"), res, cells.PARTITION_RES))

    lon0, lat0 = 10.0, 86.5
    for k in (10, 100):
        got = knn.knn(df, lon0, lat0, k, res=res).select("osm_id", "distance").collect()
        assert len(got) == k
        d = geo.haversine_m(lon, lat, lon0, lat0)
        brute = pdf.assign(d=d).nsmallest(k, "d")
        assert {r.osm_id for r in got} == set(brute["osm_id"])
        np.testing.assert_allclose(
            sorted(r.distance for r in got), np.sort(brute["d"].to_numpy()), rtol=1e-9)


def test_assign_tiles_clamps_at_grid_edges(spark):
    """Polar rows: above ~85.05°N the mercator y is negative — tile ids must
    stay in [0, 2^z) (matching functions.tile_expr) and clipped pixels must
    emit no tile rows, in BOTH the native columns and the numpy oracle."""
    z = 4
    n = 1 << z
    rows = [
        ("polar_n", 10.0, 89.9, 64, 64),     # fully above the grid top
        ("polar_s", 10.0, -89.9, 64, 64),    # fully below the grid bottom
        ("edge_n", 10.0, 85.0511, 64, 64),   # straddles y=0
        ("mid", 10.0, 50.0, 64, 64),         # ordinary row
    ]
    df = spark.createDataFrame(rows, "image_id string, lon double, lat double, w int, h int")
    got = tiles.assign_tiles(df, z).select("image_id", "tx", "ty", "px_count").collect()
    by_id = {}
    for r in got:
        assert 0 <= r.tx < n and 0 <= r.ty < n, r
        by_id.setdefault(r.image_id, 0)
        by_id[r.image_id] += r.px_count
    # fully-out rows vanish; the straddler keeps only its in-grid pixels
    assert "polar_s" not in by_id
    assert by_id["mid"] == 64 * 64
    assert 0 < by_id.get("edge_n", 0) <= 64 * 64
    # numpy oracle agrees row-for-row
    pdf = df.toPandas()
    oracle = imaging.tile_pixel_counts(
        pdf["lon"].to_numpy(), pdf["lat"].to_numpy(),
        pdf["w"].to_numpy(), pdf["h"].to_numpy(), z)
    exp = {}
    for ridx, tx, ty, px in oracle:
        assert 0 <= tx < n and 0 <= ty < n
        exp.setdefault(pdf["image_id"][int(ridx)], 0)
        exp[pdf["image_id"][int(ridx)]] += int(px)
    assert exp == by_id
    # pixel-intensity path: clipped slices stay in-bounds and in-grid
    img = np.zeros((64, 64, 3), dtype=np.uint8)
    png = imaging.encode_png(img)
    pix_rows = [(i, png, "png", lo, la, 64, 64) for i, lo, la, _, _ in
                [(r[0], r[1], r[2], r[3], r[4]) for r in rows]]
    pdf2 = spark.createDataFrame(
        pix_rows, "image_id string, bytes binary, fmt string, lon double, lat double, w int, h int")
    stats = tiles.tile_pixel_stats(pdf2, z).collect()
    assert all(0 <= s.tx < n and 0 <= s.ty < n for s in stats)
    agg = {}
    for s in stats:
        agg.setdefault(s.image_id, 0)
        agg[s.image_id] += s.px_count
    assert agg == by_id


def test_knn_single_probe_with_density_stats(spark, fixture_paths):
    """Lineage-seeded radius: the dense-fixture case resolves in ONE probe
    (no doubling, no fence re-probe) and returns exactly the brute-force
    top-k (round-2 verdict item 3)."""
    pois = _pois(spark, fixture_paths)
    stats = prepare.load_pcell_stats(spark, fixture_paths["prepared"])
    assert stats  # fixture prepare wrote lineage
    P0, P1 = fixtures.POINT_P
    ps = {}
    got = knn.knn(pois, P0, P1, 10, pcell_rows=stats, probe_stats=ps).collect()
    assert ps["probes"] == 1 and not ps["fence_reprobe"], ps
    assert len(got) == 10
    pdf = pois.select("image_id", "lon", "lat").toPandas()
    from openpoiservice_spark import geo
    d = geo.haversine_m(pdf["lon"].to_numpy(), pdf["lat"].to_numpy(), P0, P1)
    brute = set(pdf["image_id"].to_numpy()[np.argsort(d, kind="stable")][:10])
    assert {r.image_id for r in got} == brute


def test_engine_knn_df_uses_stats(spark, fixture_paths):
    from openpoiservice_spark.api import PoiEngine

    eng = PoiEngine(spark, fixture_paths["prepared"])
    P0, P1 = fixtures.POINT_P
    ps = {}
    rows = eng.knn_df(P0, P1, 5, probe_stats=ps).collect()
    assert len(rows) == 5 and ps["probes"] == 1


def _dateline_df(spark, n=400, seed=31):
    """Points straddling ±180 (half each side) with cell/pcell columns."""
    from openpoiservice_spark.functions import cell_expr, cell_parent_expr
    from openpoiservice_spark import cells as C

    rng = np.random.default_rng(seed)
    lon = np.where(rng.random(n) < 0.5,
                   rng.uniform(179.0, 180.0, n), rng.uniform(-180.0, -179.0, n))
    lat = rng.uniform(-5.0, 5.0, n)
    df = spark.createDataFrame(
        list(zip(range(n), lon.tolist(), lat.tolist())),
        "poi_id long, lon double, lat double")
    cell = cell_expr(F.col("lon"), F.col("lat"), C.DEFAULT_RES)
    return (df.withColumn("cell", cell)
              .withColumn("pcell", cell_parent_expr(F.col("cell"), C.DEFAULT_RES,
                                                    C.PARTITION_RES)),
            lon, lat)


def test_dateline_bbox_returns_brute_force_rows(spark):
    """A bbox crossing ±180 (min_lon > max_lon, PostGIS geography behavior)
    through the full engine path — wrap-aware spec, split cover, wrapped
    range pushdown — returns exactly the brute-force row set."""
    from openpoiservice_spark import cells as C, geo
    from openpoiservice_spark.functions import cell_parent_expr, make_refine_udf

    df, lon, lat = _dateline_df(spark)
    spec = geo.bbox_spec(179.4, -2.0, -179.5, 3.0)  # crosses the dateline
    res = C.pick_cover_res(spec, 0.0)
    cover = C.cover_geometry(spec, 0.0, res)
    assert cover.size > 0
    qcell = cell_parent_expr(F.col("cell"), C.DEFAULT_RES, res)
    refine = make_refine_udf(spec, 0.0, None)
    got = {r.poi_id for r in
           df.filter(qcell.isin(cover.tolist()))
             .filter(refine(F.col("lon"), F.col("lat"))).collect()}
    brute = {int(i) for i in range(len(lon))
             if ((lon[i] >= 179.4) or (lon[i] <= -179.5)) and -2.0 <= lat[i] <= 3.0}
    assert brute and got == brute
    # both sides of the dateline are represented
    assert any(lon[i] > 0 for i in brute) and any(lon[i] < 0 for i in brute)


def test_dateline_knn_probes_both_sides(spark):
    from openpoiservice_spark import geo

    df, lon, lat = _dateline_df(spark)
    got = knn.knn(df, 179.99, 0.0, 15).collect()
    d = geo.haversine_m(lon, lat, 179.99, 0.0)
    brute = set(np.argsort(d, kind="stable")[:15].tolist())
    assert {r.poi_id for r in got} == brute
    got_lons = {float(lon[r.poi_id]) for r in got}
    assert any(v > 0 for v in got_lons) and any(v < 0 for v in got_lons)


def test_cover_bbox_wrap_unit():
    from openpoiservice_spark import cells as C

    wrapped = set(C.cover_bbox(179.0, -1.0, -179.0, 1.0, 10).tolist())
    a = set(C.cover_bbox(179.0, -1.0, 180.0, 1.0, 10).tolist())
    b = set(C.cover_bbox(-180.0, -1.0, -179.0, 1.0, 10).tolist())
    assert wrapped == a | b
    # continuous-frame spec (bounds of a dateline GeomSpec) gives the same
    cont = set(C.cover_bbox(179.0, -1.0, 181.0, 1.0, 10).tolist())
    assert cont == wrapped


def test_tile_count_pyramid_nests_exactly(spark):
    """The bit-shift rollup equals re-binning the raw points at each zoom
    (slippy tiles nest exactly), every level preserves the total count,
    and the plan reads the base via checkpoint blocks (one input scan)."""
    rng = np.random.default_rng(17)
    pdf = pd.DataFrame({
        "lon": rng.uniform(-179.9, 179.9, 400),
        "lat": rng.uniform(-84.0, 84.0, 400),
    })
    df = spark.createDataFrame(pdf)
    pyr = tiles.tile_count_pyramid(df, 14, (12, 10)).collect()
    by_z = {}
    for r in pyr:
        by_z.setdefault(r.z, {})[(r.tx, r.ty)] = r.n
    assert set(by_z) == {14, 12, 10}
    assert all(sum(m.values()) == 400 for m in by_z.values())

    from openpoiservice_spark.derive import sql_mercator_tile
    for z in (12, 10):
        tx, ty = sql_mercator_tile("lon", "lat", z)
        direct = {
            (r.tx, r.ty): r.n for r in
            df.select(F.expr(tx).alias("tx"), F.expr(ty).alias("ty"))
            .groupBy("tx", "ty").agg(F.count("*").alias("n")).collect()
        }
        assert direct == by_z[z]

    plan = tiles.tile_count_pyramid(df, 14, (12, 10)) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" in plan or "Scan ExistingRDD" in plan


def test_tile_top_category_argmax_and_ties(spark):
    """Dominant category per tile: counts are right, ties break to the
    SMALLEST category id (the min(struct(-n, cat)) packing), n_total sums
    every category, and the plan is two hash aggregations — no sort
    window (the argmax must stay associative for map-side combine)."""
    # all points in one tile: cat 7 x2, cat 3 x2 (tie -> 3), cat 9 x1
    pdf = pd.DataFrame({
        "lon": [10.001, 10.002, 10.003, 10.004, 10.005],
        "lat": [50.001, 50.002, 50.003, 50.004, 50.005],
        "cat": [7, 7, 3, 3, 9],
    })
    df = spark.createDataFrame(pdf)
    rows = tiles.tile_top_category(df, 14).collect()
    # 10.00x/50.00x at z14 may straddle a tile edge; aggregate over tiles
    assert sum(r.n_total for r in rows) == 5
    one_tile = [r for r in rows if r.n_total == 5]
    if one_tile:  # the fixture lands in a single tile at this zoom
        r = one_tile[0]
        assert r.top_cat == 3 and r.n_top == 2 and r.z == 14

    # clear majority: cat 9 wins
    pdf2 = pdf.assign(cat=[9, 9, 9, 3, 7])
    r2 = tiles.tile_top_category(spark.createDataFrame(pdf2), 14).collect()
    assert {x.top_cat for x in r2 if x.n_top >= 2} <= {9} or len(r2) > 1

    plan = tiles.tile_top_category(df, 14) \
        ._jdf.queryExecution().executedPlan().toString()
    # the argmax must be an associative aggregate (min(struct) -> partial
    # map-side combine before each Exchange), never a sort window over the
    # raw rows; the SortAggregate it compiles to sorts only the (tile, cat)
    # AGGREGATE (bounded by geometry x taxonomy), not the input
    assert "Window" not in plan
    assert "partial_min" in plan and "partial_count" in plan
    assert plan.count("Exchange") == 2


def test_tile_heatmaps_png_golden_and_plan(spark):
    """tile_heatmaps: the emitted PNG decodes (repo decoder) back to
    exactly the numpy-computed log-scaled raster; metadata columns agree
    with a direct per-pixel count; and the (tile, pixel) aggregation is a
    native partial HashAggregate BEFORE the single python render stage
    (the shuffle carries hot pixels, never points)."""
    import math

    # 5 points: 3 share one pixel, 1 in a second pixel of the same tile,
    # 1 in another tile (offset > one tile width at z=10)
    z, dim = 10, 256
    scale = (1 << z) * 256
    base_lon, base_lat = 8.80, 53.07
    pts = [(base_lon, base_lat)] * 3 + \
          [(base_lon + 300 * 360.0 / scale, base_lat)] + \
          [(base_lon + 3.0, base_lat)]
    df = spark.createDataFrame(
        [(i, lo, la) for i, (lo, la) in enumerate(pts)],
        "poi_id long, lon double, lat double")
    rows = {(r.tx, r.ty): r for r in tiles.tile_heatmaps(df, z=z).collect()}
    assert len(rows) >= 2

    def gpix(lon, lat):
        xn = (lon + 180.0) / 360.0
        t = math.tan(math.radians(lat))
        yn = (1.0 - math.log(t + math.sqrt(t * t + 1.0)) / math.pi) / 2.0
        gx = min(scale - 1, max(0, int(math.floor(xn * scale))))
        gy = min(scale - 1, max(0, int(math.floor(yn * scale))))
        return gx, gy

    from collections import Counter
    per_tile = {}
    for lon, lat in pts:
        gx, gy = gpix(lon, lat)
        per_tile.setdefault((gx // dim, gy // dim), Counter())[
            (gx % dim, gy % dim)] += 1
    assert set(per_tile) == set(rows)
    for tile, cnt in per_tile.items():
        r = rows[tile]
        assert r.n_points == sum(cnt.values())
        assert r.n_hot == len(cnt)
        assert r.max_n == max(cnt.values())
        counts = np.zeros((dim, dim), dtype=np.int64)
        for (px, py), n in cnt.items():
            counts[py, px] = n
        exp = tiles.heatmap_raster(counts, r.max_n)
        got = imaging.decode_png(bytes(r.png))
        assert got.shape == (dim, dim, 3)
        assert np.array_equal(got, exp)
    # the 3-point pixel must render brighter than the 1-point pixel
    hot = rows[max(per_tile, key=lambda t: max(per_tile[t].values()))]
    arr = imaging.decode_png(bytes(hot.png))[:, :, 0]
    vals = sorted(arr[arr > 0].tolist(), reverse=True)
    assert vals[0] == 255 and (len(vals) == 1 or vals[-1] < 255)

    plan = tiles.tile_heatmaps(df, z=z)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan
    assert plan.count("HashAggregate") >= 2  # partial + final pixel agg


def test_tile_heatmap_pyramid_equals_direct_per_zoom(spark):
    """Every pyramid level — including the PNG bytes — is identical to
    running tile_heatmaps directly at that zoom: the global pixel grid
    nests (clamped floor halves consistently), so rolling the base pixel
    aggregate up by bit-shift loses nothing.  Coarser-than-base only."""
    import pytest as _pytest

    rng = np.random.default_rng(7)
    pts = [(float(lo), float(la)) for lo, la in
           zip(rng.uniform(8.0, 9.5, 400), rng.uniform(52.8, 53.4, 400))]
    df = spark.createDataFrame(
        [(i, lo, la) for i, (lo, la) in enumerate(pts)],
        "poi_id long, lon double, lat double")
    pyr = {(r.z, r.tx, r.ty): r
           for r in tiles.tile_heatmap_pyramid(df, 12, (10, 8)).collect()}
    assert len(pyr) > 0
    for z in (12, 10, 8):
        direct = {(z, r.tx, r.ty): r
                  for r in tiles.tile_heatmaps(df, z=z).collect()}
        level = {k: v for k, v in pyr.items() if k[0] == z}
        assert set(level) == set(direct)
        for k, r in level.items():
            d = direct[k]
            assert (r.n_points, r.n_hot, r.max_n) == \
                (d.n_points, d.n_hot, d.max_n)
            assert bytes(r.png) == bytes(d.png)
    with _pytest.raises(ValueError):
        tiles.tile_heatmap_pyramid(df, 12, (12,)).collect()


def test_tile_index_quadkey_and_bounds(spark):
    """tile_index: quadkeys match the canonical Bing bit-interleave
    algorithm, degree bounds are a true inverse (the tile CENTER bins back
    to the same tile; west<east, south<north), and z digits per key."""
    import math

    def bing_qk(tx, ty, z):
        s = ""
        for i in range(z, 0, -1):
            d, mask = 0, 1 << (i - 1)
            if tx & mask:
                d += 1
            if ty & mask:
                d += 2
            s += str(d)
        return s

    rng = np.random.default_rng(13)
    pts = [(int(i), float(lo), float(la)) for i, (lo, la) in enumerate(
        zip(rng.uniform(-170.0, 170.0, 200), rng.uniform(-80.0, 80.0, 200)))]
    df = spark.createDataFrame(pts, "poi_id long, lon double, lat double")
    z = 14
    rows = tiles.tile_index(df, z).collect()
    assert rows
    n = 1 << z
    for r in rows:
        assert r.quadkey == bing_qk(r.tx, r.ty, z)
        assert len(r.quadkey) == z
        assert r.west < r.east and r.south < r.north
        # inverse property: the center of the bounds re-bins to the tile
        clon = (r.west + r.east) / 2.0
        clat = (r.south + r.north) / 2.0
        xn = (clon + 180.0) / 360.0
        t = math.tan(math.radians(clat))
        yn = (1.0 - math.log(t + math.sqrt(t * t + 1.0)) / math.pi) / 2.0
        assert min(n - 1, max(0, int(math.floor(xn * n)))) == r.tx
        assert min(n - 1, max(0, int(math.floor(yn * n)))) == r.ty


def test_tile_heatmaps_weighted_sums(spark):
    """weight= sums the column instead of counting rows: one point with
    weight 7 renders exactly like 7 stacked unit points."""
    pts = [(0, 8.80, 53.07, 7)]
    wdf = spark.createDataFrame(pts, "poi_id long, lon double, lat double, wt long")
    udf = spark.createDataFrame(
        [(i, 8.80, 53.07) for i in range(7)], "poi_id long, lon double, lat double")
    got = tiles.tile_heatmaps(wdf, z=10, weight="wt").collect()
    ref = tiles.tile_heatmaps(udf, z=10).collect()
    assert len(got) == len(ref) == 1
    g, r = got[0], ref[0]
    assert (g.n_points, g.n_hot, g.max_n) == (r.n_points, r.n_hot, r.max_n) \
        == (7, 1, 7)
    assert bytes(g.png) == bytes(r.png)


def test_tile_heatmap_pyramid_reliable_checkpoint(spark, tmp_path):
    """checkpoint_dir= threads graph.py's reliable-checkpoint escape hatch
    through the pyramid's base pixel aggregate (round-6 verdict item 4):
    identical output, PNG bytes included."""
    rng = np.random.default_rng(13)
    pts = [(int(i), float(lo), float(la)) for i, (lo, la) in enumerate(
        zip(rng.uniform(8.0, 9.0, 150), rng.uniform(52.9, 53.3, 150)))]
    df = spark.createDataFrame(pts, "poi_id long, lon double, lat double")
    fast = {(r.z, r.tx, r.ty): (r.n_points, r.n_hot, r.max_n, bytes(r.png))
            for r in tiles.tile_heatmap_pyramid(df, 12, (10,)).collect()}
    rel = {(r.z, r.tx, r.ty): (r.n_points, r.n_hot, r.max_n, bytes(r.png))
           for r in tiles.tile_heatmap_pyramid(
               df, 12, (10,), checkpoint_dir=str(tmp_path / "ck")).collect()}
    assert fast == rel and len(rel) > 0
