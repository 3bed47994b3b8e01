"""Deterministic fixture synthesizer (FIXTURES.md) — no external data.

Builds the engine's input table `poi_images` (image_id, bytes, w, h, fmt,
caption, phash) at test scale.  The curated layer is engineered so that the
reference's golden query results are reproduced *by construction*: the same
query shapes as reference tests/test_pois.py, test_stats.py, test_update.py
yield the same counts (13/7/7/1/3/6/7 features, stats 6 and 9, update 38).
Placement rule: every curated point keeps >= 1.5 m distance from every
decision boundary (buffer radii, bbox edges, polygon edges, line corridors)
so spherical-vs-spheroidal distance deviations can never flip membership;
`verify_layout()` asserts all margins with the brute-force oracle.

All coordinates are authored in a local equirectangular meter frame centred
on the reference's test point P (reference tests/test_pois.py:14) and
converted to lon/lat via the inverse projection.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from . import captions, geo, imaging, taxonomy

# the reference's test geometries (tests/test_pois.py:10-94, test_stats.py:10-35)
POINT_P = (8.807499091203672, 53.07528723347236)
BBOX1 = (8.807054, 53.075024, 8.807533, 53.075363)
BBOX2 = (8.808345, 53.075677, 8.808781, 53.076031)
POLYGON = [
    [8.80864522981668685, 53.07594435294385704],
    [8.80864522981668685, 53.07536364271325624],
    [8.80824790176417238, 53.07508856944613029],
    [8.80803395588974247, 53.07545533380229585],
    [8.80821733806782525, 53.07589850739933013],
    [8.80864522981668685, 53.07594435294385704],
]
LINESTRING = [
    [8.807132326847508, 53.07574568891761],
    [8.807514373051843, 53.0756845615249],
    [8.807865855559836, 53.07559287043586],
    [8.807926982952514, 53.07545533380228],
]

MARGIN_M = 1.5

# ---- curated layout: (osm_id, x_m, y_m, tags) in the P-centred local frame.
# groups (see module docstring for the count engineering):
#   IN_BBOX 7 (inside BBOX1; 6 of them within 50 m of LINESTRING)
#   OUT_BBOX 6 (inside disk(P,50) but outside BBOX1)         -> point+50m = 13
#   POLY 7 (inside POLYGON, outside disk(P,50); 1 in BBOX2)  -> polygon = 7
#   LINE 3 (within 10 m of LINESTRING, outside disk(P,50))   -> line+10m = 3
#   MULTI 3 (200 m ring, two categories each — stats quirk Q8)
#   UPDATE 2 (250 m; one deleted + one renamed by the MERGE test)
#   FAR 10 (300 m ring; whitelist tags for custom-filter goldens)
CURATED: list[tuple[int, float, float, dict[str, str]]] = [
    # IN_BBOX — north strip (within 50 m of the linestring)
    (1001, -26.0, 6.0, {"tourism": "artwork", "name": "Stadtmusikanten I"}),
    (1002, -20.0, 5.5, {"tourism": "artwork"}),
    (1003, -14.0, 6.5, {"tourism": "artwork"}),
    (1004, -8.0, 5.2, {"tourism": "artwork", "name": "Kunstwerk Vier"}),
    (1005, -2.0, 6.2, {"amenity": "fountain"}),
    (1006, 0.5, 5.0, {"amenity": "fountain", "wheelchair": "no"}),
    # IN_BBOX — south (beyond 50 m of the linestring)
    (1007, -15.0, -25.0, {"amenity": "cafe", "name": "Cafe Sued"}),
    # OUT_BBOX — inside disk(P, 50), south of BBOX1
    (1011, -30.0, -33.0, {"amenity": "pharmacy", "name": "Apotheke Eins"}),
    (1012, -20.0, -36.0, {"amenity": "pharmacy"}),
    (1013, -10.0, -34.0, {"amenity": "pharmacy", "opening_hours": "Mo-Fr 08:00-18:00"}),
    (1014, 0.0, -38.0, {"tourism": "artwork"}),
    (1015, 8.0, -33.0, {"tourism": "artwork"}),
    (1016, -34.0, -31.5, {"tourism": "viewpoint"}),
    # POLY — inside POLYGON, pp1 also inside BBOX2
    (1021, 62.0, 50.0, {"amenity": "school", "name": "Schule Ost"}),
    (1022, 55.0, 10.0, {"amenity": "school"}),
    (1023, 60.0, 30.0, {"amenity": "school"}),
    (1024, 70.0, 20.0, {"amenity": "school"}),
    (1025, 65.0, 40.0, {"amenity": "school"}),
    (1026, 50.0, 35.0, {"amenity": "school"}),
    (1027, 58.0, 20.0, {"amenity": "school", "wheelchair": "limited"}),
    # LINE — within 10 m of the linestring's west end
    (1031, -20.0, 58.0, {"amenity": "waste_basket"}),
    (1032, -28.0, 54.0, {"amenity": "waste_basket"}),
    (1033, -16.0, 52.0, {"amenity": "waste_basket"}),
    # MULTI — 200 m ring, two categories each (cafe 564 + hotel 108)
    (1041, 68.4, 187.9, {"amenity": "cafe", "tourism": "hotel", "name": "Cafe Hotel A"}),
    (1042, 128.6, -153.2, {"amenity": "cafe", "tourism": "hotel"}),
    (1043, -197.0, -34.7, {"amenity": "cafe", "tourism": "hotel"}),
    # UPDATE — targets of the MERGE parity test (reference test_update.py:18-40)
    (1051, 150.0, 150.0, {"amenity": "bench", "name": "Alte Bank"}),  # deleted by patch
    (1052, -150.0, 150.0, {"shop": "kiosk", "name": "Kiosk am Markt"}),  # renamed by patch
    # FAR — 300 m ring, whitelist tags for custom-filter goldens
    (1061, 0.0, 300.0, {"amenity": "bench", "wheelchair": "yes"}),
    (1062, 176.3, 242.7, {"amenity": "atm", "wheelchair": "yes"}),
    (1063, 285.3, 92.7, {"tourism": "hotel", "wheelchair": "yes", "name": "Hotel Fern"}),
    (1064, 285.3, -92.7, {"amenity": "school", "wheelchair": "yes"}),
    (1065, 176.3, -242.7, {"shop": "pet", "wheelchair": "limited"}),
    (1066, 0.0, -300.0, {"tourism": "museum", "wheelchair": "limited"}),
    (1067, -176.3, -242.7, {"shop": "bakery", "fee": "yes", "smoking": "no"}),
    (1068, -285.3, -92.7, {"amenity": "restaurant", "fee": "yes", "smoking": "no"}),
    (1069, -285.3, 92.7, {"shop": "supermarket", "name": "FarShop Neun"}),
    (1070, -176.3, 242.7, {"amenity": "townhall", "name": "Rathaus Zehn"}),
]

#: rows with no category mapping: present in the RAW input, dropped at import
#: (reference parse_osm.py:347).  Placed inside disk(P, 50) on purpose — if the
#: prepare stage fails to drop them, the golden count 13 breaks loudly.
NOCAT: list[tuple[int, float, float, dict[str, str]]] = [
    (1080 + i, 30.0 * np.cos(np.radians(36 * i)), 30.0 * np.sin(np.radians(36 * i)),
     {"building": "yes", "note": f"no category {i}"})
    for i in range(10)
]

#: the MERGE patch (translated reference test_update.py:18-40): one delete,
#: one rename, one insert ("Ein Impfzentrum", the reference's added POI id).
UPDATE_DELETE_ID = 1051
UPDATE_RENAME_ID = 1052
UPDATE_RENAMED_NAME = "Kiosk am Markt wurde umbenannt"
UPDATE_INSERT = (
    2134315509, 160.0, -140.0,
    {"name": "Ein Impfzentrum", "healthcare:speciality": "vaccination"},
)

#: frozen goldens (engineered; re-verified against the brute-force oracle)
GOLDEN_COUNTS = {
    "point_buffer50": 13,
    "point_bbox_buffer50": 7,
    "polygon": 7,
    "polygon_bbox": 1,
    "linestring_buffer10": 3,
    "linestring_bbox_buffer50": 6,
    "bbox_only": 7,
    "point_buffer400": 38,
    "stats_cat621_buffer50": 6,
    "stats_group620_buffer50": 9,
    "custom_wheelchair_yes_buffer400": 4,
    "category564_buffer220": 4,
}


def local_to_lonlat(x_m, y_m):
    """Inverse equirectangular projection at P (authoring frame -> WGS84)."""
    lon0, lat0 = POINT_P
    x_m = np.asarray(x_m, dtype=np.float64)
    y_m = np.asarray(y_m, dtype=np.float64)
    lat = lat0 + y_m / geo.M_PER_DEG_LAT
    lon = lon0 + x_m / (geo.M_PER_DEG_LAT * np.cos(np.radians(lat0)))
    return lon, lat


def _rows_to_frame(rows, osm_type: int = 1) -> pd.DataFrame:
    osm_ids = np.array([r[0] for r in rows], dtype=np.int64)
    lon, lat = local_to_lonlat([r[1] for r in rows], [r[2] for r in rows])
    caps = [captions.encode_caption(osm_type, r[0], r[3]) for r in rows]
    image_ids = [f"img-{osm_type}-{r[0]}" for r in rows]
    recs = []
    for iid in image_ids:
        pixels, fmt = imaging.synth_pixels(iid)
        recs.append((imaging.encode_image(pixels, fmt), pixels.shape[1], pixels.shape[0], fmt))
    return pd.DataFrame(
        {
            "image_id": image_ids,
            "bytes": [r[0] for r in recs],
            "w": np.array([r[1] for r in recs], dtype=np.int32),
            "h": np.array([r[2] for r in recs], dtype=np.int32),
            "fmt": [r[3] for r in recs],
            "caption": caps,
            "phash": captions.encode_phash(lon, lat),
        }
    )


def curated_frame(include_nocat: bool = True) -> pd.DataFrame:
    rows = list(CURATED) + (list(NOCAT) if include_nocat else [])
    return _rows_to_frame(rows)


def merge_patch_frame() -> tuple[pd.DataFrame, list[int], dict[int, dict]]:
    """(upserts, delete_ids, expected) for the MERGE parity test."""
    oid, x, y, tags = UPDATE_INSERT
    renamed = next(r for r in CURATED if r[0] == UPDATE_RENAME_ID)
    new_tags = dict(renamed[3])
    new_tags["name"] = UPDATE_RENAMED_NAME
    ups = _rows_to_frame([
        (oid, x, y, tags),
        (UPDATE_RENAME_ID, renamed[1], renamed[2], new_tags),
    ])
    return ups, [UPDATE_DELETE_ID], {oid: tags, UPDATE_RENAME_ID: new_tags}


# ------------------------------------------------------------------ filler

#: guard box around the curated layout — filler never lands here, so the
#: golden counts are invariant under filler scale.
GUARD = (8.70, 53.00, 8.95, 53.15)

#: 12 urban cluster centres (FIXTURES.md §5) — dense cells for skew handling.
CLUSTERS = [
    (8.60, 53.30), (8.95, 53.55), (9.99, 53.55), (10.00, 53.45),
    (13.40, 52.52), (13.45, 52.48), (12.37, 51.34), (11.63, 52.13),
    (10.52, 52.26), (9.73, 52.37), (8.05, 52.27), (9.93, 53.85),
]

_TAG_POOL = [
    ("amenity", "cafe"), ("amenity", "restaurant"), ("amenity", "pub"),
    ("amenity", "fast_food"), ("amenity", "bar"), ("amenity", "pharmacy"),
    ("amenity", "school"), ("amenity", "kindergarten"), ("amenity", "bank"),
    ("amenity", "atm"), ("amenity", "fuel"), ("amenity", "parking"),
    ("amenity", "bench"), ("amenity", "waste_basket"), ("amenity", "toilets"),
    ("amenity", "place_of_worship"), ("amenity", "police"), ("amenity", "townhall"),
    ("amenity", "fountain"), ("amenity", "cinema"), ("amenity", "library"),
    ("tourism", "hotel"), ("tourism", "guest_house"), ("tourism", "hostel"),
    ("tourism", "museum"), ("tourism", "artwork"), ("tourism", "viewpoint"),
    ("tourism", "information"), ("tourism", "attraction"),
    ("shop", "bakery"), ("shop", "supermarket"), ("shop", "convenience"),
    ("shop", "clothes"), ("shop", "hairdresser"), ("shop", "butcher"),
    ("shop", "kiosk"), ("shop", "florist"), ("shop", "books"),
    ("railway", "tram_stop"), ("amenity", "bus_stop"),
]
_WHITELIST_EXTRA = [("wheelchair", "yes"), ("wheelchair", "no"), ("fee", "yes"),
                    ("smoking", "no"), ("fee", "no")]


def filler_coords(n: int, seed: int = 42, guard: bool = True):
    """Vectorized filler coordinates: 80% in gaussian urban clusters
    (sigma ~ 300 m), 20% uniform in the regional bbox (FIXTURES.md §5).
    Row i is a pure function of (seed, i)."""
    rng = np.random.default_rng(seed)
    n_cluster = int(n * 0.8)
    which = rng.integers(0, len(CLUSTERS), n_cluster)
    centers = np.array(CLUSTERS)
    sigma_deg = 300.0 / geo.M_PER_DEG_LAT
    lon = np.empty(n, dtype=np.float64)
    lat = np.empty(n, dtype=np.float64)
    lon[:n_cluster] = centers[which, 0] + rng.normal(0, sigma_deg / 0.6, n_cluster)
    lat[:n_cluster] = centers[which, 1] + rng.normal(0, sigma_deg, n_cluster)
    lon[n_cluster:] = rng.uniform(7.5, 14.0, n - n_cluster)
    lat[n_cluster:] = rng.uniform(52.0, 54.0, n - n_cluster)
    if guard:
        g = GUARD
        bad = (lon > g[0]) & (lon < g[2]) & (lat > g[1]) & (lat < g[3])
        # re-draw offenders deterministically outside the guard box
        lon[bad] = 9.2 + (np.arange(int(bad.sum())) % 1000) * 1e-4
        lat[bad] = 53.4 + (np.arange(int(bad.sum())) % 997) * 1e-4
    return lon, lat


def filler_frame(n: int, seed: int = 42, guard: bool = True, with_images: bool = True) -> pd.DataFrame:
    """Filler rows; `with_images=False` leaves a 4-byte sentinel payload for
    pure-vector benchmarks that never decode."""
    lon, lat = filler_coords(n, seed, guard)
    rng = np.random.default_rng(seed + 1)
    osm_ids = np.arange(10_000_000, 10_000_000 + n, dtype=np.int64)
    tag_idx = rng.integers(0, len(_TAG_POOL), n)
    extra_mask = rng.random(n) < 0.10
    extra_idx = rng.integers(0, len(_WHITELIST_EXTRA), n)
    caps = []
    for i in range(n):
        tags = dict([_TAG_POOL[tag_idx[i]]])
        if extra_mask[i]:
            k, v = _WHITELIST_EXTRA[extra_idx[i]]
            tags[k] = v
        caps.append(captions.encode_caption(1, int(osm_ids[i]), tags))
    image_ids = [f"img-1-{oid}" for oid in osm_ids]
    if with_images:
        recs = []
        for iid in image_ids:
            px, fmt = imaging.synth_pixels(iid)
            recs.append((imaging.encode_image(px, fmt), px.shape[1], px.shape[0], fmt))
        byts = [r[0] for r in recs]
        ws = np.array([r[1] for r in recs], dtype=np.int32)
        hs = np.array([r[2] for r in recs], dtype=np.int32)
        fmts = [r[3] for r in recs]
    else:
        byts = [b"RAW0"] * n
        ws = np.full(n, 16, dtype=np.int32)
        hs = np.full(n, 16, dtype=np.int32)
        fmts = ["raw"] * n
    return pd.DataFrame(
        {
            "image_id": image_ids,
            "bytes": byts,
            "w": ws,
            "h": hs,
            "fmt": fmts,
            "caption": caps,
            "phash": captions.encode_phash(lon, lat),
        }
    )


def build_sf_test(path: str, n_filler: int = 2000) -> None:
    """Write the pytest fixture table: curated + NOCAT + guarded filler."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    df = pd.concat([curated_frame(), filler_frame(n_filler)], ignore_index=True)
    table = pa.Table.from_pandas(df, preserve_index=False)
    pq.write_table(table, path)


# ------------------------------------------------------------------ layout QA

def verify_layout() -> None:
    """Assert every curated point keeps MARGIN_M from every decision boundary
    and that the frozen GOLDEN_COUNTS match the brute-force oracle."""
    all_rows = CURATED
    lon, lat = local_to_lonlat([r[1] for r in all_rows], [r[2] for r in all_rows])
    ids = np.array([r[0] for r in all_rows])

    point = geo.GeomSpec("point", [POINT_P])
    bbox1 = geo.bbox_spec(*BBOX1)
    bbox2 = geo.bbox_spec(*BBOX2)
    poly = geo.GeomSpec("polygon", POLYGON)
    line = geo.GeomSpec("linestring", LINESTRING)

    d_p = point.distance_m(lon, lat)
    d_line = line.distance_m(lon, lat)
    d_poly = poly.distance_m(lon, lat)
    in_bbox1 = bbox1.within_m(lon, lat, 0.0)
    in_bbox2 = bbox2.within_m(lon, lat, 0.0)
    in_poly = d_poly == 0.0

    def margin_ok(dist, radius):
        return np.abs(dist - radius) >= MARGIN_M

    assert margin_ok(d_p, 50.0).all(), ids[~margin_ok(d_p, 50.0)]
    assert margin_ok(d_p, 400.0).all()
    assert margin_ok(d_p, 220.0).all()
    assert margin_ok(d_line, 10.0).all()
    assert margin_ok(d_line, 50.0).all()
    # polygon-boundary margin for non-members / interior clearance for members
    bdist = geo.dist_to_segments_m(
        *geo.local_xy(lon, lat, poly.lon0, poly.lat0), poly._xy
    )
    assert (bdist >= MARGIN_M).all(), ids[bdist < MARGIN_M]

    # frozen goldens
    g = GOLDEN_COUNTS
    assert int((d_p <= 50).sum()) == g["point_buffer50"]
    assert int(((d_p <= 50) & in_bbox1).sum()) == g["point_bbox_buffer50"]
    assert int(in_poly.sum()) == g["polygon"]
    assert int((in_poly & in_bbox2).sum()) == g["polygon_bbox"]
    assert int((d_line <= 10).sum()) == g["linestring_buffer10"]
    assert int(((d_line <= 50) & in_bbox1).sum()) == g["linestring_bbox_buffer50"]
    assert int(in_bbox1.sum()) == g["bbox_only"]
    assert int((d_p <= 400).sum()) == g["point_buffer400"]

    cats = [taxonomy.categories_of_tags(r[3]) for r in all_rows]
    is621 = np.array([621 in c for c in cats])
    g620 = set(taxonomy.expand_group_ids([620], []))
    n620_pairs = sum(
        len(g620.intersection(c)) for c, keep in zip(cats, d_p <= 50) if keep
    )
    assert int((is621 & (d_p <= 50)).sum()) == g["stats_cat621_buffer50"]
    assert n620_pairs == g["stats_group620_buffer50"]
    wheel_yes = np.array([r[3].get("wheelchair") == "yes" for r in all_rows])
    assert int((wheel_yes & (d_p <= 400)).sum()) == g["custom_wheelchair_yes_buffer400"]
    is564 = np.array([564 in c for c in cats])
    assert int((is564 & (d_p <= 220)).sum()) == g["category564_buffer220"]
    # every curated row maps to >= 1 category; every NOCAT row maps to none
    assert all(len(c) > 0 for c in cats)
    assert all(len(taxonomy.categories_of_tags(r[3])) == 0 for r in NOCAT)
