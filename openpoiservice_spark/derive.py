"""Derived POI view over the driver's testdata + portable SQL snippets.

The driver's correctness gate runs each `__spark_entry__.queries()` entry in
Spark AND its `oracle_sql()` twin in DuckDB over the same parquet, comparing
row count + schema + order-insensitive value hash.  To make that gate
meaningful for a *geospatial* engine whose natural input is the synthetic
poi_images table, this module derives a deterministic POI view from the
`lineitem` table using only IEEE-exact arithmetic (integer ops, +,-,*,/ on
doubles) that evaluates bit-identically in Spark and DuckDB:

    pk  = l_orderkey * 10 + l_linenumber
    lon = 7.5  + ((pk * 2654435761) % 2^32) / 2^32 * 6.5     (Knuth hash)
    lat = 52.0 + ((pk * 2246822519) % 2^32) / 2^32 * 2.0
    tag = TAG_POOL[pk % 40]  -> category/group via the real taxonomy
    w,h = {16,32,64} by pk % 3 / (pk+1) % 3

Every snippet below is a *SQL string* used twice: `F.expr(snippet)` on the
Spark side and verbatim text in the DuckDB oracle — the two engines cannot
drift because they compile the same expression.  Transcendentals (sin/cos/
tan/ln) appear only inside predicates and floor()s where a 1-ulp libm
difference cannot flip the result at any realistic data density (analysis in
the module tests); constants that would otherwise be computed by different
libms (projection cosines, vector norms) are evaluated once in numpy on the
driver and inlined as literals into BOTH engines.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import taxonomy
from .fixtures import _TAG_POOL

# ------------------------------------------------------------- constants

#: query geometries over the derived lon/lat domain (7.5..14 E, 52..54 N)
BBOX_Q = (9.0, 52.4, 10.2, 53.2)
POINT_Q = (10.0, 53.0)
RADIUS_Q = 25_000.0
#: convex ring, counter-clockwise (asserted in tests)
POLY_Q = [(10.0, 52.8), (11.2, 52.75), (11.5, 53.1), (10.6, 53.4), (9.9, 53.2)]
#: convex interior ring (hole) fully inside POLY_Q, CCW (asserted in tests)
HOLE_Q = [(10.4, 52.95), (10.9, 52.95), (10.9, 53.15), (10.4, 53.15)]
#: second convex CCW ring, disjoint from POLY_Q (MultiPolygon fan-out gate)
POLY2_Q = [(8.0, 52.2), (8.8, 52.15), (9.0, 52.5), (8.4, 52.7)]
LINE_Q = [(9.0, 52.5), (10.0, 53.0), (11.0, 52.8)]
CORRIDOR_M = 20_000.0

EARTH_R = 6371008.8
M_PER_DEG = EARTH_R * math.pi / 180.0

#: tag pool with taxonomy-derived category/group ids (one category per entry)
POOL: list[tuple[str, str, int, int]] = []
for _k, _v in _TAG_POOL:
    _cats = taxonomy.categories_of_tags({_k: _v})
    assert len(_cats) == 1
    POOL.append((_k, _v, _cats[0], taxonomy.group_of_category(_cats[0])))


# ------------------------------------------------------------- snippets

def snip_pk() -> str:
    return "(l_orderkey * 10 + l_linenumber)"


def snip_lon(pk: str = "pk") -> str:
    # CAST to DOUBLE before dividing: bigint/decimal-literal division is
    # DECIMAL in Spark but DOUBLE in DuckDB — the cast pins both to IEEE
    # double so the derived coordinates are bit-identical across engines
    return f"(7.5 + CAST(({pk} * 2654435761) % 4294967296 AS DOUBLE) / 4294967296.0 * 6.5)"


def snip_lat(pk: str = "pk") -> str:
    return f"(52.0 + CAST(({pk} * 2246822519) % 4294967296 AS DOUBLE) / 4294967296.0 * 2.0)"


def snip_cat(pk: str = "pk") -> str:
    whens = " ".join(
        f"WHEN {i} THEN {cat}" for i, (_, _, cat, _) in enumerate(POOL)
    )
    return f"(CASE ({pk} % 40) {whens} END)"


def snip_fp64(pk: str = "poi_id") -> str:
    """Deterministic 64-bit fingerprint with planted near-dup clusters.

    Rows with pk % 37 == 0 fold into 540 groups (g = pk % 19980 — exactly
    37*(m % 540) for pk = 37m, no division needed); group members share the
    fingerprint except their low 2 bits (perturb = pk % 3), so within-group
    hamming is <= 2 — the planted positives the banded hamming join must
    find.  All other rows hash pk itself (64 well-spread bits).  Integer
    ops only (+, *, %, &), non-negative results, identical in Spark SQL and
    DuckDB; every subexpression parenthesized (& precedence differs)."""
    def spread(x: str) -> str:
        return (f"((({x} * 2654435761) % 2147483648) * 4294967296"
                f" + (({x} * 2246822519) % 4294967296))")

    g = f"({pk} % 19980)"
    clustered = f"(({spread(g)} & -4) + ({pk} % 3))"
    return (f"(CASE WHEN ({pk} % 37) = 0 THEN {clustered} "
            f"ELSE {spread(f'({pk})')} END)")


def snip_grp(cat: str = "cat") -> str:
    pairs = sorted({(c, g) for _, _, c, g in POOL})
    whens = " ".join(f"WHEN {c} THEN {g}" for c, g in pairs)
    return f"(CASE {cat} {whens} END)"


def snip_w(pk: str = "pk") -> str:
    return f"(CASE ({pk} % 3) WHEN 0 THEN 16 WHEN 1 THEN 32 ELSE 64 END)"


def snip_h(pk: str = "pk") -> str:
    return f"(CASE (({pk} + 1) % 3) WHEN 0 THEN 16 WHEN 1 THEN 32 ELSE 64 END)"


def sql_poi_cte() -> str:
    """The derived view as a CTE body (DuckDB oracle side)."""
    pk = snip_pk()
    return (
        "SELECT "
        f"{pk} AS poi_id, "
        f"{snip_lon(pk)} AS lon, "
        f"{snip_lat(pk)} AS lat, "
        f"{snip_cat(pk)} AS cat, "
        f"{snip_grp(snip_cat(pk))} AS grp, "
        f"{snip_w(pk)} AS w, "
        f"{snip_h(pk)} AS h "
        "FROM lineitem"
    )


def spark_poi_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same view on the Spark side — built from the same snippets.

    `grp` derives from the already-computed `cat` COLUMN rather than the
    textual snip_grp(snip_cat(pk)) nesting the oracle CTE uses: inlining the
    40-way cat CASE into every grp branch generated a > 64 KB Java method
    and silently dropped the whole gate projection out of whole-stage
    codegen (janino 'Code grows beyond 64 KB' fallback).  Same values —
    integer CASE on an integer column — so the DuckDB twin is unaffected."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pk = snip_pk()
    return li.select(
        F.expr(pk).alias("poi_id"),
        F.expr(snip_lon(pk)).alias("lon"),
        F.expr(snip_lat(pk)).alias("lat"),
        F.expr(snip_cat(pk)).alias("cat"),
        F.expr(snip_w(pk)).alias("w"),
        F.expr(snip_h(pk)).alias("h"),
    ).withColumn("grp", F.expr(snip_grp("cat"))).select(
        "poi_id", "lon", "lat", "cat", "grp", "w", "h"
    )


# node coordinates for the way-centroid analogue (J4/A5): parts are "nodes"
def snip_node_lon(key: str = "l_partkey") -> str:
    return f"(7.5 + CAST(({key} * 2654435761) % 4294967296 AS DOUBLE) / 4294967296.0 * 6.5)"


def snip_node_lat(key: str = "l_partkey") -> str:
    return f"(52.0 + CAST(({key} * 2246822519) % 4294967296 AS DOUBLE) / 4294967296.0 * 2.0)"


# ------------------------------------------------------- geometry snippets

def sql_haversine(lon: str, lat: str, lon0: float, lat0: float) -> str:
    """Haversine meters to a fixed point — same formula as geo.haversine_m."""
    return (
        f"(2.0 * {EARTH_R!r} * asin(least(1.0, sqrt("
        f"pow(sin((radians({lat}) - radians({lat0!r})) / 2.0), 2) "
        f"+ cos(radians({lat0!r})) * cos(radians({lat})) "
        f"* pow(sin((radians({lon}) - radians({lon0!r})) / 2.0), 2)))))"
    )


def sql_local_xy(lon: str, lat: str, lon0: float, lat0: float) -> tuple[str, str]:
    """Equirectangular projection; the cos(lat0) factor is a numpy-computed
    literal so both engines use the identical constant."""
    k = float(M_PER_DEG * np.cos(np.radians(lat0)))
    x = f"(({lon} - {lon0!r}) * {k!r})"
    y = f"(({lat} - {lat0!r}) * {M_PER_DEG!r})"
    return x, y


def sql_planar_d2(lon: str, lat: str, lon0: float, lat0: float) -> str:
    """Squared planar distance to a fixed point — ONLY *,+,- on doubles with
    numpy-inlined constants, so it is bit-identical across engines and safe
    as an ORDER BY key under LIMIT (a 1-ulp libm drift in a transcendental
    sort key could flip which row survives the cutoff)."""
    x, y = sql_local_xy(lon, lat, lon0, lat0)
    return f"({x} * {x} + {y} * {y})"


def sql_point_seg_dist2(px: str, py: str, ax: float, ay: float, bx: float, by: float) -> str:
    """Squared planar distance from (px,py) to segment (a,b) with clamped
    projection — mirrors geo.dist_to_segments_m."""
    dx, dy = bx - ax, by - ay
    len2 = dx * dx + dy * dy
    t = f"least(1.0, greatest(0.0, (({px} - {ax!r}) * {dx!r} + ({py} - {ay!r}) * {dy!r}) / {len2!r}))"
    cx = f"({ax!r} + {t} * {dx!r})"
    cy = f"({ay!r} + {t} * {dy!r})"
    return f"(pow({px} - {cx}, 2) + pow({py} - {cy}, 2))"


def sql_corridor_pred(lon: str, lat: str, line=LINE_Q, buffer_m: float = CORRIDOR_M) -> str:
    """Point within buffer_m of the polyline (planar local frame centred on
    the line's centroid — exactly GeomSpec's frame)."""
    lon0 = float(np.mean([p[0] for p in line]))
    lat0 = float(np.mean([p[1] for p in line]))
    k = float(M_PER_DEG * np.cos(np.radians(lat0)))
    px, py = sql_local_xy(lon, lat, lon0, lat0)
    segs = []
    for (x1, y1), (x2, y2) in zip(line[:-1], line[1:]):
        ax, ay = (x1 - lon0) * k, (y1 - lat0) * M_PER_DEG
        bx, by = (x2 - lon0) * k, (y2 - lat0) * M_PER_DEG
        segs.append(sql_point_seg_dist2(px, py, ax, ay, bx, by))
    return f"(sqrt(least({', '.join(segs)})) <= {float(buffer_m)!r})"


def sql_polygon_pred(lon: str, lat: str, ring=POLY_Q) -> str:
    """Convex-ring membership as a half-plane conjunction (ring must be CCW;
    verified by tests against the engine's ray-cast)."""
    xs = [p[0] for p in ring]
    ys = [p[1] for p in ring]
    area2 = sum(
        xs[i] * ys[(i + 1) % len(ring)] - xs[(i + 1) % len(ring)] * ys[i]
        for i in range(len(ring))
    )
    assert area2 > 0, "ring must be counter-clockwise"
    conds = []
    for i in range(len(ring)):
        x1, y1 = ring[i]
        x2, y2 = ring[(i + 1) % len(ring)]
        conds.append(
            f"(({x2 - x1!r}) * ({lat} - {y1!r}) - ({y2 - y1!r}) * ({lon} - {x1!r}) >= 0.0)"
        )
    return "(" + " AND ".join(conds) + ")"


def sql_bbox_pred(lon: str, lat: str, bbox=BBOX_Q) -> str:
    x1, y1, x2, y2 = bbox
    return f"({lon} >= {x1!r} AND {lon} <= {x2!r} AND {lat} >= {y1!r} AND {lat} <= {y2!r})"


def sql_cell(lon: str, lat: str, res: int) -> str:
    """Quadtree cell id — identical to functions.cell_expr."""
    n = 1 << res
    cx = f"least({n - 1}, greatest(0, CAST(floor(({lon} + 180.0) / 360.0 * {n}) AS BIGINT)))"
    cy = f"least({n - 1}, greatest(0, CAST(floor(({lat} + 90.0) / 180.0 * {n}) AS BIGINT)))"
    return f"(CAST({res} AS BIGINT) * {1 << 52} + {cx} * {1 << 26} + {cy})"


def sql_mercator_tile(lon: str, lat: str, z: int) -> tuple[str, str]:
    """Slippy tile ids; asinh spelled as ln(t + sqrt(t^2+1)) on both engines
    (DuckDB has no asinh; Spark uses the same spelled-out form)."""
    n = 1 << z
    xn = f"(({lon} + 180.0) / 360.0)"
    t = f"tan(radians({lat}))"
    yn = f"((1.0 - ln({t} + sqrt({t} * {t} + 1.0)) / {math.pi!r}) / 2.0)"
    tx = f"least({n - 1}, greatest(0, CAST(floor({xn} * {n}) AS BIGINT)))"
    ty = f"least({n - 1}, greatest(0, CAST(floor({yn} * {n}) AS BIGINT)))"
    return tx, ty


def sql_raster_axes(lon: str, lat: str, z: int) -> tuple[str, str]:
    """Global top-left pixel coords (gx0, gy0) of the w x h raster centred on
    the point at zoom z (256 px tiles) — mirrors imaging.raster_tile_spans."""
    scale = float((1 << z) * 256)
    xn = f"(({lon} + 180.0) / 360.0)"
    t = f"tan(radians({lat}))"
    yn = f"((1.0 - ln({t} + sqrt({t} * {t} + 1.0)) / {math.pi!r}) / 2.0)"
    gx0 = f"CAST(floor({xn} * {scale!r} - w / 2.0) AS BIGINT)"
    gy0 = f"CAST(floor({yn} * {scale!r} - h / 2.0) AS BIGINT)"
    return gx0, gy0


def sql_h32(expr: str) -> str:
    """Portable 32-bit string hash (DuckDB spelling; Spark uses
    conv(substring(md5(x),1,8),16,10) — same value)."""
    return f"CAST(concat('0x', substr(md5({expr}), 1, 8)) AS BIGINT)"
