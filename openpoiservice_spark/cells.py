"""Hierarchical lon/lat quadtree cell index — the engine's spatial key.

Role: what the GiST index is to the reference (reference
openpoiservice/server/db_import/models.py:15 declares `spatial_index=True`;
the captured plans at reference misc.sql:50-52 show index prefilter + exact
recheck).  Here the prefilter is an *equi*-predicate on an integer cell key,
which Spark/Parquet can push all the way down: directory-level partition
pruning on the coarse key + row-group min/max pruning on the fine key.

Why not H3/S2: neither library is available in this container, and for the
prefilter role a regular lon/lat quadtree is equally effective and has two
extra virtues — the encoding is plain integer arithmetic (floor, shift, mask)
so it is (a) expressible as native Spark column expressions (JVM-side,
whole-stage-codegen) *and* as ANSI SQL for the DuckDB correctness oracle,
and (b) trivially invertible for ring expansion (kNN) and cover enumeration.

Encoding (fits int64, SQL-reproducible):
    res r in [0, 20]
    nx = 2^r cells across longitude [-180, 180); ny = 2^r across [-90, 90)
    cx = clip(floor((lon + 180) / 360 * 2^r), 0, 2^r - 1)
    cy = clip(floor((lat +  90) / 180 * 2^r), 0, 2^r - 1)
    cell = (r << 52) | (cx << 26) | cy

At r=18 a cell is ~92 m (lon, at 53°N: ~55 m) x ~76 m (lat) — a good
prefilter granularity for the reference's city-scale queries (buffer cap
2000 m, reference ops_settings.yml:3-13).  At r=7 a cell is ~2.8 deg — the
coarse *partition* key for a planet-scale table (~16k non-empty land cells
at 10^12 rows keeps partitions in the tens-of-GB range; tune per deployment).
"""

from __future__ import annotations

import numpy as np

MAX_RES = 20
#: fine resolution used for the row-level cell column.
DEFAULT_RES = 18
#: coarse resolution used for the directory partition key.
PARTITION_RES = 7

_RES_SHIFT = 52
_X_SHIFT = 26
_XY_MASK = (1 << 26) - 1


def cell_of(lon, lat, res: int = DEFAULT_RES):
    """Vectorized encode: (lon, lat) degrees -> int64 cell id."""
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"res must be in [0, {MAX_RES}]")
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    n = np.int64(1) << res
    cx = np.clip(np.floor((lon + 180.0) / 360.0 * n).astype(np.int64), 0, n - 1)
    cy = np.clip(np.floor((lat + 90.0) / 180.0 * n).astype(np.int64), 0, n - 1)
    return (np.int64(res) << _RES_SHIFT) | (cx << _X_SHIFT) | cy


def cell_res(cell):
    return np.asarray(cell, dtype=np.int64) >> _RES_SHIFT


def cell_xy(cell):
    """int64 cell id -> (cx, cy) grid coordinates."""
    cell = np.asarray(cell, dtype=np.int64)
    return (cell >> _X_SHIFT) & _XY_MASK, cell & _XY_MASK


def pack_xy(cx, cy, res: int):
    cx = np.asarray(cx, dtype=np.int64)
    cy = np.asarray(cy, dtype=np.int64)
    return (np.int64(res) << _RES_SHIFT) | (cx << _X_SHIFT) | cy


def cell_parent(cell, parent_res: int):
    """Coarsen a cell id to an ancestor resolution (pure bit math — the same
    expression is applied as a native Spark column to derive the partition
    key from the row cell)."""
    cell = np.asarray(cell, dtype=np.int64)
    r = cell >> _RES_SHIFT
    cx, cy = cell_xy(cell)
    shift = (r - parent_res).astype(np.int64)
    return pack_xy(cx >> shift, cy >> shift, parent_res)


def cell_bounds(cell):
    """(min_lon, min_lat, max_lon, max_lat) of a single cell id."""
    cell = int(cell)
    r = cell >> _RES_SHIFT
    n = 1 << r
    cx = (cell >> _X_SHIFT) & _XY_MASK
    cy = cell & _XY_MASK
    w, h = 360.0 / n, 180.0 / n
    return (-180.0 + cx * w, -90.0 + cy * h, -180.0 + (cx + 1) * w, -90.0 + (cy + 1) * h)


def cover_bbox(min_lon, min_lat, max_lon, max_lat, res: int) -> np.ndarray:
    """All cells at `res` intersecting the bbox — the polyfill primitive.

    Antimeridian-aware: continuous-frame longitudes beyond ±180 (from
    geo.bbox_spec / buffered_bounds of a dateline geometry) and wrapped
    specifications (min_lon > max_lon) split into two in-range covers whose
    union is returned."""
    if min_lon > max_lon:  # wrapped specification -> continuous frame
        max_lon += 360.0
    if max_lon - min_lon >= 360.0:
        min_lon, max_lon = -180.0, 180.0
    else:
        # shift the whole window by multiples of 360 so min_lon lands in
        # [-180, 180) — makes any continuous-frame input terminate in at
        # most ONE split (hypothesis found unbounded recursion for inputs
        # more than a full turn out of range)
        shift = np.floor((min_lon + 180.0) / 360.0) * 360.0
        min_lon -= shift
        max_lon -= shift
        if max_lon > 180.0:
            return np.unique(np.concatenate([
                cover_bbox(min_lon, min_lat, 180.0, max_lat, res),
                cover_bbox(-180.0, min_lat, max_lon - 360.0, max_lat, res),
            ]))
    n = np.int64(1) << res
    x0 = int(np.clip(np.floor((min_lon + 180.0) / 360.0 * n), 0, n - 1))
    x1 = int(np.clip(np.floor((max_lon + 180.0) / 360.0 * n), 0, n - 1))
    y0 = int(np.clip(np.floor((min_lat + 90.0) / 180.0 * n), 0, n - 1))
    y1 = int(np.clip(np.floor((max_lat + 90.0) / 180.0 * n), 0, n - 1))
    xs = np.arange(x0, x1 + 1, dtype=np.int64)
    ys = np.arange(y0, y1 + 1, dtype=np.int64)
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    return pack_xy(gx.ravel(), gy.ravel(), res)


def pick_cover_res(geom, buffer_m: float, target_cells: int = 256) -> int:
    """Choose the finest resolution whose bbox cover stays <= target_cells.

    Driver-side heuristic (the driver knows the query geometry before the
    plan launches — same place the reference's planner statistics live,
    SURVEY.md §4 'join strategy choice').
    """
    mnx, mny, mxx, mxy = geom.buffered_bounds(buffer_m)
    for res in range(DEFAULT_RES, -1, -1):
        n = 1 << res
        nx = int((mxx + 180.0) / 360.0 * n) - int((mnx + 180.0) / 360.0 * n) + 1
        ny = int((mxy + 90.0) / 180.0 * n) - int((mny + 90.0) / 180.0 * n) + 1
        if nx * ny <= target_cells:
            return res
    return 0


def cover_geometry(geom, buffer_m: float, res: int | None = None) -> np.ndarray:
    """Cells at `res` that may contain points within `buffer_m` of `geom`.

    Conservative (over-inclusive is fine — the exact refine follows): a cell
    is kept when the distance from its centre to the geometry is <= buffer +
    half of the cell diagonal.  This is the analogue of the GiST `&&` bbox
    overlap prefilter (reference misc.sql:50-52), but pre-enumerated on the
    driver so it becomes an equi-IN predicate Spark can push down.
    """
    if res is None:
        res = pick_cover_res(geom, buffer_m)
    cand = cover_bbox(*geom.buffered_bounds(buffer_m), res)
    if cand.size == 0:
        return cand
    # cell centres
    n = 1 << res
    cx, cy = cell_xy(cand)
    clon = -180.0 + (cx.astype(np.float64) + 0.5) * 360.0 / n
    clat = -90.0 + (cy.astype(np.float64) + 0.5) * 180.0 / n
    # half-diagonal in meters at the cell's latitude (conservative: use cos of
    # the latitude closest to the equator within the cell row)
    from .geo import M_PER_DEG_LAT

    half_h = 0.5 * 180.0 / n * M_PER_DEG_LAT
    lat_edge = np.minimum(np.abs(clat - 90.0 / n), np.abs(clat + 90.0 / n))
    half_w = 0.5 * 360.0 / n * M_PER_DEG_LAT * np.cos(np.radians(np.minimum(lat_edge, 89.9)))
    half_diag = np.sqrt(half_w**2 + half_h**2)
    keep = geom.distance_m(clon, clat) <= buffer_m + half_diag
    return cand[keep]


def ring_cells(center_cell: int, k: int) -> np.ndarray:
    """All cells with Chebyshev grid distance <= k of center (grid_disk).

    Drives the kNN ring expansion (SURVEY.md §2.3: 'H3 grid_disk ring
    expansion around the query cell until >= k candidates').
    """
    center_cell = int(center_cell)
    res = center_cell >> _RES_SHIFT
    n = 1 << res
    cx = (center_cell >> _X_SHIFT) & _XY_MASK
    cy = center_cell & _XY_MASK
    xs = np.arange(cx - k, cx + k + 1, dtype=np.int64)
    ys = np.clip(np.arange(cy - k, cy + k + 1, dtype=np.int64), 0, n - 1)
    ys = np.unique(ys)
    xs = np.mod(xs, n)  # wrap longitude
    xs = np.unique(xs)
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    return pack_xy(gx.ravel(), gy.ravel(), res)
