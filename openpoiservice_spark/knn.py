"""k-nearest-neighbour query via cell ring expansion (SURVEY.md §2.3: the
reference has no kNN; north_rule adds it as 'kNN via H3 ring expansion').

Algorithm (driver-steered, each probe a fully-pruned scan):
  1. R <- initial ring guess; candidates = rows in the Chebyshev cell disk
     of radius R around the query cell (equi-IN prefilter, same pushdown as
     the cover join).
  2. While |candidates| < k: double R.
  3. Correctness fence: the Chebyshev disk of R cells covers a Euclidean
     ball of R * min(cell_w, cell_h) meters — if the kth candidate distance
     exceeds that guaranteed radius, a closer point could hide outside the
     disk; expand R to cover d_k and re-probe once.
  4. Exact geodesic distance + ascending top-k (`orderBy(distance).limit(k)`
     — Spark executes this as a TakeOrderedAndProject, no full sort).

The count() probes in step 2 read only the pruned cells (partition + min/max
pruning on `cell`), so even at planet scale each probe touches a handful of
row groups.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import cells, geo
from .functions import make_distance_udf


def _cell_dims_m(res: int, lat: float) -> tuple[float, float]:
    n = 1 << res
    h = 180.0 / n * geo.M_PER_DEG_LAT
    w = 360.0 / n * geo.M_PER_DEG_LAT * float(np.cos(np.radians(lat)))
    return w, h


def seed_radius(lon: float, lat: float, k: int, pcell_rows: dict[int, int],
                res: int = cells.DEFAULT_RES, max_rings: int = 4096) -> int | None:
    """Initial Chebyshev ring radius from lineage density stats, sized so the
    FIRST probe both returns >= k candidates AND already satisfies the
    correctness fence in the common case (one Spark job instead of 2-4
    driver-steered probes — the round-2 kNN latency item).

    Density rho (rows per res-cell) comes from the query's own pcell, else
    the 3x3 pcell neighbourhood, else the global mean.  Two lower bounds:
      count:  (2r+1)^2 * rho >= C_SAFETY * k        (enough candidates)
      fence:  r * min_dim >= F_SAFETY * d_k_est     (kth distance inside the
              guaranteed radius), d_k_est = sqrt(k / (pi * rho_area))
    Returns None when no stats are available (caller falls back to the
    sqrt(k)/2 guess + doubling loop).
    """
    if not pcell_rows:
        return None
    per_pcell_cells = 4 ** (res - cells.PARTITION_RES)
    pc = int(cells.cell_of(lon, lat, cells.PARTITION_RES))
    n = pcell_rows.get(pc, 0)
    if n <= 0:
        _px, _py = cells.cell_xy(pc)
        px0, py0 = int(_px), int(_py)
        grid_p = 1 << cells.PARTITION_RES
        neigh = [
            pcell_rows.get(int(cells.pack_xy(x, y, cells.PARTITION_RES)), 0)
            for x in range(max(px0 - 1, 0), min(px0 + 2, grid_p))
            for y in range(max(py0 - 1, 0), min(py0 + 2, grid_p))
        ]
        nonzero = [v for v in neigh if v > 0]
        n = (sum(nonzero) / len(nonzero)) if nonzero else (
            sum(pcell_rows.values()) / max(len(pcell_rows), 1))
    rho = max(n / per_pcell_cells, 1e-12)  # rows per res-cell
    C_SAFETY, F_SAFETY = 3.0, 1.5
    r_count = int(np.ceil((np.sqrt(C_SAFETY * k / rho) - 1.0) / 2.0))
    w, h = _cell_dims_m(res, min(abs(lat), 89.99))
    rho_area = rho / (w * h)  # rows per m^2
    d_k = float(np.sqrt(k / (np.pi * rho_area)))
    r_fence = int(np.ceil(F_SAFETY * d_k / min(w, h)))
    return int(np.clip(max(r_count, r_fence, 1), 1, max_rings))


def knn(df: DataFrame, lon: float, lat: float, k: int,
        res: int = cells.DEFAULT_RES, max_rings: int = 4096,
        pcell_rows: dict[int, int] | None = None,
        probe_stats: dict | None = None) -> DataFrame:
    """Top-k nearest rows to (lon, lat).  df needs lon/lat/cell/pcell columns.

    `pcell_rows` (lineage density stats, prepare.load_pcell_stats) seeds the
    initial ring radius so the dense common case is a SINGLE probe.
    `probe_stats`, if a dict, receives {'probes', 'r0', 'fence_reprobe'}.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    spec = geo.GeomSpec("point", [[lon, lat]])
    center = int(cells.cell_of(lon, lat, res))

    grid_n = 1 << res
    cx0 = (center >> 26) & ((1 << 26) - 1)
    cy0 = center & ((1 << 26) - 1)

    def min_dim_disk(r: int) -> float:
        """Min cell dimension over the WHOLE disk's latitude span — lon cell
        width shrinks poleward, so the fence must use the most poleward
        latitude the disk reaches, not the query latitude (a point just
        outside the disk near the pole can otherwise be closer than the
        query-latitude bound suggests)."""
        lat_lo = -90.0 + max(cy0 - r, 0) * 180.0 / grid_n
        lat_hi = -90.0 + min(cy0 + r + 1, grid_n) * 180.0 / grid_n
        lat_edge = min(max(abs(lat_lo), abs(lat_hi)), 89.99)
        w, h = _cell_dims_m(res, lat_edge)
        return min(w, h)

    def candidates(r: int) -> DataFrame:
        """The Chebyshev cell disk is an axis-aligned rectangle in grid
        space — expressed as lon/lat range predicates (pushed down to
        Parquet row-group min/max stats; within-partition sort by cell makes
        lon/lat strongly clustered) instead of a cell IN-list whose size
        would grow O(r^2).  The lon axis WRAPS at ±180 (a query near the
        dateline must probe both sides; haversine distance is wrap-correct
        already), the lat axis clamps at the poles."""
        lon_lo = -180.0 + (cx0 - r) * 360.0 / grid_n
        lon_hi = -180.0 + (cx0 + r + 1) * 360.0 / grid_n
        lat_lo = -90.0 + max(cy0 - r, 0) * 180.0 / grid_n
        lat_hi = -90.0 + min(cy0 + r + 1, grid_n) * 180.0 / grid_n
        pdisk = np.unique(
            cells.cover_bbox(lon_lo, lat_lo, lon_hi, lat_hi, cells.PARTITION_RES)
        ).tolist()
        if lon_hi - lon_lo >= 360.0:
            lon_pred = F.lit(True)
        elif lon_lo < -180.0:
            lon_pred = (F.col("lon") < lon_hi) | (F.col("lon") >= lon_lo + 360.0)
        elif lon_hi > 180.0:
            lon_pred = (F.col("lon") >= lon_lo) | (F.col("lon") < lon_hi - 360.0)
        else:
            lon_pred = (F.col("lon") >= lon_lo) & (F.col("lon") < lon_hi)
        return df.filter(
            F.col("pcell").isin(pdisk)
            & lon_pred
            & (F.col("lat") >= lat_lo) & (F.col("lat") < lat_hi)
        )

    dist = make_distance_udf(spec)

    def topk_df(r: int) -> DataFrame:
        cand = candidates(r)
        with_d = cand.withColumn("distance", dist(F.col("lon"), F.col("lat")))
        return with_d.orderBy("distance").limit(k)

    # one job per probe: the top-k itself doubles as the count probe (fewer
    # than k rows back => disk too small) AND the fence input (the k-th
    # distance is read off the collected rows, no extra agg job).  The
    # density-seeded radius makes the first probe sufficient AND fenced in
    # the common case; the doubling loop remains the stat-free fallback.
    seeded = seed_radius(lon, lat, k, pcell_rows or {}, res, max_rings)
    r = seeded if seeded is not None else max(1, int(np.ceil(np.sqrt(k) / 2.0)))
    r_init = r
    probes = 0
    while True:
        topk = topk_df(r)
        rows = topk.collect()
        probes += 1
        if len(rows) >= k or r >= max_rings:
            break
        r = min(r * 2, max_rings)

    # correctness fence (step 3): the Chebyshev disk of R cells covers a
    # Euclidean ball of R * min(cell dims over the disk's latitude span)
    fence_reprobe = False
    kth = max((row.distance for row in rows), default=None)
    if kth is not None and kth > r * min_dim_disk(r) and r < max_rings:
        # expand until the guaranteed radius covers d_k (fixed-point: the
        # bound shrinks as the disk grows poleward, so iterate, don't solve)
        need = r
        while need < max_rings and need * min_dim_disk(need) < kth:
            need = min(need * 2, max_rings)
        topk = topk_df(need)
        fence_reprobe = True
        probes += 1
    if probe_stats is not None:
        probe_stats.update(probes=probes, r0=r_init,
                           fence_reprobe=fence_reprobe)
    return topk
