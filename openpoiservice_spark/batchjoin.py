"""Many-geometry batch spatial join — the J7 *batch* mode (SURVEY.md §2.3).

The request path (api.PoiEngine) executes ONE query geometry per plan,
exactly like the reference builds one SQLAlchemy plan per request (reference
openpoiservice/server/api/query_builder.py:31-113).  A 100 TB training-data
pipeline instead joins MILLIONS of geometries (geo-tag every image against a
polygon/region layer) in one job.  This module is that operator:

    geometries ──mapInPandas──> (qcell, geom_id, geometry cols)   [cover explode]
                                        │ shuffle by (qcell[, salt])
    points ────native cell_expr──> qcell[, salt] ─┘
                 equi-JOIN (never a cartesian product)
                        │  (pipelined, same stage)
            mapInPandas exact per-geometry refine  ──> (geom_id, point keys)

Scale properties:
  * The point side carries NO geometry payload through the shuffle — only the
    int64 join key(s); the geometry side is N_geoms x |cover| small rows.
  * One shuffle per side (the equi-join's own hash partitioning).  The exact
    refine is pipelined into the post-join stage — no extra exchange.
  * A point has exactly ONE cover cell at the join resolution and each
    geometry's cover cells are distinct, so (geom_id, point) pairs are unique
    by construction — no dedup stage is needed.
  * Dense cells (urban skew) are salted: the point side picks a deterministic
    salt in [0, S) per row, the geometry side replicates its cover row S
    times, and the join key becomes (qcell, salt) — same row-set, S-way
    fan-out of the hot cell across reducers.  `auto_salt_cells` derives the
    salt map from the lineage per-pcell statistics (prepare.load_pcell_stats),
    the same stats the single-query planner uses for its strategy choice.
  * Covers are computed DISTRIBUTEDLY (mapInPandas over the geometry table):
    no driver-side loop over N geometries, so N scales past what the driver
    could enumerate.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import cells, geo
from .functions import cell_expr, cell_parent_expr, isin_expr

#: geometry-table schema: one row per query geometry.  `gspec` is the packed
#: JSON geometry `[kind, coords, holes, buffer]` (pack_geom) — a single
#: string column, deliberately NOT GeoJSON-style nested arrays: a
#: list<list<list<double>>> column segfaults pyarrow's arrow_to_pandas on
#: this container's pyarrow when crossing into mapInPandas, and the flat
#: string is smaller on the wire anyway.  Geometry layers stored as
#: WKT/GeoJSON text parse into this format with one native from_json/UDF
#: pass.
GEOM_SCHEMA = T.StructType([
    T.StructField("geom_id", T.LongType(), False),
    T.StructField("gspec", T.StringType(), False),
])


def pack_geom(spec: geo.GeomSpec, buffer_m: float) -> str:
    """Compact JSON geometry encoding `[kind, coords, holes, buffer]`."""
    import json

    return json.dumps(
        [spec.kind, [[float(x), float(y)] for x, y in spec.coords],
         [[[float(x), float(y)] for x, y in h] for h in spec.holes] or None,
         float(buffer_m)], separators=(",", ":"))


def geoms_to_df(spark: SparkSession, items: Iterable[tuple[int, geo.GeomSpec, float]]
                ) -> DataFrame:
    """Build the geometry table from driver-side (geom_id, GeomSpec, buffer)
    triples — the small-N convenience constructor (tests, gates).  Large-N
    pipelines produce GEOM_SCHEMA rows distributedly from their stored
    geometry layer."""
    rows = [(int(gid), pack_geom(spec, buf)) for gid, spec, buf in items]
    # pandas -> Arrow fast path (list-of-tuples createDataFrame pays per-row
    # pickling; noticeable from ~10^4 geometries up)
    pdf = pd.DataFrame(rows, columns=["geom_id", "gspec"])
    return spark.createDataFrame(pdf, GEOM_SCHEMA)


def _unpack_geom(s: str) -> tuple[geo.GeomSpec, float]:
    import json

    kind, coords, holes, buf = json.loads(s)
    return geo.GeomSpec(kind, coords, holes=holes), float(buf)


#: per-worker spec cache: a geometry appears in MANY Arrow batches of the
#: refine stage (once per qcell per partition) — at N=5000 geometries the
#: repeated JSON parse + GeomSpec construction dominated the refine (24 s ->
#: ~16 s for the 5000-geometry sweep at sf0.1).  Keyed by the packed string;
#: bounded with a wholesale clear (simple, and a worker rarely sees more
#: than one layer's geometries).
_SPEC_CACHE: dict[str, tuple] = {}


def _unpack_geom_cached(s: str) -> tuple[geo.GeomSpec, float]:
    out = _SPEC_CACHE.get(s)
    if out is None:
        if len(_SPEC_CACHE) >= 65536:
            _SPEC_CACHE.clear()
        out = _SPEC_CACHE[s] = _unpack_geom(s)
    return out


_COVER_SCHEMA = T.StructType([
    T.StructField("qcell", T.LongType(), False),
    T.StructField("geom_id", T.LongType(), False),
    T.StructField("gspec", T.StringType(), False),
])


def cover_rows(geoms_df: DataFrame, res: int) -> DataFrame:
    """Explode each geometry into its cell cover at `res`: one row per
    (qcell, geometry).  The packed geometry rides along so the exact refine
    after the join needs no second join and no driver broadcast — the cover
    rows ARE the broadcast-free shipping of the geometries to exactly the
    reducers that need them."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            frames = []
            for i in range(len(b)):
                gspec = b["gspec"].iloc[i]
                spec, buf = _unpack_geom(gspec)
                cover = cells.cover_geometry(spec, buf, res)
                if cover.size == 0:
                    continue
                frames.append(pd.DataFrame({
                    "qcell": cover.astype(np.int64),
                    "geom_id": np.int64(b["geom_id"].iloc[i]),
                    "gspec": gspec,
                }))
            if frames:  # never yield empty frames (Arrow empty-cast gotcha)
                yield pd.concat(frames, ignore_index=True)

    return geoms_df.mapInPandas(run, schema=_COVER_SCHEMA)


def pcell_footprint(geoms_df: DataFrame, res: int) -> list[int]:
    """The geometry layer's PARTITION-key footprint: each geometry's FINE
    cover (the same one the join will use — a coarse-res cover computed
    directly is NOT a guaranteed superset of the fine cover's parents, the
    half-diagonal slack differs) reduced to its distinct pcells inside the
    stage, so the job's output is tiny (<= 4^7 cells planet-wide) however
    large N x |cover| is.  One extra pass over the SMALL geometry side —
    deliberately not a cache of the cover rows, which would pin
    N x |cover| x |gspec| bytes of executor memory at production N."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            pcs: set[int] = set()
            for i in range(len(b)):
                spec, buf = _unpack_geom(b["gspec"].iloc[i])
                cover = cells.cover_geometry(spec, buf, res)
                if cover.size:
                    pcs.update(
                        int(c) for c in
                        np.unique(cells.cell_parent(cover, cells.PARTITION_RES)))
            if pcs:
                yield pd.DataFrame({"pc": sorted(pcs)})

    df = geoms_df.mapInPandas(run, schema="pc long")
    return sorted({r.pc for r in df.distinct().collect()})


def pick_batch_res(items, sample: int = 256) -> int:
    """Driver-side shared-resolution pick for a geometry batch: the median
    of cells.pick_cover_res over a bounded sample (all covers and the point
    key must agree on ONE res).  Median, not min/max: one continent-sized
    outlier must not coarsen every city-sized geometry's cover (false-
    positive explosion), nor one tiny geometry blow up a big one's cover
    row count — outliers on either side still get correct results, just a
    less-optimal cover for themselves."""
    items = list(items)
    step = max(1, len(items) // sample)
    picks = sorted(
        cells.pick_cover_res(spec, buf) for _, spec, buf in items[::step]
    )
    return picks[len(picks) // 2] if picks else cells.DEFAULT_RES


def auto_salt_cells(pcell_rows: dict[int, int], threshold: int,
                    max_salt: int = 32) -> dict[int, int]:
    """Salt map from the lineage per-pcell row counts: pcells whose count
    exceeds `threshold` get S = ceil(count / threshold) (capped) salt
    buckets.  Keyed at PARTITION_RES — the granularity the lineage measures."""
    out = {}
    for pc, n in pcell_rows.items():
        if n > threshold:
            out[int(pc)] = min(int(np.ceil(n / threshold)), max_salt)
    return out


def _refine_fn(keep_cols: list[str], lon_col: str, lat_col: str,
               with_distance: bool = False):
    out_cols = ["geom_id", *keep_cols] + (["distance"] if with_distance else [])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if not len(b):
                continue
            lon = b[lon_col].to_numpy()
            lat = b[lat_col].to_numpy()
            keep = np.zeros(len(b), dtype=bool)
            dist = np.zeros(len(b), dtype=np.float64) if with_distance else None
            # group by geometry within the Arrow batch: the join's hash
            # partitioning clusters each qcell's rows, so batches contain few
            # distinct geometries and each group refines vectorized
            for _, idx in b.groupby("geom_id", sort=False).indices.items():
                spec, buf = _unpack_geom_cached(b["gspec"].iloc[idx[0]])
                d = spec.distance_m(lon[idx], lat[idx])
                keep[idx] = d <= buf
                if with_distance:
                    dist[idx] = d
            if keep.any():
                out = b.loc[keep, ["geom_id", *keep_cols]]
                if with_distance:
                    out = out.assign(distance=dist[keep])
                yield out[out_cols]

    return run


def batch_spatial_join(points: DataFrame, geoms_df: DataFrame, res: int,
                       keep_cols: tuple[str, ...] = ("poi_id",),
                       lon_col: str = "lon", lat_col: str = "lat",
                       salt_cells: dict[int, int] | None = None,
                       salt_res: int = cells.PARTITION_RES,
                       with_distance: bool = False,
                       pcell_col: str | None = None) -> DataFrame:
    """JOIN every point against every query geometry containing it, in ONE
    job.  Returns (geom_id, *keep_cols) pairs — inner-join semantics: points
    matching no geometry and geometries matching no point produce no row.

    res: shared cover/join resolution (every geometry's cover and the point
    cell key must agree).  Pick ~ the finest res whose typical cover stays
    small (cells.pick_cover_res of a representative geometry).
    salt_cells: {salt_res-cell id -> S} skew map (see auto_salt_cells); the
    hot cells' join work fans out S ways with identical output.
    pcell_col: name of the points table's coarse PARTITION key column (the
    prepared layout's `pcell`).  When given, the geometry layer's pcell
    footprint (one bounded collect over the small cover side, <= 4^7 cells
    planet-wide) becomes an IN filter on that column — PARQUET DIRECTORY
    PRUNING on the point side, so a regional geometry layer never scans the
    planet-scale table's other partitions."""
    covers = cover_rows(geoms_df, res)
    qcell = cell_expr(F.col(lon_col), F.col(lat_col), res)
    if pcell_col is not None:
        pcs = pcell_footprint(geoms_df, res)
        if not pcs:
            points = points.filter(F.lit(False))
        else:
            points = points.filter(isin_expr(pcell_col, pcs))
    cols = list(dict.fromkeys([*keep_cols, lon_col, lat_col]))
    pts = points.select(*cols).withColumn("qcell", qcell)

    if salt_cells:
        entries = []
        for c, s in sorted(salt_cells.items()):
            entries.extend([F.lit(int(c)), F.lit(int(s))])
        salt_map = F.create_map(*entries)
        nsalt_p = F.coalesce(
            F.element_at(salt_map, cell_parent_expr(F.col("qcell"), res, salt_res)),
            F.lit(1))
        # deterministic per-row salt: any well-mixed function of the row works
        pts = pts.withColumn(
            "salt", F.pmod(F.xxhash64(F.col(lon_col), F.col(lat_col)), nsalt_p))
        nsalt_g = F.coalesce(
            F.element_at(salt_map, cell_parent_expr(F.col("qcell"), res, salt_res)),
            F.lit(1))
        covers = covers.withColumn(
            "salt", F.explode(F.sequence(F.lit(0).cast("long"), nsalt_g - 1)))
        joined = pts.join(covers, ["qcell", "salt"]).drop("qcell", "salt")
    else:
        joined = pts.join(covers, "qcell").drop("qcell")

    out_schema = T.StructType(
        [T.StructField("geom_id", T.LongType(), False)]
        + [joined.schema[c] for c in keep_cols]
        + ([T.StructField("distance", T.DoubleType(), False)]
           if with_distance else [])
    )
    return joined.mapInPandas(
        _refine_fn(list(keep_cols), lon_col, lat_col, with_distance),
        schema=out_schema)


def batch_join_counts(points: DataFrame, geoms_df: DataFrame, res: int,
                      include_empty: bool = False, **kw) -> DataFrame:
    """Per-geometry match counts — the batch analogue of the stats request
    (one aggregate over the join; partial aggregation keeps the shuffle to
    one row per (partition, geom_id)).  `include_empty=True` emits a 0-count
    row for geometries matching nothing (a broadcast left join against the
    small geometry-id side — the report shape a region-coverage audit
    needs)."""
    pairs = batch_spatial_join(points, geoms_df, res, **kw)
    counts = pairs.groupBy("geom_id").agg(F.count("*").alias("n_pois"))
    if not include_empty:
        return counts
    return (
        geoms_df.select("geom_id")
        .join(F.broadcast(counts), "geom_id", "left")
        .select("geom_id", F.coalesce(F.col("n_pois"), F.lit(0)).alias("n_pois"))
    )


def batch_nearest(points: DataFrame, geoms_df: DataFrame, res: int,
                  keep_cols: tuple[str, ...] = ("poi_id",),
                  **kw) -> DataFrame:
    """Assign each point its NEAREST geometry among those whose buffer
    reaches it — the 'tag every image with its region' pipeline op (one row
    per matched point: *keep_cols, nearest_geom).

    Shape: the batch join with per-pair distances, then ONE partial-
    aggregable min of struct(distance, geom_id) per point — lexicographic
    struct ordering gives the deterministic lowest-geom_id tie-break, and
    the partial aggregation means the shuffle carries one candidate per
    (task, point), not every pair."""
    pairs = batch_spatial_join(points, geoms_df, res, keep_cols=keep_cols,
                               with_distance=True, **kw)
    best = F.min(F.struct(F.col("distance"), F.col("geom_id"))).alias("best")
    return (
        pairs.groupBy(*keep_cols).agg(best)
        .select(*keep_cols, F.col("best.geom_id").alias("nearest_geom"))
    )
