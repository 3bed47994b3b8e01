"""Vectorized pandas-UDF surface (SURVEY.md §2.10) + native-column helpers.

Every per-row computation in the engine goes through Arrow-batched pandas
UDFs (BASELINE.json input_hint: "no per-row Python") or stays in native
Spark column expressions (JVM, whole-stage codegen).  Native expressions are
preferred wherever the math is closed-form integer/double arithmetic (cell
ids, tile ids) because they keep the plan inside WholeStageCodegen *and*
keep the DuckDB oracle bit-identical.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import captions as _captions
from . import cells as _cells
from . import geo as _geo
from . import taxonomy as _taxonomy

# ----------------------------------------------------------- native columns

def cell_expr(lon: Column, lat: Column, res: int) -> Column:
    """Quadtree cell id as a native column expression (cells.py encoding).
    Stays in whole-stage codegen; identical arithmetic exists in the DuckDB
    oracle SQL."""
    n = 1 << res
    cx = F.least(F.lit(n - 1), F.greatest(F.lit(0), F.floor((lon + 180.0) / 360.0 * n)))
    cy = F.least(F.lit(n - 1), F.greatest(F.lit(0), F.floor((lat + 90.0) / 180.0 * n)))
    return (
        F.lit(res).cast("long") * F.lit(1 << _cells._RES_SHIFT).cast("long")
        + cx.cast("long") * F.lit(1 << _cells._X_SHIFT).cast("long")
        + cy.cast("long")
    )


def isin_expr(col_sql: str, values) -> Column:
    """`col IN (...)` as ONE parsed SQL expression.  Column.isin(values)
    costs one py4j round-trip per literal (~0.8 ms each — a 400-cell cover
    spends ~0.3 s of driver latency just building the predicate); a single
    F.expr string is one round-trip regardless of list size.  Values must be
    ints (cell ids).  An empty list means 'no cell can match' — return a
    literal false (`IN ()` is a SQL parse error; the helper must be total,
    its callers' emptiness guards are non-local)."""
    vals = ",".join(str(int(v)) for v in values)
    if not vals:
        return F.lit(False)
    return F.expr(f"{col_sql} IN ({vals})")


def cell_parent_sql(col_sql: str, res_from: int, res_to: int) -> str:
    """cell_parent_expr as a SQL string (for isin_expr composition)."""
    shift = res_from - res_to
    m = _cells._XY_MASK
    return (f"(CAST({res_to} AS BIGINT) * {1 << _cells._RES_SHIFT} "
            f"+ shiftright(shiftright({col_sql}, {_cells._X_SHIFT}) & {m}, {shift}) "
            f"* {1 << _cells._X_SHIFT} "
            f"+ shiftright({col_sql} & {m}, {shift}))")


def cell_parent_expr(cell: Column, res_from: int, res_to: int) -> Column:
    """Coarsen a cell id column — pure int64 bit math (no doubles: cell ids
    exceed the 53-bit double mantissa, so any double round-trip would corrupt
    them)."""
    shift = res_from - res_to
    mask = F.lit(_cells._XY_MASK).cast("long")
    cx = F.shiftright(cell, _cells._X_SHIFT).bitwiseAND(mask)
    cy = cell.bitwiseAND(mask)
    return (
        F.lit(res_to).cast("long") * F.lit(1 << _cells._RES_SHIFT).cast("long")
        + F.shiftright(cx, shift) * F.lit(1 << _cells._X_SHIFT).cast("long")
        + F.shiftright(cy, shift)
    )


def lonlat_from_phash() -> tuple[Column, Column]:
    """Decode packed coordinates with native bit math (FIXTURES.md §2):
    phash = (lat_q << 32) | lon_q, 1e-7 degree quantization."""
    p = F.col("phash")
    lon = (p.bitwiseAND(F.lit(0xFFFFFFFF))).cast("double") / 1e7 - 180.0
    lat = F.shiftrightunsigned(p, 32).bitwiseAND(F.lit(0xFFFFFFFF)).cast("double") / 1e7 - 90.0
    return lon.alias("lon"), lat.alias("lat")


def tile_expr(lon: Column, lat: Column, z: int) -> tuple[Column, Column]:
    """Slippy tile (tx, ty) as native columns.  asinh is spelled
    ln(t + sqrt(t^2+1)) so the DuckDB oracle matches bit-for-bit
    (imaging.mercator_norm uses the same form)."""
    n = 1 << z
    xn = (lon + 180.0) / 360.0
    t = F.tan(F.radians(lat))
    yn = (F.lit(1.0) - F.log(t + F.sqrt(t * t + 1.0)) / F.lit(float(_pi()))) / 2.0
    tx = F.least(F.lit(n - 1), F.greatest(F.lit(0), F.floor(xn * n))).cast("long")
    ty = F.least(F.lit(n - 1), F.greatest(F.lit(0), F.floor(yn * n))).cast("long")
    return tx, ty


def _pi() -> float:
    import math

    return math.pi


# ------------------------------------------------- native caption parsing

def _unescape_expr(c: Column) -> Column:
    """%-unescape (captions._unescape) as a native replace chain."""
    return F.replace(F.replace(F.replace(c, F.lit("%3D"), F.lit("=")),
                               F.lit("%3B"), F.lit(";")),
                     F.lit("%25"), F.lit("%"))


def caption_attrs_columns() -> dict[str, Column]:
    """caption -> {osm_type, osm_id, tags, category_ids} as NATIVE column
    expressions — the whole import-side parse stays in whole-stage codegen,
    no Python in the loop (the round-1 pandas UDF cost ~6 us/row; at 10^12
    rows that is ~1700 CPU-hours per ingest wave).

    Contract: captions are the engine's canonical serialization
    (captions.encode_caption — header fields first, %-escaped `%;=`, unique
    tag keys).  The taxonomy (category_index) ships as a create_map literal:
    one flat JVM map lookup per tag, same lifecycle as the reference's
    startup-built CategoryTools indices (reference categories.py:38-63).
    Duplicate tag keys follow spark.sql.mapKeyDedupPolicy (session.py pins
    LAST_WIN = Python-dict semantics; the default EXCEPTION policy fails
    loudly rather than silently diverging).
    """
    _, category_index, _, _ = _taxonomy.indices()
    sep = "\x01"
    entries: list[Column] = []
    for k, vals in category_index.items():
        for v, cid in vals.items():
            entries.extend([F.lit(f"{k}{sep}{v}"), F.lit(int(cid))])
    cat_map = F.create_map(*entries)
    wl = F.array(*[F.lit(k) for k in _taxonomy.TAG_WHITELIST])

    cap = F.col("caption")
    tail = F.regexp_replace(cap, r"^osm_type=[^;]*;osm_id=[^;]*;?", "")
    raw = F.when(tail == "", F.expr("map()").cast("map<string,string>")) \
           .otherwise(F.str_to_map(tail, F.lit(";"), F.lit("=")))
    # escape fast-path: %-escapes are rare; the two unescape HOF passes are
    # interpreted (not codegen'd) and dominate the parse cost when applied
    # unconditionally (measured 3.0 s -> 1.8 s per 2M rows at local[32])
    esc = F.transform_values(
        F.transform_keys(raw, lambda k, _: _unescape_expr(k)),
        lambda _, v: _unescape_expr(v),
    )
    tags_all = F.when(cap.contains("%"), esc).otherwise(raw)
    # categories derive from the FULL tag set; only whitelisted keys are
    # retained for output (reference parse_osm.py:347-351)
    cats = F.array_sort(F.array_distinct(F.filter(
        F.transform(
            F.map_entries(tags_all),
            lambda e: F.element_at(cat_map, F.concat(e.key, F.lit(sep), e.value)),
        ),
        lambda x: x.isNotNull(),
    ))).cast("array<int>")
    return {
        "osm_type": F.regexp_extract(cap, r"^osm_type=([^;]*)", 1).cast("int"),
        "osm_id": F.regexp_extract(cap, r"^osm_type=[^;]*;osm_id=([^;]*)", 1).cast("long"),
        "tags": F.map_filter(tags_all, lambda k, _: F.array_contains(wl, k)),
        "category_ids": cats,
    }


# ----------------------------------------------------------- pandas UDFs

_ATTR_SCHEMA = T.StructType(
    [
        T.StructField("osm_type", T.IntegerType()),
        T.StructField("osm_id", T.LongType()),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType())),
        T.StructField("category_ids", T.ArrayType(T.IntegerType())),
    ]
)


@F.pandas_udf(_ATTR_SCHEMA)
def parse_caption_udf(caption: pd.Series) -> pd.DataFrame:
    """caption -> (osm_type, osm_id, whitelisted tags, category ids).

    One Arrow batch per call; the taxonomy indices are module-level dicts,
    loaded once per executor (same lifecycle as the reference's
    startup-built CategoryTools indices, reference categories.py:38-63).
    Categories derive from the FULL tag set; only whitelisted tag keys are
    retained for output (reference parse_osm.py:347-351).
    """
    whitelist = set(_taxonomy.TAG_WHITELIST)
    _, category_index, _, _ = _taxonomy.indices()

    types, ids, tag_maps, cat_lists = [], [], [], []
    for cap in caption:
        osm_type, osm_id, tags = _captions.decode_caption(cap)
        cats = sorted(
            {
                category_index[k][v]
                for k, v in tags.items()
                if k in category_index and v in category_index[k]
            }
        )
        types.append(osm_type)
        ids.append(osm_id)
        tag_maps.append({k: v for k, v in tags.items() if k in whitelist})
        cat_lists.append(cats)
    return pd.DataFrame(
        {"osm_type": types, "osm_id": ids, "tags": tag_maps, "category_ids": cat_lists}
    )


def make_refine_udf(spec: "_geo.GeomSpec", buffer_m: float,
                    bbox: "_geo.GeomSpec | None" = None):
    """Exact spatial refine: ST_DWithin(buffered geom [∩ bbox], point, 0)
    (reference query_builder.py:119-138).  The compiled GeomSpec is captured
    in the closure and shipped once per task (plain-numpy object, cheap
    pickle) — the Spark analogue of PostGIS's recheck after the GiST
    prefilter (reference misc.sql:50-52)."""

    @F.pandas_udf(T.BooleanType())
    def refine(lon: pd.Series, lat: pd.Series) -> pd.Series:
        ok = spec.within_m(lon.to_numpy(), lat.to_numpy(), buffer_m)
        if bbox is not None:
            ok = ok & bbox.within_m(lon.to_numpy(), lat.to_numpy(), 0.0)
        return pd.Series(ok)

    return refine


def make_distance_udf(spec: "_geo.GeomSpec", spheroid: bool = False):
    """Geodesic meters to the query geometry (reference ST_Distance at
    query_builder.py:98; which geometry per quirk Q5 is the caller's job).
    `spheroid=True` computes WGS84 Vincenty for point geometries —
    PostGIS-geography-exact output distances (geo.vincenty_m)."""

    @F.pandas_udf(T.DoubleType())
    def distance(lon: pd.Series, lat: pd.Series) -> pd.Series:
        return pd.Series(spec.distance_m(lon.to_numpy(), lat.to_numpy(), spheroid=spheroid))

    return distance
