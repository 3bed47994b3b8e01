"""Raster↔vector tile assignment — the graft's image axis (north_rule:
"raster↔vector tile assignment that bins image pixels into zoom-level tiles").

Model: each row's w×h image is a raster centred on the row's point on the
zoom-z global pixel grid (256 px per tile, slippy-map convention).  The
raster therefore overlaps at most 4 tiles; the per-tile pixel count is a
closed-form interval overlap.

Two operators:

  * `assign_tiles`      — pixel COUNTS per (z, tx, ty).  Pure native column
                          math (floor/least/greatest inside whole-stage
                          codegen) — no UDF, no decode, and the identical
                          arithmetic runs in the DuckDB oracle.
  * `tile_pixel_stats`  — adds decoded-pixel aggregates (sum of intensities
                          over the overlapping sub-rectangle) via an
                          Arrow-batched pandas UDF that decodes `bytes`.
                          This is the only operator that reads the binary
                          column (SURVEY.md §7: binary payload discipline).

The slippy formulas mirror the reference-era tile math used by every OSM
stack; the reference itself has no raster path (it serves vector GeoJSON) —
this is the graft axis B extension (FIXTURES.md §3 fixes the golden).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import imaging


def _mercator_cols(lon, lat):
    xn = (lon + 180.0) / 360.0
    t = F.tan(F.radians(lat))
    yn = (F.lit(1.0) - F.log(t + F.sqrt(t * t + 1.0)) / F.lit(math.pi)) / 2.0
    return xn, yn


def assign_tiles(df: DataFrame, z: int) -> DataFrame:
    """Explode each row into its ≤4 (z, tx, ty, px_count) tile assignments.

    Input requires columns lon, lat, w, h (+ any carried columns).  All math
    is native columns: global top-left pixel gx0/gy0, then per-axis interval
    overlap with the two candidate tiles, cross-joined via a 2×2 literal
    array and filtered to px_count > 0.
    """
    xn, yn = _mercator_cols(F.col("lon"), F.col("lat"))
    scale = float((1 << z) * 256)
    gx0 = F.floor(xn * scale - F.col("w") / 2.0).cast("long")
    gy0 = F.floor(yn * scale - F.col("h") / 2.0).cast("long")

    def axis(g0, extent):
        tA = F.floor(g0 / 256.0).cast("long")
        nA = F.least((tA + 1) * 256 - g0, extent.cast("long"))
        return tA, nA, tA + 1, extent.cast("long") - nA

    txA, nxA, txB, nxB = axis(gx0, F.col("w"))
    tyA, nyA, tyB, nyB = axis(gy0, F.col("h"))
    spans = F.array(
        F.struct(txA.alias("tx"), tyA.alias("ty"), (nxA * nyA).alias("px_count"),
                 gx0.alias("gx0"), gy0.alias("gy0")),
        F.struct(txB.alias("tx"), tyA.alias("ty"), (nxB * nyA).alias("px_count"),
                 gx0.alias("gx0"), gy0.alias("gy0")),
        F.struct(txA.alias("tx"), tyB.alias("ty"), (nxA * nyB).alias("px_count"),
                 gx0.alias("gx0"), gy0.alias("gy0")),
        F.struct(txB.alias("tx"), tyB.alias("ty"), (nxB * nyB).alias("px_count"),
                 gx0.alias("gx0"), gy0.alias("gy0")),
    )
    out = df.withColumn("tile", F.explode(spans))
    out = out.filter(F.col("tile.px_count") > 0)
    return out.select(
        *df.columns,
        F.lit(z).alias("z"),
        F.col("tile.tx").alias("tx"),
        F.col("tile.ty").alias("ty"),
        F.col("tile.px_count").alias("px_count"),
        F.col("tile.gx0").alias("gx0"),
        F.col("tile.gy0").alias("gy0"),
    )


_PIX_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("z", T.IntegerType()),
        T.StructField("tx", T.LongType()),
        T.StructField("ty", T.LongType()),
        T.StructField("px_count", T.LongType()),
        T.StructField("sum_intensity", T.DoubleType()),
        T.StructField("mean_intensity", T.DoubleType()),
    ]
)


def tile_pixel_stats(df: DataFrame, z: int) -> DataFrame:
    """Decode each image once and aggregate pixel intensities per overlapped
    tile sub-rectangle.  mapInPandas: one Arrow batch in, the ≤4 tile rows
    per image out; decode cost is the dominant term so the operator keeps
    the whole batch in numpy."""
    assigned = assign_tiles(
        df.select("image_id", "bytes", "fmt", "lon", "lat", "w", "h"), z
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out_rows = {k: [] for k in
                        ("image_id", "z", "tx", "ty", "px_count", "sum_intensity", "mean_intensity")}
            # decode each distinct image once per batch
            for iid, grp in b.groupby("image_id", sort=False):
                first = grp.iloc[0]
                px = imaging.decode_image(first["bytes"], first["fmt"]).astype(np.float64)
                inten = px.mean(axis=2)  # (h, w) mean over RGB
                h_img, w_img = inten.shape
                gx0, gy0 = int(first["gx0"]), int(first["gy0"])
                for _, r in grp.iterrows():
                    tx, ty = int(r["tx"]), int(r["ty"])
                    # overlap of [gx0, gx0+w) with tile [tx*256, (tx+1)*256)
                    x_lo = max(gx0, tx * 256) - gx0
                    x_hi = min(gx0 + w_img, (tx + 1) * 256) - gx0
                    y_lo = max(gy0, ty * 256) - gy0
                    y_hi = min(gy0 + h_img, (ty + 1) * 256) - gy0
                    sub = inten[y_lo:y_hi, x_lo:x_hi]
                    out_rows["image_id"].append(iid)
                    out_rows["z"].append(z)
                    out_rows["tx"].append(tx)
                    out_rows["ty"].append(ty)
                    out_rows["px_count"].append(int(sub.size))
                    out_rows["sum_intensity"].append(float(sub.sum()))
                    out_rows["mean_intensity"].append(
                        float(sub.mean()) if sub.size else 0.0
                    )
            yield pd.DataFrame(out_rows)

    return assigned.mapInPandas(run, schema=_PIX_SCHEMA)


def tile_histogram(df: DataFrame, z: int) -> DataFrame:
    """Aggregate: total pixels + images per tile — the headline rollup after
    the spatial join (partial aggregation is automatic; grouping key is the
    tile id so the shuffle carries only (tile, partials))."""
    return (
        assign_tiles(df, z)
        .groupBy("z", "tx", "ty")
        .agg(
            F.count("*").alias("n_images"),
            F.sum("px_count").alias("total_px"),
        )
    )
