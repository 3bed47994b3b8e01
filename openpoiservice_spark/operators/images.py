"""Image feature extraction over the binary payload column.

The multimodal-pipeline operator set (build brief): decode -> per-image
features (intensity moments, per-channel means, an 8-bin luminance
histogram).  Decode rides the in-repo codecs (imaging.py — PNG real, JPEG
stand-in documented there); swapping in PIL/turbojpeg on a real cluster
changes only imaging.decode_image.

Arrow batch in, one feature row per image out; `bytes` crosses the Python
boundary exactly once.  At 10^12 rows this stage is embarrassingly parallel
and decode-bound — it is the compute body of the scaling-efficiency
evidence job in bench.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .. import imaging

_FEAT_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("mean_g", T.DoubleType()),
        T.StructField("mean_b", T.DoubleType()),
        T.StructField("std_lum", T.DoubleType()),
        T.StructField("hist", T.ArrayType(T.LongType())),
    ]
)


def image_features(df: DataFrame) -> DataFrame:
    """df needs (image_id, bytes, fmt); returns one feature row per image."""
    src = df.select("image_id", "bytes", "fmt")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids = b["image_id"].to_numpy()
            raws = b["bytes"].to_numpy()
            fmts = b["fmt"].to_numpy()
            out = {"image_id": ids, "mean_r": [], "mean_g": [], "mean_b": [],
                   "std_lum": [], "hist": []}
            for i in range(len(b)):
                px = imaging.decode_image(raws[i], fmts[i]).astype(np.float64)
                ch = px.mean(axis=(0, 1))
                lum = px.mean(axis=2)
                out["mean_r"].append(float(ch[0]))
                out["mean_g"].append(float(ch[1]))
                out["mean_b"].append(float(ch[2]))
                out["std_lum"].append(float(lum.std()))
                hist, _ = np.histogram(lum, bins=8, range=(0.0, 256.0))
                out["hist"].append(hist.astype(np.int64))
            yield pd.DataFrame(out)

    return src.mapInPandas(run, schema=_FEAT_SCHEMA)
