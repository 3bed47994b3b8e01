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


_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("fmt", T.StringType()),
    ]
)


def resize_images(df: DataFrame, size: int = 16) -> DataFrame:
    """Decode -> nearest-neighbour resize to (size x size) -> re-encode PNG.

    Real implementation (numpy index-grid sampling); swap the interpolation
    for PIL/cv2 on a cluster that has them — schema/batching unchanged."""
    src = df.select("image_id", "bytes", "fmt")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids = b["image_id"].to_numpy()
            raws = b["bytes"].to_numpy()
            fmts = b["fmt"].to_numpy()
            out = {"image_id": ids, "bytes": [], "w": [], "h": [], "fmt": []}
            for i in range(len(b)):
                px = imaging.decode_image(raws[i], fmts[i])
                ys = (np.arange(size) * px.shape[0] // size)
                xs = (np.arange(size) * px.shape[1] // size)
                small = px[ys][:, xs]
                out["bytes"].append(imaging.encode_png(small))
                out["w"].append(size)
                out["h"].append(size)
                out["fmt"].append("png")
            yield pd.DataFrame(out)

    return src.mapInPandas(run, schema=_RESIZE_SCHEMA)


_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_bytes", T.BinaryType()),
    ]
)


def sample_frames(df: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame sampling for video payloads — DECODE STUB.

    No video codec library exists in this container, so rows whose fmt is a
    video container raise ``NotImplementedError`` at the decode step (swap
    in pyav/ffmpeg on a real cluster); image rows are treated as 1-frame
    videos and emit deterministic frame copies so the Spark-side plumbing
    (schema, fan-out, batching) is real and tested end-to-end.
    """
    src = df.select("image_id", "bytes", "fmt")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids = b["image_id"].to_numpy()
            raws = b["bytes"].to_numpy()
            fmts = b["fmt"].to_numpy()
            out = {"image_id": [], "frame_idx": [], "frame_bytes": []}
            for i in range(len(b)):
                if fmts[i] in ("mp4", "webm", "mkv", "avi"):
                    raise NotImplementedError(
                        "sample_frames stub: no video codec in this container "
                        f"(fmt={fmts[i]!r}); plug pyav/ffmpeg decode here"
                    )
                px = imaging.decode_image(raws[i], fmts[i])
                for f in range(min(n_frames, 1)):
                    out["image_id"].append(ids[i])
                    out["frame_idx"].append(f)
                    out["frame_bytes"].append(imaging.encode_png(px))
            yield pd.DataFrame(out)

    return src.mapInPandas(run, schema=_FRAME_SCHEMA)
