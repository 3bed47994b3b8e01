"""Image payload codecs + deterministic pixel synthesis + raster tile math.

The graft's raster axis (BASELINE.json graft_cell payload=image): every row
carries an encoded image in `bytes` with metadata (w, h, fmt).  This container
ships no image libraries (no PIL), so:

  * ``fmt="png"`` — a real, spec-compliant PNG codec implemented here with
    zlib (8-bit RGB, filter type 0).  Any standard viewer can open our PNGs;
    our decoder handles the subset our encoder emits and raises
    ``NotImplementedError`` for foreign PNG features (interlace, palettes,
    other filter types) — a clearly-marked stub per the build rules.
  * ``fmt="jpeg"`` — REAL baseline JPEG decode is supported: `decode_image`
    sniffs the FFD8 magic and routes genuine JPEG streams to the
    spec-compliant T.81 codec in `jpeg.py` (baseline sequential, standard
    or custom tables, 4:4:4/4:2:2/4:2:0, restart intervals; encoder
    included).  Bulk synthetic fixtures keep the deterministic QJPG
    container (magic ``QJPG``: uniform quantization step 4 + zlib,
    PSNR ~= 46.9 dB >= the 40 dB invariant) because random-noise fixtures
    are JPEG's worst case and entropy decode is sequential CPU the bench's
    decode stage doesn't need to pay; both containers flow through the same
    Spark plumbing (binary column, Arrow batches, UDF signatures).

Pixel synthesis (FIXTURES.md §3) is a pure function of image_id so any
verifier can regenerate the expected pixels without stored goldens.

Tile math: slippy-map / web-mercator.  An image is modelled as a w x h raster
centred on its point at the global-pixel scale of zoom z (256 px tiles), so a
row's pixels straddle at most 4 tiles; per-tile pixel counts have a closed
form (interval overlap) that is both numpy-vectorizable and ANSI-SQL
expressible — the DuckDB oracle reproduces it exactly.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
QJPG_MAGIC = b"QJPG"
QJPG_STEP = 4  # quantization step -> ~46.9 dB PSNR


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> PNG bytes (color type 2, bit depth 8, filter 0)."""
    pixels = np.ascontiguousarray(pixels, dtype=np.uint8)
    h, w, c = pixels.shape
    assert c == 3, "RGB only"
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    # one 0x00 filter byte per scanline
    raw = np.empty((h, 1 + w * 3), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = pixels.reshape(h, w * 3)
    idat = zlib.compress(raw.tobytes(), 6)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, 3) uint8.  Supports the subset encode_png emits.
    Corrupt/truncated streams raise ValueError (fuzz-asserted)."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    idat = b""
    while pos < len(data):
        if pos + 8 > len(data):
            raise ValueError("truncated PNG stream")
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated PNG stream")
        pos += 12 + length
        if tag == b"IHDR":
            if len(body) != 13:
                raise ValueError("corrupt PNG IHDR")
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(">IIBBBBB", body)
            if (depth, ctype, comp, filt, interlace) != (8, 2, 0, 0, 0):
                raise NotImplementedError(
                    "decode_png stub: only 8-bit RGB, no interlace "
                    f"(got depth={depth} ctype={ctype} interlace={interlace})"
                )
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("PNG has no IHDR")
    try:
        flat = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
        raw = flat.reshape(h, 1 + w * 3)
    except (zlib.error, ValueError) as e:
        raise ValueError(f"corrupt PNG stream: {e}") from None
    if (raw[:, 0] != 0).any():
        raise NotImplementedError("decode_png stub: only filter type 0")
    return raw[:, 1:].reshape(h, w, 3).copy()


def encode_qjpg(pixels: np.ndarray, step: int = QJPG_STEP) -> bytes:
    """Deterministic lossy stand-in for JPEG (see module docstring)."""
    pixels = np.ascontiguousarray(pixels, dtype=np.uint8)
    h, w, _ = pixels.shape
    q = (pixels.astype(np.int32) // step * step + step // 2).clip(0, 255).astype(np.uint8)
    return QJPG_MAGIC + struct.pack(">HHB", w, h, step) + zlib.compress(q.tobytes(), 6)


def decode_qjpg(data: bytes) -> np.ndarray:
    if data[:4] != QJPG_MAGIC:
        raise ValueError("not a QJPG payload")
    if len(data) < 9:
        raise ValueError("truncated QJPG payload")
    w, h, _step = struct.unpack(">HHB", data[4:9])
    try:
        flat = np.frombuffer(zlib.decompress(data[9:]), dtype=np.uint8)
        return flat.reshape(h, w, 3).copy()
    except (zlib.error, ValueError) as e:
        raise ValueError(f"corrupt QJPG stream: {e}") from None


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    """Dispatch decode by the row's fmt column — the engine's single decode
    entry point (used by the tile-pixel pandas UDF).

    fmt="jpeg" payloads are sniffed by magic: real JPEG streams (FFD8) go to
    the spec-compliant baseline decoder in `jpeg.py` (markers, Huffman,
    4:2:0/4:2:2/4:4:4, restart intervals); legacy QJPG containers (the
    deterministic high-PSNR stand-in used for bulk synthetic fixtures, where
    entropy-decode CPU would dominate) keep decoding unchanged."""
    if fmt == "png":
        return decode_png(data)
    if fmt in ("jpeg", "jpg"):  # real ingests carry both spellings
        if data[:2] == b"\xff\xd8":
            from . import jpeg as _jpeg

            return _jpeg.decode_jpeg(bytes(data))
        return decode_qjpg(data)
    raise NotImplementedError(f"decode stub: unsupported fmt {fmt!r}")


# ---------------------------------------------------------------- synthesis

def synth_pixels(image_id: str) -> tuple[np.ndarray, str]:
    """Deterministic pixels + fmt for an image_id (FIXTURES.md §3):
    seed = crc32(image_id); size in {16,32,64} by seed%3; png unless seed%4==0.
    """
    seed = zlib.crc32(image_id.encode("utf-8")) & 0xFFFFFFFF
    size = (16, 32, 64)[seed % 3]
    rng = np.random.default_rng(seed)
    pixels = rng.integers(0, 256, (size, size, 3), dtype=np.uint8)
    fmt = "jpeg" if seed % 4 == 0 else "png"
    return pixels, fmt


def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    return encode_png(pixels) if fmt == "png" else encode_qjpg(pixels)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB (test invariant; SURVEY.md §2.10 #7)."""
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0**2 / mse))


# ---------------------------------------------------------------- tile math

def mercator_norm(lon, lat):
    """Web-mercator normalized coords in [0,1).  asinh is spelled
    ln(t + sqrt(t^2 + 1)) so the Spark plan and the DuckDB oracle evaluate the
    byte-identical double expression (hash-stable across engines)."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    xn = (lon + 180.0) / 360.0
    t = np.tan(np.radians(lat))
    yn = (1.0 - np.log(t + np.sqrt(t * t + 1.0)) / np.pi) / 2.0
    return xn, yn


def tile_of(lon, lat, z: int):
    """Slippy tile (tx, ty) for points, vectorized."""
    xn, yn = mercator_norm(lon, lat)
    n = np.int64(1) << z
    tx = np.clip(np.floor(xn * n).astype(np.int64), 0, n - 1)
    ty = np.clip(np.floor(yn * n).astype(np.int64), 0, n - 1)
    return tx, ty


def raster_tile_spans(lon, lat, w, h, z: int):
    """Closed-form pixel->tile binning for a batch of rows.

    Each image is a w x h raster centred at its point on the zoom-z global
    pixel grid (256 px per tile).  Returns per-row:
      gx0, gy0 : top-left global pixel coords (int64)
      For each axis the raster overlaps at most ceil(64/256)+1 = 2 tiles, so
      the caller enumerates the <= 4 (tile, count) combinations from the
      interval-overlap counts returned here:
      (txA, nxA, txB, nxB, off) per axis, where counts B are 0 when the
      raster does not straddle a tile boundary on that axis and `off` is the
      number of pixels clipped below the grid edge (image-space offset of
      the first surviving column/row).
    """
    xn, yn = mercator_norm(lon, lat)
    w = np.asarray(w, dtype=np.int64)
    h = np.asarray(h, dtype=np.int64)
    scale = (np.int64(1) << z) * 256
    gx0 = np.floor(xn * scale - w / 2.0).astype(np.int64)
    gy0 = np.floor(yn * scale - h / 2.0).astype(np.int64)

    def axis_spans(g0, extent):
        # clamp the pixel interval [g0, g0+extent) to the zoom-z grid
        # [0, scale) — above ~85°N the mercator y goes negative and tile
        # ids must stay in [0, 2^z), matching functions.tile_expr's clamp;
        # clipped pixels produce no tile rows.  off = pixels clipped on the
        # low side (callers offset image-space slices by it).
        g0c = np.clip(g0, 0, scale)
        g1c = np.clip(g0 + extent, 0, scale)
        off = np.maximum(g0c - g0, 0)  # 0 for fully-right-of-grid rasters
        ext = g1c - g0c
        tA = g0c // 256  # floor div: first tile touched
        first_count = np.minimum((tA + 1) * 256 - g0c, ext)
        tB = tA + 1
        second_count = ext - first_count
        return tA, first_count, tB, second_count, off

    txA, nxA, txB, nxB, offx = axis_spans(gx0, w)
    tyA, nyA, tyB, nyB, offy = axis_spans(gy0, h)
    return gx0, gy0, (txA, nxA, txB, nxB, offx), (tyA, nyA, tyB, nyB, offy)


def tile_pixel_counts(lon, lat, w, h, z: int):
    """Vectorized oracle for per-tile pixel counts.

    Returns (row_idx, tx, ty, px_count) flat arrays with px_count > 0 —
    exactly the rows the engine's tile-assignment operator must produce.
    """
    _, _, (txA, nxA, txB, nxB, _ox), (tyA, nyA, tyB, nyB, _oy) = raster_tile_spans(
        lon, lat, w, h, z)
    n = len(txA)
    idx = np.arange(n, dtype=np.int64)
    rows = []
    for tx, nx in ((txA, nxA), (txB, nxB)):
        for ty, ny in ((tyA, nyA), (tyB, nyB)):
            cnt = nx * ny
            keep = cnt > 0
            rows.append(
                np.column_stack([idx[keep], tx[keep], ty[keep], cnt[keep]])
            )
    out = np.vstack(rows)
    order = np.lexsort((out[:, 2], out[:, 1], out[:, 0]))
    return out[order]
