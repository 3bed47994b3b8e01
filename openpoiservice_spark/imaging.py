"""Image payload codecs + deterministic pixel synthesis + raster tile math.

The graft's raster axis (BASELINE.json graft_cell payload=image): every row
carries an encoded image in `bytes` with metadata (w, h, fmt).  This container
ships no image libraries (no PIL), so:

  * ``fmt="png"`` — a real, spec-compliant PNG codec implemented here with
    zlib.  The encoder emits 8-bit RGB filter-0 streams any standard viewer
    opens; the DECODER covers the full 8-bit baseline spec (all five
    scanline filters, color types 0/2/3/4/6 incl. palettes, bit depths
    1/2/4/8, Adam7 interlace) so foreign PNGs ingest too — only 16-bit
    channels keep a loud ``NotImplementedError``.
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


#: Adam7 interlace pass grid (PNG spec 4.5.2: x0, y0, dx, dy per pass)
_ADAM7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
_PNG_DEPTHS = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8),
               4: (8, 16), 6: (8, 16)}


def _unfilter(raw: np.ndarray, n_rows: int, stride: int, bpp: int,
              pos: int) -> tuple[np.ndarray, int]:
    """Undo per-scanline filtering (PNG spec 9: None/Sub/Up/Average/Paeth).
    Sub inverts as a per-byte-lane cumulative sum (mod 256 distributes over
    addition); Up is a vector add against the prior row; Average/Paeth are
    sequential along the row by definition — fine at fixture sizes, and a
    production decode path batches many small images, not one huge one."""
    out = np.zeros((n_rows, stride), dtype=np.uint8)
    need = n_rows * (1 + stride)
    if len(raw) - pos < need:
        raise ValueError("PNG: IDAT shorter than the scanline geometry")
    block = raw[pos: pos + need].reshape(n_rows, 1 + stride)
    # Fast path: every scanline filter byte is 0 (None) — the layout this
    # module's own encoder emits and the overwhelmingly common case for
    # synthetic/screenshot-class content.  The per-scanline Python loop
    # below costs ~20 us/row in interpreter+numpy dispatch overhead; a
    # 64x64 image pays ~1.3 ms there vs one vectorized reshape+copy here
    # (the decode stage is the floor of every image lane — guide §4.2).
    if n_rows and block[:, 0].max() == 0:
        return block[:, 1:].copy(), pos + need
    for y in range(n_rows):
        ft = int(raw[pos])
        line = raw[pos + 1: pos + 1 + stride].astype(np.int32)
        pos += 1 + stride
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if ft == 0:
            rec = line
        elif ft == 1:  # Sub
            rec = line.copy()
            for lane in range(bpp):
                rec[lane::bpp] = np.cumsum(rec[lane::bpp]) & 0xFF
        elif ft == 2:  # Up
            rec = (line + prev) & 0xFF
        elif ft == 3:  # Average
            rec = np.empty(stride, np.int32)
            for x in range(stride):
                left = rec[x - bpp] if x >= bpp else 0
                rec[x] = (line[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            rec = np.empty(stride, np.int32)
            for x in range(stride):
                a = int(rec[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"PNG: bad filter type {ft}")
        out[y] = rec.astype(np.uint8)
    return out, pos


def _rows_to_samples(rows: np.ndarray, w: int, channels: int,
                     depth: int) -> np.ndarray:
    """Filtered-and-reconstructed scanline bytes -> (n_rows, w*channels)
    samples, unpacking sub-byte depths MSB-first (PNG spec 7.2)."""
    if depth == 8:
        return rows[:, : w * channels].astype(np.int32)
    bits = np.unpackbits(rows, axis=1)
    n = w * channels
    per = bits[:, : n * depth].reshape(len(rows), n, depth).astype(np.int32)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.int32)
    return (per * weights).sum(axis=2)


def _samples_to_rgb(samples: np.ndarray, w: int, ctype: int, depth: int,
                    plte: bytes | None) -> np.ndarray:
    """(n_rows, w*channels) samples -> (n_rows, w, 3) uint8.  Alpha is
    dropped (the engine's rasters are opaque RGB); gray scales to full
    8-bit range; palette indexes into PLTE with bounds checking."""
    n_rows = len(samples)
    if ctype == 0:
        maxv = (1 << depth) - 1
        g = (samples * 255) // maxv
        return np.repeat(g.astype(np.uint8).reshape(n_rows, w, 1), 3, axis=2)
    if ctype == 2:
        return samples.astype(np.uint8).reshape(n_rows, w, 3)
    if ctype == 3:
        if plte is None:
            raise ValueError("PNG: palette image without PLTE")
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        idx = samples.reshape(n_rows, w)
        if idx.max(initial=0) >= len(pal):
            raise ValueError("PNG: palette index out of range")
        return pal[idx]
    if ctype == 4:
        g = samples.reshape(n_rows, w, 2)[:, :, 0]
        return np.repeat(g.astype(np.uint8).reshape(n_rows, w, 1), 3, axis=2)
    if ctype == 6:
        return samples.astype(np.uint8).reshape(n_rows, w, 4)[:, :, :3].copy()
    raise ValueError(f"PNG: bad color type {ctype}")


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, 3) uint8.  Full baseline coverage (round-4
    'Missing' item 4 — the former foreign-feature stubs are real now): all
    five scanline filters, color types 0/2/3/4/6 (gray, RGB, palette,
    gray+alpha, RGBA; alpha dropped, gray replicated), bit depths 1/2/4/8,
    and Adam7 interlace.  16-bit channels stay a loud NotImplementedError
    (nothing in the pipeline produces them; silently truncating precision
    would be worse than refusing).  Corrupt/truncated streams raise
    ValueError (fuzz-asserted)."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    depth = ctype = interlace = 0
    plte = None
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
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body)
            if comp != 0 or filt != 0:
                raise ValueError("PNG: unknown compression/filter method")
            if ctype not in _PNG_CHANNELS or depth not in _PNG_DEPTHS[ctype]:
                raise ValueError(
                    f"PNG: invalid depth/color combination {depth}/{ctype}")
            if depth == 16:
                raise NotImplementedError(
                    "decode_png: 16-bit channels unsupported (nothing in "
                    "the pipeline emits them; refusing beats truncating)")
            if interlace not in (0, 1):
                raise ValueError(f"PNG: bad interlace method {interlace}")
            if w == 0 or h == 0 or w > 1 << 24 or h > 1 << 24:
                raise ValueError("PNG: bad dimensions")
        elif tag == b"PLTE":
            if length % 3 or length == 0:
                raise ValueError("PNG: bad PLTE length")
            plte = body
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("PNG has no IHDR")
    try:
        raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
    except zlib.error as e:
        raise ValueError(f"corrupt PNG stream: {e}") from None
    channels = _PNG_CHANNELS[ctype]
    bpp = max(1, channels * depth // 8)
    # Fused fast path for plain 8-bit RGB, no interlace, all-None filters
    # (this encoder's own output): one reshape straight from the inflated
    # stream to (h, w, 3), skipping the uint8 -> int32 -> uint8 sample
    # roundtrip of the general path.  The decode stage's cost at 32 local
    # workers is dominated by allocation/page-fault kernel time (bench
    # cpu_env: 25-45% sys on the image lanes), so fewer/smaller temporaries
    # matter as much as user CPU.  Byte-identical output by construction.
    if not interlace and ctype == 2 and depth == 8 and h:
        stride = w * 3
        need = h * (1 + stride)
        if len(raw) < need:
            raise ValueError("PNG: IDAT shorter than the scanline geometry")
        block = raw[:need].reshape(h, 1 + stride)
        if block[:, 0].max() == 0:
            if len(raw) != need:
                raise ValueError(
                    "PNG: trailing IDAT bytes beyond the pixel data")
            # .copy(): the reshape is a stride-trick VIEW into the (read-
            # only) inflated buffer; callers expect a writable array
            return block[:, 1:].reshape(h, w, 3).copy()
    out = np.zeros((h, w, 3), dtype=np.uint8)
    passes = _ADAM7 if interlace else [(0, 0, 1, 1)]
    rpos = 0
    for x0, y0, dx, dy in passes:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue
        stride = (pw * channels * depth + 7) // 8
        rows, rpos = _unfilter(raw, ph, stride, bpp, rpos)
        rgb = _samples_to_rgb(_rows_to_samples(rows, pw, channels, depth),
                              pw, ctype, depth, plte)
        out[y0::dy, x0::dx] = rgb
    if rpos != len(raw):
        raise ValueError("PNG: trailing IDAT bytes beyond the pixel data")
    return out


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
