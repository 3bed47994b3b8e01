"""JPEG (ITU-T T.81) codec in pure numpy — no PIL/turbojpeg needed.

Closes the round-1 gap "the decode path for real-world JPEG bytes is
unproven" and the round-2 gap "progressive is the majority web encoding":

  * markers: SOI/APPn/COM/DQT/DHT/DRI/SOF0/1/2/SOS/RSTn/EOI
  * BASELINE/extended sequential decode (SOF0/1) and PROGRESSIVE decode
    (SOF2: spectral selection + successive approximation, T.81 Annex G —
    DC first/refine, AC first with EOBn run codes, AC refinement with
    correction bits)
  * components: grayscale or 3-component YCbCr
  * sampling: any (h, v) factors <= 2 — covers 4:4:4, 4:2:2, 4:2:0
  * restart intervals (DRI + RST0-7 resync, DC predictor reset)
  * 8-bit precision, standard or custom quantization/Huffman tables

plus matching encoders: baseline (quality-scaled Annex K tables, 4:4:4 or
4:2:0, optional restart interval) and progressive
(`encode_jpeg_progressive`, a real spectral-selection + 1-bit
successive-approximation scan script whose coefficients converge to the
baseline encoder's exactly — the bit-exact round-trip oracle for the
progressive decoder).  Everything derives from the public T.81 spec:
canonical Huffman code construction (Annex C), zig-zag order (Figure A.6),
the default tables of Annex K, the progressive control flow of Annex G, and
the JFIF YCbCr (BT.601) color transform.

Entropy decode is sequential by nature; the hot engine path keeps the
deterministic QJPG container for bulk synthetic data (imaging.py), while
`imaging.decode_image` sniffs the FFD8 magic and routes real JPEG bytes
here — the plumbing is identical either way.
"""

from __future__ import annotations

import struct

import numpy as np

# ----------------------------------------------------------- constant tables

#: zig-zag scan order: ZIGZAG[i] = block index (row*8+col) of the i-th coeff
ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
_UNZIG = np.argsort(ZIGZAG)

#: Annex K.1/K.2 default quantization tables (zig-zag order -> natural here)
_Q_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
_Q_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

#: Annex K.3 default Huffman specs: (BITS[1..16], HUFFVAL)
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
            list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
              list(range(12)))
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
     0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
     0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
     0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
     0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
     0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
     0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
     0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
     0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
     0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
     0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
     0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
     0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
     0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
     0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
     0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
     0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
     0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
     0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
     0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
     0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)

#: orthonormal DCT-II matrix (C @ block @ C.T = 2D DCT)
_C = np.zeros((8, 8))
for _k in range(8):
    _a = np.sqrt(0.125) if _k == 0 else 0.5
    for _n in range(8):
        _C[_k, _n] = _a * np.cos(np.pi * (2 * _n + 1) * _k / 16.0)


def _canonical_codes(bits, huffval):
    """Annex C: (BITS, HUFFVAL) -> {value: (code, length)}."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


_LUT_CACHE: dict[bytes, np.ndarray] = {}


def _decode_table(bits, huffval):
    """16-bit peek LUT: lut[code16] = (value << 5) | code_length.

    Every canonical code, left-aligned to 16 bits, owns a contiguous range
    of the table — Huffman decode becomes one peek + one array index
    instead of up to 16 bit-serial dictionary probes.  Cached per table
    spec: standard-table streams share four LUTs across all decodes."""
    if len(huffval) < sum(bits):
        raise ValueError("truncated Huffman table")
    key = bytes(bits) + bytes(huffval)
    cached = _LUT_CACHE.get(key)
    if cached is not None:
        return cached
    lut = np.zeros(1 << 16, dtype=np.int32)
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            base = code << (16 - length)
            span = 1 << (16 - length)
            lut[base:base + span] = (huffval[k] << 5) | length
            code += 1
            k += 1
        code <<= 1
    _LUT_CACHE[key] = lut
    return lut


def quality_tables(quality: int = 90) -> tuple[np.ndarray, np.ndarray]:
    """IJG quality scaling of the Annex K tables."""
    quality = max(1, min(100, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    ql = np.clip((_Q_LUMA * scale + 50) // 100, 1, 255)
    qc = np.clip((_Q_CHROMA * scale + 50) // 100, 1, 255)
    return ql.astype(np.int64), qc.astype(np.int64)


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    px = px.astype(np.float64)
    r, g, b = px[..., 0], px[..., 1], px[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(y, cb, cr) -> np.ndarray:
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136286 * (cb - 128.0) - 0.714136286 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0, 255).astype(np.uint8)


def _blockize(plane: np.ndarray) -> np.ndarray:
    """(H, W) with H, W % 8 == 0 -> (n_blocks, 8, 8) in raster block order."""
    bh, bw = plane.shape[0] // 8, plane.shape[1] // 8
    return plane.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)


def _unblockize(blocks: np.ndarray, bh: int, bw: int) -> np.ndarray:
    return blocks.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)


def _pad_to(plane: np.ndarray, mh: int, mw: int) -> np.ndarray:
    """Edge-replicate pad to multiples of (mh, mw)."""
    h, w = plane.shape
    ph = (-h) % mh
    pw = (-w) % mw
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge")


# ----------------------------------------------------------------- bit I/O

class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


class _BitReader:
    """Entropy-segment reader with 0xFF00 unstuffing and RST awareness."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        try:
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1]
                if nxt == 0x00:
                    self.pos += 2
                else:
                    # marker reached: per T.81 the decoder sees 1-bits beyond
                    # the segment (padding); do not consume the marker
                    self.acc = (self.acc << 8) | 0xFF
                    self.nbits += 8
                    return
            else:
                self.pos += 1
        except IndexError:
            raise ValueError("truncated JPEG stream") from None
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def peek16(self) -> int:
        while self.nbits < 16:
            self._fill()
        return (self.acc >> (self.nbits - 16)) & 0xFFFF

    def consume(self, n: int) -> None:
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1

    def receive(self, n: int) -> int:
        if n == 0:
            return 0
        while self.nbits < n:
            self._fill()
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.consume(n)
        return v

    def align_to_marker(self) -> int:
        """Drop partial bits, expect and consume an RST marker; returns its
        index (0-7)."""
        self.acc = 0
        self.nbits = 0
        try:
            while self.data[self.pos] != 0xFF or self.data[self.pos + 1] == 0x00:
                self.pos += 1
            marker = self.data[self.pos + 1]
        except IndexError:
            raise ValueError("truncated JPEG stream") from None
        if not 0xD0 <= marker <= 0xD7:
            raise ValueError(f"expected RST marker, got {marker:#x}")
        self.pos += 2
        return marker - 0xD0


def _huff_decode(reader: _BitReader, lut: np.ndarray) -> int:
    entry = int(lut[reader.peek16()])
    if entry == 0:
        raise ValueError("invalid Huffman code")
    reader.consume(entry & 0x1F)
    return entry >> 5


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map `size` received bits to a signed amplitude."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _size_cat(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


# ----------------------------------------------------------------- encoder

def _prepare_components(pixels: np.ndarray, quality: int, subsampling: str):
    """RGB or grayscale pixels -> (comp_blocks zig-zag int64 arrays, padded
    block widths, h, w, sub, ql, qc) — the shared front half of both
    encoders.  Grayscale input ((h, w) or (h, w, 1)) yields ONE component
    (comp_blocks length 1, sub forced to 1)."""
    pixels = np.ascontiguousarray(pixels, dtype=np.uint8)
    if pixels.ndim == 2:
        pixels = pixels[..., None]
    h, w, c = pixels.shape
    if c == 1:
        ql, _qc = quality_tables(quality)
        p = _pad_to(pixels[..., 0].astype(np.float64), 8, 8) - 128.0
        blocks = _blockize(p)
        coef = np.einsum("km,nml,lj->nkj", _C, blocks, _C.T)
        quant = np.round(coef / ql.reshape(8, 8)).astype(np.int64)
        czz = quant.reshape(-1, 64)[:, ZIGZAG]
        return [czz], [p.shape[1] // 8], h, w, 1, ql, None
    assert c == 3, "RGB or grayscale only"
    if subsampling not in ("444", "420"):
        raise NotImplementedError(f"subsampling {subsampling!r}")
    sub = 2 if subsampling == "420" else 1

    ql, qc = quality_tables(quality)
    ql2 = ql.reshape(8, 8)
    qc2 = qc.reshape(8, 8)

    ycc = _rgb_to_ycbcr(pixels)
    y = ycc[..., 0]
    if sub == 2:
        cbp = _pad_to(ycc[..., 1], 2, 2)
        crp = _pad_to(ycc[..., 2], 2, 2)
        cb = cbp.reshape(cbp.shape[0] // 2, 2, cbp.shape[1] // 2, 2).mean(axis=(1, 3))
        cr = crp.reshape(crp.shape[0] // 2, 2, crp.shape[1] // 2, 2).mean(axis=(1, 3))
    else:
        cb = ycc[..., 1]
        cr = ycc[..., 2]

    # per-component padded planes + quantized zig-zag blocks
    def qblocks(plane: np.ndarray, q2: np.ndarray) -> np.ndarray:
        p = _pad_to(plane, 8, 8) - 128.0
        blocks = _blockize(p)
        coef = np.einsum("km,nml,lj->nkj", _C, blocks, _C.T)
        quant = np.round(coef / q2).astype(np.int64)
        return quant.reshape(-1, 64)[:, ZIGZAG]

    planes = [(_pad_to(y, 8 * sub, 8 * sub), ql2),
              (cb, qc2), (cr, qc2)]
    comp_blocks = []
    comp_bw = []
    for plane, q2 in planes:
        comp_blocks.append(qblocks(plane, q2))
        comp_bw.append(_pad_to(plane, 8, 8).shape[1] // 8)
    return comp_blocks, comp_bw, h, w, sub, ql, qc


def encode_jpeg(pixels: np.ndarray, quality: int = 90,
                subsampling: str = "444", restart_interval: int = 0) -> bytes:
    """(h, w, 3) RGB or (h, w) grayscale uint8 -> baseline JFIF JPEG bytes.

    subsampling: '444' (no chroma subsampling) or '420' (2x2); ignored for
    grayscale (single component).
    """
    comp_blocks, comp_bw, h, w, sub, ql, qc = _prepare_components(
        pixels, quality, subsampling)

    dc_codes = [_canonical_codes(*_DC_LUMA), _canonical_codes(*_DC_CHROMA)]
    ac_codes = [_canonical_codes(*_AC_LUMA), _canonical_codes(*_AC_CHROMA)]

    wbits = _BitWriter()
    pred = [0, 0, 0]

    def put_block(ci: int, tid: int, zz: np.ndarray) -> None:
        dc, ac_tab = dc_codes[tid], ac_codes[tid]
        diff = int(zz[0]) - pred[ci]
        pred[ci] = int(zz[0])
        s = _size_cat(diff)
        code, ln = dc[s]
        wbits.write(code, ln)
        if s:
            wbits.write(diff if diff > 0 else diff + (1 << s) - 1, s)
        run = 0
        last_nz = np.nonzero(zz[1:])[0]
        end = (last_nz[-1] + 2) if len(last_nz) else 1
        for k in range(1, end):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_tab[0xF0]  # ZRL
                wbits.write(code, ln)
                run -= 16
            s = _size_cat(v)
            code, ln = ac_tab[(run << 4) | s]
            wbits.write(code, ln)
            wbits.write(v if v > 0 else v + (1 << s) - 1, s)
            run = 0
        if end < 64:
            code, ln = ac_tab[0x00]  # EOB
            wbits.write(code, ln)

    gray = len(comp_blocks) == 1

    # MCU interleave (grayscale: one block per MCU over the padded grid)
    mcus_x = -(-w // (8 * sub)) if not gray else comp_bw[0]
    mcus_y = -(-h // (8 * sub)) if not gray else len(comp_blocks[0]) // comp_bw[0]
    mcu_count = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                wbits.flush()
                wbits.buf += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                pred[:] = [0, 0, 0]
            if gray:
                put_block(0, 0, comp_blocks[0][my * comp_bw[0] + mx])
            else:
                for v in range(sub):
                    for hh in range(sub):
                        put_block(0, 0, comp_blocks[0][(my * sub + v) * comp_bw[0] + mx * sub + hh])
                put_block(1, 1, comp_blocks[1][my * comp_bw[1] + mx])
                put_block(2, 1, comp_blocks[2][my * comp_bw[2] + mx])
            mcu_count += 1
    wbits.flush()

    # ----- assemble the stream
    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")  # APP0
    out += seg(0xDB, bytes([0]) + bytes(ql[ZIGZAG].tolist()))
    if not gray:
        out += seg(0xDB, bytes([1]) + bytes(qc[ZIGZAG].tolist()))
    if gray:
        sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([1, 1, 0x11, 0])
    else:
        sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([3])
        sof += bytes([1, (sub << 4) | sub, 0])  # Y
        sof += bytes([2, 0x11, 1])              # Cb
        sof += bytes([3, 0x11, 1])              # Cr
    out += seg(0xC0, sof)
    tables = ((0, 0, _DC_LUMA), (1, 0, _AC_LUMA)) if gray else (
        (0, 0, _DC_LUMA), (1, 0, _AC_LUMA), (0, 1, _DC_CHROMA), (1, 1, _AC_CHROMA))
    for cls, tid, (bits, vals) in tables:
        out += seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = (bytes([1, 1, 0x00, 0, 63, 0]) if gray
           else bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    out += seg(0xDA, sos)
    out += wbits.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ------------------------------------------------------- progressive encoder

#: flat Huffman specs legal for progressive scans: the Annex K baseline AC
#: tables lack the EOBn symbols (0x10, 0x20, ...) progressive scans emit, so
#: the progressive encoder ships its own trivial canonical tables — every
#: value gets a fixed-length code (9 bits covers all 256 RS values with the
#: all-ones prefix unused, per C.2).
_DC_FLAT = ([0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
# a DHT BITS entry is one byte (<= 255 codes per length): 255 nine-bit codes
# + one ten-bit code covers all 256 RS values, all-ones prefixes unused
_AC_FLAT = ([0, 0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0], list(range(256)))


def _emit_dc_first(wbits, dctab, scan_blocks, order, al: int) -> None:
    """DC first pass (T.81 G.1.2.1): Huffman-coded diffs of DC >> al.
    `order` yields (comp_index, block_index) in MCU interleave order."""
    pred = [0] * len(scan_blocks)
    for ci, bi in order:
        v = int(scan_blocks[ci][bi][0]) >> al  # arithmetic shift
        diff = v - pred[ci]
        pred[ci] = v
        s = _size_cat(diff)
        code, ln = dctab[s]
        wbits.write(code, ln)
        if s:
            wbits.write(diff if diff > 0 else diff + (1 << s) - 1, s)


def _emit_dc_refine(wbits, scan_blocks, order, al: int) -> None:
    """DC refinement (G.1.2.2): one raw bit per block, no Huffman."""
    for ci, bi in order:
        wbits.write((int(scan_blocks[ci][bi][0]) >> al) & 1, 1)


def _emit_ac_first(wbits, actab, blocks, order, ss: int, se: int, al: int) -> None:
    """AC first pass for band [ss, se] at point transform al (G.1.2.2):
    run/size coding with EOBn run-length codes across all-zero bands."""
    eobrun = 0

    def flush_eob():
        nonlocal eobrun
        if eobrun:
            r = eobrun.bit_length() - 1
            code, ln = actab[r << 4]
            wbits.write(code, ln)
            if r:
                wbits.write(eobrun - (1 << r), r)
            eobrun = 0

    for bi in order:
        zz = blocks[bi]
        run = 0
        for k in range(ss, se + 1):
            v = int(zz[k])
            mag = abs(v) >> al  # magnitude shift toward zero
            if mag == 0:
                run += 1
                continue
            flush_eob()
            while run > 15:
                code, ln = actab[0xF0]  # ZRL
                wbits.write(code, ln)
                run -= 16
            s = mag.bit_length()
            code, ln = actab[(run << 4) | s]
            wbits.write(code, ln)
            wbits.write(mag if v > 0 else (1 << s) - 1 - mag, s)
            run = 0
        if run > 0:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()


def _emit_ac_refine(wbits, actab, blocks, order, ss: int, se: int, al: int) -> None:
    """AC refinement for band [ss, se] (G.1.2.3 encoder flow): correction
    bits for already-significant coeffs ride buffered behind the next
    newly-significant coefficient / ZRL / EOB run, mirroring the decoder's
    read order."""
    eobrun = 0
    pending: list[int] = []  # correction bits deferred across EOB-run blocks

    def flush():
        nonlocal eobrun
        if eobrun:
            r = eobrun.bit_length() - 1
            code, ln = actab[r << 4]
            wbits.write(code, ln)
            if r:
                wbits.write(eobrun - (1 << r), r)
            eobrun = 0
        for b in pending:
            wbits.write(b, 1)
        pending.clear()

    for bi in order:
        zz = blocks[bi]
        band = list(range(ss, se + 1))
        absv = [abs(int(zz[k])) >> al for k in band]
        eobpos = 0  # 1 + band offset of the LAST newly-significant coeff
        for i, m in enumerate(absv):
            if m == 1:
                eobpos = i + 1
        run = 0
        inblock: list[int] = []
        for i, k in enumerate(band):
            m = absv[i]
            if m == 0:
                run += 1
                continue
            while run > 15 and i < eobpos:
                flush()
                code, ln = actab[0xF0]
                wbits.write(code, ln)
                run -= 16
                for b in inblock:
                    wbits.write(b, 1)
                inblock.clear()
            if m > 1:  # already significant: buffer its correction bit
                inblock.append(m & 1)
                continue
            # m == 1: newly significant at this precision
            flush()
            code, ln = actab[(run << 4) | 1]
            wbits.write(code, ln)
            wbits.write(1 if int(zz[k]) > 0 else 0, 1)
            for b in inblock:
                wbits.write(b, 1)
            inblock.clear()
            run = 0
        if run > 0 or inblock:
            eobrun += 1
            pending.extend(inblock)
            if eobrun == 0x7FFF:
                flush()
    flush()


def encode_jpeg_progressive(pixels: np.ndarray, quality: int = 90,
                            subsampling: str = "444",
                            restart_interval: int = 0,
                            al_first: int = 1) -> bytes:
    """(h, w, 3) uint8 RGB -> progressive JFIF JPEG (SOF2) bytes.

    Scan script (the common spectral-selection + 1-bit successive-
    approximation shape real encoders emit):
      1. DC, all components interleaved, Al=al_first
      2. DC refinement scans al_first-1 .. 0 (raw bits)
      3. per component: AC 1..5 then AC 6..63, first pass at Al=al_first
      4. per component: the same bands refined one bit at a time down to 0
    Coefficients converge to EXACTLY the baseline encoder's quantized
    values, so decode(progressive(img)) == decode(baseline(img)) bit-for-
    bit — that identity is the round-trip test."""
    comp_blocks, comp_bw, h, w, sub, ql, qc = _prepare_components(
        pixels, quality, subsampling)
    ncomp = len(comp_blocks)
    if ncomp == 1:  # grayscale: padded grid IS the MCU grid
        mcus_x = comp_bw[0]
        mcus_y = len(comp_blocks[0]) // comp_bw[0]
        samp = [(1, 1)]
    else:
        mcus_x = -(-w // (8 * sub))
        mcus_y = -(-h // (8 * sub))
        samp = [(sub, sub), (1, 1), (1, 1)]

    # MCU-interleaved (comp, block) order for the DC scans
    dc_order = []
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, (ch, cv) in enumerate(samp):
                for v in range(cv):
                    for hh in range(ch):
                        dc_order.append((ci, (my * cv + v) * comp_bw[ci] + mx * ch + hh))

    # per-component block-grid raster order for the AC scans (T.81 A.1.1:
    # ceil(component samples / 8), NOT the MCU-padded grid)
    def ac_order(ci: int) -> list[int]:
        ch, cv = samp[ci]
        cw = -(-w * ch // sub)   # component samples wide
        chh = -(-h * cv // sub)
        bw_c = -(-cw // 8)
        bh_c = -(-chh // 8)
        return [by * comp_bw[ci] + bx for by in range(bh_c) for bx in range(bw_c)]

    dctab = _canonical_codes(*_DC_FLAT)
    actab = _canonical_codes(*_AC_FLAT)

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    def sos(comps_tt: list[tuple[int, int]], ss: int, se: int, ah: int, al: int) -> bytes:
        body = bytes([len(comps_tt)])
        for cid, tt in comps_tt:
            body += bytes([cid, tt])
        body += bytes([ss, se, (ah << 4) | al])
        return seg(0xDA, body)

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0]) + bytes(ql[ZIGZAG].tolist()))
    if ncomp == 3:
        out += seg(0xDB, bytes([1]) + bytes(qc[ZIGZAG].tolist()))
        sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([3])
        sof += bytes([1, (sub << 4) | sub, 0])
        sof += bytes([2, 0x11, 1])
        sof += bytes([3, 0x11, 1])
    else:
        sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([1, 1, 0x11, 0])
    out += seg(0xC2, sof)
    out += seg(0xC4, bytes([0x00]) + bytes(_DC_FLAT[0]) + bytes(_DC_FLAT[1]))
    out += seg(0xC4, bytes([0x10]) + bytes(_AC_FLAT[0]) + bytes(_AC_FLAT[1]))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))

    def scan(emit, order, comps_tt, ss, se, ah, al) -> None:
        """One SOS: `emit(wbits, chunk)` per restart chunk — each emit call
        starts fresh (DC predictors / EOB runs reset at restarts, T.81
        G.1.2/G.2), RSTn between chunks.  DC-scan restart units are MCUs:
        for interleaved DC, `order` carries blocks-per-MCU groups."""
        out.extend(sos(comps_tt, ss, se, ah, al))
        wbits = _BitWriter()
        ri = restart_interval
        chunks = [order] if not ri else [order[i:i + ri] for i in range(0, len(order), ri)]
        rst = 0
        for j, chunk in enumerate(chunks):
            flat = [u for grp in chunk for u in grp] if chunk and isinstance(chunk[0], list) else chunk
            emit(wbits, flat)
            if j < len(chunks) - 1:
                wbits.flush()
                wbits.buf += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
        wbits.flush()
        out.extend(wbits.buf)

    # group DC order by MCU (restart units are MCUs for interleaved scans)
    per_mcu = len(dc_order) // (mcus_x * mcus_y)
    dc_mcus = [dc_order[i:i + per_mcu] for i in range(0, len(dc_order), per_mcu)]

    all_dc = [(i + 1, 0x00) for i in range(ncomp)]
    scan(lambda wb, o: _emit_dc_first(wb, dctab, comp_blocks, o, al_first),
         dc_mcus, all_dc, 0, 0, 0, al_first)
    for al in range(al_first - 1, -1, -1):
        scan(lambda wb, o, a=al: _emit_dc_refine(wb, comp_blocks, o, a),
             dc_mcus, all_dc, 0, 0, al + 1, al)
    for ci in range(ncomp):
        blocks = comp_blocks[ci]
        for (s0, s1) in ((1, 5), (6, 63)):
            scan(lambda wb, o, b=blocks, a=s0, z=s1:
                 _emit_ac_first(wb, actab, b, o, a, z, al_first),
                 ac_order(ci), [(ci + 1, 0x00)], s0, s1, 0, al_first)
    for al in range(al_first - 1, -1, -1):
        for ci in range(ncomp):
            blocks = comp_blocks[ci]
            for (s0, s1) in ((1, 5), (6, 63)):
                scan(lambda wb, o, b=blocks, a=s0, z=s1, l=al:
                     _emit_ac_refine(wb, actab, b, o, a, z, l),
                     ac_order(ci), [(ci + 1, 0x00)], s0, s1, al + 1, al)
    out += b"\xff\xd9"
    return bytes(out)


# ----------------------------------------------------------------- decoder

def _skip_to_marker(data: bytes, pos: int) -> int:
    """Advance past remaining entropy bytes to the next marker's 0xFF."""
    n = len(data)
    while pos < n - 1:
        if data[pos] == 0xFF:
            nxt = data[pos + 1]
            if nxt == 0x00:
                pos += 2
                continue
            if nxt == 0xFF:  # fill byte
                pos += 1
                continue
            return pos
        pos += 1
    raise ValueError("truncated JPEG stream")


def _comp_block_grid(c: dict, w: int, h: int, hmax: int, vmax: int) -> tuple[int, int]:
    """Non-interleaved block grid of one component (T.81 A.1.1: ceil of the
    component's sample dimensions / 8 — NOT the MCU-padded grid)."""
    cw = -(-w * c["h"] // hmax)
    ch = -(-h * c["v"] // vmax)
    return -(-cw // 8), -(-ch // 8)


def _decode_scan_baseline(reader, scan, huff, qt, restart_interval, mcus_x, mcus_y):
    """Sequential scan (SOF0/1): one full-band pass in MCU interleave,
    writing zig-zag coefficients into each component's `czz` store."""
    pred = {c["id"]: 0 for c in scan}
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.align_to_marker()
                for k in pred:
                    pred[k] = 0
            for c in scan:
                dc_tab = huff[(0, c["td"])]
                ac_tab = huff[(1, c["ta"])]
                for v in range(c["v"]):
                    for hh in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int32)
                        s = _huff_decode(reader, dc_tab)
                        if s > 16:
                            raise ValueError("invalid DC magnitude category")
                        diff = _extend(reader.receive(s), s)
                        pred[c["id"]] += diff
                        zz[0] = pred[c["id"]]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(reader, ac_tab)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index out of range")
                            zz[k] = _extend(reader.receive(s), s)
                            k += 1
                        bi = (my * c["v"] + v) * c["bw"] + mx * c["h"] + hh
                        c["czz"][bi] = zz
            mcu_count += 1


def _refine_nonzero(reader, czz, k: int, p1: int) -> None:
    """Apply one correction bit to a known-nonzero coeff (T.81 G.2.2)."""
    if reader.receive(1) and (int(czz[k]) & p1) == 0:
        czz[k] += p1 if czz[k] > 0 else -p1


def _decode_scan_progressive(reader, scan, huff, restart_interval,
                             mcus_x, mcus_y, w, h, hmax, vmax,
                             ss, se, ah, al):
    """One progressive scan (SOF2, T.81 G.2): spectral band [ss, se] at
    successive-approximation bit `al` (first pass when ah == 0, refinement
    otherwise).  DC scans may interleave components; AC scans are
    single-component in the component's own block-grid raster order."""
    if ss == 0:
        if se != 0:
            raise ValueError("progressive scan mixes DC and AC bands")
        pred = {c["id"]: 0 for c in scan}
        if len(scan) > 1:  # interleaved DC scan over MCUs
            unit_count = 0
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    if restart_interval and unit_count and unit_count % restart_interval == 0:
                        reader.align_to_marker()
                        for k in pred:
                            pred[k] = 0
                    for c in scan:
                        for v in range(c["v"]):
                            for hh in range(c["h"]):
                                bi = (my * c["v"] + v) * c["bw"] + mx * c["h"] + hh
                                _decode_dc_unit(reader, c, huff, pred, bi, ah, al)
                    unit_count += 1
        else:
            c = scan[0]
            bw_c, bh_c = _comp_block_grid(c, w, h, hmax, vmax)
            unit_count = 0
            for by in range(bh_c):
                for bx in range(bw_c):
                    if restart_interval and unit_count and unit_count % restart_interval == 0:
                        reader.align_to_marker()
                        pred[c["id"]] = 0
                    _decode_dc_unit(reader, c, huff, pred, by * c["bw"] + bx, ah, al)
                    unit_count += 1
        return

    # AC scan: exactly one component (T.81 G.1.1.1)
    if len(scan) != 1:
        raise ValueError("progressive AC scan must be single-component")
    c = scan[0]
    ac_tab = huff[(1, c["ta"])]
    bw_c, bh_c = _comp_block_grid(c, w, h, hmax, vmax)
    p1 = 1 << al
    eobrun = 0
    unit_count = 0
    for by in range(bh_c):
        for bx in range(bw_c):
            if restart_interval and unit_count and unit_count % restart_interval == 0:
                reader.align_to_marker()
                eobrun = 0
            unit_count += 1
            czz = c["czz"][by * c["bw"] + bx]
            if ah == 0:  # first pass for this band
                if eobrun:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = _huff_decode(reader, ac_tab)
                    r, s = rs >> 4, rs & 0xF
                    if s == 0:
                        if r == 15:
                            k += 16
                            continue
                        eobrun = (1 << r) - 1 + reader.receive(r)
                        break
                    k += r
                    if k > se:
                        raise ValueError("AC index out of range")
                    czz[k] = _extend(reader.receive(s), s) << al
                    k += 1
                continue
            # refinement pass (T.81 G.2.2): correction bits interleave with
            # newly-significant +-(1<<al) coefficients
            k = ss
            if eobrun == 0:
                while k <= se:
                    rs = _huff_decode(reader, ac_tab)
                    r, s = rs >> 4, rs & 0xF
                    if s == 0:
                        if r < 15:
                            # refinement EOB runs INCLUDE the current block —
                            # its remaining nonzero coeffs still take
                            # correction bits below, which decrements once
                            eobrun = (1 << r) + reader.receive(r)
                            break
                        val = 0  # ZRL: advance past 16 zero-history coeffs
                    else:
                        if s != 1:
                            raise ValueError("invalid refinement magnitude")
                        val = p1 if reader.receive(1) else -p1
                    while k <= se:
                        if czz[k] != 0:
                            _refine_nonzero(reader, czz, k, p1)
                        else:
                            if r == 0:
                                break
                            r -= 1
                        k += 1
                    if val and k <= se:
                        czz[k] = val
                    k += 1
            if eobrun > 0:
                while k <= se:
                    if czz[k] != 0:
                        _refine_nonzero(reader, czz, k, p1)
                    k += 1
                eobrun -= 1


def _decode_dc_unit(reader, c, huff, pred, bi: int, ah: int, al: int) -> None:
    czz = c["czz"][bi]
    if ah == 0:  # first DC pass: Huffman diff, scaled by 2^al
        s = _huff_decode(reader, huff[(0, c["td"])])
        if s > 16:
            raise ValueError("invalid DC magnitude category")
        pred[c["id"]] += _extend(reader.receive(s), s)
        czz[0] = pred[c["id"]] << al
    else:  # refinement: one bit per block
        if reader.receive(1):
            czz[0] = int(czz[0]) | (1 << al)


def decode_jpeg(data: bytes) -> np.ndarray:
    """JPEG bytes -> (h, w, 3) uint8 RGB (grayscale replicated).

    Baseline/extended sequential (SOF0/1) and progressive (SOF2, spectral
    selection + successive approximation) Huffman streams."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    restart_interval = 0
    comps = None
    h = w = None
    scan = None

    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("marker expected")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may pad before the
        # marker code byte — skip them rather than parsing 0xFF as a marker
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        if pos + 1 >= len(data):
            raise ValueError("truncated JPEG stream")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        if pos + 2 > len(data):
            raise ValueError("truncated JPEG stream")
        (seglen,) = struct.unpack(">H", data[pos:pos + 2])
        body = data[pos + 2:pos + seglen]
        if len(body) != seglen - 2:
            raise ValueError("truncated JPEG stream")
        if marker == 0xDB:  # DQT (may hold several tables)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                if pq == 0:  # 8-bit entries
                    tbl = np.frombuffer(body[i + 1:i + 65], dtype=np.uint8).astype(np.int64)
                    i += 65
                elif pq == 1:  # 16-bit big-endian entries (high-quality files)
                    tbl = np.frombuffer(body[i + 1:i + 129], dtype=">u2").astype(np.int64)
                    i += 129
                else:
                    raise ValueError(f"invalid DQT precision {pq}")
                if len(tbl) != 64:
                    raise ValueError("truncated quantization table")
                nat = np.empty(64, dtype=np.int64)
                nat[ZIGZAG] = tbl
                qt[tq] = nat.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1:i + 17])
                if len(bits) != 16:
                    raise ValueError("truncated Huffman table")
                n = sum(bits)
                vals = list(body[i + 17:i + 17 + n])
                huff[(cls, tid)] = _decode_table(bits, vals)
                i += 17 + n
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 (sequential) / SOF2 (progressive)
            prec = body[0]
            if prec != 8:
                raise NotImplementedError("only 8-bit precision")
            progressive = marker == 0xC2
            h, w = struct.unpack(">HH", body[1:5])
            nc = body[5]
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + 3 * ci:9 + 3 * ci]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcus_x = -(-w // (8 * hmax))
            mcus_y = -(-h // (8 * vmax))
            for c in comps:
                c["bw"] = mcus_x * c["h"]
                c["bh"] = mcus_y * c["v"]
                c["czz"] = np.zeros((c["bh"] * c["bw"], 64), dtype=np.int32)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError("arithmetic/lossless/hierarchical JPEG not supported")
        elif marker == 0xDA:  # SOS
            if comps is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            if len(body) < 4 + 2 * ns:
                raise ValueError("truncated scan header")
            scan = []
            for si in range(ns):
                cs, tt = body[1 + 2 * si], body[2 + 2 * si]
                comp = next((c for c in comps if c["id"] == cs), None)
                if comp is None:
                    raise ValueError(f"scan references unknown component {cs}")
                scan.append({**comp, "td": tt >> 4, "ta": tt & 0xF})
            ss, se, ahal = body[1 + 2 * ns:4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0xF
            if not (0 <= ss <= se <= 63):
                raise ValueError("invalid spectral band in scan header")
            # every referenced entropy table must exist (corrupt streams
            # reference tables never defined -> clean error, not KeyError)
            for c in scan:
                if ss == 0 and ah == 0 and (0, c["td"]) not in huff:
                    raise ValueError("undefined DC Huffman table")
                if se > 0 and (1, c["ta"]) not in huff:
                    raise ValueError("undefined AC Huffman table")
                if c["tq"] not in qt:
                    raise ValueError("undefined quantization table")
            reader = _BitReader(data, pos + seglen)
            if progressive:
                _decode_scan_progressive(
                    reader, scan, huff, restart_interval, mcus_x, mcus_y,
                    w, h, hmax, vmax, ss, se, ah, al,
                )
            else:
                if (ss, se, ah, al) != (0, 63, 0, 0):
                    raise ValueError("invalid sequential scan header")
                _decode_scan_baseline(
                    reader, scan, huff, qt, restart_interval, mcus_x, mcus_y
                )
            pos = _skip_to_marker(data, reader.pos)
            continue
        pos += seglen

    if scan is None or h is None:
        raise ValueError("no SOS/SOF found")

    # dequantize + IDCT all blocks per component, reassemble, upsample, crop
    planes = []
    for c in comps:
        q = qt[c["tq"]].reshape(64)[ZIGZAG]  # zig-zag-ordered quant steps
        nat = (c["czz"].astype(np.float64) * q[None, :])[:, _UNZIG].reshape(-1, 8, 8)
        spatial = np.einsum("km,nml,lj->nkj", _C.T, nat, _C) + 128.0
        plane = _unblockize(spatial, c["bh"], c["bw"])
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        g = np.clip(planes[0].round(), 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=-1)
    return _ycbcr_to_rgb(planes[0], planes[1], planes[2])
