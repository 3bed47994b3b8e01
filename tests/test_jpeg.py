"""Baseline JPEG codec (openpoiservice_spark.jpeg) — spec compliance.

Two kinds of evidence:
  * HAND-ASSEMBLED streams built in this file directly from the T.81 spec
    (markers, Annex K tables, hand-derived Huffman bit strings) — these do
    NOT go through our encoder, so they test the decoder against the spec,
    not against itself;
  * encoder->decoder round trips across quality/subsampling/size/restart
    combinations with PSNR floors.
"""

import struct

import numpy as np
import pytest

from openpoiservice_spark import imaging, jpeg


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _dht(cls: int, tid: int, spec) -> bytes:
    bits, vals = spec
    return _seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))


def _gray_stream(entropy: bytes) -> bytes:
    """Minimal single-MCU grayscale baseline JPEG around `entropy`."""
    out = b"\xff\xd8"
    out += _seg(0xDB, bytes([0]) + bytes(jpeg._Q_LUMA[jpeg.ZIGZAG].tolist()))
    out += _seg(0xC0, bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0]))
    out += _dht(0, 0, jpeg._DC_LUMA)
    out += _dht(1, 0, jpeg._AC_LUMA)
    out += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    return out + entropy + b"\xff\xd9"


def test_decode_hand_assembled_flat_gray():
    """Entropy data 0x2B = DC category 0 ('00') + AC EOB ('1010') + 1-pad:
    a DC-only block of 0 -> every pixel 128 after level shift."""
    img = jpeg.decode_jpeg(_gray_stream(bytes([0b00101011])))
    assert img.shape == (8, 8, 3)
    assert (img == 128).all()


def test_decode_hand_assembled_dc_step():
    """'011' (DC cat 2) + '10' (diff=+2) + '1010' (EOB) + pad =
    0x75 0x7F.  DC = 2 * q0 (q0=16) -> spatial 32/8 = +4 -> all 132."""
    img = jpeg.decode_jpeg(_gray_stream(bytes([0b01110101, 0b01111111])))
    assert (img == 132).all()


def test_decode_hand_assembled_ac_coefficient():
    """DC cat 0 ('00'); AC symbol 0x01 (run 0, size 1) = '00', amplitude
    bit '1' (+1); then EOB '1010' => first zig-zag AC coeff (0,1) = q[0][1]
    = 11 -> a horizontal half-cosine ramp, constant down columns."""
    entropy = bytes([0b00001101, 0b01111111])
    img = jpeg.decode_jpeg(_gray_stream(entropy))
    g = img[..., 0].astype(np.float64)
    # rows identical (no vertical variation), columns strictly decreasing
    assert np.all(g == g[0:1, :])
    assert (np.diff(g[0].astype(np.int64)) <= 0).all() and g[0, 0] > g[0, -1]
    # exact spatial value: X[m,n] = 11 * C[1,n] * C[0,m]*sqrt? ->
    # X = C.T @ A @ C with A[0,1]=11: X[m,n] = 11 * C[0,m] * C[1,n]
    expect = 128.0 + 11.0 * jpeg._C[0, 0] * jpeg._C[1, np.arange(8)]
    assert np.allclose(g[0], np.clip(np.round(expect), 0, 255))


def test_decode_rejects_arithmetic_and_lossless():
    # SOF2 (progressive) is SUPPORTED as of round 3; SOF9 (arithmetic) and
    # SOF3 (lossless) stay clean NotImplementedError guards
    for sof in (0xC9, 0xC3):
        bad = b"\xff\xd8" + _seg(sof, bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0]))
        with pytest.raises(NotImplementedError):
            jpeg.decode_jpeg(bad + b"\xff\xd9")
    # a progressive SOF with no scans is a clean ValueError, not a crash
    p = b"\xff\xd8" + _seg(0xC2, bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0]))
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(p + b"\xff\xd9")


def test_decode_skips_app_and_comment_segments():
    img0 = jpeg.decode_jpeg(_gray_stream(bytes([0b00101011])))
    # splice APP1 + COM after SOI
    s = _gray_stream(bytes([0b00101011]))
    spliced = s[:2] + _seg(0xE1, b"Exif\x00\x00junk") + _seg(0xFE, b"comment") + s[2:]
    assert (jpeg.decode_jpeg(spliced) == img0).all()


@pytest.mark.parametrize("sub", ["444", "420"])
@pytest.mark.parametrize("size", [(8, 8), (16, 16), (17, 23), (64, 64)])
def test_roundtrip_smooth(sub, size):
    h, w = size
    # constant, gentle 3-levels-per-pixel slope at every size (a steeper
    # gradient is sharper content and legitimately decodes at lower PSNR)
    xx, yy = np.meshgrid(np.arange(w) * 3.0 + 20, np.arange(h) * 3.0 + 20)
    img = np.stack([xx, yy, (xx + yy) / 2], axis=-1).round().astype(np.uint8)
    dec = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=90, subsampling=sub))
    assert dec.shape == img.shape
    assert imaging.psnr(img, dec) >= (40.0 if sub == "444" else 35.0)


def test_roundtrip_noise_444_quality95():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    dec = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=95, subsampling="444"))
    assert imaging.psnr(img, dec) >= 30.0  # noise is JPEG's worst case


def test_roundtrip_restart_intervals():
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (24, 40, 3), dtype=np.uint8)
    plain = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=90))
    rst = jpeg.encode_jpeg(img, quality=90, restart_interval=2)
    assert b"\xff\xd0" in rst or b"\xff\xd1" in rst  # markers present
    assert (jpeg.decode_jpeg(rst) == plain).all()


def test_decode_image_dispatches_real_jpeg():
    """imaging.decode_image must route FFD8 payloads to the real decoder
    while legacy QJPG bytes keep decoding (bench caches, old tables)."""
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    real = jpeg.encode_jpeg(img, quality=95)
    out = imaging.decode_image(real, "jpeg")
    assert out.shape == img.shape and imaging.psnr(img, out) >= 25.0
    legacy = imaging.encode_qjpg(img)
    out2 = imaging.decode_image(legacy, "jpeg")
    assert imaging.psnr(img, out2) >= 40.0


def test_tile_pixel_stats_on_real_jpeg(spark):
    """End-to-end: real JPEG bytes flow through the Spark decode operator
    (mapInPandas) — shape parity with the same pixels stored as PNG."""
    import pandas as pd

    from openpoiservice_spark import tiles

    rng = np.random.default_rng(6)
    rows = []
    for i in range(8):
        px = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
        rows.append({
            "image_id": f"jp-{i}", "bytes": jpeg.encode_jpeg(px, quality=95),
            "fmt": "jpeg", "lon": 8.8 + i * 0.001, "lat": 53.07, "w": 16, "h": 16,
        })
    df = spark.createDataFrame(pd.DataFrame(rows))
    out = tiles.tile_pixel_stats(df, 14).collect()
    assert sum(r.px_count for r in out) == 8 * 16 * 16
    assert all(0.0 <= r.mean_intensity <= 255.0 for r in out)


def test_truncated_stream_raises_cleanly():
    rng = np.random.default_rng(7)
    enc = jpeg.encode_jpeg(rng.integers(0, 256, (16, 16, 3), dtype=np.uint8))
    for cut in (len(enc) // 3, len(enc) // 2, len(enc) - 3):
        with pytest.raises(ValueError):
            jpeg.decode_jpeg(enc[:cut])


def test_fill_bytes_before_marker():
    """T.81 B.1.1.2: 0xFF fill bytes may pad before any marker code — they
    must be skipped, not parsed as a marker with a bogus length."""
    img = np.full((16, 16, 3), 128, dtype=np.uint8)
    data = jpeg.encode_jpeg(img, quality=90)
    # inject three fill bytes before the first post-SOI marker segment
    padded = data[:2] + b"\xff\xff\xff" + data[2:]
    assert padded[2:4] == b"\xff\xff"
    out = jpeg.decode_jpeg(padded)
    assert out.shape == (16, 16, 3)
    np.testing.assert_array_equal(out, jpeg.decode_jpeg(data))


def test_sos_before_sof_raises_cleanly():
    img = np.full((8, 8, 3), 90, dtype=np.uint8)
    data = bytearray(jpeg.encode_jpeg(img, quality=90))
    # find SOF0 and SOS segments, move SOS body's marker in front of SOF by
    # simply stripping the SOF segment
    i = data.find(b"\xff\xc0")
    (seglen,) = struct.unpack(">H", data[i + 2:i + 4])
    del data[i:i + 2 + seglen]
    with pytest.raises(ValueError, match="SOS before SOF"):
        jpeg.decode_jpeg(bytes(data))


# ------------------------------------------------------------- progressive

def test_progressive_decodes_bit_exact_vs_baseline():
    """SOF2 spectral selection + successive approximation: the progressive
    scan script converges to EXACTLY the baseline encoder's quantized
    coefficients, so both decodes must agree bit-for-bit — every size,
    subsampling, and quality here exercises EOB runs, ZRL paths, and
    refinement correction bits."""
    rng = np.random.default_rng(3)
    for size in ((8, 8), (16, 16), (17, 23), (64, 64)):
        for sub in ("444", "420"):
            for q in (50, 92):
                img = (rng.integers(0, 256, size=(*size, 3)).astype(np.float64)
                       * 0.35 + 120).astype(np.uint8)
                base = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=q, subsampling=sub))
                prog = jpeg.decode_jpeg(
                    jpeg.encode_jpeg_progressive(img, quality=q, subsampling=sub))
                np.testing.assert_array_equal(prog, base, err_msg=f"{size} {sub} q{q}")


def test_progressive_stress_noise_and_gradient():
    """Pure noise maxes out coefficient magnitudes (ZRL + refinement bits);
    a smooth gradient maxes out EOB runs — both must stay bit-exact."""
    rng = np.random.default_rng(9)
    noise = rng.integers(0, 256, size=(48, 40, 3), dtype=np.uint8)
    gy, gx = np.mgrid[0:48, 0:40]
    grad = np.stack([(gy * 5) % 256, (gx * 6) % 256, ((gx + gy) * 3) % 256],
                    axis=-1).astype(np.uint8)
    for img in (noise, grad):
        for sub in ("444", "420"):
            base = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=85, subsampling=sub))
            prog = jpeg.decode_jpeg(jpeg.encode_jpeg_progressive(img, quality=85, subsampling=sub))
            np.testing.assert_array_equal(prog, base)


def test_progressive_psnr_invariant():
    """The engine's PSNR>=40dB lossy invariant holds through the
    progressive path exactly as through baseline (same coefficients;
    smooth content like test_roundtrip_smooth — noise is JPEG's worst
    case at any scan shape)."""
    xx, yy = np.meshgrid(np.arange(64) * 3.0 + 20, np.arange(64) * 3.0 + 20)
    img = np.stack([xx, yy, (xx + yy) / 2], axis=-1).round().astype(np.uint8)
    out = jpeg.decode_jpeg(jpeg.encode_jpeg_progressive(img, quality=95))
    assert imaging.psnr(img, out) >= 40.0


def test_progressive_truncated_stream_raises():
    img = np.full((16, 16, 3), 77, dtype=np.uint8)
    data = jpeg.encode_jpeg_progressive(img, quality=90)
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(data[:len(data) // 3])


def test_decode_image_routes_progressive(tmp_path):
    """imaging.decode_image sniffs FFD8 and must handle progressive streams
    through the same mapInPandas plumbing as baseline."""
    from openpoiservice_spark import imaging

    img = np.full((16, 16, 3), 0, dtype=np.uint8)
    img[:8, :8] = [200, 30, 90]
    data = jpeg.encode_jpeg_progressive(img, quality=90)
    out = imaging.decode_image(data, "jpg")
    assert out.shape == (16, 16, 3)
    base = imaging.decode_image(jpeg.encode_jpeg(img, quality=90), "jpg")
    np.testing.assert_array_equal(out, base)


def test_progressive_restart_intervals_bit_exact():
    """RST markers inside progressive scans: DC predictors and EOB runs
    reset per restart chunk on both sides — still bit-exact vs baseline."""
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (48, 40, 3), dtype=np.uint8)
    base = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=80))
    for ri in (2, 7):
        data = jpeg.encode_jpeg_progressive(img, quality=80, restart_interval=ri)
        assert b"\xff\xd0" in data
        np.testing.assert_array_equal(jpeg.decode_jpeg(data), base)


def test_16bit_quant_tables():
    """DQT pq=1 (16-bit big-endian entries, common in high-quality files):
    same table widened to 16 bits must decode identically."""
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    data = jpeg.encode_jpeg(img, quality=90)
    i = data.find(b"\xff\xdb")
    (seglen,) = struct.unpack(">H", data[i + 2:i + 4])
    pq_tq = data[i + 4]
    tbl8 = data[i + 5:i + 5 + 64]
    body16 = bytes([0x10 | (pq_tq & 0xF)]) + b"".join(
        struct.pack(">H", b) for b in tbl8)
    patched = (data[:i] + b"\xff\xdb" + struct.pack(">H", len(body16) + 2)
               + body16 + data[i + 2 + seglen:])
    np.testing.assert_array_equal(jpeg.decode_jpeg(patched), jpeg.decode_jpeg(data))


def test_decode_hand_assembled_progressive_grayscale():
    """Hand-assembled SOF2 stream (no encoder involved): three scans over a
    single 8x8 grayscale block —
      scan 1 (Ss=0 Se=0 Ah=0 Al=1): DC first pass codes diff of (DC >> 1);
              DC=2 -> value 1 -> DC-luma cat 1 ('010') + bit '1' -> 0x5F
      scan 2 (Ss=0 Se=0 Ah=1 Al=0): one raw refinement bit (DC & 1 = 0) -> 0x7F
      scan 3 (Ss=1 Se=63 Ah=0 Al=0): AC-luma EOB ('1010') -> 0xAF
    Coefficients converge to DC=2, AC=0 — exactly the baseline DC-step
    vector, so every pixel is 128 + 2*16/8 = 132."""
    out = b"\xff\xd8"
    out += _seg(0xDB, bytes([0]) + bytes(jpeg._Q_LUMA[jpeg.ZIGZAG].tolist()))
    out += _seg(0xC2, bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0]))
    out += _dht(0, 0, jpeg._DC_LUMA)
    out += _dht(1, 0, jpeg._AC_LUMA)
    out += _seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x01])) + bytes([0b01011111])
    out += _seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x10])) + bytes([0b01111111])
    out += _seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x00])) + bytes([0b10101111])
    out += b"\xff\xd9"
    img = jpeg.decode_jpeg(out)
    assert img.shape == (8, 8, 3)
    assert (img == 132).all()
    # and it matches the sequential stream carrying the same coefficients
    seq = jpeg.decode_jpeg(_gray_stream(bytes([0b01110101, 0b01111111])))
    np.testing.assert_array_equal(img, seq)


def test_decode_hand_assembled_progressive_ac_band():
    """Progressive AC first pass with successive approximation: scan codes
    AC(0,1) at Al=1 as magnitude 1 ('00' run0/size1 + bit '1'), then the
    refinement scan (Ah=1 Al=0) supplies the low bit via a correction bit.
    Correction bit 1 -> coefficient 2*1+1 = 3; the DC scans leave DC=0."""
    out = b"\xff\xd8"
    out += _seg(0xDB, bytes([0]) + bytes(jpeg._Q_LUMA[jpeg.ZIGZAG].tolist()))
    out += _seg(0xC2, bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0]))
    out += _dht(0, 0, jpeg._DC_LUMA)
    out += _dht(1, 0, jpeg._AC_LUMA)
    # DC first (Al=1): diff 0 -> cat 0 ('00'); DC refine: bit 0
    out += _seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x01])) + bytes([0b00111111])
    out += _seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x10])) + bytes([0b01111111])
    # AC first at Al=1: (run0,size1)='00' + sign/mag bit '1' (+1), EOB '1010'
    out += _seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x01])) + bytes([0b00110101, 0b11111111])
    # AC refine to Al=0: EOB ('1010', run covers this block) followed by the
    # correction bit '1' for the already-significant coeff in the band
    out += _seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x10])) + bytes([0b10101111])
    out += b"\xff\xd9"
    img = jpeg.decode_jpeg(out)
    g = img[..., 0].astype(np.float64)
    # AC(0,1) = 3 * q[0][1] = 33 -> horizontal half-cosine ramp
    expect = 128.0 + 33.0 * jpeg._C[0, 0] * jpeg._C[1, np.arange(8)]
    assert np.allclose(g[0], np.clip(np.round(expect), 0, 255))
    assert np.all(g == g[0:1, :])


def test_grayscale_roundtrip_baseline_and_progressive():
    """Single-component streams: the grayscale encoders exercise the
    decoder's 1-component paths (including the progressive single-component
    DC scan, which is NON-interleaved over the component grid)."""
    rng = np.random.default_rng(8)
    gray = (rng.normal(128, 40, (24, 36)).clip(0, 255)).astype(np.uint8)
    base = jpeg.decode_jpeg(jpeg.encode_jpeg(gray, quality=90))
    assert base.shape == (24, 36, 3)
    np.testing.assert_array_equal(base[..., 0], base[..., 1])
    prog = jpeg.decode_jpeg(jpeg.encode_jpeg_progressive(gray, quality=90))
    np.testing.assert_array_equal(prog, base)
    rst = jpeg.decode_jpeg(
        jpeg.encode_jpeg_progressive(gray, quality=90, restart_interval=3))
    np.testing.assert_array_equal(rst, base)
    # smooth grayscale content meets the PSNR invariant
    xx, yy = np.meshgrid(np.arange(36) * 3.0 + 30, np.arange(24) * 3.0 + 30)
    smooth = (xx + yy).clip(0, 255).astype(np.uint8)
    out = jpeg.decode_jpeg(jpeg.encode_jpeg(smooth, quality=95))
    assert imaging.psnr(np.stack([smooth] * 3, axis=-1), out) >= 40.0


def test_progressive_multilevel_successive_approximation():
    """Three-level successive approximation (Al=3 first pass, refinement
    scans at 2, 1, 0): every refinement level of both DC and AC paths runs,
    coefficients still converge to the baseline's exactly."""
    rng = np.random.default_rng(12)
    img = rng.integers(0, 256, (33, 41, 3), dtype=np.uint8)
    base = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=82))
    for al in (2, 3):
        prog = jpeg.decode_jpeg(
            jpeg.encode_jpeg_progressive(img, quality=82, al_first=al))
        np.testing.assert_array_equal(prog, base, err_msg=f"al_first={al}")
    gray = rng.integers(0, 256, (19, 27), dtype=np.uint8)
    np.testing.assert_array_equal(
        jpeg.decode_jpeg(jpeg.encode_jpeg_progressive(gray, al_first=3,
                                                      restart_interval=2)),
        jpeg.decode_jpeg(jpeg.encode_jpeg(gray)))


def test_fuzz_corrupted_streams_raise_cleanly():
    """Random truncations and byte flips over baseline AND progressive
    streams: the decoder must either succeed or raise
    ValueError/NotImplementedError — never crash with IndexError/KeyError/
    OverflowError/StopIteration (a 100 TB ingest will see corrupt files)."""
    rng = np.random.default_rng(42)
    img = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    streams = [jpeg.encode_jpeg(img, quality=85),
               jpeg.encode_jpeg_progressive(img, quality=85),
               jpeg.encode_jpeg_progressive(img, quality=85, restart_interval=2)]
    for data in streams:
        data = bytearray(data)
        for trial in range(600):
            mutated = bytearray(data)
            op = trial % 3
            if op == 0:
                mutated = mutated[:rng.integers(2, len(data))]
            elif op == 1:
                mutated[rng.integers(2, len(data))] = rng.integers(0, 256)
            else:
                for _ in range(5):
                    mutated[rng.integers(2, len(data))] = rng.integers(0, 256)
            try:
                jpeg.decode_jpeg(bytes(mutated))
            except (ValueError, NotImplementedError):
                pass
