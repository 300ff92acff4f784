"""Baseline-JPEG pixel decode (operators/jpeg.py) — differential
round-trip tests against an INDEPENDENT minimal encoder written here.

The encoder below builds real baseline JFIF streams from scratch
(forward DCT -> quantize -> zigzag -> Huffman bit-pack with byte
stuffing, grayscale / 4:4:4 / 4:2:0, optional restart intervals). It
shares no code with the decoder — the decoder reads its quant and
Huffman tables from the DQT/DHT segments the encoder emits — so a
round-trip agreeing within quantization error exercises every decode
stage: marker walk, canonical Huffman, EXTEND, DC prediction, zigzag,
dequant, IDCT, upsampling, color transform, and MCU padding crop.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from lmo_data_catalog_spark.operators.jpeg import ZIGZAG, decode_jpeg_pixels

# --------------------------------------------------------- test encoder

#: flat-ish quant tables: luma mostly 4s with a coarser high-frequency
#: tail, chroma uniform 8 — small enough that round-trip error stays
#: within a few gray levels, non-trivial enough to exercise dequant.
QL = np.array([2] + [4] * 31 + [8] * 32, dtype=np.int32)  # zigzag order
QC = np.full(64, 8, dtype=np.int32)

# orthonormal forward DCT basis, re-derived here (not imported)
_CT = np.array(
    [
        [
            (np.sqrt(1 / 8) if u == 0 else 0.5)
            * np.cos((2 * x + 1) * u * np.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ]
)

# trivially canonical Huffman tables: every DC symbol is a 4-bit code,
# every AC symbol an 8-bit code (codes assigned in symbol-list order).
DC_SYMS = list(range(12))
AC_SYMS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]
DC_CODES = {sym: (i, 4) for i, sym in enumerate(DC_SYMS)}
AC_CODES = {sym: (i, 8) for i, sym in enumerate(AC_SYMS)}


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int) -> None:
        for k in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> k) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self) -> None:
        while self.nbits:
            self.write(1, 1)  # pad with 1-bits


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body


def _dht(tc: int, th: int, syms: list[int], length: int) -> bytes:
    counts = [0] * 16
    counts[length - 1] = len(syms)
    return _seg(0xC4, bytes([tc << 4 | th] + counts + syms))


def _dqt(tq: int, tbl: np.ndarray) -> bytes:
    return _seg(0xDB, bytes([tq]) + bytes(int(x) for x in tbl))


def _encode_block(bw: _BitWriter, block: np.ndarray, q: np.ndarray,
                  pred: int) -> int:
    """Forward-DCT one 8x8 spatial block (already level-shifted),
    quantize, and Huffman-encode. Returns the new DC predictor."""
    coef = _CT @ block @ _CT.T
    flat = coef.reshape(64)
    zz = np.array(
        [round(flat[ZIGZAG[z]] / q[z]) for z in range(64)], dtype=np.int64
    )
    diff = int(zz[0]) - pred

    def mag(v: int) -> tuple[int, int]:
        s = int(abs(v)).bit_length()
        return (s, v if v >= 0 else v + (1 << s) - 1)

    s, bits = mag(diff)
    code, ln = DC_CODES[s]
    bw.write(code, ln)
    if s:
        bw.write(bits, s)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = AC_CODES[0xF0]
            bw.write(code, ln)
            run -= 16
        s, bits = mag(v)
        code, ln = AC_CODES[(run << 4) | s]
        bw.write(code, ln)
        bw.write(bits, s)
        run = 0
    if run:
        code, ln = AC_CODES[0x00]
        bw.write(code, ln)
    return int(zz[0])


def _pad_to(img: np.ndarray, my: int, mx: int) -> np.ndarray:
    h, w = img.shape
    return np.pad(img, ((0, my - h), (0, mx - w)), mode="edge")


def _prep_planes(rgb: np.ndarray, subsample: bool):
    """Shared encoder front end: level-shifted (and for color,
    YCbCr-converted, optionally 4:2:0-subsampled) planes padded to
    the MCU grid, plus sampling/table/geometry metadata."""
    gray = rgb.ndim == 2
    h, w = rgb.shape[:2]
    if gray:
        planes = [rgb.astype(np.float64) - 128.0]
        samp = [(1, 1)]
        qts = [0]
    else:
        x = rgb.astype(np.float64)
        y = 0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2]
        cb = 128.0 - 0.168736 * x[..., 0] - 0.331264 * x[..., 1] + 0.5 * x[..., 2]
        cr = 128.0 + 0.5 * x[..., 0] - 0.418688 * x[..., 1] - 0.081312 * x[..., 2]
        if subsample:
            # 2x2 box average on an edge-padded even grid
            pe = _pad_to(cb, h + h % 2, w + w % 2)
            cb = pe.reshape(pe.shape[0] // 2, 2, pe.shape[1] // 2, 2).mean((1, 3))
            pe = _pad_to(cr, h + h % 2, w + w % 2)
            cr = pe.reshape(pe.shape[0] // 2, 2, pe.shape[1] // 2, 2).mean((1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y - 128.0, cb - 128.0, cr - 128.0]
        qts = [0, 1, 1]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    padded = [
        _pad_to(p, mcuy * 8 * vs, mcux * 8 * hs)
        for p, (hs, vs) in zip(planes, samp)
    ]
    return padded, samp, qts, hmax, vmax, mcux, mcuy, h, w, gray


def encode_jpeg(
    rgb: np.ndarray, *, subsample: bool = False, restart: int = 0
) -> bytes:
    """Minimal baseline JFIF encoder: grayscale (h, w) or RGB
    (h, w, 3), 4:4:4 or (``subsample``) 4:2:0, optional DRI/RSTn."""
    (padded, samp, qts, hmax, vmax, mcux, mcuy, h, w, gray) = _prep_planes(
        rgb, subsample
    )

    out = bytearray(b"\xff\xd8")  # SOI
    out += _dqt(0, QL)
    if not gray:
        out += _dqt(1, QC)
    nc = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for c in range(nc):
        sof += bytes([c + 1, samp[c][0] << 4 | samp[c][1], qts[c]])
    out += _seg(0xC0, sof)
    out += _dht(0, 0, DC_SYMS, 4) + _dht(1, 0, AC_SYMS, 8)
    if restart:
        out += _seg(0xDD, struct.pack(">H", restart))
    sos = bytes([nc])
    for c in range(nc):
        sos += bytes([c + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)

    bw = _BitWriter()
    pred = [0] * nc
    qtabs = [QL if t == 0 else QC for t in qts]
    mcu_count = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and mcu_count and mcu_count % restart == 0:
                bw.flush()
                out += bw.out
                out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                bw = _BitWriter()
                pred = [0] * nc
            for c in range(nc):
                hs, vs = samp[c]
                for by in range(vs):
                    for bx in range(hs):
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        blk = padded[c][y0 : y0 + 8, x0 : x0 + 8]
                        pred[c] = _encode_block(bw, blk, qtabs[c], pred[c])
            mcu_count += 1
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _gradient_rgb(h: int, w: int) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    r = (xx * 255 // max(w - 1, 1)).astype(np.uint8)
    g = (yy * 255 // max(h - 1, 1)).astype(np.uint8)
    b = ((xx + yy) * 255 // max(h + w - 2, 1)).astype(np.uint8)
    return np.stack([r, g, b], axis=-1)


# --------------------------------------------------------------- tests


def test_uniform_gray_decodes_exactly():
    """A uniform 128 grayscale image has all-zero coefficients after
    the level shift, so the round-trip is EXACT at any quant table."""
    img = np.full((16, 16), 128, dtype=np.uint8)
    px = decode_jpeg_pixels(encode_jpeg(img))
    assert px.shape == (16, 16, 1)
    assert (px == 128).all()


def test_uniform_color_roundtrip_close():
    img = np.empty((24, 24, 3), dtype=np.uint8)
    img[:] = (200, 30, 90)
    px = decode_jpeg_pixels(encode_jpeg(img))
    assert px.shape == (24, 24, 3)
    assert np.abs(px.astype(int) - img.astype(int)).max() <= 3


def test_gradient_444_roundtrip():
    img = _gradient_rgb(32, 40)
    px = decode_jpeg_pixels(encode_jpeg(img))
    assert px.shape == img.shape
    err = np.abs(px.astype(float) - img.astype(float)).mean()
    assert err < 3.0, err


def test_gradient_420_odd_size_crops_correctly():
    """4:2:0 with non-multiple-of-16 dims: MCU padding must be
    cropped, chroma upsampled 2x in both axes."""
    img = _gradient_rgb(19, 13)
    px = decode_jpeg_pixels(encode_jpeg(img, subsample=True))
    assert px.shape == (19, 13, 3)
    err = np.abs(px.astype(float) - img.astype(float)).mean()
    assert err < 6.0, err


def test_grayscale_gradient_roundtrip():
    img = (_gradient_rgb(17, 23)[..., 0]).copy()
    px = decode_jpeg_pixels(encode_jpeg(img))
    assert px.shape == (17, 23, 1)
    err = np.abs(px[..., 0].astype(float) - img.astype(float)).mean()
    assert err < 3.0, err


def test_restart_intervals_match_unrestarted_decode():
    """DRI + RSTn segmentation must not change a single pixel: the
    decoder resets its DC predictors exactly where the encoder did."""
    img = _gradient_rgb(32, 32)
    plain = decode_jpeg_pixels(encode_jpeg(img))
    restarted = decode_jpeg_pixels(encode_jpeg(img, restart=3))
    assert (plain == restarted).all()


def test_scanless_progressive_raises():
    """SOF2 now routes to the progressive decoder
    (test_jpeg_progressive.py); a progressive stream with no scan
    data must still raise loudly, not return zeros."""
    body = struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    payload = (
        b"\xff\xd8"
        + struct.pack(">BBH", 0xFF, 0xC2, len(body) + 2)
        + body
    )
    with pytest.raises(NotImplementedError, match="without SOF2 scans"):
        decode_jpeg_pixels(payload)


def test_progressive_arithmetic_raises():
    body = struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    payload = (
        b"\xff\xd8"
        + struct.pack(">BBH", 0xFF, 0xCA, len(body) + 2)
        + body
    )
    with pytest.raises(NotImplementedError, match="arithmetic"):
        decode_jpeg_pixels(payload)


def test_non_interleaved_multiscan_raises():
    """A baseline file may legally spread components over several
    non-interleaved scans (T.81 B.2.3). Decoding only the first scan
    as if it were interleaved would produce silently wrong pixels, so
    the decoder must refuse when SOS lists fewer components than SOF."""
    data = encode_jpeg(_gradient_rgb(16, 16))
    i = data.find(b"\xff\xda")
    assert i > 0 and data[i + 2 : i + 4] == b"\x00\x0c"  # ns=3 SOS
    one_comp_sos = bytes([0xFF, 0xDA, 0, 8, 1, 1, 0x00, 0, 63, 0])
    patched = data[:i] + one_comp_sos + data[i + 14 :]
    with pytest.raises(NotImplementedError, match="non-interleaved"):
        decode_jpeg_pixels(patched)


def test_grayscale_sof_sampling_factors_do_not_change_geometry():
    """T.81 A.2: a single-component scan is never interleaved — MCU is
    one data unit regardless of the SOF sampling factors. A grayscale
    file declaring 2x2 sampling must decode identically to the same
    stream declaring 1x1."""
    img = (_gradient_rgb(17, 23)[..., 0]).copy()
    data = encode_jpeg(img)
    base = decode_jpeg_pixels(data)
    i = data.find(b"\xff\xc0")
    assert data[i + 11] == 0x11  # the single component's samp byte
    patched = data[: i + 11] + bytes([0x22]) + data[i + 12 :]
    assert (decode_jpeg_pixels(patched) == base).all()


def test_non_integer_chroma_ratio_raises():
    """np.repeat upsampling is integer-ratio only; a 3:2 ratio must
    raise the documented boundary instead of building an undersized
    plane and crashing downstream."""
    data = encode_jpeg(_gradient_rgb(16, 16))
    i = data.find(b"\xff\xc0")
    assert data[i + 11] == 0x11 and data[i + 14] == 0x11
    patched = bytearray(data)
    patched[i + 11] = 0x33  # Y 3x3
    patched[i + 14] = 0x22  # Cb 2x2 -> 3 % 2 != 0
    with pytest.raises(NotImplementedError, match="chroma sampling"):
        decode_jpeg_pixels(bytes(patched))


def test_truncated_stream_raises():
    img = _gradient_rgb(16, 16)
    data = encode_jpeg(img)
    with pytest.raises(NotImplementedError):
        decode_jpeg_pixels(data[: len(data) - len(data) // 3])


def test_non_jpeg_raises():
    with pytest.raises(NotImplementedError, match="not a JPEG"):
        decode_jpeg_pixels(b"\x89PNG\r\n\x1a\n")


def test_jpeg_pixel_stats_kernel(spark):
    """The Spark-side mapInPandas kernel: geometry and per-channel
    means computed distributed must equal the local decode."""
    from lmo_data_catalog_spark.operators.multimodal import jpeg_pixel_stats

    imgs = {1: _gradient_rgb(24, 16), 2: _gradient_rgb(9, 31)}
    payloads = {
        k: encode_jpeg(v, subsample=(k == 1)) for k, v in imgs.items()
    }
    df = spark.createDataFrame(
        [(k, bytearray(v)) for k, v in payloads.items()],
        "doc_id long, payload binary",
    )
    got = {r["doc_id"]: r for r in jpeg_pixel_stats(df).collect()}
    for k, payload in payloads.items():
        px = decode_jpeg_pixels(payload)
        r = got[k]
        assert (r["height"], r["width"], r["channels"]) == px.shape
        want = [round(float(m), 6) for m in px.reshape(-1, 3).mean(0)]
        assert r["mean_channels"] == want


def test_jpeg_fuzz_corruption_never_hangs_or_misdecodes_silently():
    """Deterministic byte-flip fuzz: every corruption either still
    decodes to a well-formed uint8 array or raises a clean
    NotImplementedError/struct.error — never a crash or hang."""
    img = _gradient_rgb(16, 16)
    base = bytearray(encode_jpeg(img))
    rng = np.random.RandomState(7)
    for _ in range(60):
        data = bytearray(base)
        for _ in range(rng.randint(1, 4)):
            data[rng.randint(2, len(data))] = rng.randint(0, 256)
        try:
            px = decode_jpeg_pixels(bytes(data))
            assert px.dtype == np.uint8 and px.ndim == 3
        except (NotImplementedError, struct.error, KeyError):
            pass


def test_jpeg_pixel_stats_tolerant_routes_the_tail(spark):
    """The crawl-ingest variant (r11 verdict ask #4): unsupported
    codec classes and corrupt payloads become STATUS ROWS instead of
    killing the job; good payloads keep full pixel stats equal to the
    strict kernel's."""
    from lmo_data_catalog_spark.operators.multimodal import (
        jpeg_pixel_stats_tolerant,
    )

    good = encode_jpeg(_gradient_rgb(12, 20))
    # arithmetic-coded: same stream with SOF0 (FFC0) marked SOF9 (FFC9)
    # — the documented permanent non-goal class
    arith = bytearray(good)
    i = arith.find(b"\xff\xc0")
    assert i > 0
    arith[i + 1] = 0xC9
    trunc = good[: len(good) - len(good) // 3]
    rows = spark.createDataFrame(
        [
            (1, bytearray(good)),
            (2, bytes(arith)),
            (3, bytearray(trunc)),
            (4, bytearray(b"not a jpeg at all")),
        ],
        "doc_id long, payload binary",
    )
    got = {r["doc_id"]: r for r in jpeg_pixel_stats_tolerant(rows).collect()}
    assert len(got) == 4

    px = decode_jpeg_pixels(good)
    ok = got[1]
    assert ok["status"] == "ok" and ok["reason"] is None
    assert (ok["height"], ok["width"], ok["channels"]) == px.shape
    assert ok["mean_channels"] == [
        round(float(m), 6) for m in px.reshape(-1, 3).mean(0)
    ]

    ar = got[2]
    assert ar["status"] == "codec_unsupported"
    assert "arithmetic" in ar["reason"]
    # header dims survive even though pixels are refused
    assert (ar["width"], ar["height"]) == (20, 12)
    assert ar["n_pixels"] is None and ar["mean_channels"] is None

    assert got[3]["status"] in ("malformed", "codec_unsupported")
    assert got[4]["status"] == "malformed"
