"""Progressive JPEG decode (operators/jpeg.py, T.81 §G.2) —
differential round-trips against an INDEPENDENT minimal progressive
encoder written here.

The encoder emits real SOF2 streams: an interleaved DC first scan
with a point transform (Al > 0), DC bit-plane refinement scans,
per-component spectral-band AC first scans at Al > 0, and AC
refinement scans with correction-bit buffering that mirrors the
decoder's crossing order EXACTLY (bits for already-nonzero
coefficients are flushed with the symbol whose run crosses them —
the subtle part of §G.1.2.3). It shares no code with the decoder.

The strongest assertion: a progressive stream built from the same
quantized coefficients as a baseline stream must decode to pixels
within 1 gray level of the baseline decode (same coefficients, same
dequant/IDCT math; only summation order differs between the two
pipelines' IDCT implementations).
"""

from __future__ import annotations

import numpy as np
import pytest

from lmo_data_catalog_spark.operators.jpeg import ZIGZAG, decode_jpeg_pixels

from .test_jpeg_decode import (
    AC_CODES,
    DC_CODES,
    QC,
    QL,
    _BitWriter,
    _CT,
    _dht,
    _dqt,
    _gradient_rgb,
    _prep_planes,
    _seg,
    AC_SYMS,
    DC_SYMS,
)

import struct


def _comp_coeffs(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Quantized zigzag coefficients of one padded plane: (BY, BX, 64)."""
    by, bx = plane.shape[0] // 8, plane.shape[1] // 8
    out = np.zeros((by, bx, 64), dtype=np.int64)
    for r in range(by):
        for c in range(bx):
            blk = plane[r * 8 : r * 8 + 8, c * 8 : c * 8 + 8]
            flat = (_CT @ blk @ _CT.T).reshape(64)
            out[r, c] = [round(flat[ZIGZAG[z]] / q[z]) for z in range(64)]
    return out


def _mag(v: int) -> tuple[int, int]:
    s = int(abs(v)).bit_length()
    return s, (v if v >= 0 else v + (1 << s) - 1)


def _wsym(bw: _BitWriter, codes, sym: int) -> None:
    code, ln = codes[sym]
    bw.write(code, ln)


def _sos_header(comps: list[tuple[int, int, int]], ss, se, ah, al) -> bytes:
    body = bytes([len(comps)])
    for cid, td, ta in comps:
        body += bytes([cid, td << 4 | ta])
    body += bytes([ss, se, ah << 4 | al])
    return _seg(0xDA, body)


class _ScanWriter:
    """Bit writer with RSTn segmentation: ``start_unit`` mirrors the
    decoder's restart check (BEFORE unit ``i`` when i > 0 and
    i % restart == 0), so no trailing marker is ever emitted; returns
    True when a restart fired so DC predictors can reset."""

    def __init__(self, restart: int = 0):
        self.restart = restart
        self.bw = _BitWriter()
        self.buf = bytearray()
        self.unit = 0
        self.rst = 0

    def start_unit(self) -> bool:
        fired = False
        if self.restart and self.unit and self.unit % self.restart == 0:
            self.bw.flush()
            self.buf += self.bw.out
            self.buf += bytes([0xFF, 0xD0 + self.rst])
            self.rst = (self.rst + 1) % 8
            self.bw = _BitWriter()
            fired = True
        self.unit += 1
        return fired

    def finish(self) -> bytes:
        self.bw.flush()
        self.buf += self.bw.out
        return bytes(self.buf)


def _dc_first_scan(coeffs, order, samp, mcux, mcuy, al, restart=0) -> bytes:
    """Interleaved DC first scan: DIFF coding of coef0 >> al
    (restart granularity = MCU)."""
    sw = _ScanWriter(restart)
    pred = dict.fromkeys(order, 0)
    for my in range(mcuy):
        for mx in range(mcux):
            if sw.start_unit():
                pred = dict.fromkeys(order, 0)
            for ci, cid in enumerate(order):
                hs, vs = samp[ci]
                for by in range(vs):
                    for bx in range(hs):
                        v = int(coeffs[cid][my * vs + by, mx * hs + bx, 0])
                        sv = v >> al  # arithmetic shift, G.1.2.1
                        diff = sv - pred[cid]
                        pred[cid] = sv
                        s, bits = _mag(diff)
                        _wsym(sw.bw, DC_CODES, s)
                        if s:
                            sw.bw.write(bits, s)
    return sw.finish()


def _dc_refine_scan(coeffs, order, samp, mcux, mcuy, al, restart=0) -> bytes:
    """DC refinement: one bit per block — bit al of the two's
    complement coefficient (matches the decoder's OR-in)."""
    sw = _ScanWriter(restart)
    for my in range(mcuy):
        for mx in range(mcux):
            sw.start_unit()
            for ci, cid in enumerate(order):
                hs, vs = samp[ci]
                for by in range(vs):
                    for bx in range(hs):
                        v = int(coeffs[cid][my * vs + by, mx * hs + bx, 0])
                        sw.bw.write((v >> al) & 1, 1)
    return sw.finish()


def _ac_first_scan(blocks, ss, se, al, restart=0) -> bytes:
    """Single-component AC first scan over band [ss, se] at scale al
    (per-block EOB — symbol 0x00 — no cross-block EOB runs; restart
    granularity = data unit per T.81 non-interleaved scans)."""
    sw = _ScanWriter(restart)
    for zz in blocks:
        sw.start_unit()
        bw = sw.bw
        run = 0
        for k in range(ss, se + 1):
            v = int(zz[k])
            av = abs(v) >> al
            if av == 0:
                run += 1
                continue
            while run > 15:
                _wsym(bw, AC_CODES, 0xF0)
                run -= 16
            s, bits = _mag(av if v > 0 else -av)
            _wsym(bw, AC_CODES, (run << 4) | s)
            bw.write(bits, s)
            run = 0
        if run:
            _wsym(bw, AC_CODES, 0x00)
    return sw.finish()


def _ac_refine_scan(blocks, ss, se, al, restart=0) -> bytes:
    """Single-component AC refinement scan (G.1.2.3): newly
    significant coefficients as (zero-history-run << 4) | 1 symbols
    with a sign bit; one correction bit per already-nonzero
    coefficient, emitted in the decoder's crossing order — with each
    ZRL, only the bits for history positions up to its 16th
    zero-history skip; the rest ride with the next symbol."""
    sw = _ScanWriter(restart)
    for zz in blocks:
        sw.start_unit()
        bw = sw.bw
        hist = [abs(int(zz[k])) >> (al + 1) for k in range(64)]
        cur = [abs(int(zz[k])) >> al for k in range(64)]
        k = ss
        while k <= se:
            # next newly-significant position at or after k
            nxt = next(
                (
                    j
                    for j in range(k, se + 1)
                    if cur[j] == 1 and hist[j] == 0
                ),
                None,
            )
            if nxt is None:
                # EOB for this block + corrections for the remainder
                _wsym(bw, AC_CODES, 0x00)
                for j in range(k, se + 1):
                    if hist[j]:
                        bw.write(cur[j] & 1, 1)
                break
            r = sum(
                1 for j in range(k, nxt) if cur[j] == 0 and hist[j] == 0
            )
            while r > 15:
                _wsym(bw, AC_CODES, 0xF0)
                # corrections for history positions crossed by THIS
                # ZRL: up to and including its 16th zero-history skip
                zeros = 0
                while k <= se:
                    if hist[k]:
                        bw.write(cur[k] & 1, 1)
                    elif cur[k] == 0:
                        zeros += 1
                        if zeros == 16:
                            k += 1
                            break
                    k += 1
                r -= 16
            _wsym(bw, AC_CODES, (r << 4) | 1)
            bw.write(1 if int(zz[nxt]) > 0 else 0, 1)
            for j in range(k, nxt):
                if hist[j]:
                    bw.write(cur[j] & 1, 1)
            k = nxt + 1
    return sw.finish()


def _comp_grid(coeffs_c, hs, vs, hmax, vmax, h, w):
    """Non-interleaved block list (T.81 A.2.2 geometry)."""
    comp_w = -(-(w * hs) // hmax)
    comp_h = -(-(h * vs) // vmax)
    cw = -(-comp_w // 8)
    ch = -(-comp_h // 8)
    return [coeffs_c[by, bx] for by in range(ch) for bx in range(cw)]


def encode_jpeg_progressive(
    rgb: np.ndarray,
    *,
    subsample: bool = False,
    al_dc: int = 1,
    al_ac: int = 1,
    bands: tuple = ((1, 5), (6, 63)),
    restart: int = 0,
) -> bytes:
    """Minimal progressive JFIF encoder (see module docstring)."""
    (padded, samp, qts, hmax, vmax, mcux, mcuy, h, w, gray) = _prep_planes(
        rgb, subsample
    )
    nc = 1 if gray else 3
    qtabs = [QL if t == 0 else QC for t in qts]
    order = list(range(1, nc + 1))
    coeffs = {
        cid: _comp_coeffs(padded[ci], qtabs[ci])
        for ci, cid in enumerate(order)
    }

    out = bytearray(b"\xff\xd8")
    out += _dqt(0, QL)
    if not gray:
        out += _dqt(1, QC)
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for c in range(nc):
        sof += bytes([c + 1, samp[c][0] << 4 | samp[c][1], qts[c]])
    out += _seg(0xC2, sof)
    out += _dht(0, 0, DC_SYMS, 4) + _dht(1, 0, AC_SYMS, 8)
    if restart:
        out += _seg(0xDD, struct.pack(">H", restart))

    # DC first (interleaved) + bit-plane refinements down to Al=0
    out += _sos_header(
        [(cid, 0, 0) for cid in order], 0, 0, 0, al_dc
    )
    out += _dc_first_scan(coeffs, order, samp, mcux, mcuy, al_dc, restart)
    for al in range(al_dc - 1, -1, -1):
        out += _sos_header(
            [(cid, 0, 0) for cid in order], 0, 0, al + 1, al
        )
        out += _dc_refine_scan(coeffs, order, samp, mcux, mcuy, al, restart)

    # AC: per component, per spectral band — first scan at al_ac,
    # then refinements down to Al=0
    for ci, cid in enumerate(order):
        hs, vs = samp[ci]
        blocks = _comp_grid(coeffs[cid], hs, vs, hmax, vmax, h, w)
        for ss, se in bands:
            out += _sos_header([(cid, 0, 0)], ss, se, 0, al_ac)
            out += _ac_first_scan(blocks, ss, se, al_ac, restart)
    for ci, cid in enumerate(order):
        hs, vs = samp[ci]
        blocks = _comp_grid(coeffs[cid], hs, vs, hmax, vmax, h, w)
        for ss, se in bands:
            for al in range(al_ac - 1, -1, -1):
                out += _sos_header([(cid, 0, 0)], ss, se, al + 1, al)
                out += _ac_refine_scan(blocks, ss, se, al, restart)

    out += b"\xff\xd9"
    return bytes(out)


# --------------------------------------------------------------- tests

from .test_jpeg_decode import encode_jpeg  # noqa: E402


def test_uniform_gray_progressive_exact():
    img = np.full((16, 16), 128, dtype=np.uint8)
    px = decode_jpeg_pixels(encode_jpeg_progressive(img))
    assert px.shape == (16, 16, 1)
    assert (px == 128).all()


@pytest.mark.parametrize("subsample", [False, True])
def test_progressive_matches_baseline_decode(subsample):
    """Same image, same quant tables -> identical quantized
    coefficients -> progressive and baseline decodes must agree to
    within 1 gray level (IDCT summation order is the only delta)."""
    img = _gradient_rgb(19, 29)
    base = decode_jpeg_pixels(encode_jpeg(img, subsample=subsample))
    prog = decode_jpeg_pixels(
        encode_jpeg_progressive(img, subsample=subsample)
    )
    assert prog.shape == base.shape
    assert np.abs(prog.astype(int) - base.astype(int)).max() <= 1


def test_progressive_gradient_roundtrip_quality():
    img = _gradient_rgb(32, 40)
    px = decode_jpeg_pixels(encode_jpeg_progressive(img))
    err = np.abs(px.astype(float) - img.astype(float)).mean()
    assert err < 3.0, err


def test_progressive_grayscale_and_deeper_approximation():
    """al_dc=2/al_ac=2 exercises TWO refinement bit-planes per band
    and negative-DC two's-complement reconstruction."""
    img = (_gradient_rgb(17, 23)[..., 0]).copy()
    base = decode_jpeg_pixels(encode_jpeg(img))
    prog = decode_jpeg_pixels(
        encode_jpeg_progressive(img, al_dc=2, al_ac=2)
    )
    assert prog.shape == base.shape
    assert np.abs(prog.astype(int) - base.astype(int)).max() <= 1


def test_progressive_single_band_no_approximation():
    """Degenerate progressive: one full-band AC scan at Al=0 and a
    DC scan at Al=0 — the spectral-selection-only profile."""
    img = _gradient_rgb(16, 24)
    prog = decode_jpeg_pixels(
        encode_jpeg_progressive(
            img, al_dc=0, al_ac=0, bands=((1, 63),)
        )
    )
    base = decode_jpeg_pixels(encode_jpeg(img))
    assert np.abs(prog.astype(int) - base.astype(int)).max() <= 1


def test_progressive_many_bands():
    img = _gradient_rgb(24, 24)
    prog = decode_jpeg_pixels(
        encode_jpeg_progressive(
            img, bands=((1, 2), (3, 9), (10, 35), (36, 63))
        )
    )
    base = decode_jpeg_pixels(encode_jpeg(img))
    assert np.abs(prog.astype(int) - base.astype(int)).max() <= 1


def test_ac_refinement_zrl_history_corner():
    """The §G.1.2.3 corner the encoder/decoder pair must agree on:
    a band with >16 zero-history positions BETWEEN two newly
    significant coefficients, with already-nonzero (history)
    coefficients sprinkled on BOTH sides of the ZRL's 16th skip —
    the correction bits must split between the ZRL and the following
    run-size symbol exactly as the decoder crosses them. Built from
    hand-made coefficients via a custom low-level stream."""
    coef = np.zeros((1, 1, 64), dtype=np.int64)
    coef[0, 0, 0] = 40  # DC
    coef[0, 0, 1] = 5   # strong: history at every AC level
    coef[0, 0, 2] = 2   # history at al=0 (cur=2, hist=1)
    coef[0, 0, 25] = 3  # history sitting AFTER the 16th zero skip
    coef[0, 0, 30] = 1  # newly significant at al=0, after >16 zeros
    coef[0, 0, 60] = -1  # second new significant, more zeros + none

    # hand-assemble an 8x8 grayscale progressive stream around the
    # fabricated coefficients (quant table all ones so dequant is id)
    q1 = np.ones(64, dtype=np.int32)
    out = bytearray(b"\xff\xd8")
    out += _dqt(0, q1)
    out += _seg(0xC2, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    out += _dht(0, 0, DC_SYMS, 4) + _dht(1, 0, AC_SYMS, 8)
    fake = {1: coef}
    out += _sos_header([(1, 0, 0)], 0, 0, 0, 0)
    out += _dc_first_scan(fake, [1], [(1, 1)], 1, 1, 0)
    blocks = [coef[0, 0]]
    out += _sos_header([(1, 0, 0)], 1, 63, 0, 1)
    out += _ac_first_scan(blocks, 1, 63, 1)
    out += _sos_header([(1, 0, 0)], 1, 63, 1, 0)
    out += _ac_refine_scan(blocks, 1, 63, 0)
    out += b"\xff\xd9"

    px = decode_jpeg_pixels(bytes(out))
    # expected: direct IDCT of the fabricated block
    from lmo_data_catalog_spark.operators.jpeg import _C

    blk = np.zeros(64, dtype=np.float64)
    blk[ZIGZAG] = coef[0, 0]
    want = np.clip(
        _C.T @ blk.reshape(8, 8) @ _C + 128.0, 0, 255
    ).round().astype(np.uint8)
    assert (px[..., 0] == want).all()


@pytest.mark.parametrize("subsample", [False, True])
def test_progressive_restart_intervals_match_unrestarted(subsample):
    """DRI + RSTn inside EVERY progressive scan type (interleaved DC
    first, DC refinement, AC first, AC refinement) must not change a
    pixel: the decoder advances its restart segment and resets DC
    predictors / EOB runs exactly where the encoder did — restart
    granularity is MCUs for the interleaved DC scan and data units
    for the non-interleaved AC scans."""
    img = _gradient_rgb(35, 21)
    plain = decode_jpeg_pixels(
        encode_jpeg_progressive(img, subsample=subsample)
    )
    restarted = decode_jpeg_pixels(
        encode_jpeg_progressive(img, subsample=subsample, restart=2)
    )
    assert (plain == restarted).all()


def test_progressive_fuzz_never_hangs_or_crashes():
    img = _gradient_rgb(16, 16)
    base = bytearray(encode_jpeg_progressive(img))
    rng = np.random.RandomState(11)
    for _ in range(60):
        data = bytearray(base)
        for _ in range(rng.randint(1, 4)):
            data[rng.randint(2, len(data))] = rng.randint(0, 256)
        try:
            px = decode_jpeg_pixels(bytes(data))
            assert px.dtype == np.uint8 and px.ndim == 3
        except (NotImplementedError, struct.error, KeyError, IndexError):
            pass
