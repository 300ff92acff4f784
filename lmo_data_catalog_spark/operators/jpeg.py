"""Baseline JPEG (ITU-T T.81) pixel decode with stdlib + numpy only.

Reference status: extension surface (the reference script,
01_source_me.R:1-346, has no multimodal stage); this closes the last
documented boundary of the multimodal pillar — PNG pixels and WAV PCM
decoded in r7/r8, JPEG was header-only until now.

Scope — the honest-boundary contract of decode_jpeg_pixels:

- SOF0 baseline sequential DCT, Huffman entropy coding, 8-bit
  precision, grayscale or 3-component YCbCr, integer-ratio sampling
  factors (4:4:4 / 4:2:2 / 4:2:0 / ...), restart intervals
  (DRI + RSTn), single interleaved scan covering every component.
- SOF2 PROGRESSIVE Huffman (r10 verdict ask #4; T.81 §G.2): spectral
  selection (per-band AC scans, interleaved or single-component DC
  scans), successive approximation (DC point transform + bit-plane
  refinement, AC first + refinement scans with EOB-run coding),
  table redefinition between scans, restart intervals per scan.
  Coefficients accumulate per component across scans; dequant +
  IDCT + assembly run once at the end, through the same tail as
  baseline.
- Arithmetic coding (SOF9+), 12-bit precision, hierarchical,
  CMYK/4-component scans, non-interleaved multi-scan BASELINE files
  (SOS listing fewer components than SOF in a sequential file), and
  non-integer chroma sampling ratios raise ``NotImplementedError``
  — a loud boundary, never a wrong decode. Grayscale files decode
  with MCU = one block regardless of SOF sampling factors, per
  T.81 A.2 (a single-component scan is never interleaved).

  ARITHMETIC CODING IS A DOCUMENTED PERMANENT NON-GOAL (r11 verdict
  ask #4, resolved): a correct §D decoder requires the exact Table
  D.3 Qe-value state machine from the spec text, which is not
  available in this environment and must not be reconstructed from
  memory — a near-miss table would decode plausible-but-WRONG
  pixels, strictly worse than refusing. Production ingest routes
  the refusal instead of dying on it:
  operators/multimodal.py::jpeg_pixel_stats_tolerant emits
  ``status = codec_unsupported`` rows (header dims preserved) for
  this class, keeping the strict kernels' fail-fast contract for
  pipelines that want it.

Everything below is from the public spec: marker walk (B.2), canonical
Huffman decode (F.2.2), EXTEND sign extension (F.2.2.1), zigzag +
dequantization (F.2.1.5), the orthonormal 8x8 inverse DCT as two
matrix multiplies (A.3.3), nearest-neighbor chroma upsampling, and the
JFIF YCbCr->RGB transform. The MCU loop is per-coefficient Python —
fine inside an Arrow-batched worker for thumbnail-scale corpus images,
swappable for a codec library at full scale without touching the
Spark plumbing (same argument as PNG's Paeth loop).
"""

from __future__ import annotations

import struct

import numpy as np

#: zigzag scan order: index z -> (row, col) of the 8x8 block (spec
#: Figure A.6), as a flat argsort-able table.
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

#: orthonormal DCT-II basis: C[u, x] = alpha(u) * cos((2x+1) u pi / 16)
#: with alpha(0) = sqrt(1/8), alpha(u>0) = 1/2; inverse DCT of a
#: coefficient block F is C.T @ F @ C (spec A.3.3).
_C = np.array(
    [
        [
            (np.sqrt(1 / 8) if u == 0 else 0.5)
            * np.cos((2 * x + 1) * u * np.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


class _HuffTable:
    """Canonical Huffman decode table from a DHT segment (counts per
    code length 1..16 + symbol list), decoded the spec way (F.2.2.3):
    per-length (mincode, maxcode, first-symbol-index) arrays."""

    def __init__(self, counts, symbols):
        self.symbols = symbols
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        for ln in range(1, 17):
            if counts[ln - 1]:
                self.valptr[ln] = k
                self.mincode[ln] = code
                code += counts[ln - 1]
                k += counts[ln - 1]
                self.maxcode[ln] = code - 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over a de-stuffed entropy segment."""

    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise NotImplementedError("truncated JPEG entropy stream")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: _HuffTable) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.read_bit()
            if code <= table.maxcode[ln]:
                return table.symbols[
                    table.valptr[ln] + code - table.mincode[ln]
                ]
        raise NotImplementedError("invalid JPEG Huffman code")


def _extend(v: int, t: int) -> int:
    """EXTEND (F.2.2.1): map a t-bit magnitude to its signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _destuff(scan: bytes):
    """Split the entropy-coded scan into restart segments with byte
    stuffing removed: 0xFF00 -> 0xFF, RST0-7 are segment boundaries,
    any other marker ends the scan."""
    segs = []
    cur = bytearray()
    i = 0
    n = len(scan)
    while i < n:
        b = scan[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        if i + 1 >= n:
            break
        m = scan[i + 1]
        if m == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:  # RSTn
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:  # EOI or any real marker: scan is over
            break
    segs.append(bytes(cur))
    return segs


def decode_jpeg_pixels(payload: bytes):
    """Decode a baseline JPEG to an ``(h, w, channels)`` uint8 array
    (channels 1 for grayscale, 3 for RGB after the JFIF YCbCr
    transform). See module docstring for the supported envelope."""
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise NotImplementedError("payload is not a JPEG")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffTable] = {}
    sof = None
    restart_interval = 0
    scan = None
    scan_comps = None
    i = 2
    n = len(payload)
    while i + 4 <= n:
        if payload[i] != 0xFF:
            raise NotImplementedError(
                f"bad marker alignment at offset {i}"
            )
        while payload[i + 1] == 0xFF and i + 2 < n:  # fill bytes (B.1.1.2)
            i += 1
        marker = payload[i + 1]
        if marker == 0xD9:  # EOI
            break
        (ln,) = struct.unpack(">H", payload[i + 2 : i + 4])
        body = payload[i + 4 : i + 2 + ln]
        if marker == 0xDB:  # DQT
            j = 0
            while j < len(body):
                pq, tq = body[j] >> 4, body[j] & 0xF
                if pq == 0:
                    tbl = np.frombuffer(
                        body[j + 1 : j + 65], np.uint8
                    ).astype(np.int32)
                    j += 65
                else:
                    tbl = np.frombuffer(
                        body[j + 1 : j + 129], ">u2"
                    ).astype(np.int32)
                    j += 129
                qt[tq] = tbl
        elif marker == 0xC4:  # DHT
            j = 0
            while j < len(body):
                tc, th = body[j] >> 4, body[j] & 0xF
                counts = list(body[j + 1 : j + 17])
                nsym = sum(counts)
                symbols = list(body[j + 17 : j + 17 + nsym])
                huff[(tc, th)] = _HuffTable(counts, symbols)
                j += 17 + nsym
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError(
                    f"JPEG precision {prec} unsupported (8 only)"
                )
            if nc not in (1, 3):
                raise NotImplementedError(
                    f"{nc}-component JPEG unsupported (gray/YCbCr only)"
                )
            comps = []
            for c in range(nc):
                cid, samp, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, samp >> 4, samp & 0xF, tq))
            sof = (h, w, comps)
        elif marker == 0xC2:  # SOF2 progressive Huffman
            return _decode_progressive(payload)
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            kind = {
                0xC9: "arithmetic-coded",
                0xCA: "progressive arithmetic",
            }.get(marker, f"SOF{marker - 0xC0}")
            raise NotImplementedError(
                f"{kind} JPEG unsupported (baseline SOF0 / "
                "progressive SOF2 only)"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan_comps = [
                (body[1 + 2 * c], body[2 + 2 * c] >> 4, body[2 + 2 * c] & 0xF)
                for c in range(ns)
            ]
            scan = payload[i + 2 + ln :]
            break
        i += 2 + ln
    if sof is None or scan is None:
        raise NotImplementedError("JPEG without SOF0 + SOS")
    h, w, comps = sof
    if len(scan_comps) != len(comps):
        # A baseline file may legally spread components over several
        # non-interleaved scans (T.81 B.2.3); decoding only the first
        # as if it were a full interleaved scan would produce wrong
        # pixels silently. Loud boundary instead.
        raise NotImplementedError(
            f"non-interleaved JPEG scan ({len(scan_comps)} of "
            f"{len(comps)} components) unsupported"
        )
    if len(comps) == 1:
        # A single-component scan is never interleaved: MCU = one
        # data unit (T.81 A.2), so the SOF sampling factors do not
        # participate in MCU geometry. Normalize them to 1x1.
        comps = [(comps[0][0], 1, 1, comps[0][3])]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    for cid, hs, vs, _ in comps:
        if hmax % hs or vmax % vs:
            # np.repeat upsampling below is integer-ratio only; a
            # 3:2 ratio would build an undersized plane and crash
            # (or misalign) instead of raising.
            raise NotImplementedError(
                f"non-integer chroma sampling ratio for component "
                f"{cid}: {hs}x{vs} vs max {hmax}x{vmax}"
            )
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    # per-component plane in MCU-padded geometry
    planes = {
        cid: np.zeros((mcuy * 8 * vs, mcux * 8 * hs), dtype=np.float64)
        for cid, hs, vs, _ in comps
    }
    tables = {cid: (hs, vs, qt[tq]) for cid, hs, vs, tq in comps}
    dc_tbl = {cid: huff[(0, td)] for cid, td, _ in scan_comps}
    ac_tbl = {cid: huff[(1, ta)] for cid, _, ta in scan_comps}
    order = [c[0] for c in scan_comps]

    segs = _destuff(scan)
    seg_idx = 0
    reader = _BitReader(segs[0])
    pred = dict.fromkeys(order, 0)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if (
                restart_interval
                and mcu_count
                and mcu_count % restart_interval == 0
            ):
                seg_idx += 1
                if seg_idx >= len(segs):
                    raise NotImplementedError(
                        "missing JPEG restart segment"
                    )
                reader = _BitReader(segs[seg_idx])
                pred = dict.fromkeys(order, 0)
            for cid in order:
                hs, vs, q = tables[cid]
                for by in range(vs):
                    for bx in range(hs):
                        zz = np.zeros(64, dtype=np.int64)
                        t = reader.decode_symbol(dc_tbl[cid])
                        if t > 15:  # DC categories are 0..11 (8-bit)
                            raise NotImplementedError(
                                f"invalid JPEG DC category {t}"
                            )
                        pred[cid] += _extend(reader.read_bits(t), t)
                        zz[0] = pred[cid]
                        k = 1
                        while k < 64:
                            rs = reader.decode_symbol(ac_tbl[cid])
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:  # ZRL: 16 zeros
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise NotImplementedError(
                                    "JPEG AC run past block end"
                                )
                            zz[k] = _extend(reader.read_bits(s), s)
                            k += 1
                        block = np.zeros(64, dtype=np.float64)
                        block[ZIGZAG] = zz * q
                        spatial = _C.T @ block.reshape(8, 8) @ _C
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        planes[cid][y0 : y0 + 8, x0 : x0 + 8] = spatial
            mcu_count += 1

    return _planes_to_pixels(planes, comps, hmax, vmax, h, w)


def _planes_to_pixels(planes, comps, hmax, vmax, h, w):
    """Shared decode tail: upsample each component plane to full
    geometry, crop MCU padding, level-shift, JFIF YCbCr->RGB."""
    full = []
    for cid, hs, vs, _ in comps:
        p = planes[cid]
        p = np.repeat(np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1)
        full.append(p[:h, :w] + 128.0)
    if len(full) == 1:
        return (
            np.clip(full[0], 0, 255).round().astype(np.uint8)[..., None]
        )
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(rgb, 0, 255).round().astype(np.uint8)


# ------------------------------------------------- progressive (T.81 §G.2)


def _find_scan_end(payload: bytes, start: int) -> int:
    """Index of the first real marker (not stuffing 0xFF00, not
    RST0-7, not a 0xFF fill byte) after ``start`` — the end of an
    entropy-coded scan body."""
    i = start
    n = len(payload)
    while i + 1 < n:
        if payload[i] != 0xFF:
            i += 1
            continue
        m = payload[i + 1]
        if m == 0x00:
            i += 2
        elif m == 0xFF:  # fill byte
            i += 1
        elif 0xD0 <= m <= 0xD7:
            i += 2
        else:
            return i
    return n


def _refine_nonzero(reader: _BitReader, coefs, ks, ke, bit: int) -> None:
    """Correction-bit pass over zigzag positions ks..ke: every
    already-nonzero coefficient reads one bit; a 1-bit adds
    ±bit toward larger magnitude unless that bit is already set
    (G.2.2 / F.2.4.3 correction semantics)."""
    for k in range(ks, ke + 1):
        c = int(coefs[k])
        if c != 0 and reader.read_bit() and not (c & bit):
            coefs[k] = c + (bit if c > 0 else -bit)


def _decode_progressive(payload: bytes):
    """Progressive-Huffman JPEG decode: accumulate per-component
    zigzag coefficient arrays across every scan (DC/AC, first/
    refinement, spectral bands), then dequantize + IDCT once.

    Scan semantics implemented from the public spec text:

    - DC first (Ss=0, Ah=0): baseline DIFF coding of DC >> Al
      (encoder's arithmetic shift), stored << Al; interleaved MCU
      order when ns > 1, component block order otherwise.
    - DC refinement (Ah>0): one bit per block, OR'd in at Al
      (two's-complement OR reconstructs negatives exactly).
    - AC first (Ss>=1, Ah=0, ns must be 1 per G.1.1.1.1): baseline
      run/size within [Ss, Se] at scale Al, plus EOBn symbols
      (s=0, r<15): EOBRUN = 2^r - 1 + next r bits of blocks whose
      band is entirely zero at this scale.
    - AC refinement (Ah>0): newly significant coefficients arrive as
      s=1 symbols (±1 << Al after a run of r zero-HISTORY positions);
      every already-nonzero coefficient crossed contributes one
      correction bit; EOB runs carry correction bits for the
      remaining nonzero coefficients of each covered block.
    - DQT/DHT/DRI may be redefined between scans; restart markers
      reset DC predictors and the EOB run per segment.
    """
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffTable] = {}
    restart_interval = 0
    coefs = None  # cid -> (BY, BX, 64) int64, zigzag order
    geom = None
    n_scans = 0
    i = 2
    n = len(payload)
    while i + 4 <= n:
        if payload[i] != 0xFF:
            raise NotImplementedError(f"bad marker alignment at {i}")
        while payload[i + 1] == 0xFF and i + 2 < n:
            i += 1
        marker = payload[i + 1]
        if marker == 0xD9:  # EOI
            break
        (ln,) = struct.unpack(">H", payload[i + 2 : i + 4])
        body = payload[i + 4 : i + 2 + ln]
        if marker == 0xDB:
            j = 0
            while j < len(body):
                pq, tq = body[j] >> 4, body[j] & 0xF
                if pq == 0:
                    qt[tq] = np.frombuffer(
                        body[j + 1 : j + 65], np.uint8
                    ).astype(np.int32)
                    j += 65
                else:
                    qt[tq] = np.frombuffer(
                        body[j + 1 : j + 129], ">u2"
                    ).astype(np.int32)
                    j += 129
        elif marker == 0xC4:
            j = 0
            while j < len(body):
                tc, th = body[j] >> 4, body[j] & 0xF
                counts = list(body[j + 1 : j + 17])
                nsym = sum(counts)
                huff[(tc, th)] = _HuffTable(
                    counts, list(body[j + 17 : j + 17 + nsym])
                )
                j += 17 + nsym
        elif marker == 0xC2:
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError(
                    f"JPEG precision {prec} unsupported (8 only)"
                )
            if nc not in (1, 3):
                raise NotImplementedError(
                    f"{nc}-component JPEG unsupported (gray/YCbCr only)"
                )
            comps = []
            for c in range(nc):
                cid, samp, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, samp >> 4, samp & 0xF, tq))
            if nc == 1:
                comps = [(comps[0][0], 1, 1, comps[0][3])]
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            for cid, hs, vs, _ in comps:
                if hmax % hs or vmax % vs:
                    raise NotImplementedError(
                        f"non-integer chroma sampling ratio for "
                        f"component {cid}: {hs}x{vs} vs {hmax}x{vmax}"
                    )
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            coefs = {
                cid: np.zeros((mcuy * vs, mcux * hs, 64), dtype=np.int64)
                for cid, hs, vs, _ in comps
            }
            geom = (h, w, comps, hmax, vmax, mcux, mcuy)
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:
            if geom is None:
                raise NotImplementedError("JPEG SOS before SOF2")
            h, w, comps, hmax, vmax, mcux, mcuy = geom
            ns = body[0]
            scan_comps = [
                (body[1 + 2 * c], body[2 + 2 * c] >> 4,
                 body[2 + 2 * c] & 0xF)
                for c in range(ns)
            ]
            ss, se, a = body[1 + 2 * ns : 4 + 2 * ns]
            ah, al = a >> 4, a & 0xF
            scan_end = _find_scan_end(payload, i + 2 + ln)
            _progressive_scan(
                payload[i + 2 + ln : scan_end], scan_comps,
                ss, se, ah, al, comps, coefs, huff,
                restart_interval, hmax, vmax, mcux, mcuy, h, w,
            )
            n_scans += 1
            i = scan_end
            continue
        i += 2 + ln
    if geom is None or coefs is None or n_scans == 0:
        raise NotImplementedError("progressive JPEG without SOF2 scans")
    h, w, comps, hmax, vmax, mcux, mcuy = geom
    planes = {}
    for cid, hs, vs, tq in comps:
        zz = coefs[cid] * qt[tq][None, None, :]
        blocks = np.zeros_like(zz, dtype=np.float64)
        blocks[..., ZIGZAG] = zz
        by, bx = blocks.shape[:2]
        spatial = np.einsum(
            "ui,abuv,vj->abij", _C, blocks.reshape(by, bx, 8, 8), _C
        )
        planes[cid] = (
            spatial.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        )
    return _planes_to_pixels(planes, comps, hmax, vmax, h, w)


def _progressive_scan(
    scan, scan_comps, ss, se, ah, al, comps, coefs, huff,
    restart_interval, hmax, vmax, mcux, mcuy, h, w,
):
    """Apply ONE progressive scan to the coefficient store."""
    by_id = {c[0]: c for c in comps}
    segs = _destuff(scan)
    seg_idx = 0
    reader = _BitReader(segs[0])
    if ss == 0:
        # ---------------- DC scan (first or refinement) --------------
        if se != 0:
            raise NotImplementedError(
                "progressive scan mixes DC and AC (Ss=0, Se>0)"
            )
        order = [c[0] for c in scan_comps]
        pred = dict.fromkeys(order, 0)
        dc_tbl = {
            cid: (huff[(0, td)] if ah == 0 else None)
            for cid, td, _ in scan_comps
        }
        interleaved = len(scan_comps) > 1
        if interleaved:
            units = [
                (cid, by_id[cid][1], by_id[cid][2]) for cid in order
            ]
            mcu = 0
            for my in range(mcuy):
                for mx in range(mcux):
                    if (
                        restart_interval
                        and mcu
                        and mcu % restart_interval == 0
                    ):
                        seg_idx += 1
                        if seg_idx >= len(segs):
                            raise NotImplementedError(
                                "missing JPEG restart segment"
                            )
                        reader = _BitReader(segs[seg_idx])
                        pred = dict.fromkeys(order, 0)
                    for cid, hs, vs in units:
                        for byy in range(vs):
                            for bxx in range(hs):
                                blk = coefs[cid][my * vs + byy,
                                                 mx * hs + bxx]
                                _dc_unit(
                                    reader, blk, dc_tbl[cid],
                                    pred, cid, ah, al,
                                )
                    mcu += 1
        else:
            cid, hs, vs, _tq = by_id[scan_comps[0][0]]
            comp_w = -(-(w * hs) // hmax)
            comp_h = -(-(h * vs) // vmax)
            cw = -(-comp_w // 8)
            ch = -(-comp_h // 8)
            unit = 0
            for byy in range(ch):
                for bxx in range(cw):
                    if (
                        restart_interval
                        and unit
                        and unit % restart_interval == 0
                    ):
                        seg_idx += 1
                        if seg_idx >= len(segs):
                            raise NotImplementedError(
                                "missing JPEG restart segment"
                            )
                        reader = _BitReader(segs[seg_idx])
                        pred = dict.fromkeys(order, 0)
                    _dc_unit(
                        reader, coefs[cid][byy, bxx],
                        dc_tbl[cid], pred, cid, ah, al,
                    )
                    unit += 1
        return
    # ------------------- AC scan (first or refinement) ---------------
    if len(scan_comps) != 1:
        raise NotImplementedError(
            "progressive AC scan must be single-component (G.1.1.1.1)"
        )
    cid, _td, ta = scan_comps[0]
    _cid, hs, vs, _tq = by_id[cid]
    ac = huff[(1, ta)]
    comp_w = -(-(w * hs) // hmax)
    comp_h = -(-(h * vs) // vmax)
    cw = -(-comp_w // 8)
    ch = -(-comp_h // 8)
    eobrun = 0
    bit = 1 << al
    unit = 0
    for byy in range(ch):
        for bxx in range(cw):
            if (
                restart_interval
                and unit
                and unit % restart_interval == 0
            ):
                seg_idx += 1
                if seg_idx >= len(segs):
                    raise NotImplementedError(
                        "missing JPEG restart segment"
                    )
                reader = _BitReader(segs[seg_idx])
                eobrun = 0
            blk = coefs[cid][byy, bxx]
            if ah == 0:
                if eobrun > 0:
                    eobrun -= 1
                else:
                    k = ss
                    while k <= se:
                        rs = reader.decode_symbol(ac)
                        r, s = rs >> 4, rs & 0xF
                        if s == 0:
                            if r == 15:
                                k += 16
                                continue
                            eobrun = (1 << r) - 1
                            if r:
                                eobrun += reader.read_bits(r)
                            break
                        k += r
                        if k > se:
                            raise NotImplementedError(
                                "JPEG AC run past band end"
                            )
                        blk[k] = _extend(reader.read_bits(s), s) << al
                        k += 1
            else:
                if eobrun > 0:
                    eobrun -= 1
                    _refine_nonzero(reader, blk, ss, se, bit)
                else:
                    k = ss
                    while k <= se:
                        rs = reader.decode_symbol(ac)
                        r, s = rs >> 4, rs & 0xF
                        if s == 0:
                            if r < 15:
                                eobrun = (1 << r) - 1
                                if r:
                                    eobrun += reader.read_bits(r)
                                _refine_nonzero(reader, blk, k, se, bit)
                                k = se + 1
                                break
                            newval = 0  # ZRL: 16 zero-history skips
                        elif s == 1:
                            newval = bit if reader.read_bit() else -bit
                        else:
                            raise NotImplementedError(
                                "invalid JPEG AC refinement size"
                            )
                        while k <= se:
                            c = int(blk[k])
                            if c != 0:
                                if reader.read_bit() and not (c & bit):
                                    blk[k] = c + (
                                        bit if c > 0 else -bit
                                    )
                            else:
                                if r == 0:
                                    break
                                r -= 1
                            k += 1
                        if s and k <= se:
                            blk[k] = newval
                        k += 1
            unit += 1


def _dc_unit(reader, blk, dc_table, pred, cid, ah, al):
    """One DC data unit: first-scan DIFF decode at scale Al, or a
    single refinement bit OR'd in (two's-complement correct for
    negative coefficients)."""
    if ah == 0:
        t = reader.decode_symbol(dc_table)
        if t > 15:
            raise NotImplementedError(f"invalid JPEG DC category {t}")
        pred[cid] += _extend(reader.read_bits(t), t)
        blk[0] = pred[cid] << al
    else:
        if reader.read_bit():
            blk[0] = int(blk[0]) | (1 << al)
