"""Real PNG pixel decode (operators/multimodal.py::decode_png_pixels
/ png_pixel_stats): stdlib zlib inflate + all five PNG scanline
filters, round-tripped against a test-local stdlib PNG ENCODER that
applies the forward filters — so every filter path is exercised
against ground-truth pixels, plus hypothesis fuzz over geometry /
channels / filter choices, Spark-side stats, and the strict raises.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lmo_data_catalog_spark.operators.multimodal import (
    decode_png_pixels,
    parse_image_dims,
    png_pixel_stats,
)


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def _filter_row(row, prior, f: int, bpp: int) -> bytes:
    """Forward-apply PNG filter ``f`` to one reconstructed scanline
    (PNG spec §9 — the encoder side our decoder must invert)."""
    out = bytearray()
    for x in range(len(row)):
        a = int(row[x - bpp]) if x >= bpp else 0
        b = int(prior[x])
        c = int(prior[x - bpp]) if x >= bpp else 0
        if f == 0:
            v = row[x]
        elif f == 1:
            v = (int(row[x]) - a) & 0xFF
        elif f == 2:
            v = (int(row[x]) - b) & 0xFF
        elif f == 3:
            v = (int(row[x]) - ((a + b) >> 1)) & 0xFF
        else:  # Paeth
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            v = (int(row[x]) - pred) & 0xFF
        out.append(v)
    return bytes(out)


def _row_bytes(row_pixels: np.ndarray, depth: int) -> np.ndarray:
    """Scanline pixels → filter-input bytes (16-bit: big-endian pairs,
    spec §7.1)."""
    if depth == 8:
        return row_pixels.reshape(-1).astype(np.uint8)
    return np.frombuffer(
        row_pixels.reshape(-1).astype(">u2").tobytes(), np.uint8
    )


def encode_png(pixels: np.ndarray, filters=None, *, interlace=0, depth=8):
    """Minimal stdlib PNG encoder: (h, w, c) uint8/uint16 → PNG bytes,
    with a chosen filter type per scanline (default: cycle 0..4)."""
    h, w, c = pixels.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    bpp = c * (depth // 8) if depth in (8, 16) else c
    if filters is None:
        filters = [y % 5 for y in range(h)]
    raw = bytearray()
    prior = np.zeros(w * bpp, dtype=np.uint8)
    for y in range(h):
        row = _row_bytes(pixels[y], depth) if depth in (8, 16) else pixels[y].reshape(-1)
        f = filters[y]
        raw.append(f)
        raw += _filter_row(row, prior, f, bpp)
        prior = row
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def encode_palette_png(
    idx: np.ndarray,
    pal: np.ndarray,
    *,
    depth: int = 8,
    trns: bytes | None = None,
    filters=None,
):
    """Test-local palette (color type 3) encoder: (h, w) index array +
    (n, 3) palette → PNG bytes. Indices pack MSB-first at ``depth``
    bits (PNG spec §7.2) and rows forward-filter with bpp=1 (§9)."""
    h, w = idx.shape
    if filters is None:
        filters = [y % 5 for y in range(h)]
    raw = bytearray()
    stride = (w * depth + 7) // 8
    prior = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        if depth == 8:
            row = idx[y].astype(np.uint8)
        else:
            bits = (
                (idx[y][:, None] >> np.arange(depth - 1, -1, -1)) & 1
            ).astype(np.uint8).reshape(-1)
            row = np.packbits(bits)
        f = filters[y]
        raw.append(f)
        raw += _filter_row(row, prior, f, 1)
        prior = row
    ihdr = struct.pack(">IIBBBBB", w, h, depth, 3, 0, 0, 0)
    out = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
    out += _chunk(b"PLTE", pal.astype(np.uint8).tobytes())
    if trns is not None:
        out += _chunk(b"tRNS", trns)
    out += _chunk(b"IDAT", zlib.compress(bytes(raw)))
    return out + _chunk(b"IEND", b"")


#: Adam7 pass table, re-stated here (spec §8.2) rather than imported —
#: the encoder must not share the decoder's geometry constants
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def encode_png_adam7(pixels: np.ndarray, filters=None, *, depth=8) -> bytes:
    """Adam7-interlaced encoder: each pass extracted by the §8.2
    offsets, forward-filtered as an INDEPENDENT sub-image (prior row
    resets per pass), empty passes contribute nothing."""
    h, w, c = pixels.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    bpp = c * (depth // 8)
    raw = bytearray()
    fy = 0
    for x0, y0, dx, dy in _ADAM7:
        sub = pixels[y0::dy, x0::dx]
        ph, pw = sub.shape[:2]
        if ph == 0 or pw == 0:
            continue
        prior = np.zeros(pw * bpp, dtype=np.uint8)
        for y in range(ph):
            row = _row_bytes(sub[y], depth)
            f = filters[fy] if filters is not None else fy % 5
            fy += 1
            raw.append(f)
            raw += _filter_row(row, prior, f, bpp)
            prior = row
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, 1)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def encode_palette_png_adam7(
    idx: np.ndarray, pal: np.ndarray, *, depth: int = 8,
    trns: bytes | None = None,
) -> bytes:
    """Adam7 palette encoder: indices pack MSB-first per REDUCED
    scanline (each pass's own stride), filters cycle, bpp=1."""
    h, w = idx.shape
    raw = bytearray()
    fy = 0
    for x0, y0, dx, dy in _ADAM7:
        sub = idx[y0::dy, x0::dx]
        ph, pw = sub.shape[:2]
        if ph == 0 or pw == 0:
            continue
        stride = (pw * depth + 7) // 8
        prior = np.zeros(stride, dtype=np.uint8)
        for y in range(ph):
            if depth == 8:
                row = sub[y].astype(np.uint8)
            else:
                bits = (
                    (sub[y][:, None] >> np.arange(depth - 1, -1, -1)) & 1
                ).astype(np.uint8).reshape(-1)
                row = np.packbits(bits)
            f = fy % 5
            fy += 1
            raw.append(f)
            raw += _filter_row(row, prior, f, 1)
            prior = row
    ihdr = struct.pack(">IIBBBBB", w, h, depth, 3, 0, 0, 1)
    out = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
    out += _chunk(b"PLTE", pal.astype(np.uint8).tobytes())
    if trns is not None:
        out += _chunk(b"tRNS", trns)
    out += _chunk(b"IDAT", zlib.compress(bytes(raw)))
    return out + _chunk(b"IEND", b"")


def rng_pixels(seed, h, w, c):
    return np.random.default_rng(seed).integers(
        0, 256, size=(h, w, c), dtype=np.uint8
    )


def test_every_filter_type_round_trips():
    px = rng_pixels(1, 10, 7, 3)
    for f in range(5):
        got = decode_png_pixels(encode_png(px, filters=[f] * 10))
        np.testing.assert_array_equal(got, px, err_msg=f"filter {f}")


def test_mixed_filters_all_channel_counts():
    for c in (1, 2, 3, 4):
        px = rng_pixels(c, 13, 9, c)
        got = decode_png_pixels(encode_png(px))
        np.testing.assert_array_equal(got, px)
        # header path agrees with the pixel path
        fmt, w, h = parse_image_dims(encode_png(px))
        assert (fmt, w, h) == ("png", 9, 13)


@settings(max_examples=40, deadline=None)
@given(
    seed=st.integers(0, 2**31),
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    c=st.sampled_from([1, 2, 3, 4]),
    data=st.data(),
)
def test_fuzz_round_trip(seed, h, w, c, data):
    filters = data.draw(
        st.lists(st.integers(0, 4), min_size=h, max_size=h)
    )
    px = rng_pixels(seed, h, w, c)
    got = decode_png_pixels(encode_png(px, filters=filters))
    np.testing.assert_array_equal(got, px)


def test_palette_roundtrip_all_depths_and_filters():
    """Palette indices at every legal sub-16 depth, through every
    filter type, must come back as the exact PLTE RGB triples."""
    rng = np.random.default_rng(7)
    for depth in (1, 2, 4, 8):
        n = 2**depth
        pal = rng.integers(0, 256, size=(n, 3), dtype=np.uint8)
        idx = rng.integers(0, n, size=(11, 6))
        for f in range(5):
            png = encode_palette_png(idx, pal, depth=depth,
                                     filters=[f] * 11)
            got = decode_png_pixels(png)
            np.testing.assert_array_equal(
                got, pal[idx], err_msg=f"depth {depth} filter {f}"
            )
        # mixed filters + header path
        png = encode_palette_png(idx, pal, depth=depth)
        np.testing.assert_array_equal(decode_png_pixels(png), pal[idx])
        assert parse_image_dims(png) == ("png", 6, 11)


def test_palette_trns_alpha():
    """tRNS promotes the output to RGBA; entries past the tRNS table
    default to opaque 255 (spec §11.3.2)."""
    pal = np.array(
        [[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 9, 9]], np.uint8
    )
    idx = np.array([[0, 1], [2, 3]])
    png = encode_palette_png(idx, pal, depth=2, trns=bytes([10, 200]))
    got = decode_png_pixels(png)
    assert got.shape == (2, 2, 4)
    np.testing.assert_array_equal(got[..., :3], pal[idx])
    np.testing.assert_array_equal(
        got[..., 3], np.array([[10, 200], [255, 255]], np.uint8)
    )


def test_palette_strict_raises():
    pal = np.array([[1, 2, 3], [4, 5, 6]], np.uint8)
    # out-of-range index: 2-entry palette, index 3 at depth 2
    bad_idx = np.array([[0, 3]])
    with pytest.raises(NotImplementedError, match="out of range"):
        decode_png_pixels(encode_palette_png(bad_idx, pal, depth=2))
    # tRNS longer than PLTE
    ok_idx = np.array([[0, 1]])
    with pytest.raises(NotImplementedError, match="tRNS longer"):
        decode_png_pixels(
            encode_palette_png(ok_idx, pal, depth=2, trns=b"\x01" * 3)
        )


def test_adam7_roundtrips_all_channel_counts():
    """Adam7 deinterlace == the straight pixels, for every channel
    count, at sizes exercising empty passes (w or h < 5 kills pass 2
    or 3) and odd geometry; filters cycle across pass scanlines."""
    for seed, (h, w) in enumerate(
        [(1, 1), (3, 4), (4, 3), (8, 8), (13, 21), (16, 2)]
    ):
        for c in (1, 2, 3, 4):
            px = rng_pixels(100 + seed * 4 + c, h, w, c)
            got = decode_png_pixels(encode_png_adam7(px))
            np.testing.assert_array_equal(
                got, px, err_msg=f"{h}x{w}x{c}"
            )


def test_adam7_matches_sequential_decode():
    px = rng_pixels(42, 19, 27, 3)
    seq = decode_png_pixels(encode_png(px))
    inter = decode_png_pixels(encode_png_adam7(px))
    np.testing.assert_array_equal(seq, inter)


def test_adam7_palette_roundtrips():
    rng = np.random.default_rng(7)
    pal = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    for depth in (1, 2, 4, 8):
        n = min(16, 1 << depth)
        idx = rng.integers(0, n, size=(11, 13))
        got = decode_png_pixels(
            encode_palette_png_adam7(idx, pal[:n], depth=depth)
        )
        np.testing.assert_array_equal(
            got, pal[:n][idx], err_msg=f"depth {depth}"
        )
    # tRNS alpha through the interlaced path
    idx = rng.integers(0, 4, size=(6, 9))
    got = decode_png_pixels(
        encode_palette_png_adam7(idx, pal[:4], depth=2, trns=b"\x00\x80")
    )
    assert got.shape == (6, 9, 4)
    alpha = np.array([0, 0x80, 255, 255], dtype=np.uint8)
    np.testing.assert_array_equal(got[..., 3], alpha[idx])


def test_adam7_truncated_stream_raises():
    px = rng_pixels(9, 8, 8, 3)
    data = encode_png_adam7(px)
    short = zlib.compress(zlib.decompress(_idat_of(data))[:-7])
    rebuilt = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 8, 8, 8, 2, 0, 0, 1))
        + _chunk(b"IDAT", short)
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError, match="Adam7 IDAT stream"):
        decode_png_pixels(rebuilt)


def test_strict_raises_on_unsupported():
    px = rng_pixels(3, 4, 4, 3)
    with pytest.raises(NotImplementedError, match="not a PNG"):
        decode_png_pixels(b"GIF89a" + b"\x00" * 32)
    # unknown interlace METHOD still raises (Adam7 itself decodes now)
    with pytest.raises(NotImplementedError, match="interlace method"):
        decode_png_pixels(encode_png(px, interlace=2))
    # 4-bit non-palette grayscale is legal PNG but outside our contract
    ihdr4 = struct.pack(">IIBBBBB", 4, 4, 4, 0, 0, 0, 0)
    g4 = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr4)
        + _chunk(b"IDAT", zlib.compress(b"\x00" * 12))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError, match="depth=4"):
        decode_png_pixels(g4)
    # palette PNG (color type 3) with NO PLTE chunk is invalid
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 3, 0, 0, 0)
    pal = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"\x00" * 20))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError, match="without a valid PLTE"):
        decode_png_pixels(pal)
    # truncated IDAT stream
    bad = encode_png(px)
    short = zlib.compress(zlib.decompress(_idat_of(bad))[:-5])
    rebuilt = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0))
        + _chunk(b"IDAT", short)
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError, match="IDAT stream length"):
        decode_png_pixels(rebuilt)


def _idat_of(png: bytes) -> bytes:
    i = 8
    while i + 8 <= len(png):
        (ln,) = struct.unpack(">I", png[i : i + 4])
        if png[i + 4 : i + 8] == b"IDAT":
            return png[i + 8 : i + 8 + ln]
        i += 12 + ln
    raise AssertionError("no IDAT")


def test_png_pixel_stats_spark_known_images(spark):
    """Registry-adjacent: known images through the mapInPandas kernel
    — a constant-color RGBA image's channel means are exactly the
    color; a gradient image's mean is the closed-form average."""
    const = np.zeros((8, 6, 4), dtype=np.uint8)
    const[..., 0], const[..., 1], const[..., 2], const[..., 3] = (
        200, 100, 50, 255,
    )
    grad = np.tile(
        np.arange(16, dtype=np.uint8).reshape(1, 16, 1), (4, 1, 1)
    )  # gray 0..15 per row → mean 7.5
    rows = [
        (1, bytearray(encode_png(const))),
        (2, bytearray(encode_png(grad))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r["doc_id"]: r
        for r in png_pixel_stats(df).collect()
    }
    assert (got[1]["width"], got[1]["height"], got[1]["channels"]) == (6, 8, 4)
    assert got[1]["mean_channels"] == [200.0, 100.0, 50.0, 255.0]
    assert got[1]["n_pixels"] == 48
    assert (got[2]["width"], got[2]["height"], got[2]["channels"]) == (16, 4, 1)
    assert got[2]["mean_channels"] == [7.5]

    # strict contract: a non-PNG payload in the batch fails the job
    bad = spark.createDataFrame(
        [(3, bytearray(b"plain text bytes"))], "doc_id long, payload binary"
    )
    with pytest.raises(Exception, match="not a PNG"):
        png_pixel_stats(bad).collect()


def rng_pixels16(seed, h, w, c):
    return np.random.RandomState(seed).randint(
        0, 65536, size=(h, w, c)
    ).astype(np.uint16)


def test_16bit_every_filter_and_channel_count():
    """16-bit round trip: filter unit = channels*2 bytes, samples
    recombine big-endian — every filter type x every color type."""
    for c in (1, 2, 3, 4):
        for f in range(5):
            px = rng_pixels16(10 * c + f, 7, 5, c)
            got = decode_png_pixels(
                encode_png(px, filters=[f] * 7, depth=16)
            )
            assert got.dtype == np.uint16
            assert np.array_equal(got, px)


def test_16bit_adam7_matches_sequential():
    for c in (1, 3, 4):
        px = rng_pixels16(77 + c, 13, 9, c)
        seq = decode_png_pixels(encode_png(px, depth=16))
        inter = decode_png_pixels(encode_png_adam7(px, depth=16))
        assert np.array_equal(seq, inter)
        assert np.array_equal(seq, px)


@settings(max_examples=20, deadline=None)
@given(
    seed=st.integers(0, 10_000),
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    c=st.sampled_from([1, 2, 3, 4]),
    interlace=st.booleans(),
)
def test_16bit_fuzz_round_trip(seed, h, w, c, interlace):
    px = rng_pixels16(seed, h, w, c)
    png = (
        encode_png_adam7(px, depth=16)
        if interlace
        else encode_png(px, depth=16)
    )
    assert np.array_equal(decode_png_pixels(png), px)
