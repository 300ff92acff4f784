"""Adversarial payloads for the stdlib image-header parser.

parse_image_dims feeds an Arrow mapInPandas kernel; a single malformed
payload raising struct.error would kill the whole batch task at scale.
Contract under fuzz: valid containers parse to true dims; everything
malformed returns None; NOTHING raises. Pure-python function, so these
run without a SparkSession.
"""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lmo_data_catalog_spark.operators.multimodal import (
    PNG_SIGNATURE,
    parse_image_dims,
)


def png(w: int, h: int, ihdr_first: bool = True) -> bytes:
    ihdr = struct.pack(">I", 13) + b"IHDR" + struct.pack(">II", w, h) + b"\x08\x02\x00\x00\x00" + b"\x00" * 4
    if ihdr_first:
        return PNG_SIGNATURE + ihdr
    # spec violation: a different chunk before IHDR
    junk = struct.pack(">I", 4) + b"junk" + b"\x00" * 8
    return PNG_SIGNATURE + junk + ihdr


def jpeg(w: int, h: int, *, extra_segments: int = 1) -> bytes:
    out = b"\xff\xd8"
    for i in range(extra_segments):
        seg = b"fuzzdata" * (i + 1)
        out += b"\xff\xe0" + struct.pack(">H", len(seg) + 2) + seg
    sof = struct.pack(">B", 8) + struct.pack(">HH", h, w) + b"\x03"
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    return out + b"\xff\xd9"


def gif(w: int, h: int) -> bytes:
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00\x00"


# ------------------------------------------------------------ valid parses


@pytest.mark.parametrize(
    "payload,want",
    [
        (png(640, 480), ("png", 640, 480)),
        (gif(13, 7), ("gif", 13, 7)),
        (jpeg(1920, 1080), ("jpeg", 1920, 1080)),
        (jpeg(2, 3, extra_segments=4), ("jpeg", 2, 3)),
    ],
)
def test_valid_containers(payload, want):
    assert parse_image_dims(payload) == want


# ------------------------------------------------------- crafted malformed


CRAFTED = [
    b"",
    b"\xff",
    b"\xff\xd8",  # bare SOI, nothing else
    b"\xff\xd8\xff",  # marker byte truncated
    b"\xff\xd8\xff\xc0",  # SOF with no length bytes
    b"\xff\xd8\xff\xc0\x00",  # SOF length truncated to one byte
    b"\xff\xd8\xff\xc0\x00\x11\x08\x00",  # SOF dims truncated
    b"\xff\xd8\xff\xe0\x00\x00",  # zero-length segment (len<2 is invalid)
    b"\xff\xd8\xff\xe0\xff\xff" + b"x" * 4,  # segment length past EOF
    b"\xff\xd8" + b"\x00" * 32,  # SOI then non-marker garbage
    b"\xff\xd8" + b"\xff\xd0" * 50,  # standalone-marker spam, no SOF
    PNG_SIGNATURE,  # signature only
    PNG_SIGNATURE + b"\x00" * 8,  # too short for IHDR
    png(9, 9, ihdr_first=False),  # IHDR not first chunk → reject
    b"GIF89a",  # GIF header truncated before dims
    b"GIF89a\x05",  # one dim byte
    b"GIF00a" + b"\x00" * 10,  # bad GIF version
    b"\x89PNH\r\n\x1a\n" + b"\x00" * 20,  # corrupted PNG signature
]


@pytest.mark.parametrize("payload", CRAFTED, ids=range(len(CRAFTED)))
def test_crafted_malformed_return_none(payload):
    assert parse_image_dims(payload) is None


# ------------------------------------------------------------- hypothesis


@settings(max_examples=500, deadline=None)
@given(st.binary(max_size=200))
def test_random_bytes_never_raise(payload):
    r = parse_image_dims(payload)
    assert r is None or (
        isinstance(r, tuple) and len(r) == 3 and r[0] in ("png", "gif", "jpeg")
    )


@settings(max_examples=300, deadline=None)
@given(
    st.sampled_from([png(100, 50), gif(100, 50), jpeg(100, 50)]),
    st.integers(min_value=0, max_value=60),
)
def test_truncations_never_raise(payload, cut):
    """Every prefix of a valid container parses or returns None."""
    r = parse_image_dims(payload[: len(payload) - cut])
    assert r is None or r[1:] == (100, 50)


@settings(max_examples=300, deadline=None)
@given(
    st.sampled_from([png(100, 50), jpeg(100, 50)]),
    st.integers(min_value=0, max_value=40),
    st.integers(min_value=0, max_value=255),
)
def test_single_byte_corruptions_never_raise(payload, pos, val):
    if pos >= len(payload):
        return
    mutated = payload[:pos] + bytes([val]) + payload[pos + 1 :]
    parse_image_dims(mutated)  # must not raise; value unconstrained
