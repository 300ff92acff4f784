"""Real WAV/PCM audio decode (operators/multimodal.py::decode_wav_pcm
/ wav_audio_stats): manual RIFF chunk walk against a test-local
stdlib WAV ENCODER, so every bit depth / format tag / channel count
is exercised against ground-truth samples with ANALYTIC statistics
(a sine of amplitude A has RMS A/sqrt(2); DC has RMS |A|), plus
hypothesis fuzz over geometry and payload corruption, Spark-side
stats, and the strict raises on compressed / truncated input.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lmo_data_catalog_spark.operators.multimodal import (
    decode_wav_pcm,
    wav_audio_stats,
)


def encode_wav(
    samples: np.ndarray,
    *,
    rate: int = 8000,
    bits: int = 16,
    tag: int = 1,
    extensible: bool = False,
    extra_chunk: bytes | None = None,
) -> bytes:
    """Test-local WAV encoder (the forward direction our decoder must
    invert): float samples in [-1, 1], shape (n_frames, channels) →
    RIFF bytes at the given PCM/float format."""
    n, ch = samples.shape
    flat = samples.reshape(-1)
    if tag == 1:
        if bits == 8:
            data = (np.clip(flat, -1, 1 - 1 / 128) * 128 + 128).astype(
                np.uint8
            ).tobytes()
        elif bits == 16:
            data = (np.clip(flat, -1, 1 - 1 / 32768) * 32768).astype(
                "<i2"
            ).tobytes()
        elif bits == 24:
            ints = (np.clip(flat, -1, 1 - 1 / 8388608) * 8388608).astype(
                np.int64
            ) & 0xFFFFFF
            b = np.empty((len(ints), 3), np.uint8)
            b[:, 0] = ints & 0xFF
            b[:, 1] = (ints >> 8) & 0xFF
            b[:, 2] = (ints >> 16) & 0xFF
            data = b.tobytes()
        elif bits == 32:
            data = (
                np.clip(flat, -1, 1 - 1 / 2147483648) * 2147483648
            ).astype("<i4").tobytes()
        else:
            raise AssertionError(bits)
    elif tag == 3:
        data = flat.astype("<f4" if bits == 32 else "<f8").tobytes()
    else:  # deliberately-unsupported tag, still structurally valid
        data = b"\x00" * (n * ch * max(bits // 8, 1))
    block = ch * bits // 8
    if extensible:
        fmt_body = struct.pack(
            "<HHIIHH", 0xFFFE, ch, rate, rate * block, block, bits
        ) + struct.pack("<HHI", 22, bits, 1) + struct.pack("<H", tag) + (
            b"\x00\x00\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71"
        )
    else:
        fmt_body = struct.pack(
            "<HHIIHH", tag, ch, rate, rate * block, block, bits
        )
    chunks = b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
    if len(fmt_body) & 1:
        chunks += b"\x00"
    if extra_chunk is not None:
        chunks += b"junk" + struct.pack("<I", len(extra_chunk)) + extra_chunk
        if len(extra_chunk) & 1:
            chunks += b"\x00"
    chunks += b"data" + struct.pack("<I", len(data)) + data
    if len(data) & 1:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def _sine(n, ch, amp=0.5, rate=8000, freq=440.0):
    t = np.arange(n) / rate
    cols = [amp * np.sin(2 * np.pi * freq * t + k) for k in range(ch)]
    return np.stack(cols, axis=1)


# ---------------------------------------------------------------- decode


@pytest.mark.parametrize("bits", [8, 16, 24, 32])
def test_integer_pcm_roundtrip_all_depths(bits):
    x = _sine(800, 2, amp=0.5)
    rate, got = decode_wav_pcm(encode_wav(x, bits=bits))
    assert rate == 8000 and got.shape == (800, 2)
    # quantization error is bounded by one step of the depth
    assert np.abs(got - x).max() <= 1.5 / 2 ** (bits - 1)


@pytest.mark.parametrize("bits", [32, 64])
def test_ieee_float_roundtrip(bits):
    x = _sine(500, 1, amp=0.9)
    rate, got = decode_wav_pcm(encode_wav(x, bits=bits, tag=3))
    tol = 1e-6 if bits == 32 else 0.0
    assert np.abs(got - x).max() <= tol


def test_sine_rms_is_amplitude_over_sqrt2():
    # whole periods so the discrete RMS matches the analytic A/sqrt(2)
    x = _sine(8000, 1, amp=0.6, freq=440.0)  # 440 whole periods
    _, got = decode_wav_pcm(encode_wav(x, bits=32, tag=3))
    rms = float(np.sqrt((got**2).mean()))
    assert rms == pytest.approx(0.6 / np.sqrt(2), abs=1e-6)


def test_channels_deinterleave_independently():
    n = 600
    x = np.stack(
        [np.full(n, 0.25), np.full(n, -0.5), np.zeros(n)], axis=1
    )
    _, got = decode_wav_pcm(encode_wav(x, bits=16))
    assert np.abs(got.mean(0) - [0.25, -0.5, 0.0]).max() < 1e-3


def test_extensible_format_resolves_subformat():
    x = _sine(400, 2)
    rate, got = decode_wav_pcm(encode_wav(x, bits=16, extensible=True))
    assert rate == 8000 and np.abs(got - x).max() <= 1.5 / 32768


def test_unknown_chunks_are_skipped_with_word_alignment():
    x = _sine(300, 1)
    # odd-length junk chunk exercises the pad-byte walk
    payload = encode_wav(x, bits=16, extra_chunk=b"\x01\x02\x03")
    _, got = decode_wav_pcm(payload)
    assert got.shape == (300, 1)


def test_compressed_format_raises():
    x = _sine(100, 1)
    with pytest.raises(NotImplementedError, match="format tag 2"):
        decode_wav_pcm(encode_wav(x, bits=4, tag=2))


def test_truncated_data_chunk_raises():
    payload = encode_wav(_sine(400, 2), bits=16)
    with pytest.raises(NotImplementedError, match="truncated"):
        decode_wav_pcm(payload[:-100])


def test_non_riff_raises():
    with pytest.raises(NotImplementedError, match="RIFF"):
        decode_wav_pcm(b"not audio at all")


@settings(max_examples=30, deadline=None)
@given(
    n=st.integers(1, 200),
    ch=st.integers(1, 4),
    bits=st.sampled_from([8, 16, 24, 32]),
    seed=st.integers(0, 2**31 - 1),
)
def test_fuzz_roundtrip_geometry(n, ch, bits, seed):
    rng = np.random.default_rng(seed)
    x = rng.uniform(-0.99, 0.99, size=(n, ch))
    rate, got = decode_wav_pcm(encode_wav(x, bits=bits))
    assert got.shape == (n, ch)
    assert np.abs(got - x).max() <= 1.5 / 2 ** (bits - 1)


@settings(max_examples=40, deadline=None)
@given(cut=st.integers(0, 60), data=st.binary(max_size=64))
def test_fuzz_corrupt_payloads_never_crash_only_raise(cut, data):
    payload = (encode_wav(_sine(50, 1), bits=16)[:cut] + data)
    try:
        decode_wav_pcm(payload)
    except NotImplementedError:
        pass  # the only acceptable failure mode


# ---------------------------------------------------------------- spark


def test_wav_audio_stats_spark_kernel(spark):
    import math

    clips = [
        (0, encode_wav(_sine(8000, 1, amp=0.6), bits=32, tag=3)),
        (1, encode_wav(_sine(4000, 2, amp=0.25), bits=16)),
        (2, encode_wav(np.zeros((100, 1)), bits=16)),
    ]
    df = spark.createDataFrame(clips, "doc_id long, payload binary")
    out = {
        r["doc_id"]: r
        for r in wav_audio_stats(df).collect()
    }
    assert out[0]["sample_rate"] == 8000
    assert out[0]["n_frames"] == 8000
    assert out[0]["duration_s"] == pytest.approx(1.0)
    assert out[0]["rms_channels"][0] == pytest.approx(
        0.6 / math.sqrt(2), abs=1e-5
    )
    assert out[0]["peak_channels"][0] == pytest.approx(0.6, abs=1e-5)
    assert out[1]["channels"] == 2
    assert len(out[1]["rms_channels"]) == 2
    assert out[2]["rms_channels"] == [0.0]
    assert out[2]["peak_channels"] == [0.0]


def test_wav_audio_stats_strict_raise_propagates(spark):
    df = spark.createDataFrame(
        [(0, b"definitely not audio")], "doc_id long, payload binary"
    )
    with pytest.raises(Exception, match="not a RIFF/WAVE"):
        wav_audio_stats(df).collect()
