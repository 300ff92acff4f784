"""Frame-level audio features (RMS / ZCR / spectral centroid) against
closed-form expectations on synthesized signals and an independent
per-frame numpy replica, reusing test_wav_decode's in-test encoder."""

from __future__ import annotations

import numpy as np
import pytest

from lmo_data_catalog_spark.operators.multimodal import audio_frame_features

from .test_wav_decode import encode_wav


def _run(spark, payloads, **kw):
    df = spark.createDataFrame(payloads, "doc_id long, payload binary")
    return audio_frame_features(df, **kw).collect()


def test_pure_tone_closed_form(spark):
    """A bin-aligned 1 kHz tone at 16 kHz in 25 ms frames: 25 exact
    cycles per frame, so RMS = amp/sqrt(2) exactly, the centroid sits
    exactly on 1000 Hz (zero leakage), and ZCR = 2 crossings/cycle."""
    rate, amp, freq = 16000, 0.5, 1000.0
    t = np.arange(rate) / rate  # 1 s
    x = amp * np.sin(2 * np.pi * freq * t + 0.3)  # offset avoids exact 0s
    wav = encode_wav(x[:, None], rate=rate, bits=32, tag=3)
    rows = _run(spark, [(1, wav)], frame_ms=25, hop_ms=25)

    L = rate * 25 // 1000  # 400
    assert len(rows) == len(x) // L
    for r in rows:
        assert r["rms"] == pytest.approx(amp / np.sqrt(2), abs=1e-6)
        assert r["spectral_centroid_hz"] == pytest.approx(freq, abs=1e-3)
        # 25 cycles -> 50 sign flips, +-1 at the frame edges (zcr is
        # rounded to 6 dp by the operator, hence the round() back)
        assert abs(round(r["zcr"] * (L - 1)) - 50) <= 1


def test_dc_and_silence(spark):
    rate = 8000
    dc = np.full(rate // 2, 0.25)
    silence = np.zeros(rate // 2)
    rows = _run(
        spark,
        [(1, encode_wav(dc[:, None], rate=rate, bits=32, tag=3)),
         (2, encode_wav(silence[:, None], rate=rate, bits=32, tag=3))],
        frame_ms=20,
        hop_ms=20,
    )
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for r in by_doc[1]:
        assert r["rms"] == pytest.approx(0.25, abs=1e-6)
        assert r["zcr"] == 0.0
        # all energy in bin 0 -> centroid at 0 Hz
        assert r["spectral_centroid_hz"] == 0.0
    for r in by_doc[2]:
        assert r["rms"] == 0.0
        assert r["zcr"] == 0.0
        assert r["spectral_centroid_hz"] == 0.0  # defined-zero, not NaN


def test_stereo_downmix_cancellation(spark):
    """L = sine, R = -sine: the mono mix is identically zero, so every
    feature must read as silence — pins the downmix-before-framing
    order."""
    rate = 8000
    t = np.arange(rate // 4) / rate
    s = 0.4 * np.sin(2 * np.pi * 440 * t)
    stereo = np.stack([s, -s], axis=1)
    wav = encode_wav(stereo, rate=rate, bits=32, tag=3)
    rows = _run(spark, [(7, wav)], frame_ms=25, hop_ms=10)
    assert rows
    for r in rows:
        assert r["rms"] == 0.0
        assert r["spectral_centroid_hz"] == 0.0


def test_hop_framing_geometry_and_timestamps(spark):
    rate = 8000
    x = np.random.RandomState(0).uniform(-1, 1, rate)  # 1 s noise
    wav = encode_wav(x[:, None], rate=rate, bits=32, tag=3)
    rows = _run(spark, [(3, wav)], frame_ms=25, hop_ms=10)
    L, H = rate * 25 // 1000, rate * 10 // 1000
    nf = (len(x) - L) // H + 1
    assert len(rows) == nf
    assert sorted(r["frame_idx"] for r in rows) == list(range(nf))
    for r in rows:
        assert r["n_frames"] == nf
        assert r["t_ms"] == r["frame_idx"] * H * 1000 // rate


def test_matches_independent_numpy_replica(spark):
    """Full-feature cross-check on noise: straightforward per-frame
    loop (no stride tricks, no batched FFT) must agree within the
    operator's 6-dp output rounding."""
    rate = 8000
    rng = np.random.RandomState(42)
    x = rng.uniform(-1, 1, 3 * rate // 2)
    wav = encode_wav(x[:, None], rate=rate, bits=32, tag=3)
    rows = {r["frame_idx"]: r for r in _run(spark, [(5, wav)],
                                            frame_ms=20, hop_ms=15)}

    # the encoder quantizes to float32; replicate the decoded signal
    mono = x.astype(np.float32).astype(np.float64)
    L, H = rate * 20 // 1000, rate * 15 // 1000
    nf = (len(mono) - L) // H + 1
    assert len(rows) == nf
    for i in range(nf):
        fr = mono[i * H : i * H + L]
        rms = float(np.sqrt((fr**2).mean()))
        zcr = float(((fr[1:] * fr[:-1]) < 0).sum() / (L - 1))
        mag = np.abs(np.fft.rfft(fr))
        freqs = np.fft.rfftfreq(L, d=1.0 / rate)
        cent = float((mag * freqs).sum() / mag.sum()) if mag.sum() else 0.0
        r = rows[i]
        assert r["rms"] == pytest.approx(rms, abs=1e-6)
        assert r["zcr"] == pytest.approx(zcr, abs=1e-6)
        assert r["spectral_centroid_hz"] == pytest.approx(cent, abs=1e-5)


def test_short_clip_yields_no_frames(spark):
    rate = 8000
    x = np.zeros(10)
    wav = encode_wav(x[:, None], rate=rate, bits=32, tag=3)
    assert _run(spark, [(9, wav)], frame_ms=25, hop_ms=10) == []


def test_invalid_args_raise(spark):
    df = spark.createDataFrame([(1, b"x")], "doc_id long, payload binary")
    with pytest.raises(ValueError):
        audio_frame_features(df, frame_ms=0)


def test_resample_identity_and_halving():
    from lmo_data_catalog_spark.operators.multimodal import resample_pcm

    x = np.sin(2 * np.pi * 440 * np.arange(8000) / 8000)
    same = resample_pcm(x, 8000, 8000)
    assert np.array_equal(same, x)
    half = resample_pcm(x, 8000, 4000)
    assert len(half) == 4000
    # exact 2:1 decimation positions land ON input samples -> equality
    assert np.allclose(half, x[::2])


def test_resample_preserves_tone_rms_and_freq(spark):
    """8 kHz 440 Hz tone resampled to 16 kHz keeps its RMS (to linear-
    interp error) and its spectral centroid stays at 440 Hz when the
    resampled clip goes back through audio_frame_features."""
    from lmo_data_catalog_spark.operators.multimodal import (
        audio_resample_stats,
        resample_pcm,
    )

    rate = 8000
    t = np.arange(rate) / rate
    x = 0.5 * np.sin(2 * np.pi * 440 * t + 0.1)
    wav = encode_wav(x[:, None], rate=rate, bits=32, tag=3)
    df = spark.createDataFrame([(1, wav)], "doc_id long, payload binary")
    r = audio_resample_stats(df, rate_out=16000).collect()[0]
    assert (r["rate_in"], r["rate_out"]) == (8000, 16000)
    assert r["n_out"] == 16000
    # 2x linear upsample of a tone: every second output sample is a
    # midpoint, attenuated by cos(pi*f/rate_in) = cos(pi*440/8000)
    # ~= 0.985 -> expected RMS ratio sqrt((1 + 0.985^2)/2) ~= 0.9926.
    # Assert the KNOWN interpolation error, not perfection.
    expect_ratio = np.sqrt((1 + np.cos(np.pi * 440 / 8000) ** 2) / 2)
    assert r["rms_out"] / r["rms_in"] == pytest.approx(
        expect_ratio, abs=2e-3
    )

    # 2x linear upsampling is not alias-free: it leaves an IMAGE at
    # rate_in - f = 7560 Hz with relative magnitude (1-c)/2 against
    # the tone's (1+c)/2, c = cos(pi*f/rate_in) — both bin-aligned in
    # a 25 ms frame (11 and 189 cycles). The magnitude-weighted
    # centroid therefore sits at the two-component mean, ~493 Hz, NOT
    # 440 — assert the analytic prediction, pinning that the operator
    # measures the real (slightly dirty) spectrum.
    c = np.cos(np.pi * 440 / 8000)
    m1, m2 = (1 + c) / 2, (1 - c) / 2
    predicted = (m1 * 440.0 + m2 * (8000.0 - 440.0)) / (m1 + m2)
    up = resample_pcm(x.astype(np.float32).astype(np.float64), 8000, 16000)
    wav2 = encode_wav(up[:, None], rate=16000, bits=32, tag=3)
    rows = _run(spark, [(2, wav2)], frame_ms=25, hop_ms=25)
    last = max(fr["frame_idx"] for fr in rows)
    for fr in rows:
        if fr["frame_idx"] == last:
            # the tail-clamped final output sample breaks the last
            # frame's bin alignment — leakage moves its centroid
            continue
        assert fr["spectral_centroid_hz"] == pytest.approx(
            predicted, abs=2.0
        )


def test_resample_invalid_rate_raises():
    from lmo_data_catalog_spark.operators.multimodal import resample_pcm

    with pytest.raises(ValueError):
        resample_pcm(np.zeros(10), 0, 8000)


# ------------------------------------------------ log-mel (r12)


def test_mel_filter_weights_shape_and_partition():
    """Triangle sanity: non-negative, each filter peaks at 1 at its
    center bin region, adjacent filters overlap, and every interior
    frequency is covered by at least one filter."""
    from lmo_data_catalog_spark.operators.multimodal import (
        mel_filter_weights,
    )

    W = np.array(mel_filter_weights(201, 16, 16000))
    assert W.shape == (16, 201)
    assert (W >= 0).all() and W.max() <= 1.0 + 1e-12
    assert (W.sum(axis=1) > 0).all()  # no empty filter
    covered = W.sum(axis=0)
    # interior bins between the first and last centers are covered
    inner = covered[5:170]
    assert (inner > 0).all()


def test_pure_tone_lands_in_correct_mel_band(spark):
    """THE physics pin (r11 ask #6): a pure tone's argmax log-mel
    band must be the band whose triangle contains the tone — swept
    over low/mid/high frequencies so the mel warp itself is tested,
    not just bin 0."""
    from lmo_data_catalog_spark.operators.multimodal import (
        audio_logmel_features,
        mel_filter_weights,
    )

    rate, n_mels = 16000, 16
    L = rate * 25 // 1000  # 400-sample frames
    n_bins = L // 2 + 1
    W = np.array(mel_filter_weights(n_bins, n_mels, rate))
    t = np.arange(rate // 2) / rate
    payloads = []
    freqs = [320.0, 1000.0, 2400.0, 5200.0, 7000.0]
    for i, f in enumerate(freqs):
        x = 0.5 * np.sin(2 * np.pi * f * t + 0.17)
        payloads.append(
            (i, encode_wav(x[:, None], rate=rate, bits=32, tag=3))
        )
    df = spark.createDataFrame(payloads, "doc_id long, payload binary")
    rows = audio_logmel_features(
        df, frame_ms=25, hop_ms=25, n_mels=n_mels
    ).collect()
    assert rows
    for r in rows:
        f = freqs[r["doc_id"]]
        # expected band: argmax of the filter response at the tone's
        # exact bin (bin-aligned tones: f * L / rate is an integer
        # only for some; use the nearest bin's weights)
        k = round(f * L / rate)
        want = int(W[:, k].argmax())
        got = int(np.argmax(r["log_mel"]))
        assert got == want, (f, got, want)
        assert len(r["log_mel"]) == n_mels


def test_logmel_matches_independent_numpy_replica(spark):
    """Full-pipeline value check against an in-test replica (window
    view + rFFT power + mel matmul + log floor + 6dp round)."""
    from lmo_data_catalog_spark.operators.multimodal import (
        audio_logmel_features,
        mel_filter_weights,
    )

    rate, n_mels, frame_ms, hop_ms = 8000, 8, 20, 10
    rng = np.random.RandomState(11)
    x = rng.uniform(-0.8, 0.8, size=rate // 2)
    wav = encode_wav(x[:, None], rate=rate, bits=32, tag=3)
    df = spark.createDataFrame([(7, wav)], "doc_id long, payload binary")
    rows = audio_logmel_features(
        df, frame_ms=frame_ms, hop_ms=hop_ms, n_mels=n_mels
    ).collect()

    from lmo_data_catalog_spark.operators.multimodal import decode_wav_pcm

    _, samples = decode_wav_pcm(wav)
    mono = samples.mean(axis=1)
    L, H = rate * frame_ms // 1000, rate * hop_ms // 1000
    nf = (len(mono) - L) // H + 1
    idx = np.arange(nf)[:, None] * H + np.arange(L)[None, :]
    power = np.abs(np.fft.rfft(mono[idx], axis=1)) ** 2
    W = np.array(mel_filter_weights(L // 2 + 1, n_mels, rate))
    want = np.log(power @ W.T + 1e-10)
    got = {r["frame_idx"]: r["log_mel"] for r in rows}
    assert len(got) == nf
    for i in range(nf):
        assert got[i] == [round(float(v), 6) for v in want[i]]


def test_mel_weights_odd_frame_length(spark):
    """r12 advisor finding: inferring L=(n_bins-1)*2 is wrong for odd
    frame lengths (11025 Hz x 25 ms = 275 samples -> 138 bins ->
    inferred 274), shifting every bin frequency. mel_filter_weights
    must take the true L, and the logmel kernel must pass it."""
    from lmo_data_catalog_spark.operators.multimodal import (
        audio_logmel_features,
        decode_wav_pcm,
        mel_filter_weights,
    )

    rate, n_mels = 11025, 8
    L = rate * 25 // 1000  # 275 — odd
    assert L % 2 == 1
    n_bins = L // 2 + 1

    # explicit L yields bin k at k*rate/L; the old inference (L=274)
    # must produce a DIFFERENT matrix (the shift the advisor flagged)
    W_true = np.array(mel_filter_weights(n_bins, n_mels, rate, frame_len=L))
    # a frame_len inconsistent with n_bins is rejected (L-1=274 also
    # yields 138 bins, so it is legitimately accepted; L+2 is not)
    with pytest.raises(ValueError, match="rFFT bins"):
        mel_filter_weights(n_bins, n_mels, rate, frame_len=L + 2)
    # the old inference built the L-1 matrix for odd L: (n_bins-1)*2
    # = 274, silently shifting every bin frequency
    W_shift = np.array(mel_filter_weights(n_bins, n_mels, rate))
    assert not np.array_equal(W_true, W_shift)

    # end-to-end: the kernel's output must match a replica built with
    # the TRUE frame length
    rng = np.random.RandomState(3)
    x = rng.uniform(-0.5, 0.5, size=rate // 4)
    wav = encode_wav(x[:, None], rate=rate, bits=32, tag=3)
    df = spark.createDataFrame([(1, wav)], "doc_id long, payload binary")
    rows = audio_logmel_features(
        df, frame_ms=25, hop_ms=25, n_mels=n_mels
    ).collect()
    _, samples = decode_wav_pcm(wav)
    mono = samples.mean(axis=1)
    H = rate * 25 // 1000
    nf = (len(mono) - L) // H + 1
    idx = np.arange(nf)[:, None] * H + np.arange(L)[None, :]
    power = np.abs(np.fft.rfft(mono[idx], axis=1)) ** 2
    want = np.log(power @ W_true.T + 1e-10)
    got = {r["frame_idx"]: r["log_mel"] for r in rows}
    assert len(got) == nf
    for i in range(nf):
        assert got[i] == [round(float(v), 6) for v in want[i]]
