"""Perceptual audio near-dup (multimodal.afp64 / audio_near_pairs).

afp64 is the Haitsma-Kalker time-frequency double-difference sign
fingerprint; these tests pin its three load-bearing properties — exact
gain invariance (the double difference cancels amplitude), robustness to
light additive noise, and separation on unrelated broadband material —
plus the Spark plumbing (decode-batch equality, planted-pair recall
through the chunk-band join).
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from longqc_spark.operators.multimodal import (
    afp64,
    audio_fingerprint,
    audio_near_pairs,
    decode_wav,
    encode_wav,
)


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")


def _clip(seed: int, n: int = 4000) -> np.ndarray:
    """Broadband structured audio: AM-modulated multi-tone (the
    fingerprint's design target — real speech/music has temporal
    envelope structure; a bare stationary tone is the documented weak
    case)."""
    r = np.random.default_rng(seed)
    t = np.arange(n)
    y = np.zeros(n)
    for _ in range(3):
        f = r.uniform(100, 3000)
        fm = r.uniform(0.5, 4)
        y += (
            r.uniform(1000, 3000)
            * np.sin(2 * np.pi * f * t / 16000)
            * (1 + np.sin(2 * np.pi * fm * t / 16000))
        )
    return y


def test_gain_invariance():
    # exact on the signal itself (the double difference scales uniformly) …
    y = _clip(1)
    assert afp64(y * 0.5) == afp64(y)
    assert afp64(y * 0.125) == afp64(y)
    # … and within ~2 bits once a gain change is re-QUANTIZED to int16
    # (truncation noise), for any clip
    for s in range(12):
        q = _clip(s).astype(np.int16)
        assert _ham(afp64(q), afp64((q * 0.5).astype(np.int16))) <= 2


def test_noise_robust_vs_unrelated_separation():
    # 64-bit granularity makes additive-noise robustness STATISTICAL (the
    # published system matches many sub-fingerprints over a stream): the
    # median noisy-copy distance sits well inside the radius, and every
    # unrelated clip sits well outside it
    noisy_hams = []
    for s in range(20):
        y = _clip(s)
        rng = np.random.default_rng(s + 7)
        noisy_hams.append(
            _ham(
                afp64(y.astype(np.int16)),
                afp64((y + rng.normal(0, 30, len(y))).astype(np.int16)),
            )
        )
    h = afp64(_clip(1).astype(np.int16))
    hams = [_ham(h, afp64(_clip(s).astype(np.int16))) for s in range(2, 12)]
    # median noisy copy well inside the unrelated band (16+), even if the
    # tail can cross the default join radius at 64-bit granularity
    assert sorted(noisy_hams)[len(noisy_hams) // 2] <= 8
    assert min(hams) > 8


def test_codec_roundtrip_stable_and_degenerate():
    y = _clip(3).astype(np.int16)
    assert afp64(decode_wav(encode_wav(y))[0]) == afp64(y)
    assert afp64(np.zeros(4, dtype=np.int16)) == 0  # <32 samples


def test_spark_matches_direct_numpy(spark):
    rows = [
        (i, encode_wav(_clip(i).astype(np.int16))) for i in range(12)
    ]
    media = spark.createDataFrame(
        pd.DataFrame(rows, columns=["media_id", "payload"]),
        "media_id long, payload binary",
    )
    got = {r.media_id: r.afp for r in audio_fingerprint(media).collect()}
    for i, payload in rows:
        assert got[i] == afp64(decode_wav(payload)[0])


def test_audio_near_pairs_planted(spark):
    rng = np.random.default_rng(21)
    base = _clip(100)
    rows = [
        (0, encode_wav(base.astype(np.int16))),
        (1, encode_wav(base.astype(np.int16))),  # exact dup
        # half-gain re-encode of the DECODED int16 samples (exactly what a
        # transcoding pipeline emits) — integer halving, 0 fingerprint bits
        (2, encode_wav((base.astype(np.int16) * 0.5).astype(np.int16))),
    ]
    rows += [
        (i, encode_wav(_clip(i).astype(np.int16))) for i in range(3, 10)
    ]
    media = spark.createDataFrame(
        pd.DataFrame(rows, columns=["media_id", "payload"]),
        "media_id long, payload binary",
    )
    pairs = {
        (r.key_a, r.key_b): r.hamming
        for r in audio_near_pairs(media, max_hamming=6, n_chunks=8).collect()
    }
    assert pairs[(0, 1)] == 0
    assert pairs[(0, 2)] <= 2  # gain re-encode: quantization noise only
    assert all(a <= 2 and b <= 2 for a, b in pairs)
