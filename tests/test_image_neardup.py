"""Perceptual image near-dup (multimodal.dhash64 / image_near_pairs).

The dedup key must be (1) deterministic bit-for-bit (all-integer kernel),
(2) stable under the perturbations near-dups actually exhibit, and
(3) joinable by the existing SimHash chunk-band machinery. Reference
analog: per-read fingerprinting for duplicate detection, lifted from text
shingles to pixels (LAION-style image dedup).
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from longqc_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    decode_bmp,
    dhash64,
    encode_bmp,
    image_dhash,
    image_near_pairs,
    synth_media_table,
)


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")


def test_dhash_hand_fixture():
    # luma strictly increasing left-to-right → every horizontal gradient
    # bit is 1 → all-64-bits hash = int64 -1
    img = np.zeros((8, 9, 3), dtype=np.uint8)
    img[:, :, :] = (np.arange(9) * 20).astype(np.uint8)[None, :, None]
    assert dhash64(img) == -1
    # decreasing → all bits 0
    assert dhash64(img[:, ::-1]) == 0


def test_dhash_deterministic_and_codec_stable():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(30, 44, 3), dtype=np.uint8)
    h = dhash64(img)
    assert dhash64(img) == h
    assert dhash64(decode_bmp(encode_bmp(img))) == h


def test_dhash_perturbation_vs_unrelated():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(32, 48, 3), dtype=np.uint8)
    h = dhash64(img)
    # per-pixel +-2 brightness jitter: a near-dup stays within a few bits
    noisy = np.clip(
        img.astype(np.int64) + rng.integers(-2, 3, size=img.shape), 0, 255
    ).astype(np.uint8)
    assert _ham(h, dhash64(noisy)) <= 6
    # an unrelated image differs in ~32 bits
    other = rng.integers(0, 256, size=(32, 48, 3), dtype=np.uint8)
    assert _ham(h, dhash64(other)) >= 16


def test_spark_matches_direct_numpy(spark):
    media = synth_media_table(spark, n=60).filter(F.col("kind") == "image")
    got = {
        r.media_id: r.dhash for r in image_dhash(media).collect()
    }
    for row in media.collect():
        assert got[row.media_id] == dhash64(decode_bmp(bytes(row.payload)))


def test_image_near_pairs_planted(spark):
    rng = np.random.default_rng(17)
    rows = []
    base = rng.integers(0, 256, size=(24, 36, 3), dtype=np.uint8)
    rows.append((0, "image", encode_bmp(base), "image/bmp"))
    # exact byte dup
    rows.append((1, "image", encode_bmp(base), "image/bmp"))
    # near dup: small jitter
    jit = np.clip(
        base.astype(np.int64) + rng.integers(-2, 3, size=base.shape), 0, 255
    ).astype(np.uint8)
    rows.append((2, "image", encode_bmp(jit), "image/bmp"))
    # unrelated
    for i in range(3, 8):
        rows.append(
            (
                i,
                "image",
                encode_bmp(
                    rng.integers(0, 256, size=(24, 36, 3), dtype=np.uint8)
                ),
                "image/bmp",
            )
        )
    media = spark.createDataFrame(
        pd.DataFrame(
            rows, columns=["media_id", "kind", "payload", "declared_mime"]
        ),
        schema=MEDIA_SCHEMA,
    )
    pairs = {
        (r.key_a, r.key_b): r.hamming
        for r in image_near_pairs(media, max_hamming=6, n_chunks=8).collect()
    }
    assert pairs[(0, 1)] == 0  # exact dup at hamming 0
    assert (0, 2) in pairs and pairs[(0, 2)] <= 6
    assert (1, 2) in pairs
    # no unrelated pair sneaks in
    assert all(a <= 2 and b <= 2 for a, b in pairs)


def test_non_bmp_raises_at_codec_boundary(spark):
    media = spark.createDataFrame(
        pd.DataFrame(
            [(0, "image", b"\x89PNG....", "image/png")],
            columns=["media_id", "kind", "payload", "declared_mime"],
        ),
        schema=MEDIA_SCHEMA,
    )
    with pytest.raises(Exception, match="BMP"):
        image_dhash(media).collect()
