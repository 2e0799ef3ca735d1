"""Perceptual video near-dup (multimodal.video_frame_dhashes /
video_near_pairs): frame-level dhash matching rolled up to a scene-level
pair decision (min_frames gate), through the shared chunk-band join.
"""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from longqc_spark.operators.multimodal import (
    decode_video_frames,
    dhash64,
    encode_video,
    sample_frame_indices,
    video_frame_dhashes,
    video_near_pairs,
)


def _video(seed: int, nf: int = 8, h: int = 24, w: int = 32) -> np.ndarray:
    return np.random.default_rng(seed).integers(
        0, 256, size=(nf, h, w, 3), dtype=np.uint8
    )


def _jitter(frames: np.ndarray, seed: int, amp: int = 2) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return np.clip(
        frames.astype(np.int64) + rng.integers(-amp, amp + 1, size=frames.shape),
        0,
        255,
    ).astype(np.uint8)


def _media(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["media_id", "payload"]),
        "media_id long, payload binary",
    )


def test_frame_dhashes_match_direct(spark):
    frames = _video(5)
    media = _media(spark, [(0, encode_video(frames))])
    got = {
        r.frame_idx: r.dhash
        for r in video_frame_dhashes(media, n_frames=4).collect()
    }
    for idx in sample_frame_indices(len(frames), 4):
        assert got[int(idx)] == dhash64(frames[idx])
    # zero-frame container: no rows, no crash
    empty = _media(spark, [(1, encode_video(_video(0, nf=0).reshape(0, 1, 1, 3)))])
    assert video_frame_dhashes(empty).count() == 0


def test_planted_copy_pairs_all_frames(spark):
    base = _video(10)
    rows = [
        (0, encode_video(base)),
        (1, encode_video(_jitter(base, 77))),  # near-dup copy
        (2, encode_video(_video(11))),
        (3, encode_video(_video(12))),
    ]
    pairs = {
        (r.key_a, r.key_b): r
        for r in video_near_pairs(_media(spark, rows), n_frames=4).collect()
    }
    assert set(pairs) == {(0, 1)}
    assert pairs[(0, 1)].n_frame_matches == 4
    assert pairs[(0, 1)].min_hamming <= 3


def test_min_frames_gates_single_frame_coincidence(spark):
    # video 1 shares ONE sampled frame with video 0 (a title card), rest
    # unrelated — below min_frames=2, so no pair
    base = _video(20)
    other = _video(21)
    other[0] = base[0]  # frame_idx 0 is always sampled (first span)
    rows = [(0, encode_video(base)), (1, encode_video(other))]
    out = video_near_pairs(_media(spark, rows), n_frames=4, min_frames=2)
    assert out.count() == 0
    # …but visible at min_frames=1
    one = video_near_pairs(_media(spark, rows), n_frames=4, min_frames=1).first()
    assert (one.key_a, one.key_b, one.n_frame_matches) == (0, 1, 1)


def test_static_scene_self_matches_excluded(spark):
    # a video whose frames are all identical must not pair with itself
    frames = np.repeat(_video(30, nf=1), 8, axis=0)
    rows = [(0, encode_video(frames)), (1, encode_video(_video(31)))]
    assert video_near_pairs(_media(spark, rows), n_frames=4).count() == 0
