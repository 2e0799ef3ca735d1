"""Multimodal plumbing: binary columns through Arrow, stubbed decode."""

import numpy as np
import pytest

from longqc_spark.operators.multimodal import (
    decode_image,
    extract_features,
    synth_media_table,
)


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNGxxxx")


def test_fake_decode_deterministic():
    a = decode_image(b"\x89PNG123", fake=True)
    b = decode_image(b"\x89PNG123", fake=True)
    assert np.array_equal(a, b)
    assert a.ndim == 3 and a.shape[2] == 3


def test_extract_features_roundtrip(spark):
    media = synth_media_table(spark, n=60)
    feats = extract_features(media).toPandas().set_index("media_id").sort_index()
    assert len(feats) == 60
    assert feats.magic_ok.all()
    imgs = feats[feats.kind == "image"]
    assert (imgs.width > 0).all() and (imgs.height > 0).all()
    assert imgs.feature.map(len).eq(8).all()
    assert np.allclose(imgs.feature.map(sum), 1.0, atol=1e-5)
    others = feats[feats.kind != "image"]
    assert others.feature.map(len).eq(0).all()
    assert (feats.n_bytes > 64).all()


def test_extract_features_partition_invariant(spark):
    media = synth_media_table(spark, n=60)
    a = extract_features(media).toPandas().sort_values("media_id").reset_index(drop=True)
    b = (
        extract_features(media.repartition(7))
        .toPandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    assert a.drop(columns="feature").equals(b.drop(columns="feature"))
    assert all(list(x) == list(y) for x, y in zip(a.feature, b.feature))


def test_resize_image_exact_gather():
    from longqc_spark.operators.multimodal import resize_image

    img = np.arange(6 * 4 * 3, dtype=np.uint8).reshape(6, 4, 3)
    out = resize_image(img, 3, 2)
    assert out.shape == (3, 2, 3)
    # nearest-neighbor: row i maps to source row floor(i*6/3), col j to floor(j*4/2)
    assert np.array_equal(out[1, 1], img[2, 2])
    assert np.array_equal(out[0, 0], img[0, 0])


def test_sample_frame_indices():
    from longqc_spark.operators.multimodal import sample_frame_indices

    idx = sample_frame_indices(100, 4)
    assert idx.tolist() == [0, 25, 50, 75]
    # fewer frames than requested → every frame once
    assert sample_frame_indices(3, 8).tolist() == [0, 1, 2]


def test_sample_frames_udtf_shape(spark):
    from longqc_spark.operators.multimodal import sample_frames

    media = synth_media_table(spark, n=30)  # 10 videos among 30 rows
    frames = sample_frames(media, n_frames=4, out_size=(8, 8)).toPandas()
    n_videos = 10
    assert len(frames) == n_videos * 4  # 1→n row expansion
    assert (frames.height == 8).all() and (frames.width == 8).all()
    assert frames.groupby("media_id").frame_idx.is_monotonic_increasing.all()
    assert all(len(f) == 8 and abs(sum(f) - 1.0) < 1e-5 for f in frames.feature)
    # deterministic: second run identical
    again = sample_frames(media, n_frames=4, out_size=(8, 8)).toPandas()
    assert frames.sort_values(["media_id", "frame_idx"]).mean_luma.tolist() == \
        again.sort_values(["media_id", "frame_idx"]).mean_luma.tolist()


def test_binaryfile_scan_roundtrip(spark, tmp_path):
    """Real spark.read.format('binaryFile') over a directory of media
    objects must reproduce the synthetic table (payload bytes identical) and
    feed the same feature extraction."""
    from longqc_spark.operators.multimodal import (
        extract_features,
        scan_media_files,
        synth_media_table,
        write_media_files,
    )

    d = write_media_files(spark, str(tmp_path / "media"), n=24)
    scanned = scan_media_files(spark, d).toPandas().set_index("media_id").sort_index()
    want = synth_media_table(spark, n=24).toPandas().set_index("media_id").sort_index()
    assert (scanned.kind == want.kind).all()
    assert all(bytes(a) == bytes(b) for a, b in zip(scanned.payload, want.payload))

    feats = extract_features(scan_media_files(spark, d)).toPandas()
    assert len(feats) == 24 and feats.magic_ok.all()


def test_resize_property():
    from longqc_spark.operators.multimodal import resize_image, sample_frame_indices

    rng = np.random.default_rng(0)
    for _ in range(20):
        h, w = int(rng.integers(1, 80)), int(rng.integers(1, 80))
        oh, ow = int(rng.integers(1, 40)), int(rng.integers(1, 40))
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        out = resize_image(img, oh, ow)
        assert out.shape == (oh, ow, 3)
        # every output pixel exists in the source (pure gather, no blending)
        n_total, n_sample = int(rng.integers(1, 200)), int(rng.integers(1, 20))
        idx = sample_frame_indices(n_total, n_sample)
        assert len(idx) == min(n_sample, n_total)
        assert (np.diff(idx) > 0).all() and idx[0] == 0 and idx[-1] < n_total
