"""Multimodal: REAL pure-numpy BMP/WAV/LQCV-video codecs + binary-column
plumbing through Arrow; only foreign compressed formats (PNG/JPEG/MP4) stay
behind the documented codec boundary."""

import numpy as np
import pytest

from longqc_spark.operators.multimodal import (
    decode_bmp,
    decode_image,
    decode_wav,
    encode_bmp,
    encode_wav,
    extract_features,
    synth_media_table,
)


def test_bmp_roundtrip_exact():
    """encode→decode identity, including odd widths that need row padding."""
    rng = np.random.default_rng(3)
    for h, w in [(1, 1), (5, 3), (8, 7), (16, 16), (11, 33)]:
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_bmp(encode_bmp(img)), img), (h, w)


def test_bmp_hand_fixture():
    """Known pixels decode to known values (red/blue 1×2, mean hand-computed)."""
    img = np.array([[[255, 0, 0], [0, 0, 255]]], dtype=np.uint8)
    payload = encode_bmp(img)
    assert payload[:2] == b"BM"
    back = decode_bmp(payload)
    assert np.array_equal(back, img)
    assert back.mean() == pytest.approx((255 + 255) / 6)


def test_wav_roundtrip_exact():
    rng = np.random.default_rng(4)
    samples = rng.integers(-30000, 30000, size=777, dtype=np.int16)
    got, rate = decode_wav(encode_wav(samples, rate=8000))
    assert rate == 8000
    assert np.array_equal(got, samples)


def test_wav_hand_fixture():
    """Constant-amplitude square wave: RMS and zero crossings are exact."""
    samples = np.tile(np.array([1000, -1000], dtype=np.int16), 50)
    got, rate = decode_wav(encode_wav(samples))
    assert rate == 16000 and len(got) == 100
    x = got.astype(np.float64)
    assert float(np.sqrt(np.mean(x * x))) == pytest.approx(1000.0)
    assert float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))) == pytest.approx(1.0)


def test_decode_stub_raises_without_fake():
    # non-BMP formats still need real libs → loud stub
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNGxxxx")


def test_real_bmp_decodes_without_fake_flag():
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    assert np.array_equal(decode_image(encode_bmp(img)), img)


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
    auds = feats[feats.kind == "audio"]
    assert (auds.sample_rate == 16000).all() and (auds.n_samples > 0).all()
    assert (auds.rms > 0).all() and auds.feature.map(len).eq(8).all()
    vids = feats[feats.kind == "video"]
    assert vids.feature.map(len).eq(0).all()
    assert (feats.n_bytes > 44).all()


def test_extract_features_matches_direct_decode(spark):
    """Spark-side features equal a direct single-node decode of the same
    payloads — the real-decode twin of the labeler-identity gate."""
    media = synth_media_table(spark, n=12)
    feats = extract_features(media).toPandas().set_index("media_id")
    for row in media.toPandas().itertuples():
        if row.kind == "image":
            img = decode_bmp(bytes(row.payload))
            assert feats.loc[row.media_id, "mean_luma"] == pytest.approx(float(img.mean()))
            assert (feats.loc[row.media_id, "height"], feats.loc[row.media_id, "width"]) == img.shape[:2]
        elif row.kind == "audio":
            x = decode_wav(bytes(row.payload))[0].astype(np.float64)
            assert feats.loc[row.media_id, "rms"] == pytest.approx(float(np.sqrt(np.mean(x * x))))


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


def test_video_roundtrip_exact():
    """LQCV encode→decode identity: every frame byte-identical."""
    from longqc_spark.operators.multimodal import decode_video_frames, encode_video

    rng = np.random.default_rng(9)
    frames = rng.integers(0, 256, size=(5, 7, 11, 3), dtype=np.uint8)
    assert np.array_equal(decode_video_frames(encode_video(frames)), frames)


def test_video_hand_fixture():
    """Two hand-built frames (all-black, all-white): per-frame means are
    exactly 0 and 255, and the container magic/count parse as written."""
    from longqc_spark.operators.multimodal import decode_video_frames, encode_video

    frames = np.stack(
        [np.zeros((2, 3, 3), dtype=np.uint8), np.full((2, 3, 3), 255, dtype=np.uint8)]
    )
    payload = encode_video(frames)
    assert payload[:4] == b"LQCV"
    back = decode_video_frames(payload)
    assert back.shape == (2, 2, 3, 3)
    assert float(back[0].mean()) == 0.0 and float(back[1].mean()) == 255.0


def test_foreign_video_raises_without_fake():
    from longqc_spark.operators.multimodal import decode_video_frames

    with pytest.raises(NotImplementedError):
        decode_video_frames(b"\x00\x00\x00\x18ftypisomchunk")


def test_sample_frames_matches_direct_decode(spark):
    """Spark-side per-frame stats equal a direct single-node decode of the
    same REAL containers (mean luma per sampled+resized frame)."""
    from longqc_spark.operators.multimodal import (
        decode_video_frames,
        resize_image,
        sample_frame_indices,
        sample_frames,
    )

    media = synth_media_table(spark, n=12)
    got = (
        sample_frames(media, n_frames=3, out_size=(6, 6))
        .toPandas()
        .set_index(["media_id", "frame_idx"])
        .sort_index()
    )
    n_checked = 0
    for row in media.toPandas().itertuples():
        if row.kind != "video":
            continue
        frames = decode_video_frames(bytes(row.payload))
        for idx in sample_frame_indices(len(frames), 3):
            fr = resize_image(frames[idx], 6, 6)
            assert got.loc[(row.media_id, int(idx)), "mean_luma"] == pytest.approx(
                float(fr.mean())
            )
            assert got.loc[(row.media_id, int(idx)), "n_frames_total"] == len(frames)
            n_checked += 1
    assert n_checked > 0


def test_video_zero_frames_and_truncation():
    from longqc_spark.operators.multimodal import decode_video_frames, encode_video

    empty = encode_video(np.empty((0, 8, 8, 3), dtype=np.uint8))
    out = decode_video_frames(empty)
    assert out.shape[0] == 0  # valid container, no frames, no crash

    full = encode_video(np.zeros((2, 4, 4, 3), dtype=np.uint8))
    for cut in (6, 10, len(full) - 3):
        with pytest.raises(ValueError, match="truncated LQCV"):
            decode_video_frames(full[:cut])


def test_sample_frames_survives_zero_frame_video(spark):
    from longqc_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        encode_video,
        sample_frames,
    )

    empty = encode_video(np.empty((0, 4, 4, 3), dtype=np.uint8))
    full = encode_video(np.full((2, 4, 4, 3), 7, dtype=np.uint8))
    media = spark.createDataFrame(
        [(0, "video", bytearray(empty), "video/x-lqcv"),
         (1, "video", bytearray(full), "video/x-lqcv")],
        schema=MEDIA_SCHEMA,
    )
    got = sample_frames(media, n_frames=4).toPandas()
    # the zero-frame container contributes no rows and kills nothing
    assert set(got.media_id) == {1}
    assert len(got) == 2
