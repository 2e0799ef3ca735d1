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
