"""Multimodal plumbing: schema, determinism, stub gating."""

import numpy as np
import pytest

from webdq import multimodal


def test_synth_media_deterministic(spark):
    a = {r["media_id"]: (r["media_type"], bytes(r["payload"])) for r in multimodal.synth_media(spark, 50, 2).collect()}
    b = {r["media_id"]: (r["media_type"], bytes(r["payload"])) for r in multimodal.synth_media(spark, 50, 7).collect()}
    assert a == b
    assert all(p[1][:4] == b"WDQ0" for p in a.values())


def test_decode_image_features(spark):
    m = multimodal.synth_media(spark, 40)
    out = multimodal.decode_image_features(m, fake=True).collect()
    assert len(out) == 40
    for r in out:
        assert 8 <= r["width"] < 72 and 8 <= r["height"] < 72 and r["channels"] == 3
        h = np.array(r["byte_hist"])
        assert len(h) == 16 and abs(h.sum() - 1.0) < 1e-5


def test_decode_stub_gated(spark):
    m = multimodal.synth_media(spark, 4)
    with pytest.raises(Exception, match="NotImplementedError|PIL|libvips"):
        multimodal.decode_image_features(m, fake=False).collect()


def test_sample_frames(spark):
    m = multimodal.synth_media(spark, 60)
    frames = multimodal.sample_frames(m, every=2).collect()
    vids = {r["media_id"] for r in m.filter("media_type = 'video'").collect()}
    assert {r["media_id"] for r in frames} == vids
    for r in frames:
        assert r["frame_no"] % 2 == 0
        assert len(bytes(r["frame"])) > 0
