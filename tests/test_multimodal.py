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


def test_ppm_real_decode_roundtrip(spark):
    """The pure-numpy PPM parser decodes a known image exactly."""
    w, h = 5, 3
    body = bytes(range(w * h * 3))
    payload = b"P6\n" + f"{w} {h}\n255\n".encode() + body
    w2, h2, ch, mean, hist = multimodal._decode_one(payload, fake=False)
    assert (w2, h2, ch) == (w, h, 3)
    assert abs(mean - np.mean(np.frombuffer(body, dtype=np.uint8))) < 1e-12
    assert abs(sum(hist) - 1.0) < 1e-6
    # comment lines in the header are PPM-legal
    payload_c = b"P6\n# a comment\n" + f"{w} {h}\n255\n".encode() + body
    assert multimodal._decode_one(payload_c, fake=False)[:2] == (w, h)


def test_ppm_media_from_documents(spark):
    m = multimodal.ppm_media_from_documents(spark, "/root/testdata/sf0.001")
    out = multimodal.decode_image_features(m).collect()
    assert len(out) == m.count()
    for r in out:
        assert 4 <= r["width"] <= 16 and 4 <= r["height"] <= 14 and r["channels"] == 3
        assert 0.0 <= r["mean_byte"] <= 255.0


def test_wav_decode_matches_stdlib(spark):
    """The numpy WAV parser agrees with python's stdlib wave module."""
    import io
    import wave

    m = multimodal.synth_wav_media(spark, 20)
    feats = {r["media_id"]: r for r in multimodal.decode_audio_features(m).collect()}
    for row in m.collect():
        payload = bytes(row["payload"])
        with wave.open(io.BytesIO(payload)) as wf:
            assert feats[row["media_id"]]["sample_rate"] == wf.getframerate()
            assert feats[row["media_id"]]["n_channels"] == wf.getnchannels()
            assert feats[row["media_id"]]["n_samples"] == wf.getnframes()
        r = feats[row["media_id"]]
        assert abs(r["duration_s"] - r["n_samples"] / r["sample_rate"]) < 1e-12
        # sine of amplitude 12000/32768 → rms ≈ a/√2 ≈ 0.259
        assert 0.2 < r["rms"] < 0.3


def test_jpeg_png_seam_raises(spark):
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        multimodal._decode_one(b"\xff\xd8\xff\xe0" + b"\x00" * 32, fake=False)
    with _pytest.raises(NotImplementedError):
        multimodal._decode_one(b"\x89PNG\r\n\x1a\n" + b"\x00" * 32, fake=False)
