"""Multimodal binary-column plumbing: synthetic payloads, Arrow-batched
feature extraction verified against local numpy, frame sampling shape,
decode stubs."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from blow_spark import multimodal
from blow_spark.sources import read_table


def test_byte_features_match_numpy(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents").limit(20)
    media = multimodal.with_synthetic_media(docs)
    feats = {r["doc_id"]: r for r in multimodal.extract_byte_features(media).collect()}
    for row in docs.select("doc_id", "text").collect():
        arr = np.frombuffer(row["text"].encode("utf-8"), dtype=np.uint8)
        hist = np.bincount(arr >> 4, minlength=16).astype(np.float64) / arr.size
        nz = hist[hist > 0]
        entropy = float(-(nz * np.log2(nz)).sum())
        got = feats[row["doc_id"]]
        assert got["n_bytes"] == arr.size
        assert got["byte_entropy"] == pytest.approx(entropy)
        assert np.allclose(got["byte_hist"], hist)


def test_frame_sample_shape(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents").limit(10)
    media = multimodal.with_synthetic_media(docs)
    frames = multimodal.sample_frames(media, n_frames=4, frame_bytes=64)
    rows = frames.collect()
    assert len(rows) == 40  # 1 blob → exactly 4 frames
    assert {r["frame_no"] for r in rows} == {0, 1, 2, 3}
    assert all(len(bytes(r["frame_bytes"])) <= 64 for r in rows)
    # determinism: same input → same frames
    again = frames.collect()
    assert {(r["doc_id"], r["frame_no"], bytes(r["frame_bytes"])) for r in rows} == {
        (r["doc_id"], r["frame_no"], bytes(r["frame_bytes"])) for r in again
    }


def test_resize_matches_numpy(spark, sf_dir):
    """Distributed resize checksum == local decode+resize on the same
    payloads (plumbing carries real values, not just shapes)."""
    docs = read_table(spark, sf_dir, "documents").limit(12)
    media = multimodal.with_synthetic_media(docs)
    got = {r["doc_id"]: r for r in multimodal.resize_features(media, 4, 4).collect()}
    for row in docs.select("doc_id", "text").collect():
        img = multimodal.decode_image(row["text"].encode("utf-8"), fake_decode=True)
        small = multimodal.resize_image(img, 4, 4)
        g = got[row["doc_id"]]
        assert (g["out_h"], g["out_w"], g["n_px"]) == (4, 4, small.size)
        assert g["px_sum"] == int(small.astype(np.int64).sum())


def test_resize_shapes_and_determinism():
    img = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
    small = multimodal.resize_image(img, 4, 4)
    assert small.shape == (4, 4, 3)
    # nearest-neighbor: output (i,j) == input (2i, 2j)
    assert (small == img[::2, ::2]).all()
    up = multimodal.resize_image(img, 16, 16)
    assert up.shape == (16, 16, 3)
    assert (multimodal.resize_image(img, 4, 4) == small).all()


def test_audio_window_features_match_numpy(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents").limit(8)
    media = multimodal.with_synthetic_media(docs)
    got = {}
    for r in multimodal.audio_window_features(media, window_samples=256).collect():
        got[(r["doc_id"], r["window_no"])] = r
    for row in docs.select("doc_id", "text").collect():
        wave = multimodal.decode_audio(row["text"].encode("utf-8"), fake_decode=True)
        n_win = max(1, -(-wave.size // 256))
        for w in range(n_win):
            seg = wave[w * 256 : (w + 1) * 256]
            if seg.size == 0:
                continue
            g = got[(row["doc_id"], w)]
            assert g["n_samples"] == seg.size
            assert g["rms"] == pytest.approx(float(np.sqrt(np.mean(seg.astype(np.float64) ** 2))))
            assert g["peak"] == pytest.approx(float(np.abs(seg).max()))


def test_decode_stub_behavior():
    payload = b"x" * 500
    fake = multimodal.decode_image(payload, fake_decode=True)
    assert fake.shape == (8, 8, 3)
    try:
        import PIL  # noqa: F401

        have_pil = True
    except ImportError:
        have_pil = False
    if not have_pil:
        with pytest.raises(NotImplementedError):
            multimodal.decode_image(payload)
        with pytest.raises(NotImplementedError):
            multimodal.decode_audio(payload)


def test_media_schema(spark, sf_dir):
    media = multimodal.with_synthetic_media(read_table(spark, sf_dir, "documents").limit(5))
    row = media.select("meta.media_type", "meta.width", "meta.height").first()
    assert row["media_type"] == "image"
    assert 1 <= row["width"] <= 640 and 1 <= row["height"] <= 480
