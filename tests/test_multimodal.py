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


def _encode_png(img, color_type, filters):
    """Minimal test-side PNG ENCODER: forward-filters each row with the
    given per-row filter types and deflates — independent arithmetic
    from the decoder's reconstruction, so round-tripping validates the
    filter math, not just zlib."""
    import struct
    import zlib

    import numpy as np

    h, w = img.shape[:2]
    ch = 1 if img.ndim == 2 else img.shape[2]
    flat = img.reshape(h, w * ch).astype(np.int32)
    raw = b""
    prior = np.zeros(w * ch, dtype=np.int32)
    for y, f in zip(range(h), filters):
        line = flat[y]
        out = np.zeros(w * ch, dtype=np.int32)
        for x in range(w * ch):
            a = line[x - ch] if x >= ch else 0
            b = prior[x]
            c = prior[x - ch] if x >= ch else 0
            if f == 0:
                v = line[x]
            elif f == 1:
                v = line[x] - a
            elif f == 2:
                v = line[x] - b
            elif f == 3:
                v = line[x] - (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                v = line[x] - pred
            out[x] = v & 0xFF
        raw += bytes([f]) + bytes(out.astype(np.uint8))
        prior = line
    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_png_decoder_all_filters():
    """The stdlib PNG decoder reconstructs every per-spec filter type
    (None/Sub/Up/Average/Paeth) exactly, for RGB and grayscale."""
    import numpy as np

    rng = np.random.default_rng(11)
    rgb = rng.integers(0, 256, size=(5, 4, 3), dtype=np.uint8)
    png = _encode_png(rgb, color_type=2, filters=[0, 1, 2, 3, 4])
    got = multimodal.decode_image(bytes(png))
    assert got.shape == (5, 4, 3) and np.array_equal(got, rgb)

    gray = rng.integers(0, 256, size=(4, 6), dtype=np.uint8)
    png_g = _encode_png(gray, color_type=0, filters=[4, 3, 2, 1])
    got_g = multimodal.decode_image(bytes(png_g))
    assert got_g.shape == (4, 6) and np.array_equal(got_g, gray)


def test_wav_decode_real_roundtrip():
    """RIFF/WAV PCM decodes through the stdlib wave parser: samples
    written by the stdlib writer come back exactly (int16 / 32768)."""
    import io
    import wave

    import numpy as np

    samples = (np.arange(-500, 500, 2, dtype=np.int16) * 33)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(samples.tobytes())
    got = multimodal.decode_audio(buf.getvalue())
    assert np.array_equal(got, samples.astype(np.float32) / 32768.0)


def test_resize_features_on_real_png(spark):
    """End-to-end: real PNG payloads decode FOR REAL inside the
    distributed mapInPandas resize (magic-byte detection — no flag
    needed), and the pixel checksum matches numpy on the true pixels."""
    import numpy as np

    rng = np.random.default_rng(5)
    rows, want = [], {}
    for i in range(3):
        img = rng.integers(0, 256, size=(6, 6, 3), dtype=np.uint8)
        rows.append((i, bytes(_encode_png(img, 2, [0, 1, 2, 3, 4, 2]))))
        small = multimodal.resize_image(img, 3, 3)
        want[i] = (int(small.size), int(small.astype(np.int64).sum()))
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    got = {
        r["doc_id"]: (r["n_px"], r["px_sum"])
        for r in multimodal.resize_features(df, out_h=3, out_w=3).collect()
    }
    assert got == want


def test_production_png_encoder_roundtrip():
    """multimodal.encode_png -> decode_image round trip is lossless for
    gray, RGB, and RGBA."""
    import numpy as np

    rng = np.random.default_rng(21)
    for shape in [(5, 7), (6, 4, 3), (3, 3, 4)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        got = multimodal.decode_image(multimodal.encode_png(img))
        assert got.shape == img.shape and np.array_equal(got, img)


def test_blob_chunk_reassemble_total_domain(spark, tmp_path):
    """Empty and NULL texts are in the query's domain (advice r7):
    empty -> exactly one empty chunk (not the [0, -1] descending-
    sequence artifact), NULL -> treated as empty, row KEPT. Both
    round-trip TRUE."""
    from blow_spark.queries import queries

    spark.createDataFrame(
        [
            (1, "x" * 130, "en", "s", 130),  # 3 chunks (64+64+2)
            (2, "", "en", "s", 0),  # empty payload
            (3, None, "en", "s", None),  # NULL payload
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(tmp_path / "documents.parquet"))
    got = {
        r.doc_id: r
        for r in queries()["multimodal_blob_chunk_reassemble"](
            spark, str(tmp_path)
        ).collect()
    }
    assert len(got) == 3
    assert (got[1].n_chunks, got[1].total_bytes) == (3, 130)
    assert (got[2].n_chunks, got[2].total_bytes) == (1, 0)
    assert (got[3].n_chunks, got[3].total_bytes) == (1, 0)
    assert all(got[i].reassembly_ok for i in (1, 2, 3))
