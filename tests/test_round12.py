"""Round-12 pins: 4:2:0 chroma-subsampled JPEG (round-11 verdict item
#4), the narrowed codec gate, and the large-star/small-star connected
components upgrade (round-11 verdict item #5)."""

from __future__ import annotations

import numpy as np
import pytest

from blow_spark import multimodal as M


def _fixture_tile_expectation(v: int, par: int) -> tuple[int, int, int]:
    """The closed form the DuckDB oracle uses (derivation in
    jpeg420_corpus_fixture_dir's docstring)."""
    vp = 32 + (v % 160)
    y_r = vp + 4 * par
    y_dec = 2 * ((y_r - 127) // 2) + 128
    if par:
        return (y_dec - 3, y_dec - 4, y_dec + 30)
    return (y_dec, y_dec, y_dec)


def test_jpeg420_closed_form_exhaustive():
    """Every (byte value, tile parity) combo decodes to EXACTLY the
    oracle's closed form — 512 combos, 32 full encode/decode cycles.
    This is the proof the multimodal_jpeg_420_decode_stats oracle is
    an exactness gate, not a tolerance check."""
    combos = [(v, par) for v in range(256) for par in (0, 1)]
    mismatched = 0
    for chunk in range(0, 512, 16):
        batch = combos[chunk : chunk + 16]
        img = np.zeros((64, 64, 3), dtype=np.uint8)
        exp = np.zeros_like(img)
        for t, (v, par) in enumerate(batch):
            ty, tx = divmod(t, 4)
            vp = 32 + (v % 160)
            img[ty * 16 : (ty + 1) * 16, tx * 16 : (tx + 1) * 16] = (
                vp,
                vp,
                vp + 34 * par,
            )
            exp[ty * 16 : (ty + 1) * 16, tx * 16 : (tx + 1) * 16] = (
                _fixture_tile_expectation(v, par)
            )
        dec = M._decode_jpeg(M.encode_jpeg_baseline(img, 50, subsampling="420"))
        mismatched += int(
            (dec.astype(int) != exp.astype(int)).any(axis=-1).sum()
        )
    assert mismatched == 0


def test_jpeg420_roundtrip_natural_image():
    """A smooth gradient image survives the full 4:2:0 chain with small
    error (it IS lossy), correct shape at non-MCU-aligned dimensions,
    and a smaller file than 4:4:4 at the same quality — the point of
    subsampling."""
    xx, yy = np.meshgrid(np.arange(75), np.arange(41))
    img = np.stack(
        [
            (60 + xx * 2) % 256,
            (30 + yy * 3) % 256,
            (xx + yy) % 256,
        ],
        axis=-1,
    ).astype(np.uint8)
    enc420 = M.encode_jpeg_baseline(img, 90, subsampling="420")
    enc444 = M.encode_jpeg_baseline(img, 90, subsampling="444")
    dec = M._decode_jpeg(enc420)
    assert dec.shape == img.shape
    assert float(np.mean(np.abs(dec.astype(int) - img.astype(int)))) < 8.0
    assert len(enc420) < len(enc444)


def test_jpeg420_grayscale_content_matches_444():
    """Gray-valued RGB has constant (128) chroma, so 4:2:0 and 4:4:4
    must decode IDENTICALLY — chroma subsampling only ever touches
    chroma."""
    rng = np.random.default_rng(12)
    g = rng.integers(40, 200, (32, 48), dtype=np.uint8)
    img = np.stack([g, g, g], axis=-1)
    d420 = M._decode_jpeg(M.encode_jpeg_baseline(img, 50, subsampling="420"))
    d444 = M._decode_jpeg(M.encode_jpeg_baseline(img, 50, subsampling="444"))
    assert np.array_equal(d420, d444)


def test_jpeg_gate_narrowed():
    """The NotImplementedError gate now excludes ONLY what is truly
    unimplemented: sampling factors outside 1-2, progressive (SOF2),
    and non-420/444 encoder requests. 4:2:0 itself decodes."""
    img = np.zeros((16, 16, 3), dtype=np.uint8)
    enc = bytearray(M.encode_jpeg_baseline(img, 50, subsampling="420"))
    # corrupt the luma sampling byte in SOF0 to 3x1 (factor > 2)
    i = enc.index(b"\xff\xc0")
    # SOF0 payload: len(2) prec(1) h(2) w(2) nc(1) then per-comp id,samp,tq
    samp_off = i + 2 + 2 + 1 + 2 + 2 + 1 + 1
    assert enc[samp_off] == 0x22
    enc[samp_off] = 0x31
    with pytest.raises(NotImplementedError, match="sampling factors"):
        M._decode_jpeg(bytes(enc))
    # progressive still gated
    enc2 = bytearray(M.encode_jpeg_baseline(img, 50, subsampling="420"))
    enc2[i + 1] = 0xC2
    with pytest.raises(NotImplementedError, match="SOF0"):
        M._decode_jpeg(bytes(enc2))
    with pytest.raises(NotImplementedError, match="subsampling"):
        M.encode_jpeg_baseline(img, 50, subsampling="422")


def test_jpeg420_with_restart_markers_unaffected_regression():
    """The generalized MCU walk kept the 4:4:4 path intact: re-encode
    the round-11 flat-block fixture shape and check the decoded image
    against its closed form (2*floor((v-127)/2)+128 per block)."""
    vals = [0, 1, 63, 64, 127, 128, 129, 200, 254, 255] * 7
    img = np.zeros((64, 64), dtype=np.uint8)
    exp = np.zeros_like(img)
    for k in range(64):
        r, c = divmod(k, 8)
        v = vals[k % len(vals)]
        img[r * 8 : (r + 1) * 8, c * 8 : (c + 1) * 8] = v
        exp[r * 8 : (r + 1) * 8, c * 8 : (c + 1) * 8] = min(
            max(2 * ((v - 127) // 2) + 128, 0), 255
        )
    dec = M._decode_jpeg(M.encode_jpeg_baseline(img, 50))
    assert np.array_equal(dec, exp)


def test_cc_large_small_star_long_chain(spark):
    """A 400-node PATH (diameter 399) must converge under the default
    max_iter=25 on the distributed path — impossible for plain
    O(diameter) label propagation, the property the large-star/
    small-star upgrade buys (Kiveris et al. SoCC 2014: O(log² n)
    rounds regardless of diameter)."""
    from pyspark.sql import functions as F

    from blow_spark import dedup

    pairs = spark.range(399).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    comp = {
        r["node"]: r["comp"]
        for r in dedup.connected_components(
            pairs, local_edge_cutoff=0
        ).collect()
    }
    assert len(comp) == 400
    assert set(comp.values()) == {0}


def test_cc_star_forest_many_components_with_selfloops(spark):
    """Mixed shape through the distributed path: several components,
    duplicate and reversed edges, and self-loop-only nodes (which never
    enter the star loop but must still be labeled)."""
    from blow_spark import dedup

    pairs = spark.createDataFrame(
        [
            (5, 3), (3, 5), (3, 1),          # comp {1,3,5}
            (8, 9), (9, 8),                  # comp {8,9}
            (7, 7),                          # self-loop-only node
            (20, 12), (12, 14), (14, 20),    # cycle comp {12,14,20}
        ],
        ["id_a", "id_b"],
    )
    comp = {
        r["node"]: r["comp"]
        for r in dedup.connected_components(
            pairs, local_edge_cutoff=0
        ).collect()
    }
    assert comp == {1: 1, 3: 1, 5: 1, 8: 8, 9: 8, 7: 7, 12: 12, 14: 12, 20: 12}


# --------------------------------------------------------------------------
# QOI codec (round 12)
# --------------------------------------------------------------------------


def test_qoi_hand_verified_spec_bytes():
    """Byte-for-byte against the one-page spec, computed by hand:
    (255,0,0) from the (0,0,0,255) start state is a DIFF with dr=-1
    (wrap) -> 0b01_01_10_10 = 0x5A; two repeats -> RUN(2) = 0xC1;
    back to (0,0,0) is DIFF dr=+1 (wrap) -> 0x7A. A large jump is an
    RGB literal."""
    img = np.array([[[255, 0, 0], [255, 0, 0], [255, 0, 0], [0, 0, 0]]], dtype=np.uint8)
    enc = M.encode_qoi(img)
    assert enc[:4] == b"qoif"
    assert enc[14:-8] == bytes([0x5A, 0xC1, 0x7A])
    assert enc[-8:] == b"\x00" * 7 + b"\x01"
    assert np.array_equal(M.decode_qoi(enc), img)
    enc2 = M.encode_qoi(np.array([[[10, 200, 30]]], dtype=np.uint8))
    assert enc2[14:-8] == bytes([0xFE, 10, 200, 30])


def test_qoi_roundtrip_rgb_rgba_random():
    rng = np.random.default_rng(3)
    for nc in (3, 4):
        for shape in ((1, 1), (7, 13), (64, 64)):
            img = rng.integers(0, 256, (*shape, nc), dtype=np.uint8)
            img[: shape[0] // 2, : shape[1] // 2] = 77
            dec = M.decode_qoi(M.encode_qoi(img))
            assert dec.shape == img.shape and np.array_equal(dec, img)


def test_qoi_fixture_exercises_all_rgb_ops():
    """The fixture pattern must hit RUN, DIFF, LUMA, RGB, and INDEX —
    INDEX guaranteed because the 4 palette colors occupy DISTINCT
    running-index hash slots (asserted here, so a palette edit that
    silently collides is caught)."""
    slots = [
        (r * 3 + g * 5 + b * 7 + 255 * 11) % 64
        for (r, g, b) in M.QOI_FIXTURE_PALETTE
    ]
    assert len(set(slots)) == 4
    img = np.zeros((64, 64, 3), dtype=np.uint8)
    for r in range(64):
        for c in range(64):
            img[r, c] = M.qoi_fixture_pixel(r, c, (r * 41) % 256)
    enc = M.encode_qoi(img)
    ops = {"RGB": 0, "RGBA": 0, "INDEX": 0, "DIFF": 0, "LUMA": 0, "RUN": 0}
    p = 14
    while p < len(enc) - 8:
        b = enc[p]
        if b == 0xFE:
            ops["RGB"] += 1
            p += 4
        elif b == 0xFF:
            ops["RGBA"] += 1
            p += 5
        elif b >> 6 == 0:
            ops["INDEX"] += 1
            p += 1
        elif b >> 6 == 1:
            ops["DIFF"] += 1
            p += 1
        elif b >> 6 == 2:
            ops["LUMA"] += 1
            p += 2
        else:
            ops["RUN"] += 1
            p += 1
    assert ops["RUN"] > 0 and ops["DIFF"] > 0 and ops["LUMA"] > 0
    assert ops["RGB"] > 0 and ops["INDEX"] > 0
    assert np.array_equal(M.decode_qoi(enc), img)


def test_qoi_alpha_change_uses_rgba_op():
    img = np.array([[[5, 5, 5, 255], [5, 5, 5, 128], [5, 5, 5, 128]]], dtype=np.uint8)
    enc = M.encode_qoi(img)
    assert 0xFF in enc[14:-8]  # RGBA literal for the alpha change
    assert np.array_equal(M.decode_qoi(enc), img)


def test_qoi_malformed_streams_raise():
    with pytest.raises(ValueError, match="not a QOI"):
        M.decode_qoi(b"nope" + b"\0" * 20)
    good = M.encode_qoi(np.zeros((2, 2, 3), dtype=np.uint8))
    with pytest.raises(ValueError, match="end marker"):
        M.decode_qoi(good[:-1] + b"\x02")
    # a run longer than the pixel budget
    import struct
    bad = b"qoif" + struct.pack(">IIBB", 2, 1, 3, 0) + bytes([0xC0 | 61]) + b"\x00" * 7 + b"\x01"
    with pytest.raises(ValueError, match="run overflows"):
        M.decode_qoi(bad)


# --------------------------------------------------------------------------
# Adam7 interlaced PNG (round 12)
# --------------------------------------------------------------------------


def test_png_adam7_roundtrip_all_shapes():
    """Interlaced encode -> decode is identity across channel counts and
    sizes with EMPTY passes (any dimension < 5 skips passes entirely),
    and matches the sequential decode of the same image."""
    rng = np.random.default_rng(5)
    for ch in (None, 3, 4):
        for shape in ((1, 1), (2, 3), (7, 5), (33, 17), (64, 64)):
            img = rng.integers(
                0, 256, (shape if ch is None else (*shape, ch)), dtype=np.uint8
            )
            dec = M._decode_png(M.encode_png(img, interlace=True))
            assert dec.shape == img.shape and np.array_equal(dec, img)
            assert np.array_equal(M._decode_png(M.encode_png(img)), img)


def test_png_adam7_stream_is_actually_interlaced():
    """The interlaced stream must differ from the sequential one (same
    pixels, different scanline order) and declare interlace=1 in IHDR."""
    img = np.arange(64 * 64 * 3, dtype=np.uint8).reshape(64, 64, 3)
    seq = M.encode_png(img)
    adam = M.encode_png(img, interlace=True)
    assert adam != seq
    ihdr_off = adam.index(b"IHDR") + 4
    assert adam[ihdr_off + 12] == 1 and seq[seq.index(b"IHDR") + 4 + 12] == 0
    assert np.array_equal(M._decode_png(adam), M._decode_png(seq))


def test_png_invalid_interlace_still_gated():
    img = np.zeros((8, 8), dtype=np.uint8)
    enc = bytearray(M.encode_png(img))
    enc[enc.index(b"IHDR") + 4 + 12] = 2
    with pytest.raises(NotImplementedError, match="interlace=2"):
        M._decode_png(bytes(enc))
