"""Round-14 pins: the r13-ADVICE exact-readout fixes, the overflow
guards, and the full successive-approximation progressive JPEG codec
(r13 verdict item #4 taken the IMPLEMENT way for AC refinement). Each
test names what it pins so a regression reads as a reopened item."""

from __future__ import annotations

import numpy as np
import pytest

from blow_spark import multimodal as M

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# full progressive JPEG (encode successive=True -> decode_jpeg_progressive)
# ---------------------------------------------------------------------------


def _roundtrip_images():
    rng = np.random.default_rng(1404)
    yield rng.integers(0, 256, (64, 64), dtype=np.uint8)  # dense noise
    yield rng.integers(0, 256, (48, 56, 3), dtype=np.uint8)  # RGB, ragged
    yield np.tile(np.arange(64, dtype=np.uint8), (64, 1))  # smooth ramp
    flat = np.full((40, 40), 200, np.uint8)  # long EOB runs
    yield flat
    step = np.full((64, 64), 128, np.uint8)
    step[32:, :] += 40
    step[:, 32:] -= 30
    yield step


def test_sa_progressive_decode_matches_baseline_exactly():
    """The headline codec gate: a successive-approximation progressive
    encoding of an image decodes (decode_jpeg_progressive) to EXACTLY
    the pixels of the baseline encoding's decode — same FDCT/quant
    pipeline, so identical coefficients must reconstruct identically
    through the completely different entropy path (EOBn runs, ZRL over
    zero-history, correction bits)."""
    for i, img in enumerate(_roundtrip_images()):
        for q in (35, 50, 75):
            prog = M.encode_jpeg_progressive(img, quality=q, successive=True)
            base = M.encode_jpeg_baseline(img, quality=q, subsampling="444")
            got = M.decode_jpeg_progressive(prog)
            want = M.decode_image(base)
            assert np.array_equal(got, want), f"image {i} q={q}"


def test_sa_scan_script_census():
    """The SA script is the libjpeg shape: 6 scans for grayscale
    (DC first Al=1, two AC-first bands Al=1, DC refine Ah=1, two
    AC-refine bands), 14 for RGB 4:4:4, with the split bands (1-5,
    6-63) realized in the SOS headers the decoder saw."""
    img = np.random.default_rng(7).integers(0, 256, (64, 64), dtype=np.uint8)
    st: dict = {}
    M.decode_jpeg_progressive(
        M.encode_jpeg_progressive(img, quality=50, successive=True), stats=st
    )
    assert len(st["scans"]) == 6
    assert st["scans"][0] == (0, 0, 0, 1)  # DC first at Al=1
    assert (1, 5, 0, 1) in st["scans"] and (6, 63, 0, 1) in st["scans"]
    assert (0, 0, 1, 0) in st["scans"]  # DC refinement
    assert (1, 5, 1, 0) in st["scans"] and (6, 63, 1, 0) in st["scans"]
    rgb = np.random.default_rng(8).integers(0, 256, (24, 24, 3), dtype=np.uint8)
    st2: dict = {}
    M.decode_jpeg_progressive(
        M.encode_jpeg_progressive(rgb, quality=50, successive=True), stats=st2
    )
    assert len(st2["scans"]) == 14  # 1 DC + 3*2 AC first + 1 + 3*2 refine


def test_sa_fixture_blocks_force_every_decoder_path():
    """The crafted fixture blocks quantize to EXACTLY one coefficient
    at the last zigzag position — q=2 (correction bit 0), q=3
    (correction bit 1), q=1 (newly significant only in the refinement
    scan) — so every fixture file forces ZRL runs in both scan kinds,
    EOB runs > 1, and both correction-bit parities. This is the
    rounding-noise-below-half-quantizer claim in jpeg_sa_fixture_block's
    docstring, checked against the encoder's own pipeline."""
    ql, _ = M._jpeg_quality_tables(50)
    for k, want in ((61, 2), (62, 3), (63, 1)):
        blk = M.jpeg_sa_fixture_block(k, 123)
        f = M._JM @ (blk - 128.0) @ M._JM.T
        qf = np.floor(np.round(f, 8) / ql + 0.5).astype(int)
        nz = {(r, c): int(qf[r, c]) for r in range(8) for c in range(8) if qf[r, c]}
        assert nz == {(7, 7): want}, f"block {k}: {nz}"
    # end-to-end: a real fixture image exercises all four path counters
    img = M.jpeg_sa_fixture_image(b"The quick brown fox jumps over the lazy dog, twice over again..")
    st: dict = {}
    got = M.decode_jpeg_progressive(
        M.encode_jpeg_progressive(img, quality=50, successive=True), stats=st
    )
    want = M.decode_image(M.encode_jpeg_baseline(img, quality=50))
    assert np.array_equal(got, want)
    assert st["used_eobrun"] > 0
    assert st["used_zrl"] > 0
    assert st["used_newsig_refine"] > 0
    assert st["corr_bits"] > 0


def test_sa_stream_is_genuinely_progressive_and_backward_compatible():
    """The SA stream is a real SOF2 multi-scan file: decode_image
    refuses it (truthful baseline-only gate), decode_jpeg_progressive_dc
    reads just its first scan (coarse Al=1 DC preview), and the FULL
    decoder also accepts the round-13 2-scan spectral-only stream."""
    img = np.random.default_rng(9).integers(0, 256, (64, 64), dtype=np.uint8)
    sa = M.encode_jpeg_progressive(img, quality=50, successive=True)
    with pytest.raises(NotImplementedError):
        M.decode_image(sa)
    dc = M.decode_jpeg_progressive_dc(sa)
    assert dc.shape == (64, 64)
    two_scan = M.encode_jpeg_progressive(img, quality=50)
    base = M.decode_image(M.encode_jpeg_baseline(img, quality=50))
    assert np.array_equal(M.decode_jpeg_progressive(two_scan), base)


def test_prog_ac_huffman_table_is_spec_valid():
    """The flat-8 custom AC table: 176 symbols (every EOBn 0-14, ZRL,
    all (run,size<=10)), all 8 bits, Kraft sum < 1 (prefix-free), and
    the all-ones padding code is NOT a symbol (so 1-padding at scan end
    can never decode as data)."""
    bits, vals = M._JH_AC_PROG
    assert sum(bits) == len(vals) == 176
    assert bits[7] == 176 and sum(b for i, b in enumerate(bits) if i != 7) == 0
    enc = M._huff_canonical(bits, vals)
    assert all(ln == 8 for _, ln in enc.values())
    assert (0xFF, 8) not in {(c, l) for c, l in enc.values()}
    for r in range(15):
        assert (r << 4) in enc  # EOBn categories
    assert 0xF0 in enc


# ---------------------------------------------------------------------------
# pHash/DCT perceptual twin (r13 verdict item #8's suggested compose)
# ---------------------------------------------------------------------------


def test_phash_matrix_rows_are_zero_sum_adjusted():
    """The brightness-invariance THEOREM rests on every AC row of the
    e6 DCT tensor summing to exactly zero — a constant input shift then
    contributes 0 to every coefficient with u>=1 or v>=1, including
    the (0, v>=1) row via the transposed factor."""
    m = M.phash_dct_matrix_e6()
    assert m.shape == (8, 8)
    for u in range(1, 8):
        assert int(m[u].sum()) == 0, f"row {u} sum {m[u].sum()}"
    # rounding adjustment stays tiny: within 5 µunits of the float DCT
    assert np.abs(m - 1e6 * M._JM).max() <= 5


def _py_phash(grid: list[int], m) -> int:
    """Pure-Python third replication of the pHash pipeline (the dHash
    test's discipline): 8x8 grid -> integer DCT -> median threshold."""
    coefs = []
    for uv in range(1, 64):
        u, v = divmod(uv, 8)
        s = 0
        for k in range(64):
            s += grid[k] * int(m[u][k // 8]) * int(m[v][k % 8])
        coefs.append(s)
    med = sorted(coefs)[31]
    h = 0
    for i, c in enumerate(coefs):
        if c > med:
            h |= 1 << i
    return h


def test_phash_brightness_invariance_and_reencode_closeness():
    """End-to-end on the real codec: the q75 decode of an image and of
    its +6-brightened twin produce IDENTICAL pHashes (the zero-sum
    theorem, no clipping), the q50/q75 re-encode pair lands within
    tau=8 bits, and the pure-Python replication agrees with the
    numpy/matmul production path bit-for-bit."""
    m = M.phash_dct_matrix_e6()
    raw = b"Perceptual DCT hashing certifies what gradients cannot!..."
    raw = raw[:64].ljust(64, b"\0")
    img = np.zeros((64, 64), dtype=np.uint8)
    for k, v in enumerate(raw):
        r, c = divmod(k, 8)
        img[r * 8 : (r + 1) * 8, c * 8 : (c + 1) * 8] = v
        if 0 < v < 255:
            img[r * 8, c * 8] = v + 1
            img[r * 8, c * 8 + 1] = v - 1
    bright = np.minimum(img.astype(np.int32) + 6, 255).astype(np.uint8)

    def spark_path_hash(jpeg_bytes: bytes) -> int:
        dec = M.decode_image(jpeg_bytes)
        bsum = dec.astype(np.int64).reshape(8, 8, 8, 8).sum(axis=(1, 3))
        d = m @ bsum @ m.T
        coefs = d.reshape(-1)[1:]
        med = int(np.sort(coefs)[31])
        return sum(1 << i for i in range(63) if int(coefs[i]) > med)

    h50 = spark_path_hash(M.encode_jpeg_baseline(img, quality=50))
    h75 = spark_path_hash(M.encode_jpeg_baseline(img, quality=75))
    hb = spark_path_hash(M.encode_jpeg_baseline(bright, quality=75))
    assert hb == h75, "brightness shift changed the hash"
    assert bin(h50 ^ h75).count("1") <= 8, "re-encode pair outside tau"
    # third replication: pure-Python over the closed-form q75 grid
    # (identity decode), scaled by 64 like the block sums
    grid = [64 * v for v in raw]
    assert _py_phash(grid, m) == h75
    # q50 closed form: odd v < 255 rounds up
    g50 = [64 * (v + 1 if v % 2 == 1 and v < 255 else v) for v in raw]
    assert _py_phash(g50, m) == h50


# ---------------------------------------------------------------------------
# r13-ADVICE exact fixed-point readouts
# ---------------------------------------------------------------------------


def test_fx_div_helpers_match_exact_rounding():
    """_fx_div_spark/_fx_div_duck implement round-half-away-from-zero
    of num*scale/den for positive den — pinned against Python rational
    arithmetic across signs, ties, and scales."""
    from fractions import Fraction

    import duckdb

    from blow_spark.queries.mlprims import _fx_div_duck

    def want(num, den, scale):
        x = Fraction(num * scale, den)
        q, r = divmod(abs(x.numerator), x.denominator)
        up = 2 * r >= x.denominator
        mag = q + (1 if up else 0)
        return mag if x >= 0 else -mag

    con = duckdb.connect()
    for num in (-7, -5, -3, -1, 0, 1, 3, 5, 7, 999_999, -1_000_001, 10**18):
        for den in (1, 2, 3, 7, 1000, 10**6):
            for scale in (1, 100, 10**6):
                w = want(num, den, scale)
                if abs(w) >= 2**63:  # helper contract: result fits BIGINT
                    continue
                sql = _fx_div_duck(
                    f"CAST({num} AS HUGEINT)", f"CAST({den} AS HUGEINT)", scale
                )
                got = con.execute(f"SELECT {sql}").fetchone()[0]
                assert got == w, (num, den, scale)


def test_guarded_bigint_outputs_are_varchar_exact(spark):
    """r13 verdict item #3: the two sub-1000x-headroom outputs ship as
    the VARCHAR exact transport — still parseable integers with the
    right magnitudes."""
    from blow_spark.queries import queries

    qs = queries()
    r = qs["stats_mann_whitney_u"](spark, SF).first()
    assert isinstance(r.u_a_x2, str) and int(r.u_a_x2) >= 0
    assert 0 <= int(r.u_a_x2) <= 2 * r.na * r.nb
    rows = qs["drift_psi_by_source"](spark, SF).collect()
    assert rows
    for row in rows:
        assert isinstance(row.psi_num, str)
        int(row.psi_num)  # parses exactly
        assert row.psi_den > 0


# ---------------------------------------------------------------------------
# overflow_audit summary-compare: the accumulation-noise floor
# ---------------------------------------------------------------------------


def _load_overflow_audit():
    import importlib.util
    import pathlib

    p = pathlib.Path(__file__).resolve().parents[1] / "scripts" / "overflow_audit.py"
    spec = importlib.util.spec_from_file_location("overflow_audit", p)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_summary_compare_accumulation_floor_accepts_order_noise(spark):
    """Pins the round-14 float-SUM floor in summary_compare: a SUM diff
    UNDER the accumulation envelope (n * column_scale * 1e-12) is
    engine-order noise and must pass EVEN WHEN the totals themselves
    exceed the envelope (the partial-cancellation class caught live on
    similarity_cosine_threshold_exact at sf1 — mixed-sign column, small
    but nonzero total, relative test divides noise by it)."""
    import duckdb

    oa = _load_overflow_audit()
    con = duckdb.connect()
    # n=3, scale=1 -> floor = 3e-12; totals 5e-12 vs 7e-12 both EXCEED
    # the floor, their diff 2e-12 sits under it.
    df = spark.createDataFrame([(1.0,), (-1.0,), (5e-12,)], "z double")
    ok, detail = oa.summary_compare(
        df, con, "SELECT z FROM (VALUES (1.0), (-1.0), (7e-12)) t(z)", 60.0
    )
    assert ok, detail


def test_summary_compare_accumulation_floor_still_flags_real_defects(spark):
    """The floor must NOT swallow a value-scale distortion: a SUM off by
    ~0.5 on a unit-scale 3-row column is orders of magnitude above the
    envelope and stays a red."""
    import duckdb

    oa = _load_overflow_audit()
    con = duckdb.connect()
    df = spark.createDataFrame([(1.0,), (-1.0,), (5e-12,)], "z double")
    ok, detail = oa.summary_compare(
        df, con, "SELECT z FROM (VALUES (1.0), (-1.0), (0.5)) t(z)", 60.0
    )
    assert not ok
    assert "sum_z" in detail
