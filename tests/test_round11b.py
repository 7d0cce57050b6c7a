"""Round-11 second-batch invariants: codec unit vectors (G.711, IMA
ADPCM, BMP), Aho-Corasick automaton correctness, winnowing guarantees,
DTW metric properties, and the QUALIFY rewriter.

The cross-engine value equality of every new query is covered by the
parametrized oracle suite (tests/test_queries_oracle.py); these tests
pin the ALGORITHMS against independently-known ground truth so an
engines-agree-but-both-wrong slip (the round-10 Bollinger lesson) has
a second tripwire.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from blow_spark import acmatch, multimodal


# --------------------------------------------------------------------------
# G.711 — spec vectors
# --------------------------------------------------------------------------


def _ulaw_ref(u: int) -> int:
    """Sun ulaw2linear reference (CCITT G.711)."""
    u = ~u & 0xFF
    sign = u & 0x80
    exponent = (u >> 4) & 7
    mantissa = u & 0x0F
    mag = ((mantissa << 3) + 0x84) << exponent
    val = mag - 0x84
    return -val if sign else val


def _alaw_ref(a: int) -> int:
    """Sun alaw2linear reference."""
    a ^= 0x55
    t = (a & 0x0F) << 4
    seg = (a & 0x70) >> 4
    if seg == 0:
        t += 8
    else:
        t = (t + 0x108) << (seg - 1)
    return t if a & 0x80 else -t


def test_g711_sql_algebra_matches_reference():
    from blow_spark.queries.codecs import _alaw_lin, _ulaw_lin

    import duckdb

    ul = _ulaw_lin("u", "duck")
    al = _alaw_lin("u", "duck")
    rows = duckdb.sql(
        f"SELECT u, {ul} AS ul, {al} AS al"
        " FROM (SELECT UNNEST(range(0, 256)) AS u)"
    ).fetchall()
    for u, got_ul, got_al in rows:
        assert got_ul == _ulaw_ref(u), f"ulaw byte {u}"
        assert got_al == _alaw_ref(a=u), f"alaw byte {u}"
    # spec landmarks: 0xFF is +0 in mu-law; extremes hit +/-32124
    assert _ulaw_ref(0xFF) == 0
    assert max(abs(_ulaw_ref(u)) for u in range(256)) == 32124
    assert max(abs(_alaw_ref(a)) for a in range(256)) == 32256


# --------------------------------------------------------------------------
# IMA ADPCM — hand-computed vector + clamp rails
# --------------------------------------------------------------------------


def test_adpcm_first_steps_hand_checked():
    # byte 0x00 -> nibbles (0, 0): step=7 -> diff=0+... = 7>>3 = 0 ...
    # nibble 0: diff = 7 >> 3 = 0 -> pred 0; index += -1 -> clamp 0
    out = multimodal.decode_adpcm_ima(b"\x00")
    assert list(out) == [0, 0]
    # nibble 7 at step 7: diff = 0 + 1 + 3 + 7 = 11 (wait: step>>3=0,
    # +step>>2=1, +step>>1=3, +step=7 -> 11); pred=11; idx 0+8=8 (step 16)
    # second nibble 0 at step 16: diff = 2, pred 13
    out = multimodal.decode_adpcm_ima(b"\x07")
    assert list(out) == [11, 13]
    # sign nibble 0xF at step 7: diff 11, pred -11
    out = multimodal.decode_adpcm_ima(b"\x0f")
    assert out[0] == -11


def test_adpcm_clamps_and_index_bounds():
    # all-7 nibbles ramp up and must clamp at +32767 with index at 88
    data = b"\x77" * 64
    out = multimodal.decode_adpcm_ima(data)
    assert out.max() == 32767
    idx = 0
    for _ in range(128):
        idx = max(0, min(88, idx + 8))
    assert idx == 88
    # all-F nibbles clamp at -32768
    assert multimodal.decode_adpcm_ima(b"\xff" * 64).min() == -32768


# --------------------------------------------------------------------------
# BMP — flip, stride, channel order
# --------------------------------------------------------------------------


def test_bmp_decoder_flip_stride_channels():
    from blow_spark.queries.codecs import _bmp_header

    # pixel array: row r (bottom-up), 20-byte stride; mark pixel (0,0)
    # of the TOP image row = source row 7, bytes B=1,G=2,R=3
    pix = bytearray(160)
    pix[7 * 20 + 0] = 1  # B
    pix[7 * 20 + 1] = 2  # G
    pix[7 * 20 + 2] = 3  # R
    # poison the pad bytes of every row — a stride-naive decoder reads them
    for r in range(8):
        pix[r * 20 + 18] = 255
        pix[r * 20 + 19] = 255
    img = multimodal.decode_image(bytes(_bmp_header()) + bytes(pix))
    assert img.shape == (8, 6, 3)
    assert tuple(img[0, 0]) == (3, 2, 1)  # RGB at top-left
    assert img.sum() == 6  # pad bytes must NOT leak into pixels


def test_bmp_decoder_rejects_non_subset():
    hdr = bytearray(b"BM" + b"\0" * 60)
    struct.pack_into("<I", hdr, 10, 54)
    struct.pack_into("<Iii", hdr, 14, 40, 4, 4)
    struct.pack_into("<HH", hdr, 26, 1, 8)  # 8bpp -> not the subset
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(bytes(hdr) + b"\0" * 64)


# --------------------------------------------------------------------------
# Aho-Corasick — vs brute force
# --------------------------------------------------------------------------


def _brute_counts(text: str, patterns: tuple[str, ...]) -> list[int]:
    return [
        sum(1 for i in range(len(text)) if text.startswith(p, i))
        for p in patterns
    ]


def test_aho_corasick_matches_bruteforce_incl_overlaps():
    patterns = ("a", "ab", "aba", "bab", "abab", "b")
    goto, fail, out = acmatch.build_automaton(patterns)
    for text in ["ababab", "aaaa", "babababa", "", "xyz", "abba"]:
        got = acmatch.count_matches(text, goto, fail, out, len(patterns))
        assert got == _brute_counts(text, patterns), text


def test_aho_corasick_nested_output_links():
    # "can" must be reported while traversing "scan" (suffix-link output)
    patterns = ("scan", "can")
    goto, fail, out = acmatch.build_automaton(patterns)
    got = acmatch.count_matches("scan", goto, fail, out, 2)
    assert got == [1, 1]


# --------------------------------------------------------------------------
# Winnowing — paper guarantees on the oracle output
# --------------------------------------------------------------------------


def test_winnowing_guarantees_oracle():
    from blow_spark.oracle import duckdb_run
    from blow_spark.queries import oracle_sql

    df = duckdb_run(
        oracle_sql()["text_winnowing_fingerprint"], "/root/testdata/sf0.001"
    )
    # at least one fingerprint per w consecutive windows (coarse form:
    # n_fp >= n_windows / w), density <= 1
    assert (df.n_fp * 4 >= df.n_windows).all()
    assert (df.n_fp <= df.n_windows).all()
    assert (df.density_e6 <= 1_000_000).all()
    # expected density ~= 2/(w+1) = 0.4 (paper §4): loose corpus-level band
    assert 300_000 < df.density_e6.mean() < 500_000


# --------------------------------------------------------------------------
# DTW — metric sanity on the numpy DP
# --------------------------------------------------------------------------


def test_dtw_dp_zero_and_symmetry_free_cases():
    import pandas as pd

    from blow_spark.queries.stats4 import _DTW_BAND, _DTW_LEN

    def run(x, m):
        n, band = _DTW_LEN, _DTW_BAND
        inf = np.iinfo(np.int64).max // 4
        dp = np.full((n + 1, n + 1), inf, dtype=np.int64)
        dp[0, 0] = 0
        for i in range(1, n + 1):
            for j in range(max(1, i - band), min(n, i + band) + 1):
                cost = abs(x[i - 1] - m[j - 1])
                dp[i, j] = cost + min(
                    dp[i - 1, j], dp[i, j - 1], dp[i - 1, j - 1]
                )
        return int(dp[n, n])

    rng = np.random.default_rng(7)
    x = rng.integers(0, 1000, _DTW_LEN)
    assert run(x, x) == 0  # identity
    y = np.roll(x, 1)
    # elastic alignment: shifted series cost <= rigid Euclidean L1 cost
    assert run(x, y) <= int(np.abs(x - y).sum())


def test_dtw_oracle_cell_topology():
    from blow_spark.queries.stats4 import _DTW_BAND, _DTW_LEN, _dtw_cells

    cells = _dtw_cells()
    assert (1, 1) == cells[0]
    assert (_DTW_LEN, _DTW_LEN) == cells[-1]
    assert all(abs(i - j) <= _DTW_BAND for i, j in cells)
    # diagonal order = topological: every predecessor appears earlier
    seen = set()
    for i, j in cells:
        for pi, pj in ((i - 1, j), (i, j - 1), (i - 1, j - 1)):
            if (pi, pj) in set(cells):
                assert (pi, pj) in seen or (pi, pj) == (i, j)
        seen.add((i, j))


# --------------------------------------------------------------------------
# QUALIFY rewriter
# --------------------------------------------------------------------------


def test_rewrite_qualify_forms():
    from blow_spark.queries.relational3 import _rewrite_qualify

    out = _rewrite_qualify(
        "SELECT a, b FROM t QUALIFY RANK() OVER (ORDER BY b) = 1"
    )
    assert out.startswith("SELECT * EXCEPT (__qualify) FROM (")
    assert "WHERE __qualify" in out and "ORDER BY" not in out.split("WHERE")[1]
    out2 = _rewrite_qualify(
        "SELECT a FROM t QUALIFY ROW_NUMBER() OVER (PARTITION BY a ORDER BY a) <= 2 ORDER BY a"
    )
    # the OVER-clause ORDER BY stays inside; the trailing one hoists out
    assert out2.rstrip().endswith("ORDER BY a")
    assert "PARTITION BY a ORDER BY a" in out2
    with pytest.raises(ValueError):
        _rewrite_qualify("DELETE FROM t")


# --------------------------------------------------------------------------
# Round-11 batch 3: indexed PNG, Krippendorff, JL
# --------------------------------------------------------------------------


def test_indexed_png_roundtrip_and_gates():
    rng = np.random.default_rng(11)
    idx = rng.integers(0, 64, (8, 8)).astype(np.uint8)
    png = multimodal.encode_png_indexed(idx, multimodal.PALETTE64)
    img = multimodal.decode_image(png)
    assert img.shape == (8, 8, 3)
    assert (img == multimodal.PALETTE64[idx]).all()
    # index out of palette range must be rejected, not wrapped
    small = multimodal.PALETTE64[:32]
    png_bad = multimodal.encode_png_indexed(idx, small)  # idx up to 63
    with pytest.raises(ValueError):
        multimodal.decode_image(png_bad)
    # palette channels are distinct permutations (the channel-swap gate)
    p = multimodal.PALETTE64.astype(int)
    assert len(set(p[:, 0])) == 64 and len(set(p[:, 1])) == 64
    assert not (p[:, 0] == p[:, 1]).all()


def test_krippendorff_alpha_bounds_and_perfect_agreement():
    from blow_spark.oracle import duckdb_run
    from blow_spark.queries import oracle_sql

    df = duckdb_run(
        oracle_sql()["eval_krippendorff_alpha_nominal"],
        "/root/testdata/sf0.001",
    )
    assert (df.alpha_e6 <= 1_000_000).all()
    # dissent rules fire on ~1/7 + ~1/11 of units -> alpha well inside (0, 1)
    assert (df.alpha_e6 > 400_000).all() and (df.alpha_e6 < 999_999).all()
    # identity: do_pairs = 0 would give alpha exactly 1e6 — closed form
    n, cats = 10, (10, 10, 10)
    N = 3 * n
    de = sum(c * (N - c) for c in cats)
    alpha = 1 - (2 * 0 * N * (N - 1)) / (6 * n * de)
    assert alpha == 1.0


def test_jl_projection_expectation_and_exact_scale():
    from blow_spark.oracle import duckdb_run
    from blow_spark.queries import oracle_sql

    df = duckdb_run(
        oracle_sql()["vector_jl_projection_distortion"],
        "/root/testdata/sf0.001",
    )
    # E[|y|^2] = k * |q|^2 -> corpus mean ratio near 1 (JL guarantee);
    # per-vector spread is chi^2_16-wide, so only the mean is pinned
    assert 0.9e6 < df.ratio_e6.mean() < 1.1e6
    # x1024 quantization is exact: norms are stable integers > 0
    assert (df.norm_q2 > 0).all()


def test_jl_sign_mix_is_balanced():
    from blow_spark.queries.vectors import _JL_K, _jl_sign

    import duckdb

    rows = duckdb.sql(
        f"SELECT {_jl_sign('i', 'j')} AS s FROM"
        f" (SELECT UNNEST(range(0, 64)) AS i),"
        f" (SELECT UNNEST(range(0, {_JL_K})) AS j)"
    ).fetchall()
    signs = [r[0] for r in rows]
    assert set(signs) == {-1, 1}
    # near-balanced: a degenerate (parity-of-product) mix would be all +1
    frac = signs.count(1) / len(signs)
    assert 0.35 < frac < 0.65


# --------------------------------------------------------------------------
# Round-11 batch 4: WAV-ADPCM container + winnowing candidates
# --------------------------------------------------------------------------


def test_wav_adpcm_container_roundtrip():
    pred, idx = -1234, 40
    payload = bytes(range(32))
    block = struct.pack("<hBB", pred, idx, 0) + payload
    fmt = struct.pack("<HHIIHHHH", 0x11, 1, 8000, 8000 * 36 // 65, 36, 4, 2, 65)
    wav = (
        b"RIFF" + struct.pack("<I", 4 + 16 + len(fmt) + len(block)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(block)) + block
    )
    s = multimodal.decode_wav_adpcm(wav)
    ref = np.concatenate(
        [[pred], multimodal.decode_adpcm_ima(payload, pred, idx)]
    )
    assert len(s) == 65 and (s == ref).all()
    # header predictor IS the first sample; negative seed survives LE parse
    assert s[0] == -1234
    # decode_audio routes the compressed tag away from the wave module
    f = multimodal.decode_audio(wav)
    assert abs(f[0] - pred / 32768.0) < 1e-9
    # stereo is outside the subset — truthful gate
    fmt2 = struct.pack("<HHIIHHHH", 0x11, 2, 8000, 8000, 36, 4, 2, 65)
    wav2 = (
        b"RIFF" + struct.pack("<I", 4 + 16 + len(fmt2) + len(block)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt2)) + fmt2
        + b"data" + struct.pack("<I", len(block)) + block
    )
    with pytest.raises(NotImplementedError):
        multimodal.decode_wav_adpcm(wav2)


def test_winnowing_candidates_oracle_properties():
    from blow_spark.oracle import duckdb_run
    from blow_spark.queries import oracle_sql
    from blow_spark.queries.text3 import _WINDUP_MIN_SHARED

    df = duckdb_run(
        oracle_sql()["dedup_winnowing_candidates"], "/root/testdata/sf0.001"
    )
    assert len(df) > 0  # threshold calibrated non-degenerate at gate SF
    assert (df.shared_fp >= _WINDUP_MIN_SHARED).all()
    assert (df.doc_a < df.doc_b).all()


def test_hurst_rs_ladder_monotone_in_scale():
    """R/S grows with block scale for any persistent-ish series —
    corpus-level monotonicity of the per-scale means (Hurst's own
    diagnostic; a broken cumulative-deviation window flattens it)."""
    from blow_spark.oracle import duckdb_run
    from blow_spark.queries import oracle_sql

    df = duckdb_run(
        oracle_sql()["timeseries_hurst_rs_ladder"], "/root/testdata/sf0.001"
    )
    by_scale = df.groupby("scale_m").mean_rs_e6.mean()
    assert by_scale[8] < by_scale[16] < by_scale[32]
    # sqrt(m) lower bound-ish: R/S at scale m is >= ~1 in these units
    assert (df.mean_rs_e6 > 1_000_000).all()


def test_theil_nonnegative_and_between_le_within_max():
    from blow_spark.oracle import duckdb_run
    from blow_spark.queries import oracle_sql

    df = duckdb_run(
        oracle_sql()["stats_theil_inequality"], "/root/testdata/sf0.001"
    )
    # Theil T >= 0 (Jensen); the e6 rounding can leave at most a tiny
    # negative residue on a perfectly equal group — allow -5 ppm
    assert (df.theil_e6 >= -5).all()
    between = df[df.component == "between"].theil_e6.iloc[0]
    assert between >= 0
    # between-group inequality is far below the within-group levels on
    # a hash-partitioned fixture (nations are random customer slices)
    assert between < df[df.component != "between"].theil_e6.max()


def test_tiff_byte_order_gate():
    """Both TIFF byte orders decode to the same planted fields — and an
    order-blind parse provably cannot (the planted width exceeds 255,
    so its u16 bytes differ under swap)."""
    from blow_spark.oracle import duckdb_run
    from blow_spark.queries import oracle_sql

    df = duckdb_run(
        oracle_sql()["multimodal_tiff_header_meta"], "/root/testdata/sf0.001"
    )
    assert set(df.byte_order) == {"II", "MM"}
    assert (df.n_entries == 3).all()
    assert (df.width >= 16).all() and (df.width <= 4108).all()
    assert set(df.bits_per_sample) == {8, 16}
    # swap-sensitivity: some widths need both bytes (> 255), so a parser
    # that ignores the mark cannot reproduce them for the MM half
    assert (df[df.byte_order == "MM"].width > 255).any()
