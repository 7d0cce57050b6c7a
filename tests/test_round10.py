"""Round-10 property pins beyond the oracle gate.

1. Geohash: the pure-integer interleave pipeline must equal the
   canonical bisection algorithm for a grid of coordinates, and the
   published known answer for the geohash spec's classic example.
2. Tree split: the histogram Gini argmax must equal a brute-force
   per-threshold replay in Python.
3. NDCG: the injected integer discount table is the real 1/log2 curve.
"""

from __future__ import annotations

import math

import duckdb


# --- canonical geohash bisection (the spec's algorithm) -------------------

_GH32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _geohash_bisect(lat: float, lon: float, nchars: int) -> str:
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    bits, even, out, ch = 0, True, [], 0
    while len(out) < nchars:
        if even:
            mid = (lon_lo + lon_hi) / 2
            if lon >= mid:
                ch = (ch << 1) | 1
                lon_lo = mid
            else:
                ch = ch << 1
                lon_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2
            if lat >= mid:
                ch = (ch << 1) | 1
                lat_lo = mid
            else:
                ch = ch << 1
                lat_hi = mid
        even = not even
        bits += 1
        if bits == 5:
            out.append(_GH32[ch])
            bits, ch = 0, 0
    return "".join(out)


def _geohash_integer(lat_mu: int, lon_mu: int, nchars: int) -> str:
    """Pure-Python replica of the query's integer pipeline."""
    latbits = (lat_mu + 90_000_000) * 1048576 // 180_000_000
    lonbits = (lon_mu + 180_000_000) * 1048576 // 360_000_000
    out = []
    for k in range(nchars):
        ch = 0
        for j in range(5):
            m = 5 * k + j
            if m % 2 == 0:
                bit = (lonbits >> (19 - m // 2)) & 1
            else:
                bit = (latbits >> (19 - (m - 1) // 2)) & 1
            ch = (ch << 1) | bit
        out.append(_GH32[ch])
    return "".join(out)


def test_geohash_integer_equals_bisection():
    # µ-degree grid over the full domain, incl. cell-boundary-adjacent
    # points; 8 chars = 40 bits uses exactly the 20+20 quantizer bits.
    for i in range(-6, 7):
        for j in range(-12, 13):
            lat_mu = i * 9_999_937 % 180_000_001 - 90_000_000
            lon_mu = j * 14_999_981 % 360_000_001 - 180_000_000
            assert _geohash_integer(lat_mu, lon_mu, 8) == _geohash_bisect(
                lat_mu / 1e6, lon_mu / 1e6, 8
            ), (lat_mu, lon_mu)


def test_geohash_known_answer():
    # the geohash spec's canonical example: 57.64911, 10.40744 → u4pruydq
    assert _geohash_integer(57_649_110, 10_407_440, 8) == "u4pruydq"


def test_geohash_sql_twin_matches_python():
    """The generated DuckDB-side expression equals the Python replica
    (and therefore the bisection spec) on a sample of points."""
    from blow_spark.queries.spatial import _GH_DUCK

    con = duckdb.connect()
    rows = con.execute(
        f"""
        WITH pts AS (
          SELECT (x * 9999937) % 180000001 - 90000000 AS lat,
                 (x * 14999981) % 360000001 - 180000000 AS lon
          FROM generate_series(1, 50) t(x)
        ), bits AS (
          SELECT lat, lon,
                 (lat + 90000000) * 1048576 // 180000000 AS latbits,
                 (lon + 180000000) * 1048576 // 360000000 AS lonbits
          FROM pts
        )
        SELECT lat, lon, {_GH_DUCK} AS gh FROM bits
        """
    ).fetchall()
    for lat_mu, lon_mu, gh in rows:
        assert gh == _geohash_integer(lat_mu, lon_mu, 8)


def test_tree_split_matches_bruteforce(spark, sf_dir):
    """The histogram Gini argmax equals a per-threshold brute force."""
    from blow_spark.queries import queries

    pdf = duckdb.connect().execute(
        f"SELECT n_chars, CAST(lang = 'en' AS INT) AS y "
        f"FROM read_parquet('{sf_dir}/documents.parquet')"
    ).df()
    vals = sorted(pdf["n_chars"].unique())
    n_all = len(pdf)
    pos_all = int(pdf["y"].sum())

    def gini(pos, n):
        return 1.0 - (pos * pos + (n - pos) * (n - pos)) / (n * n)

    best = None
    for t in vals:
        left = pdf[pdf["n_chars"] <= t]
        n_l, pos_l = len(left), int(left["y"].sum())
        if n_l == 0 or n_l == n_all:
            continue
        gain = (
            gini(pos_all, n_all)
            - n_l / n_all * gini(pos_l, n_l)
            - (n_all - n_l) / n_all * gini(pos_all - pos_l, n_all - n_l)
        )
        key = (round(gain * 1e9), -t)
        if best is None or key > best[0]:
            best = (key, t)
    got = queries()["ml_tree_split_gini"](spark, sf_dir).collect()[0]
    assert got["threshold"] == best[1]


def test_ndcg_discount_table():
    from blow_spark.queries.evalrank import _DISC_E9, _NDCG_K

    assert len(_DISC_E9) == _NDCG_K
    assert _DISC_E9[0] == 10**9  # 1/log2(2) = 1
    assert all(a > b for a, b in zip(_DISC_E9, _DISC_E9[1:]))
    for i, d in enumerate(_DISC_E9):
        assert d == round(1e9 / math.log2(i + 2))


def test_wordpiece_segmentation_reconstructs(spark, sf_dir):
    """Stripping '##' from the pieces and concatenating must rebuild the
    word exactly — the lossless-segmentation invariant of WordPiece."""
    from blow_spark.queries import queries

    rows = queries()["tokenizer_wordpiece_greedy"](spark, sf_dir).collect()
    assert rows, "empty segmentation output"
    for r in rows:
        pieces = r["segmentation"].split(" ")
        assert pieces[0] == pieces[0].lstrip("#"), "first piece is continuation"
        rebuilt = pieces[0] + "".join(p[2:] for p in pieces[1:])
        assert rebuilt == r["word"], (r["word"], r["segmentation"])
        assert r["n_pieces"] == len(pieces)


def test_holt_coefficients_exact_dyadic():
    """The injected Holt coefficients are the exact impulse response of
    the (α=1/2, β=1/4) recursion and sum to ≈ the unit step."""
    from fractions import Fraction as Fr

    from blow_spark.queries.finance import _HOLT_CB, _HOLT_CL, _HOLT_D, _HOLT_K

    A, B = Fr(1, 2), Fr(1, 4)
    l_prev, b_prev = Fr(0), Fr(0)
    for t in range(_HOLT_K):
        x = Fr(1) if t == 0 else Fr(0)
        lv = A * x + (1 - A) * (l_prev + b_prev)
        bv = B * (lv - l_prev) + (1 - B) * b_prev
        assert _HOLT_CL[t] == lv * _HOLT_D
        assert _HOLT_CB[t] == bv * _HOLT_D
        l_prev, b_prev = lv, bv
    assert abs(sum(_HOLT_CL) / _HOLT_D - 1) < 0.01  # tail ≈ 0.2% dropped


def test_kl_divergence_nonnegative(spark, sf_dir):
    """Gibbs' inequality: every per-source KL against the corpus mix is
    ≥ 0 (up to the e6 per-term fixpoint quantum × bucket count)."""
    from blow_spark.queries import queries

    rows = queries()["corpus_length_kl_by_source"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["kl_e6_sum"] >= -20, r  # ≥ −(buckets × ½ quantum)


def test_kcenter_min_distances_nonincreasing(spark, sf_dir):
    """Farthest-point selection distances are non-increasing in the
    round number (each added seed can only shrink min-distances)."""
    from blow_spark.queries import queries

    rows = queries()["vector_kcenter_greedy_seed"](spark, sf_dir).collect()
    ds = [r["mind_e6"] for r in sorted(rows, key=lambda r: r["sel_round"])]
    assert ds[0] == 0
    assert all(a >= b for a, b in zip(ds[1:], ds[2:])), ds
