"""Round-11 property pins beyond the oracle gate.

1. Bollinger: the ±2σ breakout flag must be NON-degenerate on the
   fixture (the round-10 bug — a spurious ×n in the integer
   inequality — made the effective band ≈ ±8.9σ and flagged 0 rows;
   the oracle could not catch it because both engines shared the
   error). Pin both directions: some rows break out, most don't, and
   every flag agrees with a float replay of |x − µ| > 2σ evaluated
   far from the boundary.
2. Quantile normalization: per-source normalized SUMS must be
   invariant under an uneven source split (the round-10 oracle used
   DuckDB float '/' + round-to-nearest CAST, which only agreed with
   Spark's integer ceiling because the fixture's sources divide
   n_all exactly).
3. Macro-F1: a class absent from both gold and pred must be EXCLUDED
   from the macro denominator, not counted as F1=0.
"""

from __future__ import annotations

import duckdb


def test_bollinger_breakouts_nondegenerate(spark, sf_dir):
    from blow_spark.queries import queries

    rows = queries()["finance_bollinger_breakouts"](spark, sf_dir).collect()
    assert rows
    n_break = sum(r["is_breakout"] for r in rows)
    # a real ±2σ band on ~gaussian-ish daily revenue flags a few % of
    # days — never zero, never the majority
    assert 0 < n_break < len(rows) // 2, (n_break, len(rows))
    # float replay, trusted away from the decision boundary (>1e-6
    # relative margin); exact-integer flag must agree there
    for r in rows:
        n = 20
        dev = int(r["dev_xn"])  # n·x − S, exact
        mean_x100 = r["mean_cents_x100"]
        sigma_d = r["sigma_dollars"]
        sigma_xn_cents = sigma_d * 100.0 * n  # n·σ in cents
        lhs, rhs = abs(dev), 2.0 * sigma_xn_cents
        if rhs > 0 and abs(lhs - rhs) / rhs > 1e-4:
            assert r["is_breakout"] == int(lhs > rhs), (
                dev,
                mean_x100,
                sigma_d,
                r,
            )


def test_quantile_normalize_oracle_uneven_split():
    """Replay the ml_quantile_normalize ORACLE SQL on a tiny corpus
    whose sources do NOT divide the total evenly (7 + 5 docs): the
    integer-ceiling g_rank must stay in [1, n_all] and every doc must
    get exactly one normalized value (the float-division oracle bug
    dropped/duplicated rows whenever 2·n_src ∤ (2r−1)·n_all)."""
    from blow_spark.queries import oracle_sql

    sql = oracle_sql()["ml_quantile_normalize"]
    con = duckdb.connect()
    con.execute(
        """
        CREATE VIEW documents AS
        SELECT * FROM (VALUES
          (1,'a',37),(2,'a',144),(3,'a',55),(4,'a',199),(5,'a',62),
          (6,'a',301),(7,'a',88),
          (8,'b',41),(9,'b',250),(10,'b',93),(11,'b',170),(12,'b',12)
        ) AS t(doc_id, source, n_chars)
        """
    )
    out = con.execute(sql).fetchall()
    # columns: source, n_docs, sum_raw, sum_norm, min_norm, max_norm
    by_src = {r[0]: r for r in out}
    assert by_src["a"][1] == 7 and by_src["b"][1] == 5
    all_vals = [37, 144, 55, 199, 62, 301, 88, 41, 250, 93, 170, 12]
    lo, hi = min(all_vals), max(all_vals)
    for r in out:
        assert lo <= r[4] <= r[5] <= hi, r
    # Python ground truth: rank r of n_src maps to global order stat
    # at ceil((2r-1)*N / (2*n_src)), type-1
    svals = sorted(all_vals)
    for src, vals in (("a", [37, 55, 62, 88, 144, 199, 301]),
                      ("b", [12, 41, 93, 170, 250])):
        n_src, n_all = len(vals), len(all_vals)
        expect = sum(
            svals[-((-(2 * r - 1) * n_all) // (2 * n_src)) - 1]
            for r in range(1, n_src + 1)
        )
        assert by_src[src][3] == expect, (src, by_src[src][3], expect)


def test_macro_f1_excludes_absent_classes():
    """Oracle replay with one of the 5 classes absent from gold AND
    pred: macro_f1 must average the 4 defined per-class F1s (here all
    perfect → 1.0), not 4/5."""
    from blow_spark.queries import oracle_sql

    sql = oracle_sql()["eval_confusion_prf_macro"]
    con = duckdb.connect()
    # perfect classifier over 4 classes; 'fr' never appears: its
    # length bucket (480..599) is unpopulated and no gold doc is fr
    rows, langs = [], ["en", "zh", "es", "de"]
    for i, lang in enumerate(langs):
        for j in range(3):
            # n_chars chosen so n_chars // 120 == i → pred == lang
            rows.append(f"({i * 3 + j + 1},'{lang}',{120 * i + 10 + j})")
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        + ",".join(rows)
        + ") AS t(doc_id, lang, n_chars)"
    )
    out = con.execute(sql).fetchall()
    assert len(out) == 5
    macro = {r[0]: r[7] for r in out}
    for lang in langs:
        assert macro[lang] == 1.0, out


def test_exact_substring_excise_constructed(spark):
    """Known-answer pin for dedup.exact_substring_excise on a crafted
    corpus: a 60-char boilerplate shared by two docs is excised from
    both (the full 60 chars, not just one 40-window), unique text
    stays, and sub-threshold (<40 char) repeats survive."""
    from blow_spark.dedup import exact_substring_excise

    boiler = "B" * 25 + "OILERPLATE-LICENSE-HEADER-" + "B" * 9  # 60 chars
    assert len(boiler) == 60
    uniq_a = "alpha text that is entirely unique to document A here."
    uniq_b = "totally different beta body for document B, also unique."
    short_rep = "tiny-repeat "  # 12 chars, repeated but < 40: must stay
    rows = [
        (1, short_rep + boiler + uniq_a),
        (2, uniq_b + boiler + short_rep),
        (3, "no duplicates at all in this third document, short."),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: r
        for r in exact_substring_excise(
            df, "text", "doc_id", min_len=40, min_count=2
        ).collect()
    }
    assert out[1]["clean_text"] == short_rep + uniq_a
    assert out[2]["clean_text"] == uniq_b + short_rep
    assert out[3]["clean_text"] == rows[2][1]
    for doc_id, text in rows:
        r = out[doc_id]
        assert r["n_chars_kept"] + r["n_chars_removed"] == len(text)
    assert out[1]["n_chars_removed"] == 60
    assert out[2]["n_chars_removed"] == 60
    assert out[3]["n_chars_removed"] == 0


def test_exact_substring_merges_overlapping_windows(spark):
    """A 100-char duplicated run is one merged interval: every one of
    its 61 overlapping 40-windows is duplicated, and the interval fold
    must excise exactly the 100-char union, splicing the remainder."""
    from blow_spark.dedup import exact_substring_excise

    dup = "".join(chr(ord("a") + (i * 7) % 26) for i in range(100))
    rows = [(1, "head-" + dup + "-tail"), (2, dup)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: r
        for r in exact_substring_excise(
            df, "text", "doc_id", min_len=40, min_count=2
        ).collect()
    }
    assert out[1]["clean_text"] == "head--tail"
    assert out[2]["clean_text"] == ""
    assert out[2]["n_chars_kept"] == 0
