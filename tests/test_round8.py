"""Property tests for the round-8 operators — invariants the oracle's
value-hash can't express: estimator guarantees (priority sampling),
brute-force replays (concurrency sweep, KS statistic, Gram matrix),
and structural sanity (RAKE phrases)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from blow_spark.queries import queries

SF = "/root/testdata/sf0.001"
ALL = queries()


def test_priority_sample_invariants(spark):
    """Top-k selection: every kept row's priority must be >= tau (the
    (k+1)-th priority), and every estimate >= its own weight (the
    max(w, tau) estimator's floor)."""
    pdf = ALL["sample_priority_weighted"](spark, SF).toPandas()
    assert len(pdf) == 20
    assert (pdf["priority"] >= pdf["tau"] - 0.01).all()  # kept = top-k
    assert (pdf["est_dollars"] * 100 >= pdf["weight_cents"] - 1).all()
    # tau identical across rows (one threshold per draw)
    assert pdf["tau"].nunique() == 1


def test_concurrency_peak_bruteforce(spark):
    """Replay the +1/-1 sweep in pandas over the same spans and compare
    the peak and its first attainment time."""
    from blow_spark.sources import read_table
    from pyspark.sql import functions as F

    e = read_table(spark, SF, "events")
    spans = (
        e.groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(F.min("ts").alias("t0"), F.max("ts").alias("t1"))
        .toPandas()
    )
    pts = []
    for _, r in spans.iterrows():
        pts.append((r["t0"], 1, r["user_id"]))
        pts.append((r["t1"], -1, r["user_id"]))
    pts.sort(key=lambda p: (p[0], -p[1], p[2]))
    run, peak, peak_ts = 0, -1, None
    for ts, d, _u in pts:
        run += d
        if run > peak:
            peak, peak_ts = run, ts
    got = ALL["events_concurrency_peak"](spark, SF).toPandas()
    assert int(got["peak_concurrency"][0]) == peak
    assert pd.Timestamp(got["first_peak_ts"][0]) == pd.Timestamp(peak_ts)
    assert int(got["n_spans"][0]) == len(spans)


def test_ks_two_sample_bruteforce(spark):
    """Recompute D = max|F0 - F1| directly from the per-user metric."""
    from blow_spark.sources import read_table
    from pyspark.sql import functions as F

    e = read_table(spark, SF, "events")
    pu = (
        e.groupBy("user_id")
        .agg(
            F.round(
                F.coalesce(
                    F.sum(F.col("value").cast("decimal(18,6)")), F.lit(0)
                )
                * 1_000_000
            )
            .cast("bigint")
            .alias("yi")
        )
        .toPandas()
    )
    pu["arm"] = pu["user_id"] % 2
    a = np.sort(pu[pu.arm == 0]["yi"].to_numpy())
    b = np.sort(pu[pu.arm == 1]["yi"].to_numpy())
    grid = np.unique(np.concatenate([a, b]))
    f0 = np.searchsorted(a, grid, side="right") / len(a)
    f1 = np.searchsorted(b, grid, side="right") / len(b)
    d_expect = np.abs(f0 - f1).max()
    got = ALL["stats_ks_two_sample"](spark, SF).toPandas()
    assert abs(float(got["ks_d"][0]) - d_expect) < 1e-6


def test_gram_matrix_matches_numpy(spark):
    """The distributed partial-aggregate X^T X must equal a single
    numpy product over the same quantized matrix."""
    from blow_spark.sources import read_table

    emb = read_table(spark, SF, "embeddings").toPandas()
    X = np.stack(
        emb["embedding"].map(
            lambda v: np.round(np.asarray(v, dtype="float64") * 1000).astype(
                "int64"
            )
        )
    )
    G = X.T @ X
    n = X.shape[0]
    s = X.sum(axis=0)
    got = ALL["vector_gram_matrix_pandas"](spark, SF).toPandas()
    for _, r in got.iterrows():
        i, j = int(r["i"]) - 1, int(r["j"]) - 1
        assert int(r["gram_int"]) == int(G[i, j])
        c = (n * G[i, j] - s[i] * s[j]) / (
            np.sqrt(float(G[i, i]) * n - s[i] * s[i])
            * np.sqrt(float(G[j, j]) * n - s[j] * s[j])
        )
        assert abs(float(r["corr"]) - round(c, 6)) < 1e-9
    # top-10 by |corr| really is the global top-10
    corrs = []
    for i in range(64):
        for j in range(i + 1, 64):
            c = (n * G[i, j] - s[i] * s[j]) / (
                np.sqrt(float(G[i, i]) * n - s[i] * s[i])
                * np.sqrt(float(G[j, j]) * n - s[j] * s[j])
            )
            corrs.append(abs(c))
    corrs.sort(reverse=True)
    assert abs(abs(float(got["corr"].iloc[-1])) - corrs[9]) < 1e-6


def test_rake_phrases_structure(spark):
    """Phrases contain no stopwords, scores are positive, and the list
    is sorted by score descending."""
    pdf = ALL["text_rake_keywords"](spark, SF).toPandas()
    assert len(pdf) == 15
    for phrase in pdf["phrase"]:
        toks = phrase.split(" ")
        assert toks, phrase
        assert all(t not in ("a", "the") and t != "" for t in toks), phrase
    scores = pdf["rake_score"].to_list()
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)


def test_interpurchase_percentiles_replay(spark):
    """Type-1 quantile definition replayed in pandas."""
    from blow_spark.sources import read_table

    o = read_table(spark, SF, "orders").toPandas()
    c = read_table(spark, SF, "customer").toPandas()
    df = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    df = df.sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
    df["gap"] = (
        df.groupby("o_custkey")["o_orderdate"].diff().dt.days
    )
    got = ALL["orders_interpurchase_percentiles"](spark, SF).toPandas()
    for _, r in got.iterrows():
        gaps = np.sort(
            df[df["c_mktsegment"] == r["seg"]]["gap"].dropna().to_numpy()
        )
        q = r["pctl"] / 100.0
        expect = gaps[int(np.ceil(q * len(gaps))) - 1]
        assert int(r["gap_days"]) == int(expect), (r["seg"], r["pctl"])
        assert int(r["n_gaps"]) == len(gaps)


def test_maxsim_is_bounded_and_self_free(spark):
    """MaxSim scores are sums of 4 cosines: |score| <= 4e9 in e9 units;
    no query returned as its own neighbor; exactly 3 per query."""
    pdf = ALL["similarity_maxsim_multivector"](spark, SF).toPandas()
    assert (pdf["query_id"] != pdf["neighbor_id"]).all()
    assert (pdf["maxsim_e9"].abs() <= 4_000_000_000).all()
    counts = pdf.groupby("query_id").size()
    assert (counts == 3).all()
