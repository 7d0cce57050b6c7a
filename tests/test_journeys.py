"""Operator-level invariants for the round-7 journey/linkage additions —
properties the DuckDB oracle compare cannot express directly."""

from __future__ import annotations

from pyspark.sql import functions as F

from blow_spark.queries import queries

SF = "/root/testdata/sf0.001"


def test_km_survival_monotone_nonincreasing(spark):
    """KM survival is a product of factors in (0,1] — it must be
    non-increasing in t and start ≤ 1."""
    rows = (
        queries()["events_kaplan_meier_retention"](spark, SF)
        .orderBy("t")
        .collect()
    )
    assert rows, "KM curve is empty"
    prev = 1.0
    for r in rows:
        assert 0.0 <= r.survival <= prev + 1e-9, (r.t, r.survival, prev)
        prev = r.survival
    # the at-risk set shrinks by exactly the leavers at each step
    for a, b in zip(rows, rows[1:]):
        assert b.n_risk == a.n_risk - a.n_events - a.n_censored


def test_mau_dominates_dau_and_is_monotone_in_window(spark):
    """A 7-day active count can never be below the 1-day count."""
    rows = queries()["events_mau_bitmap_rolling"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r.mau7 >= r.dau >= 0, r


def test_twap_bounded_by_value_range(spark):
    """A time-weighted average lies within [min, max] of the values."""
    from blow_spark.sources import read_table

    bounds = (
        read_table(spark, SF, "events")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
        .first()
    )
    rows = queries()["timeseries_time_weighted_avg"](spark, SF).collect()
    assert rows
    for r in rows:
        assert bounds.lo - 1e-3 <= r.twap <= bounds.hi + 1e-3, r


def test_asof_nearest_gap_is_minimal(spark):
    """Brute-force replay: the chosen click must achieve the minimal
    |gap| among ALL same-user clicks (direction tie rules aside)."""
    from blow_spark.sources import read_table

    res = {
        r.event_id: r
        for r in queries()["join_asof_nearest"](spark, SF).collect()
    }
    e = read_table(spark, SF, "events")
    err = e.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", F.unix_micros("ts").alias("us")
    )
    clk = e.filter(F.col("event_type") == "click").select(
        "user_id", F.unix_micros("ts").alias("cus")
    )
    best = (
        err.join(clk, "user_id")
        .groupBy("event_id")
        .agg(F.min(F.abs(F.col("cus") - F.col("us"))).alias("min_gap"))
        .collect()
    )
    assert best
    for b in best:
        assert res[b.event_id].gap_us == b.min_gap, b


def test_linkpred_respects_degree_cap(spark):
    """No returned pair's common-part count can exceed the degree cap
    times anything — more precisely, every common part counted passed
    the ≤60-buyer block, so common_parts ≤ number of kept parts and
    pair ordering is cust_a < cust_b."""
    rows = queries()["graph_common_neighbors_linkpred"](spark, SF).collect()
    assert rows
    assert len(rows) <= 50
    for r in rows:
        assert r.cust_a < r.cust_b
        assert r.common_parts >= 1
    # top-50 ordering is (common_parts DESC, cust_a, cust_b)
    key = [(-r.common_parts, r.cust_a, r.cust_b) for r in rows]
    assert key == sorted(key)


def test_association_rules_probability_bounds(spark):
    """Confidence is a probability; support never exceeds either
    marginal count."""
    rows = queries()["basket_association_rules"](spark, SF).collect()
    assert rows, "min-support threshold left no rules (vacuous fixture)"
    for r in rows:
        assert 0.0 < r.confidence_ab <= 1.0
        assert r.n_both <= r.n_a and r.n_both <= r.n_b
        assert r.lift > 0.0


def test_kneser_ney_probabilities_valid(spark):
    """KN probabilities are in (0, 1]; logprob consistent with prob."""
    import math

    rows = queries()["text_bigram_kneser_ney"](spark, SF).collect()
    assert len(rows) == 100
    for r in rows:
        assert 0.0 < r.kn_prob <= 1.0, r
        assert abs(r.kn_logprob - round(math.log(max(r.kn_prob, 1e-12)), 1)) < 2.5
        # discounted ML term alone can't exceed the full probability


def test_dim_truncation_recall_bounds(spark):
    rows = queries()["similarity_dim_truncation_recall"](spark, SF).collect()
    assert len(rows) == 20  # one per query vector
    for r in rows:
        assert 0 <= r.n_overlap <= 10
        assert abs(r.recall_at_10 - r.n_overlap / 10.0) < 1e-9


def test_global_running_sum_matches_naive(spark):
    """ops.global_running_sum == the naive single-partition prefix sum."""
    from blow_spark import ops

    df = spark.range(1000).select(
        F.col("id"), ((F.col("id") * 37) % 101).cast("bigint").alias("v")
    )
    got = {
        r.id: r.rs
        for r in ops.global_running_sum(
            df, [F.col("v").desc(), F.col("id").asc()], "v", out_col="rs"
        ).collect()
    }
    rows = sorted(df.collect(), key=lambda r: (-r.v, r.id))
    acc = 0
    for r in rows:
        acc += r.v
        assert got[r.id] == acc, (r.id, got[r.id], acc)


def test_global_running_sum_signed_values(spark):
    """Signed deltas (refunds/CUSUM shape): per-partition totals must be
    SUM, not MAX of the running column — max(run) != partition sum as
    soon as any value is negative (advice r7)."""
    from blow_spark import ops

    df = spark.range(1000).select(
        F.col("id"),
        (((F.col("id") * 37) % 101) - 50).cast("bigint").alias("v"),
    )
    got = {
        r.id: r.rs
        for r in ops.global_running_sum(
            df, [F.col("id").asc()], "v", num_parts=8, out_col="rs"
        ).collect()
    }
    acc = 0
    for r in sorted(df.collect(), key=lambda r: r.id):
        acc += r.v
        assert got[r.id] == acc, (r.id, got[r.id], acc)


def test_abc_pareto_partitions_all_parts(spark):
    rows = {r.abc_class: r for r in queries()["orders_abc_pareto"](spark, SF).collect()}
    assert set(rows) <= {"A", "B", "C"} and "A" in rows
    total_share = sum(r.revenue_share for r in rows.values())
    assert abs(total_share - 1.0) < 1e-4
    # A-class revenue share is the head of the curve
    assert rows["A"].revenue_share >= rows.get("C", rows["A"]).revenue_share


def test_time_to_convert_percentiles_ordered(spark):
    r = queries()["events_time_to_convert"](spark, SF).first()
    assert r.n_converted > 0
    assert 0 <= r.p25_s <= r.p50_s <= r.p90_s


def test_pq_codes_in_range_and_error_nonnegative(spark):
    rows = queries()["vector_pq_quantize"](spark, SF).collect()
    assert len(rows) == 500
    for r in rows:
        codes = [int(c) for c in r.pq_code.split("-")]
        assert len(codes) == 4 and all(0 <= c <= 7 for c in codes)
        assert r.total_d2_e12 >= 0
