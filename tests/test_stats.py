"""Statistical-test family invariants (the oracle compare in
test_queries_oracle.py covers exactness; these pin the math's internal
consistency so a formula transposition can't pass both sides)."""

from __future__ import annotations

from blow_spark.queries import queries

SF = "/root/testdata/sf0.001"


def test_welch_df_bounds(spark):
    r = queries()["stats_welch_ttest"](spark, SF).first()
    # Welch-Satterthwaite df lies between min(n)-1 and n0+n1-2
    assert min(r.n0, r.n1) - 1 <= r.welch_df <= r.n0 + r.n1 - 2
    assert r.n0 > 0 and r.n1 > 0


def test_chi_square_nonnegative_df(spark):
    r = queries()["stats_chi_square_independence"](spark, SF).first()
    assert r.chi2_stat >= 0.0
    assert r.df == 16  # (5 segments - 1) x (5 regions - 1)
    assert r.n > 0


def test_mann_whitney_u_range(spark):
    r = queries()["stats_mann_whitney_u"](spark, SF).first()
    # U in [0, na*nb] (doubled representation; VARCHAR exact transport
    # since round 14 -- O(n^2) crosses int64 near sf1000)
    assert 0 <= int(r.u_a_x2) <= 2 * r.na * r.nb
    # near-balanced hash arms => z should not be astronomical
    assert abs(r.z_stat_e6) < 50_000_000


def test_benjamini_hochberg_stepup(spark):
    rows = sorted(
        queries()["stats_benjamini_hochberg"](spark, SF).collect(),
        key=lambda r: r.p_rank,
    )
    assert [r.p_rank for r in rows] == list(range(1, len(rows) + 1))
    # rejections form a prefix of the p-value ranking (step-up property)
    flags = [r.rejected for r in rows]
    assert flags == sorted(flags, reverse=True)
    # every rejected row's p is <= the threshold at the cut rank
    k = sum(flags)
    if k:
        assert rows[k - 1].p_cheb <= rows[k - 1].bh_threshold


def test_mode_is_max_count(spark):
    import pyspark.sql.functions as F

    from blow_spark.sources import read_table

    got = {
        r.l_returnflag: (r.mode_quantity, r.mode_count)
        for r in queries()["agg_mode_exact"](spark, SF).collect()
    }
    li = read_table(spark, SF, "lineitem")
    counts = (
        li.groupBy("l_returnflag", F.col("l_quantity").cast("bigint").alias("v"))
        .count()
        .collect()
    )
    by_flag: dict[str, list] = {}
    for r in counts:
        by_flag.setdefault(r.l_returnflag, []).append((r["count"], r.v))
    for flag, vs in by_flag.items():
        best = max(c for c, _ in vs)
        want_v = min(v for c, v in vs if c == best)
        assert got[flag] == (want_v, best)


def test_geo_harmonic_mean_ordering(spark):
    rows = queries()["agg_geo_harmonic_means"](spark, SF).collect()
    assert rows
    for r in rows:
        # AM-GM-HM inequality: harmonic <= geometric (strict unless constant)
        assert r.harmonic_mean <= r.geo_mean + 1e-6
        assert r.geo_mean > 0 and r.harmonic_mean > 0


def test_degree_assortativity_range(spark):
    r = queries()["graph_degree_assortativity"](spark, SF).first()
    assert r.n_edges > 0
    assert -1.0 <= r.assortativity <= 1.0


def test_clustering_coefficient_bounds(spark):
    r = queries()["graph_clustering_coefficient"](spark, SF).first()
    assert r.n_nodes > 0 and r.n_wedges > 0
    # transitivity lies in [0, 1]; triangles never exceed wedges/3
    assert 0.0 <= r.global_cc <= 1.0
    assert 3 * r.n_triangles <= r.n_wedges


def test_autocorrelation_bounds(spark):
    rows = queries()["timeseries_autocorrelation"](spark, SF).collect()
    assert [r.lag for r in rows] == list(range(1, 8))
    for r in rows:
        assert r.n_pairs > 0
        # sample ACF with data-derived pair sets stays within [-1, 1]
        # up to the missing-day normalization slack
        assert -1.05 <= r.acf <= 1.05


def test_power_user_curve_accounting(spark):
    from blow_spark.sources import read_table
    import pyspark.sql.functions as F

    rows = queries()["events_power_user_curve"](spark, SF).collect()
    assert rows
    total_users = sum(r.n_users for r in rows)
    e = read_table(spark, SF, "events")
    want = (
        e.select(F.date_format("ts", "yyyy-MM").alias("m"), "user_id")
        .distinct()
        .count()
    )
    # every (month, user) lands in exactly one active-days bin
    assert total_users == want
    assert all(1 <= r.active_days <= 31 for r in rows)


def test_dbscan_core_points_nonvacuous(spark):
    rows = queries()["spatial_dbscan_core_points"](spark, SF).collect()
    assert rows, "epsilon too small: no neighbor pairs at the gate SF"
    assert any(r.is_core for r in rows)
    for r in rows:
        assert r.n_neighbors >= 1
        assert r.is_core == (r.n_neighbors >= 2)


def test_soft_reweight_mass_conservation(spark):
    rows = queries()["dedup_soft_reweight"](spark, SF).collect()
    n_docs = len(rows)
    assert n_docs > 0
    # every doc present exactly once; weights bounded by 10000/size
    by_cluster: dict[int, list] = {}
    for r in rows:
        by_cluster.setdefault(r.cluster, []).append(r)
    assert sum(len(v) for v in by_cluster.values()) == n_docs
    multi = 0
    for cl, members in by_cluster.items():
        size = members[0].cluster_size
        assert len(members) == size
        for m in members:
            assert m.weight_bp == 10000 // size
        if size > 1:
            multi += 1
    assert multi > 0, "fixture has no dup clusters: reweighting vacuous"


def test_naive_bayes_beats_majority_class(spark):
    import collections

    from blow_spark.sources import read_table

    rows = queries()["text_naive_bayes_langid"](spark, SF).collect()
    acc = sum(r.is_correct for r in rows) / len(rows)
    langs = collections.Counter(
        r.lang for r in read_table(spark, SF, "documents").select("lang").collect()
    )
    majority = max(langs.values()) / sum(langs.values())
    # resubstitution accuracy must beat always-predict-majority: the
    # likelihood table carries real signal (measured 0.438 vs 0.386)
    assert acc > majority, (acc, majority)


def test_named_window_single_shuffle(spark):
    """The three named specs share one partitioning -> exactly one hash
    exchange and one sort in the physical plan."""
    import sys

    sys.path.insert(0, "/root/repo/tests")
    from plan_guard import exchange_counts, physical_plan

    df = queries()["sql_named_window_front_door"](spark, SF)
    plan = physical_plan(df)
    assert exchange_counts(plan) == (1, 0)
    assert plan.count("Sort") == 1


def test_filter_clause_subset_invariants(spark):
    rows = queries()["sql_filter_clause_front_door"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_discounted <= r.n_rows
        assert r.bulk_suppliers >= 0


def test_skewness_kurtosis_bounds(spark):
    rows = queries()["agg_skewness_kurtosis"](spark, SF).collect()
    assert rows
    for r in rows:
        # kurtosis >= skewness^2 - 2 (Pearson inequality) for any dist
        assert r.excess_kurtosis + 3 >= r.skewness**2 + 1 - 1e-6
        assert abs(r.skewness) < 10


def test_scd2_point_in_time_unique_match(spark):
    rows = queries()["join_scd2_point_in_time"](spark, SF).collect()
    assert rows
    # SCD2 intervals never overlap => each purchase matches at most once
    ids = [r.event_id for r in rows]
    assert len(ids) == len(set(ids))


def test_seasonal_naive_backtest_bounds(spark):
    r = queries()["timeseries_seasonal_naive_backtest"](spark, SF).first()
    assert r.n_days > 0
    assert r.mae >= 0
    assert 0.0 <= r.smape <= 2.0  # sMAPE is bounded by 2 by construction


def test_class_balance_uniform_labels(spark):
    import collections

    rows = queries()["sample_class_balance"](spark, SF).collect()
    counts = collections.Counter(r.lang for r in rows)
    k = rows[0].class_size
    assert len(counts) >= 2
    assert all(v == k for v in counts.values()), counts
