"""Spatial grid join: adversarial blocking geometry + a pure-Python
third-engine replay of the rolling-MAD window."""

from __future__ import annotations

import duckdb

from pyspark.sql import functions as F

from blow_spark.queries import queries
from blow_spark.queries.spatial import _EPS_MU, grid_epsilon_pairs

EPS2 = _EPS_MU * _EPS_MU


def _pts(spark, rows, idcol):
    return spark.createDataFrame(rows, f"{idcol} long, lat long, lon long")


def _pairs(spark, probes, builds):
    return {
        (r.probe_id, r.build_id, r.d2_mu)
        for r in grid_epsilon_pairs(
            _pts(spark, probes, "probe_id"), _pts(spark, builds, "build_id"), _EPS_MU
        ).collect()
    }


def test_grid_blocking_geometry(spark):
    """Planted points exercising every blocking edge: the exact-ε
    boundary pair across adjacent cells, a diagonal-corner pair, a
    coincident pair, an over-ε pair INSIDE one cell (cells are ε×ε so
    in-cell distance reaches ε√2), and an over-ε pair across cells."""
    probes = [(1, 0, 0), (2, 5_999_999, 5_999_999)]
    builds = [
        (10, _EPS_MU, 0),  # adjacent cell, d2 == ε² exactly → kept
        (11, _EPS_MU + 1, 0),  # adjacent cell, d2 > ε² → dropped
        (12, 0, 0),  # coincident → kept, d2 = 0
        (13, 5_000_000, 4_000_000),  # same cell as probe 1, d2 = 41e12 > ε² → dropped
        (14, 6_000_001, 6_000_001),  # diagonal corner from probe 2, d2 = 8 → kept
    ]
    got = _pairs(spark, probes, builds)
    assert (1, 10, EPS2) in got
    assert (1, 12, 0) in got
    assert (2, 14, 8) in got
    kept = {(p, b) for p, b, _ in got}
    assert (1, 11) not in kept  # 1 µdeg past the boundary
    assert (1, 13) not in kept  # same cell, beyond ε
    # probe 2 also sees builds 10/12 if within ε — verify against brute force
    brute = {
        (p, b, d2)
        for p, plat, plon in probes
        for b, blat, blon in builds
        if (d2 := (plat - blat) ** 2 + (plon - blon) ** 2) <= EPS2
    }
    assert got == brute


def test_grid_no_duplicate_candidates(spark, sf_dir):
    """Each qualifying pair is emitted exactly once by construction —
    pinned on the real fixture via the registered query's inputs."""
    from blow_spark.sources import read_table
    from blow_spark.queries.spatial import _mu_coord, _LAT_SPAN, _LON_SPAN

    c = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("probe_id"),
        _mu_coord("geo:c:", F.col("c_custkey"), _LAT_SPAN, 60_000_000).alias("lat"),
        _mu_coord("geo:C:", F.col("c_custkey"), _LON_SPAN, 180_000_000).alias("lon"),
    )
    s = read_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("build_id"),
        _mu_coord("geo:s:", F.col("s_suppkey"), _LAT_SPAN, 60_000_000).alias("lat"),
        _mu_coord("geo:S:", F.col("s_suppkey"), _LON_SPAN, 180_000_000).alias("lon"),
    )
    cand = grid_epsilon_pairs(c, s, _EPS_MU).select("probe_id", "build_id")
    assert cand.count() == cand.distinct().count() > 0


def test_rolling_mad_python_replay(spark, sf_dir):
    """Third-engine pin: replay the trailing-7 median/MAD window in pure
    Python over the same parquet and demand bit-identical doubles."""
    rows = queries()["timeseries_rolling_mad_anomaly"](spark, sf_dir).collect()
    got = {r.event_id: (r.med, r.mad, r.is_anomaly) for r in rows}

    con = duckdb.connect()
    src = con.execute(
        f"SELECT event_id, user_id, event_type, value FROM "
        f"read_parquet('{sf_dir}/events.parquet') "
        f"ORDER BY user_id, event_type, ts, event_id"
    ).fetchall()

    def med(sorted_vals):
        n = len(sorted_vals)
        if n % 2 == 1:
            return sorted_vals[(n - 1) // 2]
        return (sorted_vals[n // 2 - 1] + sorted_vals[n // 2]) / 2

    by_type: dict[tuple, list] = {}
    for eid, uid, etype, val in src:
        hist = by_type.setdefault((uid, etype), [])
        hist.append(val)
        win = hist[-7:]
        m = med(sorted(win))
        d = med(sorted(abs(v - m) for v in win))
        anom = abs(val - m) > 3 * d and d > 0
        assert got[eid] == (m, d, anom), (eid, got[eid], (m, d, anom))
    assert len(got) == len(src)


def test_tile_pyramid_parent_child_consistency(spark, sf_dir):
    """Every parent tile's (n_points, sum) must equal the sum over its
    children (child cell ids div 2 = parent id — the pyramid
    invariant); also no tile is empty and the finest level partitions
    the full point set."""
    rows = queries()["agg_spatial_tile_pyramid"](spark, sf_dir).collect()
    by_level = {0: {}, 1: {}, 2: {}}
    for r in rows:
        assert r.n_points > 0
        by_level[r.level][(r.cell_x, r.cell_y)] = (r.n_points, r.sum_bal_cents)
    for child_level in (1, 2):
        rolled = {}
        for (x, y), (n, s) in by_level[child_level].items():
            k = (x // 2, y // 2)
            pn, ps = rolled.get(k, (0, 0))
            rolled[k] = (pn + n, ps + s)
        assert rolled == by_level[child_level - 1]
    total = sum(n for n, _ in by_level[2].values())
    from blow_spark.sources import read_table

    assert total == read_table(spark, sf_dir, "customer").count()
