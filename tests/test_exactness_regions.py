"""Fixture-size guard for the exactness-region equality oracles.

Four registered queries (`agg_approx_sketches`, `agg_hll_sketch_union`,
`agg_kll_quantile_rollup`, and the percentile_approx half of the sketch
battery) are oracle-paired ONLY because their sketch parameters sit
inside a region where the estimate is provably/measurably exact at the
gate scale factors. Growing the fixtures past those regions would
silently flip the equality oracles from exactness proofs to failures
with an opaque hash mismatch (round-4 advice). This guard turns that
into a clear, named failure: it asserts the ACTUAL fixture counts stay
inside each documented region, for every gate sf dir present.

Regions (documented at the query sites):
- HLL lgK=16 coupon (exact) phase: distinct l_partkey <= 2^14
  (blow_spark/queries/relational.py agg_approx_sketches,
  blow_spark/queries/batteries.py agg_hll_sketch_union — per-group
  distinct <= global distinct, so the global bound covers the groups
  and their union).
- KLL k=65535 uncompacted: TOTAL lineitem rows <= 65535 — the merged
  __ALL__ row is the binding constraint, not the groups
  (blow_spark/queries/batteries.py agg_kll_quantile_rollup; the
  k=32768 layout-dependence trap is recorded there).
- percentile_approx accuracy=10^6 >= n: lineitem rows <= 10^6
  (agg_approx_sketches median leg).

DuckDB does the counting: this is a fixture check, not an engine test,
and it must stay cheap enough to run unconditionally.
"""

from __future__ import annotations

import os

import duckdb
import pytest

GATE_SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]

HLL_COUPON_MAX_DISTINCT = 2**14
KLL_K = 65535
PERCENTILE_ACCURACY = 1_000_000


@pytest.mark.parametrize("sf_dir", GATE_SF_DIRS)
def test_fixtures_stay_inside_sketch_exactness_regions(sf_dir):
    if not os.path.isdir(sf_dir):
        pytest.skip(f"{sf_dir} not present")
    li = os.path.join(sf_dir, "lineitem.parquet")
    n_rows, n_parts = duckdb.sql(
        f"SELECT COUNT(*), COUNT(DISTINCT l_partkey) FROM '{li}'"
    ).fetchone()
    assert n_parts <= HLL_COUPON_MAX_DISTINCT, (
        f"{sf_dir}: {n_parts} distinct l_partkey exceeds the HLL lgK=16 "
        f"coupon-exact region ({HLL_COUPON_MAX_DISTINCT}); the equality "
        f"oracles of agg_approx_sketches / agg_hll_sketch_union are no "
        f"longer valid at this scale — re-derive the region or switch "
        f"those queries to error-bound oracles before trusting a hash "
        f"mismatch"
    )
    assert n_rows <= KLL_K, (
        f"{sf_dir}: {n_rows} lineitem rows exceed KLL k={KLL_K}; the "
        f"merged __ALL__ sketch in agg_kll_quantile_rollup can now "
        f"compact (layout-dependently — see the k=32768 trap in its "
        f"docstring) and its equality oracle is no longer valid"
    )
    assert n_rows <= PERCENTILE_ACCURACY, (
        f"{sf_dir}: {n_rows} lineitem rows exceed percentile_approx "
        f"accuracy={PERCENTILE_ACCURACY}; the exact-GK median leg of "
        f"agg_approx_sketches is no longer exact"
    )
