"""Two-point linearity measurement for the graph/iterative family
(round-3 verdict item #5): pagerank and connected_components at 1x and
10x edges, plus the union-find-vs-distributed slope on EACH side of the
CC strategy cutoff over the same graph family.

Methodology matches SCALE.md's round-3 dedup/ANN table: seeded synthetic
inputs materialized to parquet first (so the measured operator excludes
input derivation), operators warmed once per session with a small run,
best-of-2 timings on local[32].

Run: python scripts/scale_graph.py            (full, ~10 min)
     python scripts/scale_graph.py --quick    (sanity shapes only)
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")


def random_edges(spark, n_edges: int, avg_degree: int = 10, seed: int = 7):
    """Seeded pseudo-random multigraph: N = n_edges/avg_degree nodes,
    endpoints from xxhash64 of the edge index — deterministic, uniform,
    no driver data. Written to parquet so timed runs scan files like a
    real deployment (and derivation cost is excluded)."""
    n_nodes = max(2, n_edges // avg_degree)
    df = (
        spark.range(n_edges)
        .select(
            F.pmod(F.xxhash64(F.col("id"), F.lit(seed)), F.lit(n_nodes)).alias("src"),
            F.pmod(F.xxhash64(F.col("id"), F.lit(seed + 1)), F.lit(n_nodes)).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
    )
    path = tempfile.mkdtemp(prefix=f"scale_graph_{n_edges}_")
    df.write.mode("overwrite").parquet(path)
    return path


def best_of(fn, n: int = 2) -> float:
    times = []
    for _ in range(n):
        t0 = time.time()
        fn()
        times.append(time.time() - t0)
    return min(times)


def main() -> None:
    quick = "--quick" in sys.argv
    from blow_spark import dedup, ops
    from blow_spark.session import get_spark

    spark = get_spark(app_name="scale_graph", master="local[32]")
    results = {}

    sizes = (100_000, 1_000_000) if quick else (1_000_000, 10_000_000)

    # ---- pagerank: 1x vs 10x edges, 3 iterations ----
    paths = {n: random_edges(spark, n) for n in sizes}
    # warm (codegen/JIT) on a small set
    warm = spark.read.parquet(random_edges(spark, 50_000))
    ops.pagerank(warm, iterations=3, assume_distinct=True).count()
    for n, p in paths.items():
        e = spark.read.parquet(p)
        results[f"pagerank_{n}"] = best_of(
            lambda e=e: ops.pagerank(e, iterations=3, assume_distinct=True).count()
        )

    # ---- connected components: same graph family, both strategies ----
    # CC edge sizes chosen to straddle nothing by default (both under the
    # 2M cutoff) so the LOCAL path measures its own slope; the cutoff=0
    # override then forces the DISTRIBUTED path on identical graphs.
    cc_sizes = (20_000, 200_000) if quick else (200_000, 2_000_000)
    cc_paths = {n: random_edges(spark, n) for n in cc_sizes}
    wpairs = warm.select(F.col("src").alias("id_a"), F.col("dst").alias("id_b"))
    dedup.connected_components(wpairs).count()                      # warm local
    dedup.connected_components(wpairs, local_edge_cutoff=0).count() # warm dist
    for n, p in cc_paths.items():
        pairs = spark.read.parquet(p).select(
            F.col("src").alias("id_a"), F.col("dst").alias("id_b")
        )
        results[f"cc_local_{n}"] = best_of(
            lambda pairs=pairs: dedup.connected_components(pairs).count()
        )
        # LAST_CC_STRATEGY is a single-threaded convenience; this script
        # runs serially so the assert is safe. Under any parallelization
        # use the per-call `df.cc_strategy` attribute instead.
        assert dedup.LAST_CC_STRATEGY["strategy"] == "local"
        results[f"cc_distributed_{n}"] = best_of(
            lambda pairs=pairs: dedup.connected_components(
                pairs, local_edge_cutoff=0
            ).count()
        )
        assert dedup.LAST_CC_STRATEGY["strategy"] == "distributed"

    # ---- the cutoff flip on a >2M graph, default cutoff ----
    if not quick:
        big = spark.read.parquet(random_edges(spark, 2_500_000)).select(
            F.col("src").alias("id_a"), F.col("dst").alias("id_b")
        )
        results["cc_default_2500000"] = best_of(
            lambda: dedup.connected_components(big).count(), n=1
        )
        results["cc_default_2500000_strategy"] = dedup.LAST_CC_STRATEGY["strategy"]

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
