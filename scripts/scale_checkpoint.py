#!/usr/bin/env python
"""Round-7 verdict item #7: the iterative families (pagerank, LPA,
k-core, BFS) pay a per-round lineage-truncation cost that SCALE.md
documented only as "localCheckpoint truncates" — this script MEASURES
the three candidate strategies so the adopted one is evidence-backed:

  local_checkpoint  df.localCheckpoint()            (current; eager,
                    writes shuffle-RDD blocks to executor local disk)
  persist_disk      df.persist(DISK_ONLY) + count() (eager via count;
                    blocks on local disk, lineage RETAINED)
  none              plain lineage                   (plan doubles per
                    round; AQE plans every round blind)

Measured loops are byte-identical to the production ones
(queries/pipeline_ops.py graph_label_propagation, ops.pagerank) with
only the truncation call swapped. Run at sf0.1 and the sf1-shaped
build (scripts/scale_sf1.py rep10) — min-of-2 per cell, same VM-noise
stance as bench.py.

Run: python scripts/scale_checkpoint.py [--sf1] [--rounds 3]
Results land in SCALE.md's "Iterative lineage truncation" table.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark import StorageLevel
from pyspark.sql import Window as W
from pyspark.sql import functions as F

SF01 = "/root/testdata/sf0.1"


def truncate(df, mode, registry):
    if mode == "local_checkpoint":
        return df.localCheckpoint()
    if mode == "persist_disk":
        df = df.persist(StorageLevel.DISK_ONLY)
        df.count()
        registry.append(df)
        return df
    return df  # none


def lpa(spark, sf_dir, mode, rounds):
    from blow_spark.sources import read_table

    registry = []
    li = read_table(spark, sf_dir, "lineitem")
    sp = li.select(F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s")).distinct()
    e0 = (
        sp.alias("a")
        .join(sp.alias("b"), (F.col("a.p") == F.col("b.p")) & (F.col("a.s") < F.col("b.s")))
        .select(F.col("a.s").alias("u"), F.col("b.s").alias("v"))
        .distinct()
    )
    adj = (
        e0.unionAll(e0.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .repartition(F.col("v"))
        .persist()
    )
    labels = adj.select(F.col("u").alias("node")).distinct().withColumn("label", F.col("node"))
    w = W.partitionBy("node").orderBy(F.desc("c"), F.asc("label"))
    for _ in range(rounds):
        nbr = adj.join(labels, adj.v == labels.node).select(F.col("u").alias("node"), "label")
        cnt = nbr.groupBy("node", "label").agg(F.count("*").alias("c"))
        labels = truncate(
            cnt.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("node", "label"),
            mode,
            registry,
        )
    out = labels.groupBy("label").agg(F.count("*").alias("n"))
    n = out.count()
    adj.unpersist()
    for d in registry:
        d.unpersist()
    return n


def pagerank(spark, sf_dir, mode, rounds):
    from blow_spark.sources import read_table

    registry = []
    o = read_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("src"), (F.col("o_orderkey") % 1000).alias("dst")
    )
    e = o.distinct().persist()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n_nodes = nodes.count()
    outdeg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    contrib = e.join(outdeg, "src").repartition(F.col("src")).persist()
    ranks = truncate(nodes.withColumn("rank", F.lit(1.0 / n_nodes)), mode, registry)
    base = 0.15 / n_nodes
    for _ in range(rounds):
        inbound = (
            contrib.join(ranks, contrib.src == ranks.node)
            .select(F.col("dst"), (F.col("rank") / F.col("outdeg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = truncate(
            nodes.join(inbound, nodes.node == inbound.dst, "left").select(
                "node",
                (F.lit(base) + F.lit(0.85) * F.coalesce(F.col("inflow"), F.lit(0.0))).alias("rank"),
            ),
            mode,
            registry,
        )
    n = ranks.count()
    for d in (e, nodes, contrib):
        d.unpersist()
    for d in registry:
        d.unpersist()
    return n


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf1", action="store_true", help="also run the sf1-shaped build")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--reuse", help="existing sf1 build dir")
    args = ap.parse_args()

    from blow_spark import get_spark

    spark = get_spark(app_name="scale_checkpoint")
    dirs = {"sf0.1": SF01}
    if args.sf1 or args.reuse:
        if args.reuse:
            dirs["sf1"] = args.reuse
        else:
            from scale_sf1 import build_sf1  # noqa: F401 (same dir)

            dirs["sf1"] = build_sf1(spark)
    for sf_name, sf_dir in dirs.items():
        for algo_name, algo in (("lpa", lpa), ("pagerank", pagerank)):
            for mode in ("local_checkpoint", "persist_disk", "none"):
                best = float("inf")
                for _ in range(2):
                    t0 = time.perf_counter()
                    n = algo(spark, sf_dir, mode, args.rounds)
                    best = min(best, time.perf_counter() - t0)
                    spark.catalog.clearCache()
                print(f"{sf_name} {algo_name} {mode:17s} rounds={args.rounds} "
                      f"best={best:7.2f}s rows={n}", flush=True)
    spark.stop()


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
