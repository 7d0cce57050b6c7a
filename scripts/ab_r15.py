#!/usr/bin/env python
"""Round-15 TIGHTLY-INTERLEAVED A/B for the two round-14 optimizations
whose wall effect the driver's record could not prove (round-14 verdict
item #2): graph_label_propagation (window argmax -> struct-max hash
aggregate) and graph_closeness_centrality_bfs (per-level
checkpoint_small truncation).

Both variants are constructed IN THE SAME SESSION and run ALTERNATELY
(old, new, old, new, ...) so roving host interference — worth 10-15 s
per bench run on this shared VM, per the round-14 record — hits both
arms equally instead of whichever batch ran in the bad window. The
"old" arms are the verbatim round-13 forms (git 460aed0^); the "new"
arms call the live catalog.

Usage: python scripts/ab_r15.py [--n 4]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).
"""

from __future__ import annotations

import argparse
import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window as W
from pyspark.sql import functions as F


def old_lpa(spark, sf_dir):
    """Verbatim round-13 graph_label_propagation (row_number argmax)."""
    from blow_spark.queries.pipeline_ops import _LPA_ROUNDS
    from blow_spark.sources import read_table

    li = read_table(spark, sf_dir, "lineitem")
    sp = li.select(
        F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s")
    ).distinct()
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
    labels = adj.select(F.col("u").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    w = W.partitionBy("node").orderBy(F.desc("c"), F.asc("label"))
    for _ in range(_LPA_ROUNDS):
        nbr = adj.join(labels, adj.v == labels.node).select(
            F.col("u").alias("node"), "label"
        )
        cnt = nbr.groupBy("node", "label").agg(F.count("*").alias("c"))
        labels = (
            cnt.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("node", "label")
            .localCheckpoint()
        )
    out = labels.groupBy(F.col("label").cast("bigint").alias("label")).agg(
        F.count("*").cast("bigint").alias("n_nodes")
    )
    adj.unpersist()
    return out


def old_closeness(spark, sf_dir):
    """Verbatim round-13 closeness BFS (lazy frontier chain, no
    checkpoint truncation)."""
    from blow_spark.queries.linkage import _purchase_edges

    edges = _purchase_edges(spark, sf_dir)
    seeds = (
        edges.select("c").distinct().orderBy("c").limit(10)
        .select(F.col("c").alias("seed"))
    )
    reached = seeds.select(
        "seed", F.col("seed").alias("node"), F.lit("c").alias("side"),
        F.lit(0).alias("dist"),
    )
    frontier = reached
    for dist in range(1, 5):
        if dist % 2 == 1:
            nxt = (
                frontier.join(edges, frontier.node == edges.c)
                .select("seed", F.col("p").alias("node"))
                .distinct()
                .select("seed", "node", F.lit("p").alias("side"),
                        F.lit(dist).alias("dist"))
            )
        else:
            nxt = (
                frontier.join(edges, frontier.node == edges.p)
                .select("seed", F.col("c").alias("node"))
                .distinct()
                .select("seed", "node", F.lit("c").alias("side"),
                        F.lit(dist).alias("dist"))
            )
        reached = reached.unionByName(nxt)
        frontier = nxt
    best = reached.groupBy("seed", "node", "side").agg(F.min("dist").alias("d"))
    return (
        best.groupBy("seed")
        .agg(
            F.sum((F.col("d") == 1).cast("bigint")).alias("n_d1"),
            F.sum((F.col("d") == 2).cast("bigint")).alias("n_d2"),
            F.sum((F.col("d") == 3).cast("bigint")).alias("n_d3"),
            F.sum((F.col("d") == 4).cast("bigint")).alias("n_d4"),
            F.sum(
                F.when(F.col("d") > 0, F.expr("12 div d")).otherwise(0)
            ).cast("bigint").alias("harmonic_x12"),
        )
        .orderBy("seed")
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from blow_spark import get_spark
    from blow_spark.queries import queries

    spark = get_spark(app_name="blow_spark_ab_r15")
    catalog = queries()
    catalog["flagship_fizzbuzz_agg"](spark, sf_dir).write.mode(
        "overwrite"
    ).format("noop").save()

    pairs = [
        ("graph_label_propagation", old_lpa, catalog["graph_label_propagation"]),
        (
            "graph_closeness_centrality_bfs",
            old_closeness,
            catalog["graph_closeness_centrality_bfs"],
        ),
    ]
    for name, old_fn, new_fn in pairs:
        samples: dict[str, list[float]] = {"old": [], "new": []}
        for _ in range(args.n):
            for tag, fn in (("old", old_fn), ("new", new_fn)):
                spark.sparkContext.setJobDescription(f"ab:{name}:{tag}")
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
                samples[tag].append(round(time.perf_counter() - t0, 3))
                spark.catalog.clearCache()
                gc.collect()
        print(
            f"{name}: old min={min(samples['old'])} runs={samples['old']} | "
            f"new min={min(samples['new'])} runs={samples['new']}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
