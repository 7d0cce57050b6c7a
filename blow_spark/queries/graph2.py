"""Second graph battery: HITS hubs/authorities on the customer→part
purchase bipartite graph.

Reference parity note: the reference engine (wizgrao/blow) has no graph
surface (maps/maps.go:8-14); extension operators from the task brief's
analytics mandate. Companion to the iterative family in
queries/pipeline_ops.py (pagerank, label propagation, k-core).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from blow_spark.queries import register
from blow_spark.sources import read_table


@register(
    "graph_hits_hubs_authorities",
    oracle="""
    WITH edges AS (
      SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ), auth AS (
      -- one HITS half-step from hub0 = 1: authority = in-degree
      SELECT p, CAST(COUNT(*) AS BIGINT) AS a FROM edges GROUP BY p
    ), hub AS (
      -- hub = sum of neighbor authorities (exact integers)
      SELECT e.c, CAST(SUM(a.a) AS BIGINT) AS h
      FROM edges e JOIN auth a USING (p) GROUP BY e.c
    ), an AS (
      SELECT CAST(SUM(CAST(a AS HUGEINT) * a) AS DOUBLE) AS nrm FROM auth
    ), hn AS (
      SELECT CAST(SUM(CAST(h AS HUGEINT) * h) AS DOUBLE) AS nrm FROM hub
    ), top_a AS (
      SELECT 'authority' AS role, a.p AS node_id,
             ROUND(a.a / SQRT(an.nrm), 6) AS score
      FROM auth a CROSS JOIN an
      ORDER BY a.a DESC, a.p LIMIT 10
    ), top_h AS (
      SELECT 'hub' AS role, h.c AS node_id,
             ROUND(h.h / SQRT(hn.nrm), 6) AS score
      FROM hub h CROSS JOIN hn
      ORDER BY h.h DESC, h.c LIMIT 10
    )
    SELECT * FROM top_a
    UNION ALL
    SELECT * FROM top_h
    ORDER BY role, score DESC, node_id
    """,
    tags=("graph", "orders", "lineitem"),
)
def graph_hits_hubs_authorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One HITS iteration (Kleinberg, JACM 1999) on the customer→part
    purchase bipartite graph from hub⁰ ≡ 1: authority(part) = buyer
    count, hub(customer) = Σ authority over bought parts, each side
    L2-normalized — "which parts anchor the catalog, which customers
    sweep it?". Scores stay exact BIGINTs until the final normalize,
    so top-k ORDER is decided on integers (ties by node id) and the
    normalized doubles are identical in both engines.

    Scale: distinct-edge projection (one shuffle), degree aggregate,
    one edge-keyed join+aggregate for hubs — the same bounded-fanout
    shapes as graph_pagerank_bipartite. Edges, auth, and hub scores
    each SPILL once (materialize.spill_to_parquet) because the norm
    branch and the top-k branch both read them — without the spill the
    union's two branches re-derive the whole chain (measured 16 static
    exchanges → 6). The two L2 norms are 1-row broadcast cross joins,
    and each top-10 is TakeOrderedAndProject (per-partition heads, no
    global sort materialized). Further iterations repeat the same pair
    of joins; one step is registered because each subsequent step is
    plan-identical with hub/auth swapped."""
    from blow_spark.materialize import spill_to_parquet

    o = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    edges = spill_to_parquet(
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct(),
        "blow_spark_hits_edges_",
    )
    auth = spill_to_parquet(
        edges.groupBy("p").agg(F.count("*").cast("bigint").alias("a")),
        "blow_spark_hits_auth_",
    )
    hub = spill_to_parquet(
        edges.join(auth, "p")
        .groupBy("c")
        .agg(F.sum("a").cast("bigint").alias("h")),
        "blow_spark_hits_hub_",
    )
    an = auth.agg(
        F.sum(F.col("a").cast("decimal(38,0)") * F.col("a"))
        .cast("double")
        .alias("nrm")
    )
    hn = hub.agg(
        F.sum(F.col("h").cast("decimal(38,0)") * F.col("h"))
        .cast("double")
        .alias("nrm")
    )
    top_a = (
        auth.crossJoin(F.broadcast(an))
        .orderBy(F.col("a").desc(), F.col("p").asc())
        .limit(10)
        .select(
            F.lit("authority").alias("role"),
            F.col("p").alias("node_id"),
            F.round(F.col("a") / F.sqrt(F.col("nrm")), 6).alias("score"),
        )
    )
    top_h = (
        hub.crossJoin(F.broadcast(hn))
        .orderBy(F.col("h").desc(), F.col("c").asc())
        .limit(10)
        .select(
            F.lit("hub").alias("role"),
            F.col("c").alias("node_id"),
            F.round(F.col("h") / F.sqrt(F.col("nrm")), 6).alias("score"),
        )
    )
    return top_a.unionAll(top_h).orderBy(
        "role", F.col("score").desc(), "node_id"
    )
