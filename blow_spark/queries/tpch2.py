"""TPC-H plan shapes, wave 2: Q2, Q8, Q9, Q11, Q12, Q15, Q16, Q20, Q21.

Completes the TPC-H-adapted suite started in tpch.py (the reference has no
SQL/join/agg layer anywhere — SURVEY.md §2.2 — so this whole family is
new-engine surface). The driver fixtures carry no ``partsupp`` table and a
reduced column set (FIXTURES.md), so the queries that classically hinge on
partsupp (Q2/Q9/Q11/Q16/Q20) use ``lineitem`` as the part↔supplier bridge
and ``s_acctbal``/``p_retailprice`` as the cost columns; each keeps the
classic's *plan shape*: the same join graph, subquery kind, and aggregate
structure.

Scale notes (100 TB design point): every dimension side
(region/nation/supplier/part, and derived per-part or per-order aggregate
tables that are keyed like dimensions) is broadcast; lineitem never
self-joins — correlated EXISTS / scalar subqueries over the fact table are
rewritten as one groupBy over the fact plus a broadcast join back
(Q2: min-per-part; Q15: max-over-agg; Q21: per-order supplier stats),
which is one shuffle instead of a fact×fact join.

Determinism contract per blow_spark.queries.__init__: money sums through
DECIMAL(18,4) cast back to DOUBLE on both sides; ratios divide the two
exact doubles (IEEE division is order-free); every top-k ORDER BY carries
a unique tiebreaker.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from blow_spark.queries import register
from blow_spark.queries.relational import _dec_sum
from blow_spark.sources import read_table


def _revenue():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@register(
    "tpch_q2_min_cost_supplier",
    oracle="""
    WITH bridge AS (
        SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name
    FROM part
    JOIN bridge   ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE p_size = 5
      AND p_type = 'LARGE'
      AND r_name = 'EUROPE'
      AND s_acctbal = (
          SELECT MIN(s2.s_acctbal)
          FROM bridge b2
          JOIN supplier s2 ON s2.s_suppkey = b2.l_suppkey
          JOIN nation   n2 ON s2.s_nationkey = n2.n_nationkey
          JOIN region   r2 ON n2.n_regionkey = r2.r_regionkey
          WHERE b2.l_partkey = p_partkey AND r2.r_name = 'EUROPE'
      )
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
    tags=("tpch", "join", "subquery"),
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: correlated MIN subquery per part → rewritten as a
    groupBy(min) over the bridge plus an equality join back (no
    re-scan of the fact per outer row). bridge = distinct
    (l_partkey, l_suppkey) stands in for partsupp; the min-cost column is
    s_acctbal. All dims broadcast; the distinct() on the bridge is the one
    shuffle and is reused for both the outer plan and the min table."""
    p = read_table(spark, sf_dir, "part").filter(
        (F.col("p_size") == 5) & (F.col("p_type") == "LARGE")
    )
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    bridge = (
        read_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    )
    # supplier×nation×region (Europe only) — tiny, computed once, broadcast
    eu_supp = (
        s.join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    priced = bridge.join(F.broadcast(eu_supp), bridge.l_suppkey == eu_supp.s_suppkey)
    min_cost = priced.groupBy(F.col("l_partkey").alias("mc_partkey")).agg(
        F.min("s_acctbal").alias("min_bal")
    )
    return (
        priced.join(
            F.broadcast(min_cost),
            (priced.l_partkey == min_cost.mc_partkey)
            & (priced.s_acctbal == min_cost.min_bal),
        )
        .join(F.broadcast(p), priced.l_partkey == p.p_partkey)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name")
        .orderBy(
            F.col("s_acctbal").desc(), F.col("n_name"), F.col("s_name"), F.col("p_partkey")
        )
        .limit(100)
    )


@register(
    "tpch_q8_national_market_share",
    oracle="""
    SELECT o_year,
           CAST(SUM(CASE WHEN nation = 'NATION_7'
                         THEN CAST(volume AS DECIMAL(18,4)) ELSE 0 END) AS DOUBLE)
           / CAST(SUM(CAST(volume AS DECIMAL(18,4))) AS DOUBLE) AS mkt_share
    FROM (
        SELECT EXTRACT(year FROM o_orderdate) AS o_year,
               l_extendedprice * (1 - l_discount) AS volume,
               n2.n_name AS nation
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region    ON n1.n_regionkey = r_regionkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'ASIA'
          AND p_type = 'ECONOMY'
          AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
    tags=("tpch", "join", "agg"),
)
def tpch_q8_national_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: 8-way join (nation joined twice under different roles) →
    per-year conditional-share aggregate. Every dim broadcast; the fact
    side flows through one orders⋈lineitem shuffle. Share = exact decimal
    numerator/denominator, divided as doubles (order-free)."""
    p = read_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    li = read_table(spark, sf_dir, "lineitem")
    s = read_table(spark, sf_dir, "supplier")
    o = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between("1996-01-01", "1997-12-31")
    )
    c = read_table(spark, sf_dir, "customer")
    n1 = read_table(spark, sf_dir, "nation").alias("n1")
    n2 = read_table(spark, sf_dir, "nation").alias("n2")
    r = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    vol = F.col("volume").cast("decimal(18,4)")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1.n_nationkey"))
        .join(F.broadcast(r), F.col("n1.n_regionkey") == r.r_regionkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2.n_nationkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            _revenue().alias("volume"),
            F.col("n2.n_name").alias("nation"),
        )
        .groupBy("o_year")
        .agg(
            (
                F.sum(F.when(F.col("nation") == "NATION_7", vol).otherwise(F.lit(0))).cast(
                    "double"
                )
                / F.sum(vol).cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "tpch_q9_product_type_profit",
    oracle="""
    SELECT nation, o_year,
           CAST(SUM(CAST(amount AS DECIMAL(18,4))) AS DOUBLE) AS sum_profit
    FROM (
        SELECT n_name AS nation,
               EXTRACT(year FROM o_orderdate) AS o_year,
               l_extendedprice * (1 - l_discount) - p_retailprice * l_quantity * 0.5
                   AS amount
        FROM lineitem
        JOIN part     ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%bolt%'
    ) profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
    tags=("tpch", "join", "agg"),
)
def tpch_q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape: 5-way join with a LIKE part filter → profit expression →
    (nation, year) rollup. ps_supplycost is absent from the fixtures;
    p_retailprice·l_quantity·0.5 stands in, keeping the
    revenue-minus-cost expression over two joined tables. part/supplier/
    nation broadcast; orders⋈lineitem is the shuffle."""
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part").filter(F.col("p_name").like("%bolt%"))
    s = read_table(spark, sf_dir, "supplier")
    o = read_table(spark, sf_dir, "orders")
    n = read_table(spark, sf_dir, "nation")
    amount = _revenue() - F.col("p_retailprice") * F.col("l_quantity") * F.lit(0.5)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(_dec_sum(F.col("amount")).alias("sum_profit"))
        .orderBy(F.col("nation"), F.col("o_year").desc())
    )


@register(
    "tpch_q11_important_stock",
    oracle="""
    SELECT l_partkey AS ps_partkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS value
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_3'
    GROUP BY l_partkey
    HAVING CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) > (
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) * 0.001
        FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_3'
    )
    ORDER BY value DESC, ps_partkey
    """,
    tags=("tpch", "agg", "subquery"),
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: grouped value per part HAVING > fraction of an
    uncorrelated scalar total. The grouped aggregate is computed ONCE and
    reused for both the groups and the global total (re-aggregating the
    per-group sums — exact decimal, so identical to summing rows), then a
    broadcast of the 1-row total joins back: one fact shuffle, no second
    scan."""
    li = read_table(spark, sf_dir, "lineitem")
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    dec = F.col("l_extendedprice").cast("decimal(18,4)")
    per_part = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("l_partkey").alias("ps_partkey"))
        .agg(F.sum(dec).alias("value_dec"))
    )
    total = per_part.agg((F.sum("value_dec").cast("double") * F.lit(0.001)).alias("thresh"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .withColumn("value", F.col("value_dec").cast("double"))
        .filter(F.col("value") > F.col("thresh"))
        .select("ps_partkey", "value")
        .orderBy(F.col("value").desc(), F.col("ps_partkey"))
    )


@register(
    "tpch_q12_shipping_delay_classes",
    oracle="""
    SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) > 90 THEN 'SLOW'
                WHEN date_diff('day', o_orderdate, l_shipdate) > 30 THEN 'MEDIUM'
                ELSE 'FAST' END AS delay_class,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_shipdate >= o_orderdate
    GROUP BY delay_class
    ORDER BY delay_class
    """,
    tags=("tpch", "join", "agg"),
)
def tpch_q12_shipping_delay_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: fact⋈fact equi-join → computed grouping key →
    conditional counts. l_shipmode is absent; the grouping key is a
    ship-delay bucket computed with datediff (day boundaries — identical
    to DuckDB's date_diff('day') on the midnight-aligned fixtures)."""
    o = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") >= F.col("o_orderdate"))
        .withColumn(
            "delay_class",
            F.when(delay > 90, "SLOW").when(delay > 30, "MEDIUM").otherwise("FAST"),
        )
        .groupBy("delay_class")
        .agg(
            F.sum(F.when(urgent, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~urgent, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
        .orderBy("delay_class")
    )


@register(
    "tpch_q15_top_supplier",
    oracle="""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
                    AS DOUBLE) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier
    JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
    tags=("tpch", "agg", "subquery"),
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: windowed-quarter revenue view → scalar MAX over the view
    → equality filter. The revenue aggregate is built once; the 1-row max
    is broadcast back onto it (classic view-reuse shape, no re-scan).
    Exact decimal revenue means the MAX equality can't be split by float
    summation order."""
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        _dec_sum(_revenue()).alias("total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("max_rev"))
    s = read_table(spark, sf_dir, "supplier")
    return (
        s.join(revenue, s.s_suppkey == revenue.supplier_no)
        .crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("max_rev"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "tpch_q16_parts_supplier_counts",
    oracle="""
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) bridge
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#9'
      AND p_type NOT IN ('PROMO', 'ECONOMY')
      AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    tags=("tpch", "join", "agg", "subquery"),
)
def tpch_q16_parts_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: anti-join against a complaint-supplier subquery →
    distinct supplier count per part attribute triple. bridge = distinct
    (l_partkey, l_suppkey) stands in for partsupp. The NOT IN subquery
    (no NULLs possible in s_suppkey) is a broadcast left-anti join."""
    bridge = (
        read_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    )
    p = read_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#9")
        & (~F.col("p_type").isin("PROMO", "ECONOMY"))
        & (F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29))
    )
    bad_supp = read_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0)
    return (
        bridge.join(
            F.broadcast(bad_supp),
            bridge.l_suppkey == bad_supp.s_suppkey,
            "left_anti",
        )
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), F.col("p_brand"), F.col("p_type"), F.col("p_size")
        )
    )


@register(
    "tpch_q20_potential_promotion",
    oracle="""
    SELECT s_name, s_acctbal
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
      AND s_suppkey IN (
          SELECT l_suppkey
          FROM lineitem
          JOIN part ON p_partkey = l_partkey
          WHERE p_name LIKE 'small%'
            AND l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate <  TIMESTAMP '1997-01-01'
          GROUP BY l_suppkey
          HAVING SUM(l_quantity) > 100
      )
    ORDER BY s_name, s_acctbal
    """,
    tags=("tpch", "join", "subquery"),
)
def tpch_q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: IN-subquery whose body is itself a filtered
    join+groupBy+HAVING → left-semi join into the supplier dim. The inner
    aggregate shuffles only qualifying lineitems (part filter is pushed
    before the shuffle via a broadcast join)."""
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    p = read_table(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    qualifying = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 100)
        .select("l_suppkey")
    )
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3")
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(qualifying), s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name", "s_acctbal")
    )


@register(
    "tpch_q21_suppliers_who_kept_waiting",
    oracle="""
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND date_diff('day', o_orderdate, l1.l_shipdate) > 90
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND date_diff('day', o3.o_orderdate, l3.l_shipdate) > 90
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
    tags=("tpch", "join", "subquery", "agg"),
)
def tpch_q21_suppliers_who_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape: the classic double correlated EXISTS over the fact
    table, rewritten for scale as ONE per-order aggregate — distinct
    suppliers and distinct *late* suppliers per order — joined back to the
    late lineitems. EXISTS(other supplier) ⇔ n_supp ≥ 2;
    NOT EXISTS(other late supplier) ⇔ n_late_supp = 1 given l1 is late
    itself. This turns two fact×fact correlated scans into one extra
    groupBy on the join key the fact is already shuffled by."""
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = read_table(spark, sf_dir, "supplier")
    late = F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 90
    # per-order supplier stats, computed over lineitem⋈orders once
    lo = li.join(o, li.l_orderkey == o.o_orderkey)
    per_order = lo.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(late, F.col("l_suppkey"))).alias("n_late_supp"),
    )
    l1 = lo.filter(late).select("l_orderkey", "l_suppkey")
    return (
        l1.join(per_order.withColumnRenamed("l_orderkey", "po_orderkey"),
                l1.l_orderkey == F.col("po_orderkey"))
        .filter((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").cast("bigint").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(100)
    )
