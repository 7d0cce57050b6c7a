"""Parity queries: the blow-surface pipeline API and the scale-path custom
operators, each cross-validated against an independent SQL formulation.

These deliberately duplicate semantics already covered by a naive catalog
query (join_asof, join_range_nonequi, window_session) — same oracle, two
engine-side implementations — so a regression in either the naive or the
scale-path form is caught by the same gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from blow_spark import ops
from blow_spark.pipeline import fizzbuzz_pipeline
from blow_spark.queries import register
from blow_spark.sources import read_table, register_views


@register(
    "source_python_datasource",
    oracle="""
    SELECT CASE WHEN r % 15 = 0 THEN 'fizzbuzz'
                WHEN r % 3  = 0 THEN 'fizz'
                WHEN r % 5  = 0 THEN 'buzz'
                ELSE 'other' END AS word,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(r) AS BIGINT) AS sum_n
    FROM RANGE(0, 10000) t(r)
    GROUP BY word
    """,
    tags=("source", "datasource", "pipeline"),
)
def source_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's Generator contract (maps/maps.go:8-10,
    GeneratorSource :39-49) as a FIRST-CLASS Spark source: a Python
    DataSource whose reader splits the generated range into parallel
    InputPartitions (blow_spark.datasource). The scan feeds the fizzbuzz
    classification + aggregate — generator → classify → agg, fully
    planned by Catalyst, hash-checked against DuckDB's RANGE."""
    from blow_spark import datasource

    datasource.register(spark)
    g = (
        spark.read.format("blow_generator")
        .option("n", 10_000)
        .option("partitions", 8)
        .load()
    )
    word = (
        F.when(F.col("n") % 15 == 0, F.lit("fizzbuzz"))
        .when(F.col("n") % 3 == 0, F.lit("fizz"))
        .when(F.col("n") % 5 == 0, F.lit("buzz"))
        .otherwise(F.lit("other"))
    )
    return g.groupBy(word.alias("word")).agg(
        F.count("*").alias("n"),
        F.sum("n").cast("bigint").alias("sum_n"),
    )


@register(
    "pipeline_fizzbuzz_udf",
    oracle="""
    SELECT r AS number,
           CASE WHEN r % 15 = 0 THEN 'fizzbuzz'
                WHEN r % 3  = 0 THEN 'fizz'
                WHEN r % 5  = 0 THEN 'buzz'
                ELSE CAST(r AS VARCHAR) END AS word
    FROM RANGE(0, 10000) t(r)
    """,
    tags=("pipeline", "udf", "flagship"),
)
def pipeline_fizzbuzz_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference demo end-to-end through the blow-parity surface:
    GeneratorSource → MapDispatch(fizzmapper) (cmd/fizzbuzz/server/
    server.go:60), i.e. the opaque-Python-UDF path over mapInPandas.
    Exactly 10,000 rows — pins the flatMap multiplicity contract
    (SURVEY.md §2.3.1)."""
    return fizzbuzz_pipeline(spark, 10_000).df


@register(
    "ops_asof_union_window",
    oracle="""
    SELECT e.event_id,
           e.user_id,
           c.ts AS asof_ts
    FROM (SELECT * FROM events WHERE event_type = 'error') e
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON e.user_id = c.user_id AND e.ts > c.ts
    """,
    tags=("join", "asof", "ops"),
)
def ops_asof_union_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join via the scale path (union + single window pass — one
    shuffle, no cross-product; blow_spark.ops.asof_join). Same oracle as
    the naive range-join form (catalog: join_asof)."""
    ev = read_table(spark, sf_dir, "events")
    err = ev.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    clk = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    out = ops.asof_join(err, clk, on="user_id", left_ts="ts", right_ts="ts", strict=True)
    return out.select("event_id", "user_id", F.col("asof_ts"))


@register(
    "ops_range_join_bucketed",
    oracle="""
    SELECT a.s_suppkey AS suppkey,
           COUNT(b.s_suppkey) AS n_peers
    FROM supplier a
    LEFT JOIN supplier b
      ON b.s_acctbal BETWEEN a.s_acctbal - 250 AND a.s_acctbal + 250
     AND b.s_suppkey <> a.s_suppkey
    GROUP BY a.s_suppkey
    """,
    tags=("join", "range", "ops"),
)
def ops_range_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band join via bucket-explode equi-join (blow_spark.ops.
    range_join_bucketed) — O(matches) instead of the BNLJ cross product.
    Same oracle as the naive non-equi form (catalog: join_range_nonequi).
    Left-join parity: unmatched a-rows kept via count aggregation over an
    inner bucket join + an anti-join fill."""
    s = read_table(spark, sf_dir, "supplier")
    a = s.select(F.col("s_suppkey").alias("a_key"), F.col("s_acctbal").alias("a_bal"))
    b = s.select(F.col("s_suppkey").alias("b_key"), F.col("s_acctbal").alias("b_bal"))
    pairs = ops.range_join_bucketed(a, b, "a_bal", "b_bal", radius=250.0).filter(
        F.col("b_key") != F.col("a_key")
    )
    counts = pairs.groupBy(F.col("a_key")).agg(F.count("b_key").alias("n_peers"))
    return (
        a.join(counts, "a_key", "left")
        .select(
            F.col("a_key").alias("suppkey"),
            F.coalesce(F.col("n_peers"), F.lit(0)).alias("n_peers"),
        )
    )


@register(
    "ops_sessionize",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ), numbered AS (
      SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
      FROM marked
    )
    SELECT user_id,
           MIN(ts)                        AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE   AS session_end,
           COUNT(*)                       AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM numbered
    GROUP BY user_id, session_no
    """,
    tags=("session", "ops"),
)
def ops_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands sessionization (blow_spark.ops.session_bounds) —
    the batch twin of F.session_window, same oracle as window_session."""
    e = read_table(spark, sf_dir, "events")
    return ops.session_bounds(
        e, key_col="user_id", ts_col="ts", gap_minutes=30, agg_value_col="value"
    ).select("user_id", "session_start", "session_end", "n_events", "total_value")


@register(
    "udtf_dynamic_schema",
    oracle="""
    SELECT event_id,
           CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) AS k,
           LENGTH(props) AS props_len
    FROM events
    WHERE event_id < 2000
    """,
    tags=("udf", "udtf", "analyze"),
)
def udtf_dynamic_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF with a static ``analyze()`` phase (Spark 4): the
    OUTPUT SCHEMA is computed at plan time from a constant argument — a
    comma-separated field spec — instead of being declared. This is the
    full UDTF contract the one-shape fizzbuzz UDTF doesn't exercise:
    Catalyst calls analyze() during resolution, the generated columns
    participate in optimization like any static schema, and eval() then
    emits rows matching it. Spec here = 'k,props_len' → a JSON-int
    extract and a length column, checked against DuckDB's JSON path."""
    import json

    from pyspark.sql.functions import udtf
    from pyspark.sql.types import LongType, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    @udtf
    class FieldExtract:
        @staticmethod
        def analyze(spec: AnalyzeArgument, props: AnalyzeArgument) -> AnalyzeResult:
            schema = StructType()
            for field in spec.value.split(","):
                schema = schema.add(field, LongType())
            return AnalyzeResult(schema=schema)

        def __init__(self):
            self._fields = None

        def eval(self, spec: str, props: str):
            fields = spec.split(",")
            try:
                doc = json.loads(props) if props else {}
            except ValueError:
                doc = {}
            row = []
            for f in fields:
                if f == "props_len":
                    row.append(len(props) if props is not None else None)
                else:
                    v = doc.get(f)
                    row.append(int(v) if v is not None else None)
            yield tuple(row)

    spark.udtf.register("field_extract", FieldExtract)
    e = read_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    e.createOrReplaceTempView("events_udtf_src")
    return spark.sql(
        "SELECT s.event_id, f.k, f.props_len "
        "FROM events_udtf_src s, LATERAL field_extract('k,props_len', s.props) f"
    )


@register(
    "pipeline_fizzbuzz_udtf",
    oracle="""
    WITH t AS (SELECT r FROM RANGE(0, 10000) t(r)),
    base AS (
      SELECT r AS number,
             CASE WHEN r % 15 = 0 THEN 'fizzbuzz'
                  WHEN r % 3  = 0 THEN 'fizz'
                  WHEN r % 5  = 0 THEN 'buzz'
                  ELSE CAST(r AS VARCHAR) END AS word
      FROM t WHERE r % 7 <> 0 OR r % 15 = 0
    ),
    extra AS (SELECT r AS number, 'fizzbuzz!' AS word FROM t WHERE r % 15 = 0)
    SELECT number, word FROM base
    UNION ALL
    SELECT number, word FROM extra
    """,
    tags=("pipeline", "udf", "udtf"),
)
def pipeline_fizzbuzz_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's core abstraction — the flatMap-shaped `Mapper`
    (`Do(Keyed, chan<- Keyed)`, maps/maps.go:12-14, 0..N emissions per
    input) — as a first-class Spark 4 Python UDTF invoked via LATERAL.
    Multiplicity is exercised for real: multiples of 15 emit TWO rows,
    multiples of 7 (not 15) emit ZERO, everything else ONE — pinning
    SURVEY.md §2.3.1 exactly where mapInPandas (pipeline_fizzbuzz_udf)
    pins it batch-wise. UDTF registration is the analog of
    `Host.Register` (maps/dispatch.go:242-249). Arrow-batched transfer;
    scales as a map-only stage — no shuffle, no state."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="number: bigint, word: string")
    class FizzBuzzUdtf:
        def eval(self, i: int):
            if i % 15 == 0:
                yield i, "fizzbuzz"
                yield i, "fizzbuzz!"
            elif i % 7 == 0:
                return
            elif i % 3 == 0:
                yield i, "fizz"
            elif i % 5 == 0:
                yield i, "buzz"
            else:
                yield i, str(i)

    spark.udtf.register("fizzbuzz_udtf", FizzBuzzUdtf)
    return spark.sql(
        "SELECT f.number, f.word FROM range(0, 10000) t, LATERAL fizzbuzz_udtf(t.id) f"
    )


@register(
    "join_asof_cogroup",
    oracle="""
    SELECT e.event_id,
           e.user_id,
           c.ts AS last_click_ts
    FROM (SELECT * FROM events WHERE event_type = 'error') e
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON e.user_id = c.user_id AND e.ts > c.ts
    """,
    tags=("join", "asof", "udf", "ops"),
)
def join_asof_cogroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Third as-of-join implementation: two-table cogroup →
    `pd.merge_asof` per key (df.groupBy().cogroup().applyInPandas — the
    Spark API the reference's two-sided worker dispatch would need but
    never built; SURVEY.md §2.2 joins row). Both sides shuffle once on
    user_id, then each group joins in-memory in Arrow batches. Same
    oracle as join_asof / ops_asof_union_window, so all three engine
    paths are pinned to one semantic. At 100 TB this is the pattern for
    arbitrary per-key two-input logic Catalyst can't express."""
    import pandas as pd

    ev = read_table(spark, sf_dir, "events")
    err = ev.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    clk = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts")
    )

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty:
            return pd.DataFrame(
                {"event_id": [], "user_id": [], "last_click_ts": []}
            ).astype({"event_id": "int64", "user_id": "int64"})
        left = left.sort_values("ts")
        right = right.sort_values("click_ts")[["click_ts"]]
        out = pd.merge_asof(
            left, right, left_on="ts", right_on="click_ts", allow_exact_matches=False
        )
        out = out.rename(columns={"click_ts": "last_click_ts"})
        return out[["event_id", "user_id", "last_click_ts"]]

    return (
        err.groupBy("user_id")
        .cogroup(clk.groupBy("user_id"))
        .applyInPandas(merge, "event_id long, user_id long, last_click_ts timestamp")
    )


@register(
    "udf_scalar_python",
    oracle="""
    SELECT l_orderkey,
           CASE WHEN l_orderkey % 15 = 0 THEN 'fizzbuzz'
                WHEN l_orderkey % 3 = 0  THEN 'fizz'
                WHEN l_orderkey % 5 = 0  THEN 'buzz'
                ELSE CAST(l_orderkey AS VARCHAR) END AS word,
           l_linenumber
    FROM lineitem
    """,
    tags=("udf", "python"),
)
def udf_scalar_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python @udf — the U1 scalar-UDF surface in its
    slowest legal form, registered deliberately: it completes the UDF
    API matrix (@udf here; @pandas_udf, mapInPandas, applyInPandas,
    UDTF, mapInArrow elsewhere) and is the documented anti-pattern the
    vectorized forms replace (per-row Python dispatch ~10-100× slower —
    never on a hot path; SCALE.md "Python boundary policy"). Logic is
    the reference's fizzbuzz mapper (cmd/fizzbuzz/fizzbuzz.go:21-46)."""
    from pyspark.sql.functions import udf

    @udf("string")
    def fizz(n):
        if n % 15 == 0:
            return "fizzbuzz"
        if n % 3 == 0:
            return "fizz"
        if n % 5 == 0:
            return "buzz"
        return str(n)

    li = read_table(spark, sf_dir, "lineitem")
    return li.select("l_orderkey", fizz("l_orderkey").alias("word"), "l_linenumber")


@register(
    "udf_pandas_scalar",
    oracle="""
    SELECT l_orderkey,
           (l_orderkey * 2654435761) % 4294967296 % 1024 AS hash_bucket,
           l_quantity * 2.0                              AS qty_doubled
    FROM lineitem
    """,
    tags=("udf", "pandas", "arrow"),
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar @pandas_udf (Arrow batches in, numpy arithmetic,
    Arrow batches out) — the fast form of the U1 scalar surface: one
    Python call per batch instead of per row. Knuth multiplicative
    hashing in int64 (no overflow: keys ≪ 2^33) and a doubling in
    float64 — both bit-exact against the oracle's integer/IEEE
    arithmetic, no rounding needed. Stays a map-only stage: Arrow
    transfer pipelines with the scan."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # no type hints: `from __future__ import annotations` stringifies
    # them, which pandas_udf's hint parser rejects; hint-free defaults
    # to the SCALAR variant, which is what this is
    @pandas_udf("long")
    def bucket(k):
        return (k * 2654435761) % 4294967296 % 1024

    @pandas_udf("double")
    def doubled(q):
        return q * 2.0

    li = read_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        bucket("l_orderkey").alias("hash_bucket"),
        doubled("l_quantity").alias("qty_doubled"),
    )


@register(
    "udf_sql_declared",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(ROUND(l_extendedprice * (1.0 - l_discount) * 100, 0)
                         AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM lineitem
    WHERE l_partkey < 1000
    GROUP BY l_returnflag
    """,
    tags=("udf", "sql", "spark4"),
)
def udf_sql_declared(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-declared UDFs (Spark 4: CREATE FUNCTION ... RETURN <expr> /
    RETURN TABLE(...)) — the U1 Mapper surface with the body in SQL, so
    Catalyst INLINES it (fully codegen'd, no Python boundary at all;
    the plan is identical to writing the expression inline, which is
    exactly what the oracle does). A scalar function computes the
    discounted price and a table function encapsulates the
    small-parts slice; revenue is a fixed-point integer sum, so the
    result is engine-exact."""
    register_views(spark, sf_dir, ["lineitem"])
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION bs_disc_price(p DOUBLE, d DOUBLE) "
        "RETURNS DOUBLE RETURN p * (1.0 - d)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION bs_small_parts() RETURNS TABLE "
        "(l_returnflag STRING, l_extendedprice DOUBLE, l_discount DOUBLE) RETURN "
        "SELECT l_returnflag, l_extendedprice, l_discount FROM lineitem WHERE l_partkey < 1000"
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n_lines,
               CAST(SUM(CAST(ROUND(bs_disc_price(l_extendedprice, l_discount) * 100, 0)
                             AS BIGINT)) AS BIGINT) AS revenue_cents
        FROM bs_small_parts()
        GROUP BY l_returnflag
        """
    )


@register(
    "udtf_table_argument",
    oracle="""
    WITH g AS (
      SELECT user_id,
             epoch_us(ts) - epoch_us(LAG(ts) OVER (
               PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
      FROM events
    )
    SELECT user_id,
           CAST(MAX(gap_us) AS BIGINT) AS max_gap_us,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM g GROUP BY user_id
    """,
    tags=("udf", "udtf", "spark4", "table-argument"),
)
def udtf_table_argument(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF taking a TABLE argument with PARTITION BY / ORDER BY
    (Spark 4) — the 'process each group as an ordered stream' contract
    the reference's NetworkMapper could only approximate with key
    affinity (maps/dispatch.go keyed dispatch): here the engine
    guarantees one UDTF instance per user_id partition fed rows in
    (ts, event_id) order, and the UDTF keeps sequential state (previous
    timestamp) that a plain scalar UDF cannot. Gap arithmetic is exact
    integer microseconds from timedelta fields on the Python side and
    epoch_us() on the oracle side — no float epoch conversions. The
    same computation is window-expressible (and the oracle does exactly
    that); the query pins the UDTF execution contract, not the math."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="user_id: bigint, max_gap_us: bigint, n_events: bigint")
    class MaxGap:
        def __init__(self):
            self._prev = None
            self._user = None
            self._max = None
            self._n = 0

        def eval(self, row):
            self._user = row["user_id"]
            self._n += 1
            if self._prev is not None:
                d = row["ts"] - self._prev
                gap = (d.days * 86_400_000_000 + d.seconds * 1_000_000
                       + d.microseconds)
                if self._max is None or gap > self._max:
                    self._max = gap
            self._prev = row["ts"]

        def terminate(self):
            if self._user is not None:
                yield self._user, self._max, self._n

    spark.udtf.register("bs_max_gap", MaxGap)
    read_table(spark, sf_dir, "events").createOrReplaceTempView("events_v")
    return spark.sql(
        "SELECT * FROM bs_max_gap(TABLE(events_v) "
        "PARTITION BY user_id ORDER BY (ts, event_id))"
    )
