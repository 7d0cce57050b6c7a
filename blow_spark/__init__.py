"""blow_spark — a PySpark-native analytics engine with the capabilities of
wizgrao/blow, rebuilt Spark-first.

The reference (``/root/reference``, MIT) is a MapReduce-inspired distributed
flatMap framework (maps/maps.go, maps/dispatch.go). This engine re-expresses
its capability surface — source → distributed flatMap chain → sink — on the
Spark DataFrame/Catalyst stack, and extends it with the full relational,
streaming, and LLM-data-pipeline operator inventory in SURVEY.md §2.

Layout:
    session      SparkSession factory tuned for local[32] / cluster parity
    sources      readers (parquet/csv/json/orc, range, streaming) + writers
    pipeline     blow-parity fluent API (Source/flat_map/map_dispatch/sink)
    functions    scalar batteries + text-analysis column functions
    dedup        exact / MinHash-LSH / SimHash / n-gram-Jaccard / embedding dedup
    similarity   brute-force + LSH-bucketed ANN over embedding columns
    multimodal   binary-column plumbing (decode/feature/resize stubs)
    streaming    Structured Streaming ops (windows, watermark, stateful)
    queries      registry of named queries + DuckDB oracle SQL (driver contract)
"""

from blow_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
