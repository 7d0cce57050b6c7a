"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over blow_spark's query catalog: every operator in SURVEY.md §2
registers a (Spark builder, DuckDB oracle) pair in
``blow_spark.queries.REGISTRY``; this module re-exports that registry in
the driver's shape.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from blow_spark import queries as catalog  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Reproduces the reference's one real computation (fizzbuzz,
    cmd/fizzbuzz/fizzbuzz.go:21-46) as a columnar scan→classify→aggregate
    plan over lineitem."""
    return catalog.queries()["flagship_fizzbuzz_agg"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return catalog.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twin for each SQL-expressible query."""
    return catalog.oracle_sql()
