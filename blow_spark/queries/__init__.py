"""Query catalog — the driver-contract surface.

Every operator the engine claims (SURVEY.md §2) registers here as a named
query: a Spark builder ``(spark, sf_dir) -> DataFrame`` plus, where the
semantics are ANSI-SQL-expressible, a DuckDB oracle string over the same
parquet fixtures. ``__spark_entry__.py`` re-exports this registry.

Determinism rules every registered query follows (so the driver's
order-insensitive value-hash matches):

* every computed column is aliased identically in Spark and SQL;
* money aggregations are exact — either DECIMAL sums cast back to DOUBLE
  or fixed-point ROUND(x·10^k)→BIGINT sums (the fast path; both sides of
  a pair must use the SAME form: they differ at shortest-repr rounding
  boundaries) — so float summation order can't diverge;
* integer SUMs are cast to BIGINT in the oracle (DuckDB widens to
  HUGEINT, which pandas would coerce to float);
* LIMIT/top-k queries ORDER BY a key that is provably total, so the
  selected row set is unique;
* timestamps stay µs-precision, session time zone pinned UTC.
"""

from __future__ import annotations

import re

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    builder: QueryFn
    oracle: str | None  # DuckDB-runnable ANSI SQL, or None → rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, Query] = {}


def _interp_doc(fn: QueryFn) -> None:
    """Resolve {_CONST}-style placeholders in a builder's docstring
    against its module globals. Docstrings can't be f-strings, so
    authors write the same {_NAME} placeholders the oracle f-string
    uses; without this the generated QUERIES.md shows the literal
    brace text (round-8 ADVICE item 3). Unknown names are left as-is."""
    doc = fn.__doc__
    if not doc or "{_" not in doc:
        return
    g = fn.__globals__
    fn.__doc__ = re.sub(
        r"\{(_[A-Za-z0-9_]+)\}",
        lambda m: str(g[m.group(1)]) if m.group(1) in g else m.group(0),
        doc,
    )


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: add a query to the catalog."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _interp_doc(fn)
        REGISTRY[name] = Query(name=name, builder=fn, oracle=oracle, tags=tags)
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    _load()
    return {name: q.builder for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _load()
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}


_LOADED = False


def _load() -> None:
    """Import all query modules (they self-register on import)."""
    global _LOADED
    if _LOADED:
        return
    from blow_spark.queries import (  # noqa: F401
        batteries,
        codecs,
        corpus,
        entity,
        evalrank,
        experimentation,
        finance,
        graph2,
        governance,
        journeys,
        linkage,
        mlprims,
        multimodal_q,
        parity,
        pipeline_ops,
        product,
        recsys,
        relational,
        relational_ext,
        relational3,
        retrieval,
        spatial,
        stats,
        stats2,
        stats3,
        stats4,
        stats5,
        text,
        text2,
        text3,
        tpch,
        tpch2,
        vectors,
        windows_streaming,
    )

    _LOADED = True
