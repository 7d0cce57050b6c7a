"""Local replica of the driver's correctness gate.

The driver runs each ``queries()[name]`` on Spark and the matching
``oracle_sql()[name]`` on DuckDB over the same parquet fixtures, then
compares row count + schema + order-insensitive value hash. This module
reproduces that check locally (strictly: exact values after canonical
normalization) so regressions surface in pytest before a driver round.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass

import pandas as pd

from blow_spark.sources import TPCH_TABLES


def duckdb_run(sql: str, sf_dir: str) -> pd.DataFrame:
    import duckdb

    con = duckdb.connect()
    try:
        for t in TPCH_TABLES:
            path = os.path.join(sf_dir, f"{t}.parquet")
            if os.path.exists(path):
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
        return con.execute(sql).df()
    finally:
        con.close()


def _norm_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "∅"
        # exact repr: queries are designed to be bit-deterministic across engines
        return repr(v)
    if isinstance(v, (pd.Timestamp,)):
        return v.isoformat()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def canonical_rows(df: pd.DataFrame) -> list[tuple]:
    """Sort columns by name, normalize cells, sort rows — order-insensitive."""
    cols = sorted(df.columns)
    rows = [tuple(_norm_cell(row[c]) for c in cols) for _, row in df[cols].iterrows()]
    return sorted(rows)


@dataclass
class CompareResult:
    name: str
    ok: bool
    detail: str = ""


def compare(name: str, spark_df, oracle_pdf: pd.DataFrame) -> CompareResult:
    spdf = spark_df.toPandas()
    if len(spdf) != len(oracle_pdf):
        return CompareResult(name, False, f"row count {len(spdf)} != oracle {len(oracle_pdf)}")
    s_cols, o_cols = sorted(spdf.columns), sorted(oracle_pdf.columns)
    if s_cols != o_cols:
        return CompareResult(name, False, f"columns {s_cols} != oracle {o_cols}")
    s_rows, o_rows = canonical_rows(spdf), canonical_rows(oracle_pdf)
    if s_rows != o_rows:
        diffs = [
            f"  spark={sr}\n  oracle={orr}"
            for sr, orr in zip(s_rows, o_rows)
            if sr != orr
        ][:3]
        return CompareResult(name, False, "value mismatch (first diffs):\n" + "\n".join(diffs))
    return CompareResult(name, True)
