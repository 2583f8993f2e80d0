"""Local replica of the driver's correctness gate: run a catalog query on
Spark and its oracle SQL on DuckDB over the same parquet tables, then
compare row count, column names, and (order-insensitively) values.

The comparison is strict — exact equality for every cell, including
float bits — because the catalog's determinism discipline
(catalog.py docstring) is supposed to make results bit-identical. If a
query needs tolerance, that's a bug in the query, not the harness.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass, field

import duckdb
import pandas as pd

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon_cell(v):
    # Canonicalize a cell for order-insensitive comparison.
    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "\x00NAN"
        return float(v).hex()  # bit-exact
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_canon_cell(x)}" for k, x in sorted(v.items())) + "}"
    if isinstance(v, bytes):
        return v.hex()
    return repr(v)


def canon_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [
        tuple(_canon_cell(df[c].iloc[i]) for c in cols) for i in range(len(df))
    ]
    rows.sort()
    return rows


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    problems: list[str] = field(default_factory=list)


def compare_query(spark, con, name: str, fn, oracle: str, sf_dir: str) -> CompareResult:
    sdf = fn(spark, sf_dir).toPandas()
    odf = con.execute(oracle).fetch_df()
    problems: list[str] = []
    if sorted(sdf.columns) != sorted(odf.columns):
        problems.append(f"columns: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
    if len(sdf) != len(odf):
        problems.append(f"rowcount: spark={len(sdf)} oracle={len(odf)}")
    if not problems:
        srows, orows = canon_rows(sdf), canon_rows(odf)
        if srows != orows:
            diffs = [
                (i, s, o)
                for i, (s, o) in enumerate(zip(srows, orows))
                if s != o
            ][:3]
            problems.append(f"values differ; first diffs: {diffs}")
    return CompareResult(name, not problems, len(sdf), len(odf), problems)
