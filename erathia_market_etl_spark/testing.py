"""Differential-oracle test harness (SURVEY.md §5 rebuild strategy #1).

Replicates the driver's compare: run the Spark query and the DuckDB
oracle SQL on the same parquet fixtures, then check row count, column
names, and an order-insensitive value hash. Used by tests/ so mismatches
surface before the driver's CORRECTNESS gate does.
"""

from __future__ import annotations

import datetime as _dt
import hashlib
import math
import os
from dataclasses import dataclass

import duckdb

from .sources.parquet_io import FIXTURE_TABLES


def duckdb_connect_fixtures(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon(v) -> str:
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return "T" if v else "F"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            v = 0.0  # normalize -0.0
        return repr(round(v, 6))
    if isinstance(v, _dt.datetime):
        return v.isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    return str(v)


def rows_fingerprint(columns: list[str], rows: list[tuple]) -> str:
    """Order-insensitive: canonicalize each row with columns sorted by
    name, sort the row strings, hash."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    lines = sorted("|".join(_canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


@dataclass
class CompareResult:
    name: str
    spark_rows: int
    oracle_rows: int
    columns_match: bool
    hash_match: bool
    spark_cols: tuple
    oracle_cols: tuple

    @property
    def ok(self) -> bool:
        return (
            self.spark_rows == self.oracle_rows
            and self.columns_match
            and self.hash_match
        )


def compare_query(name: str, spark_df, oracle_sql: str, sf_dir: str) -> CompareResult:
    spark_cols = tuple(spark_df.columns)
    spark_rows = [tuple(r) for r in spark_df.collect()]

    con = duckdb_connect_fixtures(sf_dir)
    try:
        cur = con.execute(oracle_sql)
        oracle_cols = tuple(d[0] for d in cur.description)
        oracle_rows = cur.fetchall()
    finally:
        con.close()

    columns_match = sorted(spark_cols) == sorted(oracle_cols)
    hash_match = columns_match and rows_fingerprint(
        list(spark_cols), spark_rows
    ) == rows_fingerprint(list(oracle_cols), oracle_rows)
    return CompareResult(
        name=name,
        spark_rows=len(spark_rows),
        oracle_rows=len(oracle_rows),
        columns_match=columns_match,
        hash_match=hash_match,
        spark_cols=spark_cols,
        oracle_cols=oracle_cols,
    )
