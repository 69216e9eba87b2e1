"""Differential-oracle test harness (SURVEY.md §5 rebuild strategy #1).

Replicates the driver's compare: run the Spark query and the DuckDB
oracle SQL on the same parquet fixtures, then check row count, column
names, and an order-insensitive value hash. Used by tests/ so mismatches
surface before the driver's CORRECTNESS gate does.

Canonicalization parity (round-1 lesson, VERDICT.md "What's wrong" #5):
BOTH sides go through pandas exactly like the driver — the Spark result
via ``toPandas()`` and the oracle via ``cursor.df()`` — NOT via
``collect()``/``fetchall()``. The paths differ in type mapping (DuckDB
HUGEINT → float64 under pandas but Python int under fetchall), so a
fetchall-based local compare passes where the driver fails. Going
through pandas makes that class of mismatch reproduce locally.
"""

from __future__ import annotations

import datetime as _dt
import hashlib
import math
import os
from dataclasses import dataclass

import duckdb
import numpy as np

from .sources.parquet_io import FIXTURE_TABLES


def duckdb_connect_fixtures(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(path):
            # a Spark-written planted table is a DIRECTORY of part
            # files; the driver's fixtures are single files
            path = os.path.join(path, "*.parquet")
        elif not os.path.exists(path):
            continue
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon(v) -> str:
    # numpy scalars first: np.bool_/np.integer are NOT instances of the
    # Python types, and np.float64 must share the float path so the
    # int-vs-float distinction matches the driver's pandas view.
    if v is None:
        return "∅"
    if isinstance(v, (bool, np.bool_)):
        return "T" if bool(v) else "F"
    if isinstance(v, (float, np.floating)):
        v = float(v)
        if math.isnan(v):
            return "∅"  # pandas renders SQL NULL in numeric cols as NaN
        if v == 0.0:
            v = 0.0  # normalize -0.0
        return repr(round(v, 6))
    if isinstance(v, np.integer):
        return str(int(v))
    if isinstance(v, _dt.datetime):
        # pd.NaT IS an instance of datetime and its isoformat() is the
        # literal string 'NaT' — canonicalize it as SQL NULL instead
        # (NaT != NaT, same self-compare trick as the float-NaN path)
        if v != v:
            return "∅"
        # Driver parity: Spark DATE → python date via toPandas, DuckDB
        # DATE → midnight datetime64 via .df(); the driver compares them
        # equal (silver_clean_fact was driver-green in r1), so midnight
        # timestamps canonicalize as bare dates on both sides.
        s = v.isoformat()
        return s[:10] if s.endswith("T00:00:00") else s
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, np.ndarray):
        return "[" + ",".join(_canon(x) for x in v.tolist()) + "]"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if v != v:  # pd.NaT and friends
        return "∅"
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


def _pandas_rows(pdf) -> list[tuple]:
    # itertuples preserves numpy scalar types (the driver's view);
    # .values would upcast mixed columns to object inconsistently.
    return [tuple(r) for r in pdf.itertuples(index=False, name=None)]


def compare_query(name: str, spark_df, oracle_sql: str, sf_dir: str) -> CompareResult:
    # Driver parity: Spark side via toPandas(), oracle via .df() —
    # see module docstring.
    spark_pdf = spark_df.toPandas()
    spark_cols = tuple(spark_pdf.columns)
    spark_rows = _pandas_rows(spark_pdf)

    con = duckdb_connect_fixtures(sf_dir)
    try:
        oracle_pdf = con.execute(oracle_sql).df()
        oracle_cols = tuple(oracle_pdf.columns)
        oracle_rows = _pandas_rows(oracle_pdf)
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
