"""Local replica of the driver's DuckDB-oracle comparison (row count +
column names + order-insensitive values), used by tests/test_oracle_parity.py
so mismatches surface before the driver's CORRECTNESS gate does.

Normalization is stricter than any plausible hash: every cell is rendered to
a canonical string (floats via repr, so both engines must agree to the bit
after the query-side rounding policy), rows are sorted as tuples.
"""

from __future__ import annotations

import datetime as _dt
import decimal
import math

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


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _canon(v) -> str:
    if v is None:
        return "@null"
    if isinstance(v, float):
        if math.isnan(v):
            return "@null"
        return repr(v)
    if isinstance(v, (pd.Timestamp, _dt.datetime)):
        if pd.isna(v):
            return "@null"
        return pd.Timestamp(v).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, decimal.Decimal):
        return f"dec:{v}"
    if isinstance(v, bytes):
        return "0x" + v.hex()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if v is pd.NaT or (isinstance(v, type(pd.NA)) if hasattr(pd, "NA") else False):
        return "@null"
    try:
        if pd.isna(v):
            return "@null"
    except (TypeError, ValueError):
        pass
    return f"{type(v).__name__}:{v}"


def canonical_rows(df: pd.DataFrame) -> list[tuple[str, ...]]:
    cols = sorted(df.columns)
    out = [tuple(_canon(v) for v in row) for row in df[cols].itertuples(index=False)]
    out.sort()
    return out


def compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    problems: list[str] = []
    s_cols, d_cols = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if s_cols != d_cols:
        problems.append(f"columns differ: spark={s_cols} duck={d_cols}")
        return problems
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count differs: spark={len(spark_pdf)} duck={len(duck_pdf)}")
    s_rows, d_rows = canonical_rows(spark_pdf), canonical_rows(duck_pdf)
    if s_rows != d_rows:
        s_only = [r for r in s_rows if r not in set(d_rows)][:3]
        d_only = [r for r in d_rows if r not in set(s_rows)][:3]
        problems.append(
            f"values differ (cols={s_cols}); spark-only sample={s_only}; duck-only sample={d_only}"
        )
    return problems
