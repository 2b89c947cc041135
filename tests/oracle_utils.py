"""Mirror of the driver's correctness gate: run a Spark query and its
DuckDB oracle side by side, compare row count, column names, and
order-insensitive values.  Used by tests so mismatches surface before the
driver's CORRECTNESS_r{N}.json does.
"""

from __future__ import annotations

import datetime as _dt
import math
import os
from decimal import Decimal

import duckdb
import numpy as np


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"):
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon(v):
    if v is None:
        return None
    if isinstance(v, (np.floating,)):
        v = float(v)
    if isinstance(v, (np.integer,)):
        v = int(v)
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(_canon(x) for x in v)
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (bool, np.bool_)):
        return bool(v)
    return v


def normalize(df_pandas) -> tuple[list[str], list[tuple]]:
    cols = sorted(df_pandas.columns)
    rows = [tuple(_canon(v) for v in row)
            for row in df_pandas[cols].itertuples(index=False, name=None)]
    rows.sort(key=repr)
    return cols, rows


def compare(spark_df, con, sql, name="") -> list[str]:
    """Returns a list of problems; empty list == match."""
    problems = []
    s_pdf = spark_df.toPandas()
    d_pdf = con.sql(sql).df()
    s_cols, s_rows = normalize(s_pdf)
    d_cols, d_rows = normalize(d_pdf)
    if s_cols != d_cols:
        problems.append(f"{name}: columns differ spark={s_cols} duck={d_cols}")
        return problems
    if len(s_rows) != len(d_rows):
        problems.append(f"{name}: row counts differ spark={len(s_rows)} duck={len(d_rows)}")
    for i, (a, b) in enumerate(zip(s_rows, d_rows)):
        if a != b:
            problems.append(f"{name}: first differing row #{i}:\n  spark={a}\n  duck ={b}")
            break
    return problems
