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


def _duck_df(con, sql):
    """Fetch an oracle result EXACTLY: .df() converts DECIMAL(38,0) /
    HUGEINT to float64 (values beyond 2^53 alias — ADVICE r05); the
    arrow path keeps decimals as decimal128 -> Decimal objects."""
    return con.sql(sql).arrow().to_pandas()


def _canon(v):
    if v is None:
        return None
    if isinstance(v, (np.floating,)):
        v = float(v)
    if isinstance(v, (np.integer,)):
        v = int(v)
    if isinstance(v, Decimal):
        # integral decimals compare as exact ints (beyond-2^53 values
        # must not round through float64); fractional keep float
        # semantics (both engines emit the identical double there).
        if v == v.to_integral_value():
            return int(v)
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


def _sort_key(v):
    """Type-insensitive total order for the row sort (ADVICE r06): an
    int 2 from one engine and a float 2.0 from the other are == but
    have different reprs, so a repr sort could align equal row sets
    differently and report a false first-diff.  Numbers sort by exact
    numeric value (Python compares int vs float exactly, no 2^53
    aliasing); kind prefixes keep None/numbers/composites/strings in
    disjoint bands."""
    if v is None:
        return (0,)
    if isinstance(v, bool):
        return (1, int(v))
    if isinstance(v, (int, float)):
        return (1, v)
    if isinstance(v, tuple):
        return (2, tuple(_sort_key(x) for x in v))
    return (3, repr(v))


def normalize(df_pandas) -> tuple[list[str], list[tuple]]:
    cols = sorted(df_pandas.columns)
    rows = [tuple(_canon(v) for v in row)
            for row in df_pandas[cols].itertuples(index=False, name=None)]
    rows.sort(key=lambda r: tuple(_sort_key(v) for v in r))
    return cols, rows


def _canon_frame(pdf, cols):
    """Vectorized canonicalization: shared dtypes + total row order."""
    import pandas as pd

    out = {}
    for c in cols:
        s = pdf[c]
        if pd.api.types.is_bool_dtype(s):
            s = s.astype("int64")
        elif pd.api.types.is_integer_dtype(s):
            s = s.astype("int64")
        elif pd.api.types.is_float_dtype(s):
            s = s.astype("float64")
        elif pd.api.types.is_datetime64_any_dtype(s):
            s = s.astype("datetime64[us]").astype(str)
        else:
            # object column: bail to the row-at-a-time path if it holds
            # composites (lists/dicts) — only flat outputs go fast.
            sample = s.dropna().head(20)
            if any(isinstance(v, (list, tuple, dict, np.ndarray))
                   for v in sample):
                return None
            if any(isinstance(v, Decimal) for v in sample):
                # Exact path (ADVICE r05): integral DECIMAL(38,0) /
                # HUGEINT beyond 2^53 alias as float64 — keep them as
                # Python ints (object dtype; sorts numerically, and
                # int == int64 compares exactly); fractional decimals
                # keep float semantics.
                def _dec(v):
                    if v is None:
                        return None
                    if isinstance(v, Decimal):
                        return (int(v) if v == v.to_integral_value()
                                else float(v))
                    return v
                s = s.map(_dec)
            else:
                s = s.astype(str).where(~s.isna(), None)
        out[c] = s
    f = pd.DataFrame(out)
    f = f.sort_values(cols, kind="mergesort", na_position="last")
    return f.reset_index(drop=True)


def compare_big(spark_df, con, sql, name="") -> list[str]:
    """compare(), but vectorized — for multi-million-row results where
    the per-row Python canonicalization of compare() is the bottleneck.
    Same contract: count, column names, order-insensitive exact values.
    """
    problems = []
    s_pdf = spark_df.toPandas()
    d_pdf = _duck_df(con, sql)
    s_cols, d_cols = sorted(s_pdf.columns), sorted(d_pdf.columns)
    if s_cols != d_cols:
        return [f"{name}: columns differ spark={s_cols} duck={d_cols}"]
    if len(s_pdf) != len(d_pdf):
        problems.append(f"{name}: row counts differ "
                        f"spark={len(s_pdf)} duck={len(d_pdf)}")
        return problems
    s_f = _canon_frame(s_pdf, s_cols)
    d_f = _canon_frame(d_pdf, s_cols)
    if s_f is None or d_f is None:          # composite columns present
        return compare(spark_df, con, sql, name)
    for c in s_cols:
        a, b = s_f[c].to_numpy(), d_f[c].to_numpy()
        if a.dtype != b.dtype:
            # one engine emitted int64 where the other emitted exact
            # object ints (the Decimal path) — compare as objects
            a, b = a.astype(object), b.astype(object)
        if a.dtype.kind == "f":
            eq = (a == b) | (np.isnan(a) & np.isnan(b))
        else:
            eq = (a == b) | ((a != a) & (b != b))  # None==None via NaN
        if not bool(np.asarray(eq).all()):
            i = int(np.argmin(eq))
            problems.append(f"{name}: column {c} first diff row #{i}: "
                            f"spark={a[i]!r} duck={b[i]!r}")
            break
    return problems


def compare(spark_df, con, sql, name="") -> list[str]:
    """Returns a list of problems; empty list == match."""
    problems = []
    s_pdf = spark_df.toPandas()
    d_pdf = _duck_df(con, sql)
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
