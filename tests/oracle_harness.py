"""Local replica of the driver's correctness gate: run each registry
query on Spark and its oracle SQL on DuckDB over the same parquet
tables, then compare row count, column names, and an order-insensitive
canonical value rendering.
"""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd

from acuvate_spark.tables import TABLES


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _cell(v) -> str:
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "∅"
        return f"{v:.12g}"
    if isinstance(v, (np.floating,)):
        return _cell(float(v))
    if isinstance(v, (np.integer,)):
        return str(int(v))
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_cell(x) for x in v) + "]"
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if v is pd.NaT:
        return "∅"
    return str(v)


def canon(df: pd.DataFrame) -> tuple[list[str], list[tuple]]:
    cols = sorted(df.columns)
    rows = sorted(
        tuple(_cell(v) for v in row) for row in df[cols].itertuples(index=False, name=None)
    )
    return cols, rows


def compare(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str) -> list[str]:
    """Returns a list of mismatch descriptions (empty = pass)."""
    problems = []
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"{name}: row count {len(spark_pdf)} vs oracle {len(oracle_pdf)}")
    sc, sr = canon(spark_pdf)
    oc, orows = canon(oracle_pdf)
    if sc != oc:
        problems.append(f"{name}: columns {sc} vs oracle {oc}")
        return problems
    if sr != orows:
        n_bad = 0
        for i, (a, b) in enumerate(zip(sr, orows)):
            if a != b:
                if n_bad < 3:
                    problems.append(f"{name}: row {i} spark={a} oracle={b}")
                n_bad += 1
        extra = abs(len(sr) - len(orows))
        if n_bad or extra:
            problems.append(f"{name}: {n_bad} differing rows, {extra} extra rows")
    return problems
