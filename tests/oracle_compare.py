"""Order-insensitive result comparison between a Spark DataFrame and a
DuckDB oracle query — a local stand-in for the driver's correctness gate
(row count + column-name schema + value hash after sorting columns by name).

Normalization: floats/decimals rounded to 6 decimal places and formatted,
timestamps/dates to ISO strings, NULLs to a sentinel; rows sorted as string
tuples. Queries themselves are responsible for rounding unstable float
aggregates (partial-agg ordering) — this module's rounding only removes
representation noise, not accumulation noise.
"""

from __future__ import annotations

import datetime
import decimal
import math
from typing import Any

import pandas as pd

NULL = "\x00NULL"


def _norm_cell(v: Any) -> str:
    if v is None:
        return NULL
    if isinstance(v, float):
        if math.isnan(v):
            return NULL
        if math.isinf(v):
            return "inf" if v > 0 else "-inf"
        return f"{round(v, 6):.6f}"
    if isinstance(v, decimal.Decimal):
        return f"{float(round(v, 6)):.6f}"
    if isinstance(v, pd.Timestamp):
        if pd.isna(v):
            return NULL
        return v.isoformat()
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if v is pd.NaT:
        return NULL
    try:
        if pd.isna(v):  # covers np.nan in object columns, pd.NA
            return NULL
    except (TypeError, ValueError):
        pass
    if isinstance(v, bool):
        return "true" if v else "false"
    import numpy as np

    if isinstance(v, (np.floating,)):
        return _norm_cell(float(v))
    if isinstance(v, (np.integer,)):
        return str(int(v))
    if isinstance(v, np.ndarray):
        return "[" + ",".join(_norm_cell(x) for x in v.tolist()) + "]"
    return str(v)


def normalize(pdf: pd.DataFrame) -> list[tuple[str, ...]]:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    rows = [tuple(_norm_cell(v) for v in row) for row in pdf.itertuples(index=False, name=None)]
    rows.sort()
    return rows


def assert_matches_oracle(spark_df, duck_con, oracle_sql: str, name: str = "query") -> None:
    spark_pdf = spark_df.toPandas()
    oracle_pdf = duck_con.execute(oracle_sql).df()

    s_cols, o_cols = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    assert s_cols == o_cols, f"{name}: column mismatch spark={s_cols} oracle={o_cols}"
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count mismatch spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
    )

    s_rows, o_rows = normalize(spark_pdf), normalize(oracle_pdf)
    mismatches = [(a, b) for a, b in zip(s_rows, o_rows) if a != b]
    assert not mismatches, (
        f"{name}: {len(mismatches)}/{len(s_rows)} rows differ; first: "
        f"spark={mismatches[0][0]} oracle={mismatches[0][1]} (cols={s_cols})"
    )
