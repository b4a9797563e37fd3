"""Order-insensitive result comparison between a Spark DataFrame and a
DuckDB oracle query — a local stand-in for the driver's correctness gate
(row count + column-name schema + value hash after sorting columns by name).

STRICTNESS CONTRACT (round 2): this comparator must be at least as strict
as the driver's canon. Round 1's version normalized Decimals and floats to
``%.6f`` — which masked two real driver hash-fails (Spark DECIMAL(20,4)
renders '0.0500', the DuckDB oracle float renders '0.05'; numerically
equal, red under the driver). Therefore:

- ``Decimal`` cells keep their exact string form (trailing zeros and all).
  A query that emits DECIMAL on one engine and DOUBLE on the other WILL
  mismatch here, as it does under the driver. Emit a canon-stable type
  (rounded double, or identical decimal cast on both engines).
- floats use ``repr`` (shortest round-trip) — no rounding. Queries are
  responsible for rounding unstable float aggregates themselves
  (functions/rounding.round_to); after correct rounding both engines
  produce bit-identical doubles.
- list / ndarray / dict / set cells raise: the driver's pandas-based
  canonicalizer crashes on unhashable cells (CORRECTNESS_r01
  ``llm_multimodal_decode_features`` err). Serialize complex output with
  ``to_json`` at the query boundary.
"""

from __future__ import annotations

import datetime
import decimal
import math
from typing import Any

import numpy as np
import pandas as pd

NULL = "\x00NULL"


class ComplexCellError(TypeError):
    """A result cell holds a container type that would crash the driver's
    canonicalizer — serialize it (to_json) at the query boundary."""


def _norm_cell(v: Any) -> str:
    if v is None or v is pd.NaT:
        return NULL
    if isinstance(v, (list, tuple, dict, set, np.ndarray)):
        raise ComplexCellError(
            f"complex-typed cell {type(v).__name__} would crash the driver "
            "canon (unhashable in pandas sort) — to_json it at the query boundary"
        )
    if isinstance(v, np.floating):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return NULL
        if math.isinf(v):
            return "inf" if v > 0 else "-inf"
        # -0.0 and 0.0 repr differently but compare equal in every engine
        if v == 0.0:
            v = 0.0
        return repr(v)
    if isinstance(v, decimal.Decimal):
        # exact string form, trailing zeros preserved — matches driver canon
        return str(v)
    if isinstance(v, pd.Timestamp):
        if pd.isna(v):
            return NULL
        return v.isoformat()
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    try:
        if pd.isna(v):  # covers np.nan in object columns, pd.NA
            return NULL
    except (TypeError, ValueError):
        pass
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, np.integer):
        return str(int(v))
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
