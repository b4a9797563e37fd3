"""The local comparator must be AT LEAST as strict as the driver's canon.

Round 1's comparator normalized Decimals/floats to %.6f and green-lit two
queries the driver hash-failed (DECIMAL '0.0500' vs float '0.05'). These
tests pin the strict behavior so it can't silently loosen again.
"""

from __future__ import annotations

import decimal

import numpy as np
import pandas as pd
import pytest

from tests.oracle_compare import ComplexCellError, normalize


def test_decimal_trailing_zeros_mismatch_float():
    """Spark DECIMAL(20,4) vs DuckDB DOUBLE — numerically equal, red under
    the driver. The strict canon must also see them as different."""
    spark_side = pd.DataFrame({"v": [decimal.Decimal("0.0500")]})
    oracle_side = pd.DataFrame({"v": [0.05]})
    assert normalize(spark_side) != normalize(oracle_side)


def test_identical_decimals_match():
    a = pd.DataFrame({"v": [decimal.Decimal("96262.50")]})
    b = pd.DataFrame({"v": [decimal.Decimal("96262.50")]})
    assert normalize(a) == normalize(b)


def test_floats_not_rounded():
    """No %.6f smoothing: sub-1e-6 differences must be visible, as they are
    to the driver. Queries own their rounding (functions/rounding)."""
    a = pd.DataFrame({"v": [0.1234567891]})
    b = pd.DataFrame({"v": [0.1234567892]})
    assert normalize(a) != normalize(b)


def test_equal_floats_match_and_neg_zero_is_zero():
    a = pd.DataFrame({"v": [0.05, -0.0]})
    b = pd.DataFrame({"v": [0.05, 0.0]})
    assert normalize(a) == normalize(b)


def test_complex_cell_raises():
    """List/array cells crash the driver's canonicalizer (CORRECTNESS_r01
    llm_multimodal_decode_features err) — locally they must fail loudly."""
    with pytest.raises(ComplexCellError):
        normalize(pd.DataFrame({"v": [[1.0, 2.0]]}))
    with pytest.raises(ComplexCellError):
        normalize(pd.DataFrame({"v": [np.array([1.0, 2.0])]}))


def test_null_forms_coalesce():
    a = pd.DataFrame({"v": [None]})
    b = pd.DataFrame({"v": [float("nan")]})
    assert normalize(a) == normalize(b)
