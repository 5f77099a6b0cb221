"""Unit tests for the local oracle mirror itself (tests/oracle_utils.py).

The r2 driver failures (`scalar_functions` signum DOUBLE-vs-int,
`lineitem_flag_stats` count_if HUGEINT-vs-BIGINT) passed the local
mirror because pd.to_numeric + tolerance erased the dtype difference
that the driver's string-hash sees. These tests pin that the mirror is
now dtype-strict: the exact pre-fix forms must FAIL locally.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tests.oracle_utils import compare_frames


def test_int_vs_float_drift_fails():
    # the `above_150k` shape from r2: Spark signum() DOUBLE vs DuckDB sign() int
    spark_pdf = pd.DataFrame({"k": [1, 2, 3], "sgn": [-1.0, 0.0, 1.0]})
    duck_pdf = pd.DataFrame({"k": [1, 2, 3], "sgn": [-1, 0, 1]})
    with pytest.raises(AssertionError, match="dtype drift"):
        compare_frames(spark_pdf, duck_pdf, "signum_shape")


def test_float_vs_int_drift_fails_other_side():
    # the `n_discounted` shape from r2: DuckDB HUGEINT→float vs Spark BIGINT
    spark_pdf = pd.DataFrame({"k": [1, 2], "n": np.array([8912, 7], dtype="int64")})
    duck_pdf = pd.DataFrame({"k": [1, 2], "n": [8912.0, 7.0]})
    with pytest.raises(AssertionError, match="dtype drift"):
        compare_frames(spark_pdf, duck_pdf, "count_if_shape")


def test_matching_int_columns_pass():
    a = pd.DataFrame({"k": [1, 2], "n": [10, 20]})
    b = pd.DataFrame({"k": [2, 1], "n": [20, 10]})  # order-insensitive
    compare_frames(a, b, "ints_ok")


def test_matching_float_columns_pass_with_tolerance():
    a = pd.DataFrame({"x": [0.1234567, 2.5]})
    b = pd.DataFrame({"x": [0.1234568, 2.5]})
    compare_frames(a, b, "floats_ok")


def test_nullable_int_exemption():
    # nullable ints can't live in an int64 Series: pandas forces float64
    # with NaN on BOTH sides when row sets truly match, but a full-outer
    # shape can surface one side pre-coerced — only exempt when the float
    # side actually carries nulls (no false dtype alarm, values still checked)
    a = pd.DataFrame({"k": [1, 2, 3], "n": [1.0, np.nan, 3.0]})
    b = pd.DataFrame({"k": [1, 2, 3], "n": [1.0, np.nan, 3.0]})
    compare_frames(a, b, "nullable_ok")


def test_real_value_mismatch_still_fails():
    a = pd.DataFrame({"x": [1.0, 2.0]})
    b = pd.DataFrame({"x": [1.0, 2.5]})
    with pytest.raises(AssertionError, match="value mismatch"):
        compare_frames(a, b, "values_bad")
