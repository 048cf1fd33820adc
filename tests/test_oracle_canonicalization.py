"""Regression: the local oracle gate must be canonicalization-faithful to
the driver's value hash.

Round 8 shipped 19/50 red driver slots because the local checker compared
fetch-level Python objects (both engines return decimal.Decimal — match)
while the driver compares through a dataframe conversion (DuckDB .df()
renders DECIMAL as float64; Spark .toPandas() keeps Decimal — mismatch).
These tests pin the checker's normalization so that class can never ship
green locally again:

- a Decimal cell and a float cell with identical value must NOT compare
  equal (the r8 class);
- a float and an equal float must compare equal, full-precision (the r6
  ROUND-on-double ulp class stays visible);
- a date and the equivalent midnight timestamp MUST compare equal (the
  driver passed events_sketch_merge at r8 with exactly that shape);
- int64 and float64 of the same value must NOT compare equal (DuckDB
  renders SUM(int) = HUGEINT as float64; outputs must be dtype-aligned).
"""

import datetime
import decimal
import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from check_oracle import norm_cell, pdf_rows  # noqa: E402


def test_decimal_vs_float_mismatch():
    # The r8 driver class: byte-identical values, different representation.
    assert norm_cell(decimal.Decimal("1524135.000000")) != norm_cell(1524135.0)
    assert norm_cell(decimal.Decimal("0.500000")) != norm_cell(0.5)


def test_float_full_precision():
    assert norm_cell(0.1 + 0.2) != norm_cell(0.3)  # last-bit visible
    assert norm_cell(1234.5) == norm_cell(1234.5)
    assert norm_cell(float("nan")) == norm_cell(float("nan"))


def test_date_equals_midnight_timestamp():
    d = datetime.date(2024, 1, 22)
    ts = pd.Timestamp("2024-01-22 00:00:00")
    assert norm_cell(d) == norm_cell(ts)
    # ...but a non-midnight timestamp stays distinct
    assert norm_cell(d) != norm_cell(pd.Timestamp("2024-01-22 01:00:00"))


def test_int_vs_float_mismatch():
    assert norm_cell(np.int64(1136)) != norm_cell(np.float64(1136.0))
    assert norm_cell(np.int64(7)) == norm_cell(7)


def test_pdf_rows_through_pandas():
    # End-to-end through the pandas path: a decimal column frame and its
    # float64 twin must produce different normalized rows.
    dec_pdf = pd.DataFrame({"v": [decimal.Decimal("1.000000")]})
    dbl_pdf = pd.DataFrame({"v": [1.0]})
    a = [tuple(norm_cell(c) for c in r) for r in pdf_rows(dec_pdf)]
    b = [tuple(norm_cell(c) for c in r) for r in pdf_rows(dbl_pdf)]
    assert a != b


def test_duckdb_decimal_output_fails_vs_spark_decimal():
    # The actual engine pair: DuckDB DECIMAL through .df() vs the same
    # value as a Python Decimal (what Spark .toPandas() yields). This is
    # the exact mechanism of the r8 red class.
    import duckdb

    con = duckdb.connect()
    odf = con.execute("SELECT CAST(1.5 AS DECIMAL(38,6)) AS v").df()
    (ocell,) = pdf_rows(odf)[0]
    assert norm_cell(ocell) != norm_cell(decimal.Decimal("1.500000"))
    # and the fixed convention matches:
    odf2 = con.execute("SELECT CAST(ROUND(CAST(1.5 AS DECIMAL(38,6)), 6) AS DOUBLE) AS v").df()
    (ocell2,) = pdf_rows(odf2)[0]
    assert norm_cell(ocell2) == norm_cell(1.5)


def test_duckdb_decimal_double_cast_past_2_53_needs_varchar_roundtrip():
    """The sf100-exposed class: DuckDB's DECIMAL->DOUBLE cast divides the
    scaled int128 in floating point, inexact once value*10^scale exceeds
    2^53; Spark's BigDecimal.doubleValue() is correctly rounded at any
    magnitude. The oracle convention therefore routes the final cast
    through VARCHAR (exact digits -> correctly-rounded parse) — this
    pins both halves: the direct cast IS wrong above the ceiling, and
    the varchar round-trip matches Python's correctly-rounded
    str->float at every magnitude (and is bit-identical below it)."""
    import duckdb

    con = duckdb.connect()
    big = "2679535128980.000000"  # scaled int 2.68e18 > 2^53
    direct, via_varchar = con.execute(
        f"SELECT CAST(CAST({big} AS DECIMAL(38,6)) AS DOUBLE),"
        f" CAST(CAST(CAST({big} AS DECIMAL(38,6)) AS VARCHAR) AS DOUBLE)"
    ).fetchone()
    assert via_varchar == float(big) == 2679535128980.0
    assert direct != via_varchar  # the defect the convention avoids
    # below the ceiling the two paths are bit-identical
    for small in ("123.456789", "-0.000001", "999999999.999999"):
        d, v = con.execute(
            f"SELECT CAST(CAST({small} AS DECIMAL(38,6)) AS DOUBLE),"
            f" CAST(CAST(CAST({small} AS DECIMAL(38,6)) AS VARCHAR) AS DOUBLE)"
        ).fetchone()
        assert d == v == float(small)
