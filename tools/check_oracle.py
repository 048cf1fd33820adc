"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB at the given SF, compare row count,
column names, and order-insensitive values.

Usage: python tools/check_oracle.py [--plain] [sf_dir] [query ...]
  --plain: use a default-config SparkSession (exactly what the driver's
  gate does) instead of the engine's tuned session.

At sf >= 10 the plain session's default ~1g driver heap OOMs on the
large-result queries; the real gate only runs at sf <= 0.1 where plain is
fine. For large-SF plain checks set SPARK_DRIVER_MEM (e.g. `24g`) — the
plain branch honors it while keeping every other conf at default.
"""

from __future__ import annotations

import decimal
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np

from redpanda_spark.datamodel import TESTDATA_TABLES
from redpanda_spark.plans.queries import ORACLES, QUERIES
from redpanda_spark.session import get_spark


def norm_cell(v):
    # Canonicalization-FAITHFUL to the driver's hash: the driver compares
    # values after a dataframe conversion (Spark .toPandas() vs DuckDB
    # .df()), where DuckDB renders DECIMAL as float64 while Spark keeps
    # decimal.Decimal objects. Round 8 proved (19/50 red) that emitting
    # decimal output columns fails the driver even when values are
    # byte-identical — so this checker must treat Decimal and float as
    # DIFFERENT representations, never coerce one into the other.
    if isinstance(v, np.generic):
        v = v.item()
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # Full-precision repr, NOT a fixed-dp format: the driver's gate
        # hashes full-precision values, and a 6-dp normalization here once
        # masked a last-bit representation mismatch the driver failed
        # (mixture_plan, round 6). The local gate must be at least as
        # strict as the driver's.
        return repr(v)
    if isinstance(v, decimal.Decimal):
        # Representation-sensitive: Decimal('1.000000') != float 1.0 at the
        # driver. DuckDB's .df() never yields Decimal, so any Spark decimal
        # output column fails here — by design (see VERDICT r8 "What's
        # wrong" #1/#2).
        return "dec:" + str(v)
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    if hasattr(v, "isoformat"):
        try:
            iso = v.isoformat()[:26]
        except (ValueError, AttributeError):
            return str(v)
        # date == midnight-timestamp: DuckDB's .df() renders DATE as
        # datetime64 (midnight) while Spark's .toPandas() keeps
        # datetime.date; the driver canonicalizes these EQUAL (proof:
        # events_sketch_merge was driver-green at r8 with exactly this
        # date-vs-midnight-ts shape). Collapse midnight to the date form.
        if iso.endswith("T00:00:00"):
            return iso[:10]
        return iso
    return str(v)


def pdf_rows(pdf):
    """Row tuples from a pandas frame, preserving per-cell Python types
    the way a dataframe-level hash would see them (Timestamp for
    datetime64, numpy scalars for numerics, raw objects otherwise)."""
    return [tuple(row) for row in pdf.itertuples(index=False, name=None)]


def norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_cell(r[i]) for i in idx) for r in rows)


def main():
    args = [a for a in sys.argv[1:] if a != "--plain"]
    plain = "--plain" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    if plain:
        # driver-equivalent session: default configs, NTZ parquet inference
        # on — catches anything that only works under our tuned session
        from pyspark.sql import SparkSession

        b = SparkSession.builder.master("local[32]").appName(
            "oracle-check-plain"
        )
        # the one escape hatch from all-default confs: sf>=10 results
        # overflow the default ~1g driver heap (usage note above)
        if os.environ.get("SPARK_DRIVER_MEM"):
            b = b.config(
                "spark.driver.memory", os.environ["SPARK_DRIVER_MEM"]
            )
        spark = b.getOrCreate()
    else:
        spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    n_pass = n_fail = 0
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            # .toPandas(), NOT .collect(): the driver hashes through a
            # dataframe conversion; fetch-level Python objects (where both
            # engines return Decimal) masked the r8 decimal-output class.
            srows = pdf_rows(sdf.toPandas())
        except Exception as e:
            print(f"FAIL {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        if name not in ORACLES:
            print(f"ok   {name}: rows={len(srows)} (no oracle — rows-only) "
                  f"[{time.time()-t0:.1f}s]")
            n_pass += 1
            continue
        try:
            res = con.execute(ORACLES[name])
            ocols = [d[0] for d in res.description]
            orows = pdf_rows(res.df())
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols spark={sorted(scols)} oracle={sorted(ocols)}")
        if not problems:
            a, b = norm_rows(scols, srows), norm_rows(ocols, orows)
            if a != b:
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                problems.append(f"values differ, e.g. {diff}")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)} [{time.time()-t0:.1f}s]")
            n_fail += 1
        else:
            print(f"ok   {name}: rows={len(srows)} [{time.time()-t0:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} ok, {n_fail} fail")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
