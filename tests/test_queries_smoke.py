"""Smoke: every catalog query runs at sf0.001 and returns a stable schema;
entry() contract works."""

from __future__ import annotations

import pytest

from redpanda_spark.plans.queries import ORACLES, QUERIES


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_runs(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.columns  # schema resolves
    assert df.count() >= 0


def test_oracles_reference_existing_queries():
    assert set(ORACLES) <= set(QUERIES)


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
