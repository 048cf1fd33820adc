"""The sampled-exact oracle tool (tools/sampled_oracle.py) must hold at
sf0.01 — the same four checks the scale runs use, so a regression in the
sampling predicates or the commuting-restriction logic fails CI before a
multi-hour sf10/sf100 run does."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools")
)

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    return c


@pytest.mark.parametrize(
    "check",
    ["dedup_minhash", "dedup_incremental", "dedup_cluster", "doc_ngram_topk"],
)
@pytest.mark.parametrize("backend", ["CHECKS", "NP_CHECKS"])
def test_sampled_exact(spark, con, check, backend):
    """Both backends (DuckDB pair join; numpy postings — the sf100 scale
    path) must independently agree with the engine, which also cross-
    validates the two oracles against each other."""
    import sampled_oracle

    n = getattr(sampled_oracle, backend)[check](spark, con, SF_DIR)
    assert n > 0, f"{check}: empty sample proves nothing — widen the stratum"


def test_sample_predicate_is_a_real_stratum(spark, con):
    """The Spark-side and SQL-side sampling predicates agree row for row
    (the whole design hangs on restriction commuting through ONE shared
    predicate), and the stratum is neither empty nor everything."""
    import numpy as np

    import sampled_oracle

    ids = np.arange(0, 5000, dtype=np.int64)
    py = set(ids[sampled_oracle._sampled(ids)].tolist())
    sql = {
        r[0]
        for r in con.execute(
            "SELECT i FROM range(5000) t(i) WHERE "
            + sampled_oracle.SQL_SAMPLED.format(col="i")
        ).fetchall()
    }
    assert py == sql
    assert 0 < len(py) < len(ids)
