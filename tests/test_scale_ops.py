"""Scale operators: salted skew joins (operators/skew.py) and bucketed
co-located joins (sources/bucketed.py).

The properties that matter: salting is row-invisible (identical multiset
vs the plain join, inner AND left), deterministic (hash salt, not rand),
and actually spreads the hot key; bucketing eliminates every Exchange
from a fact-fact join plan while returning the same rows.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from redpanda_spark.operators.skew import SALT_COL, detect_hot_keys, salted_join
from redpanda_spark.sources.bucketed import (
    assert_no_exchange,
    bucketed_join,
    plan_string,
    write_bucketed,
)


def _skewed_frames(spark, n_hot=5000, n_cold=50):
    # user 7 owns n_hot rows; users 100.. own one row each
    big = spark.range(n_hot + n_cold).select(
        F.col("id").alias("event_id"),
        F.when(F.col("id") < n_hot, F.lit(7))
        .otherwise(F.col("id") - n_hot + 100)
        .alias("user_id"),
        (F.col("id") % 13).alias("value"),
    )
    small = spark.range(200).select(
        F.col("id").alias("user_id"),
        F.concat(F.lit("seg_"), (F.col("id") % 4).cast("string")).alias("seg"),
    )
    return big, small


def _norm(df):
    return sorted(tuple(r) for r in df.collect())


def test_detect_hot_keys_finds_planted_key(spark):
    big, _ = _skewed_frames(spark)
    hot = detect_hot_keys(big, "user_id", min_share=0.01)
    assert hot == [7]


def test_detect_hot_keys_empty_on_uniform(spark):
    df = spark.range(1000).select((F.col("id") % 500).alias("k"))
    assert detect_hot_keys(df, "k", min_share=0.01) == []


@pytest.mark.parametrize("how", ["inner", "left"])
def test_salted_join_row_identical_to_plain(spark, how):
    big, small = _skewed_frames(spark)
    plain = big.join(small, "user_id", how)
    salted = salted_join(
        big, small, key="user_id", spread_col="event_id",
        salt_factor=8, hot_keys=[7], how=how,
    )
    assert sorted(salted.columns) == sorted(plain.columns)
    assert _norm(salted.select(*plain.columns)) == _norm(plain)


def test_salted_join_all_keys_mode(spark):
    big, small = _skewed_frames(spark)
    plain = big.join(small, "user_id", "inner")
    salted = salted_join(
        big, small, key="user_id", spread_col="event_id",
        salt_factor=4, hot_keys=None,
    )
    assert _norm(salted.select(*plain.columns)) == _norm(plain)


def test_salted_join_spreads_hot_key(spark):
    big, _ = _skewed_frames(spark)
    from redpanda_spark.operators.skew import salted_join as _  # noqa: F401

    salt = F.when(
        F.col("user_id").isin(7),
        F.pmod(F.xxhash64(F.col("event_id")), F.lit(8)).cast("int"),
    ).otherwise(F.lit(0))
    spread = (
        big.withColumn(SALT_COL, salt)
        .where(F.col("user_id") == 7)
        .groupBy(SALT_COL)
        .count()
        .collect()
    )
    counts = {r[SALT_COL]: r["count"] for r in spread}
    # the 5000-row key lands on all 8 sub-keys, none holding >25%
    assert len(counts) == 8
    assert max(counts.values()) < 5000 * 0.25


def test_salted_join_deterministic(spark):
    big, small = _skewed_frames(spark)
    a = salted_join(big, small, "user_id", "event_id", 8, [7])
    b = salted_join(
        big.repartition(11), small, "user_id", "event_id", 8, [7]
    )
    assert _norm(a) == _norm(b)


def test_salted_join_rejects_bad_args(spark):
    big, small = _skewed_frames(spark)
    with pytest.raises(ValueError):
        salted_join(big, small, "user_id", "event_id", 8, None, how="full")
    with pytest.raises(ValueError):
        salted_join(big, small, "user_id", "event_id", 0)


@pytest.fixture()
def bucketed_pair(spark, tmp_path):
    facts = spark.range(10_000).select(
        F.col("id").alias("k"),
        (F.col("id") % 97).alias("v"),
    )
    dims = spark.range(2_000).select(
        F.col("id").alias("k"),
        F.concat(F.lit("d"), F.col("id").cast("string")).alias("name"),
    )
    write_bucketed(facts, "t_facts", "k", buckets=8, path=str(tmp_path / "f"))
    write_bucketed(dims, "t_dims", "k", buckets=8, path=str(tmp_path / "d"))
    yield facts, dims
    spark.sql("DROP TABLE IF EXISTS t_facts")
    spark.sql("DROP TABLE IF EXISTS t_dims")


def test_bucketed_join_no_exchange_and_correct(spark, bucketed_pair):
    # no threshold juggling: bucketed_join's merge hint pins SMJ even
    # when the dim side is under autoBroadcastJoinThreshold
    facts, dims = bucketed_pair
    joined = bucketed_join(spark, "t_facts", "t_dims", "k")
    assert_no_exchange(joined)
    assert "SortMergeJoin" in plan_string(joined)
    expected = _norm(facts.join(dims, "k"))
    assert _norm(joined.select(*facts.join(dims, "k").columns)) == expected


def test_write_bucketed_one_file_per_bucket(spark, bucketed_pair, tmp_path):
    import glob
    import os

    files = [
        f
        for f in glob.glob(str(tmp_path / "f" / "*"))
        if f.endswith(".parquet") and os.path.basename(f).startswith("part-")
    ]
    assert len(files) == 8  # aligned repartition -> exactly one per bucket


def test_assert_no_exchange_ignores_exchange_in_identifiers(spark):
    df = spark.range(10).withColumnRenamed("id", "ExchangeRate")
    assert_no_exchange(df)  # substring match would false-positive here


def test_bucketed_groupby_no_exchange(spark, bucketed_pair):
    agg = (
        spark.table("t_facts").groupBy("k").agg(F.sum("v").alias("sv"))
    )
    assert_no_exchange(agg)
    assert agg.count() == 10_000


def test_assert_no_exchange_catches_shuffle(spark):
    df = spark.range(100).groupBy((F.col("id") % 3).alias("g")).count()
    with pytest.raises(AssertionError):
        assert_no_exchange(df)


# -- property test: salting is row-invisible under random skew -----------------

import hypothesis.strategies as st
from hypothesis import HealthCheck, given, settings


@given(
    st.lists(st.integers(min_value=0, max_value=6), min_size=1, max_size=40),
    st.lists(st.integers(min_value=0, max_value=6), min_size=0, max_size=8),
    st.integers(min_value=1, max_value=5),
    st.sampled_from(["inner", "left"]),
)
@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
def test_salted_join_property_row_identical(spark, big_keys, dim_keys, factor, how):
    big = spark.createDataFrame(
        [(i, k) for i, k in enumerate(big_keys)], "event_id long, user_id long"
    )
    small = spark.createDataFrame(
        [(k, f"s{k}") for k in sorted(set(dim_keys))], "user_id long, seg string"
    )
    plain = big.join(small, "user_id", how)
    for hot in (None, sorted(set(big_keys))[:2]):
        salted = salted_join(
            big, small, "user_id", "event_id", factor, hot, how=how
        )
        assert _norm(salted.select(*plain.columns)) == _norm(plain)


def test_salted_join_rejects_salt_column_collision(spark):
    big, small = _skewed_frames(spark)
    with pytest.raises(ValueError):
        salted_join(
            big.withColumn(SALT_COL, F.lit(1)), small, "user_id", "event_id", 4
        )
