"""Interval (range-overlap) join — match facts to time intervals without
a cartesian explosion.

The companion to the as-of join (`operators/asof.py`): as-of answers
"the version in effect at t", interval join answers "which windows
[start, end) cover t" — campaign attribution, maintenance windows,
session containment. Spark compiles a plain
``f.ts BETWEEN i.start AND i.end`` join to BroadcastNestedLoop/cartesian
(facts × intervals); DuckDB plans a proper IEJoin, which makes the
semantics independently oracle-checkable.

Scale shape — the standard time-bucketing decomposition:

  1. Pick a bucket width (≈ the typical interval length).
  2. Explode each interval into the buckets it touches —
     ceil(len/bucket)+1 rows per interval, a small constant when widths
     are chosen sanely.
  3. Equi-join facts on (key, bucket) — a hash join Catalyst shuffles on
     (key, bucket), which also SPREADS a hot key across its time range.
  4. Re-apply the exact range predicate to discard bucket-boundary
     false positives.

Cost: one shuffle of facts + exploded intervals on (key, bucket); no
nested loop anywhere (plan-asserted in tests). Long-tailed interval
lengths should be split by the caller (or use multiple bucket tiers);
``max_buckets_per_interval`` guards runaway explosions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    facts: DataFrame,
    intervals: DataFrame,
    on: list[str] | str,
    facts_time: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bucket: int = 3600,
    time_unit_is_timestamp: bool = True,
    end_exclusive: bool = False,
    max_buckets_per_interval: int = 1024,
) -> DataFrame:
    """Inner join: every (fact, interval) pair with the same key where
    ``start <= ts <= end`` (``end_exclusive=True`` uses ``< end``).
    Output: all fact columns + all interval columns except the key.

    ``bucket`` is in seconds for timestamp columns, in raw units for
    numeric time columns. An interval spanning more than
    ``max_buckets_per_interval`` buckets raises — split it or raise the
    bucket size (a silent cap would silently drop matches).
    """
    keys = [on] if isinstance(on, str) else list(on)
    clash = (set(intervals.columns) - set(keys)) & set(facts.columns)
    if clash:
        raise ValueError(f"interval columns collide with fact columns: {clash}")

    def to_units(c):
        return F.unix_timestamp(F.col(c)) if time_unit_is_timestamp else F.col(c)

    b0 = F.floor(to_units(start_col) / bucket).cast("long")
    b1 = F.floor(to_units(end_col) / bucket).cast("long")
    n_buckets = (b1 - b0 + 1).alias("_nb")

    iv = intervals.withColumn("_nb", n_buckets)
    over = iv.where(F.col("_nb") > max_buckets_per_interval)
    # driver-side guard on an aggregate, not a collect of data rows
    if over.limit(1).count() > 0:
        raise ValueError(
            f"interval spans more than {max_buckets_per_interval} buckets; "
            "split long intervals or increase the bucket size"
        )
    exploded = iv.select(
        *keys,
        *[c for c in intervals.columns if c not in keys],
        F.explode(F.sequence(b0, b1)).alias("_bucket"),
    )
    f = facts.withColumn(
        "_bucket", F.floor(to_units(facts_time) / bucket).cast("long")
    )
    # exact predicate on the ORIGINAL columns — to_units() is
    # seconds-truncated for bucketing only and would lose sub-second
    # precision here
    lo = F.col(start_col) <= F.col(facts_time)
    hi = (
        F.col(facts_time) < F.col(end_col)
        if end_exclusive
        else F.col(facts_time) <= F.col(end_col)
    )
    return (
        f.join(exploded, keys + ["_bucket"])
        .where(lo & hi)
        .drop("_bucket")
    )
