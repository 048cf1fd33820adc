"""Stream-stream joins over topic streams — watermark-bounded state.

The reference has no stream-stream join (transforms are stateless
per-record, SURVEY.md §2.5/2.6); this is part of the added analytics
layer, expressed with Spark's native stream-stream equi-join: both
sides carry event-time watermarks and the join condition bounds the
time skew, so each side's buffered state is evicted once the other
side's watermark passes — bounded memory at any corpus rate (the
unbounded-state hazard is rejected by Spark itself if the bounds are
missing).

Shape: shuffle both streams on the join key once; state lives in the
partitioned state store (RocksDB-backed on a real cluster). Skewed hot
keys behave like any stateful keyed operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str = "timestamp",
    right_time: str = "timestamp",
    watermark: str = "10 seconds",
    max_skew: str = "5 seconds",
    how: str = "inner",
) -> DataFrame:
    """Join two STREAMING frames on ``on`` where the right event lands
    within [left_time - max_skew, left_time + max_skew]. Column names of
    the right side are suffixed ``_r`` (except the key). Outer joins
    emit unmatched rows only after the watermark closes their window —
    Spark semantics, surfaced here unchanged."""
    l = left.withWatermark(left_time, watermark)
    r = right.withWatermark(right_time, watermark)
    for c in r.columns:
        if c != on:
            r = r.withColumnRenamed(c, f"{c}_r")
    rt = f"{right_time}_r"
    cond = (
        (l[on] == r[on])
        & (F.col(rt) >= F.col(left_time) - F.expr(f"INTERVAL {max_skew}"))
        & (F.col(rt) <= F.col(left_time) + F.expr(f"INTERVAL {max_skew}"))
    )
    return l.join(r, cond, how).drop(r[on])
