"""As-of (temporal) join — annotate facts with the dim version in effect
at each fact's own event time.

Kafka Streams calls this a versioned-KTable join; the reference's
compacted topics give you only the LATEST version (keep-latest,
`storage/compaction_reducers.h`), so processing-time joins come free
(streaming/enrich.py) but event-time correctness — "the state as of when
the event happened" — needs a temporal join. Spark has no ASOF JOIN
(range self-joins explode); DuckDB does, which makes the semantics
exactly oracle-checkable.

Implementation is the union-sort-window shape, the scale-correct way to
express as-of in Spark:

  1. Tag dim versions (side=0) and facts (side=1), union on the key.
  2. One shuffle: window by key ordered by (time, side), then
     ``last(dim_payload, ignorenulls=True)`` — every fact row sees the
     most recent dim version at-or-before its timestamp (dim sorts
     before facts at equal time: version effective AT t applies to a
     fact AT t).
  3. Keep the fact rows.

Cost: ONE shuffle of facts+versions on the join key — same as any
keyed aggregation over the facts, independent of version-history
length per key (a range join would be facts × versions). Skewed keys
behave like any hot groupBy key (AQE/salting apply).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    facts: DataFrame,
    versions: DataFrame,
    on: list[str] | str,
    facts_time: str = "ts",
    versions_time: str = "ts",
    strict: bool = False,
) -> DataFrame:
    """Left as-of join: every fact row + the payload columns of the most
    recent version row with the same key and ``versions_time <=
    facts_time`` (``strict=True`` uses ``<`` — the version must predate
    the fact). Facts with no prior version get NULLs, like a left join.

    Output: all fact columns, plus every non-key, non-time column of
    ``versions``.
    """
    keys = [on] if isinstance(on, str) else list(on)
    payload = [c for c in versions.columns if c not in keys + [versions_time]]
    clash = set(payload) & set(facts.columns)
    if clash:
        raise ValueError(f"version payload collides with fact columns: {clash}")

    v = versions.select(
        *keys,
        F.col(versions_time).alias("_t"),
        F.lit(0).alias("_side"),
        *[F.col(c) for c in payload],
        *[F.lit(None).cast(facts.schema[c].dataType).alias(f"_f_{c}")
          for c in facts.columns],
    )
    f = facts.select(
        *keys,
        F.col(facts_time).alias("_t"),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(versions.schema[c].dataType).alias(c) for c in payload],
        *[F.col(c).alias(f"_f_{c}") for c in facts.columns],
    )
    # strict: a version AT t must NOT apply to a fact AT t -> facts sort
    # first at equal time and last() skips the co-timed version
    order = [F.col("_t"), F.col("_side").asc() if not strict else F.col("_side").desc()]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = v.unionByName(f).select(
        "*",
        *[
            F.last(F.col(c), ignorenulls=True).over(w).alias(f"_v_{c}")
            for c in payload
        ],
    )
    return carried.where(F.col("_side") == 1).select(
        *[F.col(f"_f_{c}").alias(c) for c in facts.columns],
        *[F.col(f"_v_{c}").alias(c) for c in payload],
    )
