"""Multi-micro-batch streaming correctness: the same source drained in
STAGED availableNow runs against ONE checkpoint — stop after the first
batch of files, restart a fresh query, drain the rest — must produce the
same union as the batch twin. This exercises state recovery across
restart (window state, join buffers, watermark position), the property
the reference's commit batcher guarantees across crashes
(`transform/commit_batcher.cc`), not just one-shot drains.

Sources/sinks are parquet dirs (file-sink commit log makes the union
exactly-once across restarts); events come from the sf0.001 fixture,
split by TIME so a later stage never carries data behind the recovered
watermark."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from redpanda_spark.sources.tables import load_table, normalize_event_time

SF_DIR = "/root/testdata/sf0.001"
SENTINEL = "zzz_watermark_flush"


@pytest.fixture(scope="module")
def events(spark):
    ev = normalize_event_time(load_table(spark, SF_DIR, "events"))
    return ev.select("event_id", "user_id", "ts", "event_type", "props")


def _staged_drain(spark, tmp_path, stages, build, mode="append"):
    """Write each stage's rows into the source dir, then drain it with a
    FRESH query on the SAME checkpoint — a stop/restart between every
    stage."""
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    schema = None
    for i, stage_df in enumerate(stages):
        stage_df.write.mode("append").parquet(src)
        schema = schema or spark.read.parquet(src).schema
        out = build(spark.readStream.schema(schema).parquet(src))
        q = (
            out.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode(mode)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(180), f"stage {i} did not drain"
    return spark.read.parquet(sink)


def _split_by_time(events, frac=0.5):
    """Two time-contiguous halves: every stage-2 event is >= the split
    point, so restart recovery — not late-data drop — is what's tested."""
    t_split = events.selectExpr(
        f"percentile_approx(ts, {frac}, 10000) AS t"
    ).collect()[0]["t"]
    return (
        events.where(F.col("ts") < F.lit(t_split)),
        events.where(F.col("ts") >= F.lit(t_split)),
        t_split,
    )


def _rowset(df):
    return {tuple(r) for r in df.collect()}


def test_windowed_agg_survives_restart(spark, tmp_path, events):
    """stream_window_stats shape across a restart: tumbling 1h windows +
    2h watermark in append mode. A final sentinel stage pushes the
    watermark past every real window so append mode releases them all;
    the union of the staged emissions must equal the batch aggregation."""
    first, second, _ = _split_by_time(events)
    flush = events.orderBy(F.col("ts").desc()).limit(1).select(
        F.col("event_id"),
        F.col("user_id"),
        (F.col("ts") + F.expr("INTERVAL 12 HOURS")).alias("ts"),
        F.lit(SENTINEL).alias("event_type"),
        F.col("props"),
    )

    def build(stream):
        return (
            stream.withWatermark("ts", "2 hours")
            .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
            .agg(
                F.count("*").alias("n"),
                F.sum(F.length("props")).alias("props_bytes"),
            )
            .select(
                F.unix_timestamp(F.col("win.start")).alias("window_start_s"),
                "event_type",
                "n",
                "props_bytes",
            )
        )

    got = _staged_drain(spark, tmp_path, [first, second, flush], build)
    got = got.where(F.col("event_type") != SENTINEL)

    want = (
        events.groupBy(
            F.unix_timestamp(
                F.date_trunc("hour", F.col("ts"))
            ).alias("window_start_s"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.length("props")).alias("props_bytes"),
        )
    )
    assert _rowset(got) == _rowset(want)
    # and the restart really split the work: both runs emitted windows
    assert got.count() > 0


def test_stream_stream_join_survives_restart(spark, tmp_path, events):
    """stream_stream_join shape across a restart: click->purchase pairs
    within +/-4h. Stage-2 clicks must find stage-1 purchases still
    buffered in the RECOVERED join state (and vice versa) — pairs that
    straddle the split prove the checkpoint carried the buffers."""
    from redpanda_spark.streaming.joins import stream_stream_join

    # Build the batch twin FIRST and split at the purchase timestamp of a
    # maximally-skewed pair, so at least one pair is guaranteed to
    # straddle the restart (click in stage 1, purchase in stage 2).
    clicks = events.where(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("cts"), F.col("event_id").alias("click_id")
    )
    buys = events.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("user_id_r"),
        F.col("ts").alias("pts"),
        F.col("event_id").alias("purchase_id"),
    )
    pairs = clicks.join(
        buys,
        (F.col("user_id") == F.col("user_id_r"))
        & (F.col("pts") >= F.col("cts") - F.expr("INTERVAL 4 HOURS"))
        & (F.col("pts") <= F.col("cts") + F.expr("INTERVAL 4 HOURS")),
    )
    split_row = (
        pairs.where(F.col("pts") > F.col("cts"))
        .orderBy((F.unix_timestamp("pts") - F.unix_timestamp("cts")).desc())
        .select("pts")
        .first()
    )
    assert split_row is not None, "fixture has no skewed pair to straddle"
    t_split = split_row["pts"]
    first = events.where(F.col("ts") < F.lit(t_split))
    second = events.where(F.col("ts") >= F.lit(t_split))

    def build(stream):
        clicks = stream.where(F.col("event_type") == "click").select(
            "user_id", "ts", "event_id"
        )
        buys = stream.where(F.col("event_type") == "purchase").select(
            "user_id", "ts", "event_id"
        )
        joined = stream_stream_join(
            clicks,
            buys,
            on="user_id",
            left_time="ts",
            right_time="ts",
            watermark="8 hours",
            max_skew="4 hours",
        )
        return joined.select(
            "user_id",
            F.col("event_id").alias("click_id"),
            F.col("event_id_r").alias("purchase_id"),
            (F.unix_timestamp("ts_r") - F.unix_timestamp("ts"))
            .cast("bigint")
            .alias("delta_s"),
        )

    got = _staged_drain(spark, tmp_path, [first, second], build)

    want = pairs.select(
        "user_id",
        "click_id",
        "purchase_id",
        (F.unix_timestamp("pts") - F.unix_timestamp("cts"))
        .cast("bigint")
        .alias("delta_s"),
    )
    assert _rowset(got) == _rowset(want)
    # the recovery-proving subset: pairs whose two sides live in
    # DIFFERENT stages can only exist if the restarted query rebuilt the
    # first run's join buffers from the checkpoint
    cross = (
        want.join(
            events.select(
                F.col("event_id").alias("click_id"),
                F.col("ts").alias("c_ts"),
            ),
            "click_id",
        )
        .join(
            events.select(
                F.col("event_id").alias("purchase_id"),
                F.col("ts").alias("p_ts"),
            ),
            "purchase_id",
        )
        .where(
            (
                (F.col("c_ts") < F.lit(t_split))
                & (F.col("p_ts") >= F.lit(t_split))
            )
            | (
                (F.col("p_ts") < F.lit(t_split))
                & (F.col("c_ts") >= F.lit(t_split))
            )
        )
    )
    assert cross.count() > 0, (
        "no pair straddles the restart — the split point proves nothing; "
        "move the split"
    )


def test_session_windows_merge_across_restart(spark, tmp_path, events):
    """stream_sessionize shape across a restart: session_window state is
    the hardest to recover (sessions MERGE as events arrive), so the
    split point is placed INSIDE a multi-event session — its stage-2
    events must extend the stage-1 open session from the recovered state,
    or the union shows a torn session and fails the set compare."""
    from pyspark.sql import Window

    from redpanda_spark.streaming.stateful import streaming_sessionize

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wsum = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sess_rows = events.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.unix_timestamp("ts")
                - F.unix_timestamp(F.lag("ts").over(w))
                >= 1800
            ),
            1,
        )
        .otherwise(0)
        .alias("new_sess"),
    ).withColumn("sid", F.sum("new_sess").over(wsum))
    want = sess_rows.groupBy("user_id", "sid").agg(
        F.unix_timestamp(F.min("ts")).alias("start_s"),
        (F.unix_timestamp(F.max("ts")) + 1800).alias("end_s"),
        F.count("*").alias("n_events"),
    ).select("user_id", "start_s", "end_s", "n_events")

    # split inside a multi-event session: t_split = its second event's ts
    straddle = (
        sess_rows.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("user_id", "sid").orderBy("ts", "event_id")
            ),
        )
        .where(F.col("rn") == 2)
        .orderBy("ts")
        .select("ts")
        .first()
    )
    assert straddle is not None, "fixture has no multi-event session"
    t_split = straddle["ts"]
    first = events.where(F.col("ts") < F.lit(t_split))
    second = events.where(F.col("ts") >= F.lit(t_split))
    # sentinel: one far-future event for a user id outside the corpus —
    # pushes the watermark past every real session end so append mode
    # releases them; its own (never-closing) session is filtered out
    flush = events.orderBy(F.col("ts").desc()).limit(1).select(
        F.col("event_id"),
        F.lit(-1).cast("long").alias("user_id"),
        (F.col("ts") + F.expr("INTERVAL 3 HOURS")).alias("ts"),
        F.col("event_type"),
        F.col("props"),
    )

    def build(stream):
        return streaming_sessionize(
            stream, ts_col="ts", user_col="user_id", gap="30 minutes"
        ).select(
            "user_id",
            F.unix_timestamp("session_start").alias("start_s"),
            F.unix_timestamp("session_end").alias("end_s"),
            "n_events",
        )

    got = _staged_drain(spark, tmp_path, [first, second, flush], build)
    got = got.where(F.col("user_id") >= 0)
    assert _rowset(got) == _rowset(want)
    # the split really landed inside a session: some emitted session
    # starts before the split and ends (events) at/after it
    split_s = want.where(
        (F.col("start_s") < F.unix_timestamp(F.lit(t_split)))
        & (F.col("end_s") - 1800 >= F.unix_timestamp(F.lit(t_split)))
    )
    assert split_s.count() > 0, "no session straddles the restart"
