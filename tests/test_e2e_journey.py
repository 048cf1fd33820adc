"""The switching user's day-1 pipeline, end to end in one test:

    produce (keyed JSON, 3 partitions)
      → data transform (validate/route, poison records to the DLQ)
        → consumer group drain + offset commit
        → typed datalake translation (registry JSON schema)
          → hour-partitioned snapshot write
            → Iceberg v2 export
              → INDEPENDENT from-spec conformance read
            → continuous rollup merge + read-back

with one value thread (sum of ``amount``) asserted at every stage, so a
wrong row anywhere breaks the chain. The pieces each have their own
suites; this test proves they compose — the "a user of the reference
could switch and run their pipeline" claim (reference e2e analog:
`tests/rptest/tests/data_transforms_test.py` + `datalake/` e2e).
"""

from __future__ import annotations

import json

import pytest

from pyspark.sql import Row
from pyspark.sql import functions as F

from redpanda_spark.consumer import Consumer
from redpanda_spark.engine import TopicConfig, TopicEngine
from redpanda_spark.operators.coordinator import GroupManager
from redpanda_spark.sources.datalake import translate_json_topic, write_datalake
from redpanda_spark.sources.iceberg_export import export_iceberg, read_iceberg
from redpanda_spark.streaming.rollup import merge_rollup, read_rollup
from redpanda_spark.streaming.transforms import TransformProcessor
from tools.iceberg_conformance import traverse

N_VALID = 120
N_POISON = 6
VALUE_SCHEMA = "user_id bigint, event_type string, amount double"


def _validate_transform(out_topic: str):
    """Parse-or-raise: malformed JSON raises (→ DLQ), valid rows pass."""

    def fn(rec: dict):
        v = rec.get("value")
        doc = json.loads(bytes(v).decode())  # raises on poison
        if doc["event_type"] == "noise":
            return  # filtered, not an error
        yield out_topic, rec

    return fn


@pytest.mark.parametrize("scheme", ["", "file://"])
def test_day1_pipeline_composes(spark, tmp_path, scheme):
    """scheme='file://' runs the SAME day-1 pipeline with every root —
    engine, lake, Iceberg table, rollup store — on the JVM's Hadoop
    FileSystem, the object-store deployment shape. A stage that only
    works on raw local paths breaks the parametrized leg."""
    engine = TopicEngine(spark, scheme + str(tmp_path / "topics"))
    engine.create_topic("raw", TopicConfig(partitions=3))
    engine.create_topic("clean", TopicConfig(partitions=3))
    engine.create_topic("dlq", TopicConfig(partitions=1))

    # -- 1. produce: keyed JSON, a few filtered rows, a few poison rows ----
    rows = []
    for i in range(N_VALID):
        doc = {"user_id": i % 10, "event_type": f"t{i % 3}", "amount": i / 4.0}
        rows.append(Row(key=str(i % 10).encode(), value=json.dumps(doc).encode()))
    for i in range(8):  # filtered (valid JSON, unwanted type)
        doc = {"user_id": 99, "event_type": "noise", "amount": 1.0}
        rows.append(Row(key=b"99", value=json.dumps(doc).encode()))
    for i in range(N_POISON):  # poison (not JSON)
        rows.append(Row(key=b"px", value=f"not-json-{i}".encode()))
    engine.produce("raw", spark.createDataFrame(rows, "key binary, value binary"))
    expected_amount = sum(i / 4.0 for i in range(N_VALID))

    # -- 2. transform: validate + route, poison to DLQ ----------------------
    tp = TransformProcessor(
        engine, "raw", _validate_transform("clean"), ["clean"], dlq_topic="dlq"
    )
    tp.run_once_batch()
    assert engine.log("clean").count() == N_VALID
    assert engine.log("dlq").count() == N_POISON

    # -- 3. consumer group drains the clean topic, commits ------------------
    mgr = GroupManager({"clean": 3, "raw": 3, "dlq": 1}, engine=engine)
    c = Consumer(engine, mgr, "day1-group", ["clean"])
    c.subscribe()
    polled = []
    for rows_ in c.poll().values():
        polled += [json.loads(bytes(r["value"]).decode()) for r in rows_]
    assert len(polled) == N_VALID
    assert sum(d["amount"] for d in polled) == expected_amount
    c.commit()
    assert c.poll() == {} or all(not v for v in c.poll().values())

    # -- 4. typed translation + snapshot datalake write ---------------------
    translated = translate_json_topic(engine.log("clean"), VALUE_SCHEMA)
    lake = scheme + str(tmp_path / "lake")
    write_datalake(translated, lake)
    lake_df = spark.read.parquet(f"{lake}/*/*.parquet")
    assert lake_df.count() == N_VALID

    # -- 5. Iceberg export, read back through BOTH readers ------------------
    ice = scheme + str(tmp_path / "ice")
    summary = export_iceberg(spark, lake, ice)
    assert summary["n_rows"] == N_VALID
    # the independent from-spec reader is deliberately raw-local (no
    # shared fsio code); on the file:// leg it reads the same bytes at
    # their physical path
    conf = traverse(str(tmp_path / "ice"))
    assert conf["schema_errors"] == []
    assert conf["live_record_count"] == N_VALID
    back = read_iceberg(spark, ice)
    assert back.count() == N_VALID
    got_amount = back.agg(F.sum("amount").alias("s")).collect()[0]["s"]
    assert abs(got_amount - expected_amount) < 1e-9

    # -- 6. continuous rollup over the translated rows ----------------------
    store = scheme + str(tmp_path / "rollup")
    events = translated.select(
        F.col("redpanda.timestamp").alias("ts"),
        "event_type",
        F.col("amount").alias("value"),
    )
    merge_rollup(store, events, window_dur="1 hour")
    roll = read_rollup(spark, store)
    agg = roll.agg(
        F.sum("n").alias("n"), F.sum("sum_value").alias("sv")
    ).collect()[0]
    assert agg["n"] == N_VALID
    assert abs(float(agg["sv"]) - expected_amount) < 1e-6
