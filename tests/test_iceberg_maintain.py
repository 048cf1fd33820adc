"""Iceberg v2 maintenance (sources/iceberg_maintain.py): position
deletes with merge-on-read, compaction as a REPLACE snapshot, snapshot
expiry with orphan GC — each step re-validated by the independent
from-spec conformance reader."""

from __future__ import annotations

import os

import pyarrow.parquet as papq
import pytest
from pyspark.sql import functions as F

from redpanda_spark.sources.iceberg_export import export_iceberg, read_iceberg
from redpanda_spark.sources.iceberg_maintain import (
    compact_data_files,
    delete_where,
    expire_snapshots,
    live_entries,
    _current_metadata,
)
from tools.iceberg_conformance import traverse


def _mk_table(spark, tmp_path, n=100, parts=1):
    """lake -> exported iceberg table with n rows over two hours."""
    from redpanda_spark.sources.datalake import write_datalake

    lake = str(tmp_path / "lake")
    out = str(tmp_path / "ice")
    df = spark.range(0, n).select(
        F.col("id"),
        (F.col("id") * 10).alias("v"),
        F.when(F.col("id") % 2 == 0, F.to_timestamp(F.lit("2024-03-01 10:00:00")))
        .otherwise(F.to_timestamp(F.lit("2024-03-01 11:00:00")))
        .alias("_hour"),
    )
    if parts > 1:
        df = df.repartition(parts)
    write_datalake(df, lake)
    export_iceberg(spark, lake, out)
    return out


def test_delete_where_merge_on_read(spark, tmp_path):
    out = _mk_table(spark, tmp_path, n=100)
    pre_snap = _current_metadata(out)["current-snapshot-id"]

    res = delete_where(spark, out, "id % 10 = 0")
    assert res["deleted_rows"] == 10

    got = sorted(r["id"] for r in read_iceberg(spark, out).select("id").collect())
    assert got == [i for i in range(100) if i % 10 != 0]
    # time travel to the pre-delete snapshot still sees every row
    pre = read_iceberg(spark, out, snapshot_id=pre_snap)
    assert pre.count() == 100
    # conformance: chain stays spec-valid, delete file accounted
    t = traverse(out)
    assert t["schema_errors"] == []
    assert t["position_delete_count"] == 10
    assert t["live_record_count"] == 100  # data files untouched
    assert t["summary"]["operation"] == "delete"

    # idempotence: the same predicate now matches nothing -> no commit
    again = delete_where(spark, out, "id % 10 = 0")
    assert again == {"deleted_rows": 0, "snapshot_id": None}
    assert _current_metadata(out)["current-snapshot-id"] == res["snapshot_id"]

    # a second, overlapping-free delete stacks on the first
    delete_where(spark, out, "id < 5")
    got = sorted(r["id"] for r in read_iceberg(spark, out).select("id").collect())
    assert got == [i for i in range(100) if i % 10 != 0 and i >= 5]


def test_delete_file_is_spec_schema_and_sorted(spark, tmp_path):
    out = _mk_table(spark, tmp_path, n=40)
    delete_where(spark, out, "id >= 30")
    _, dels = live_entries(_current_metadata(out))
    [entry] = dels
    path = entry["data_file"]["file_path"]
    tbl = papq.read_table(path)
    # reserved field-ids from the spec, real in the parquet schema
    assert (
        tbl.schema.field("file_path").metadata[b"PARQUET:field_id"] == b"2147483546"
    )
    assert tbl.schema.field("pos").metadata[b"PARQUET:field_id"] == b"2147483545"
    rows = list(zip(tbl.column("file_path").to_pylist(), tbl.column("pos").to_pylist()))
    assert rows == sorted(rows)
    # delete rows address live data files of the table
    data_paths = {
        e["data_file"]["file_path"]
        for e in live_entries(_current_metadata(out))[0]
    }
    assert {r[0] for r in rows} <= data_paths


def test_compact_applies_deletes_and_replaces(spark, tmp_path):
    out = _mk_table(spark, tmp_path, n=100, parts=6)
    pre = traverse(out)
    assert len(pre["data_files"]) > 2  # several small files per hour
    delete_where(spark, out, "id % 10 = 0")
    pre_snap = _current_metadata(out)["current-snapshot-id"]

    res = compact_data_files(spark, out, target_bytes=64 * 1024 * 1024)
    assert res["rewritten_files"] == len(pre["data_files"])
    assert res["new_files"] == 2  # one bin per _hour partition

    t = traverse(out)
    assert t["schema_errors"] == []
    assert t["summary"]["operation"] == "replace"
    assert len(t["data_files"]) == 2
    # deletes were applied during the rewrite and their file dropped
    assert t["position_delete_count"] == 0
    assert t["live_record_count"] == 90

    got = sorted(r["id"] for r in read_iceberg(spark, out).select("id").collect())
    assert got == [i for i in range(100) if i % 10 != 0]
    # the _hour partition column still materializes from the layout
    hours = read_iceberg(spark, out).select("_hour").distinct().count()
    assert hours == 2
    # time travel: the pre-compaction snapshot still reads (with deletes)
    assert read_iceberg(spark, out, snapshot_id=pre_snap).count() == 90

    # nothing left to compact -> no-op, no new snapshot
    cur = _current_metadata(out)["current-snapshot-id"]
    again = compact_data_files(spark, out, target_bytes=64 * 1024 * 1024)
    assert again["new_files"] == 0 and again["snapshot_id"] is None
    assert _current_metadata(out)["current-snapshot-id"] == cur


def test_compact_keeps_deletes_for_untouched_files(spark, tmp_path):
    """A delete targeting a file OUTSIDE the compaction scope must keep
    applying after the REPLACE commit."""
    out = _mk_table(spark, tmp_path, n=100, parts=6)
    delete_where(spark, out, "id % 10 = 0")
    # compact with a tiny small-file threshold so NO file qualifies:
    meta = _current_metadata(out)
    res = compact_data_files(spark, out, target_bytes=64, small_bytes=1)
    assert res["new_files"] == 0
    # now rewrite only files under one partition by raising the bar for
    # a subset: compact everything; deletes for untouched files keep
    # applying (exercised through the threshold path below)
    res = compact_data_files(
        spark, out, target_bytes=10**9, small_bytes=10**9, min_input_files=3
    )
    assert res["new_files"] >= 1
    got = sorted(r["id"] for r in read_iceberg(spark, out).select("id").collect())
    assert got == [i for i in range(100) if i % 10 != 0]


def test_expire_snapshots_gc(spark, tmp_path):
    out = _mk_table(spark, tmp_path, n=100, parts=6)
    files_v1 = {f["file_path"] for f in traverse(out)["data_files"]}
    delete_where(spark, out, "id >= 90")
    compact_data_files(spark, out, target_bytes=64 * 1024 * 1024)
    meta = _current_metadata(out)
    old_snaps = [
        s["snapshot-id"]
        for s in meta["snapshots"]
        if s["snapshot-id"] != meta["current-snapshot-id"]
    ]
    res = expire_snapshots(out, keep_last=1)
    assert res["expired"] == len(old_snaps)
    assert res["files_deleted"] > 0

    # current read unaffected; original small files are gone from disk
    got = sorted(r["id"] for r in read_iceberg(spark, out).select("id").collect())
    assert got == list(range(90))
    assert not any(os.path.exists(p) for p in files_v1)
    # time travel to an expired snapshot now fails loudly
    with pytest.raises(ValueError):
        read_iceberg(spark, out, snapshot_id=old_snaps[0])
    # conformance: EXISTING entries referencing expired snapshot ids are
    # accepted via the recorded property, everything else still strict
    t = traverse(out)
    assert t["schema_errors"] == []
    assert t["live_record_count"] == 90

    # expiring again is a no-op
    assert expire_snapshots(out, keep_last=1) == {"expired": 0, "files_deleted": 0}


def test_expire_requires_a_policy(spark, tmp_path):
    out = _mk_table(spark, tmp_path, n=10)
    with pytest.raises(ValueError):
        expire_snapshots(out)


def test_external_reader_sees_merge_on_read_result(spark, tmp_path):
    """A plain-Spark read of the table's data files + delete files (no
    engine code) reproduces read_iceberg's answer — the interop story
    for position deletes."""
    out = _mk_table(spark, tmp_path, n=60)
    delete_where(spark, out, "v >= 400")
    meta = _current_metadata(out)
    data_e, del_e = live_entries(meta)
    data = spark.read.parquet(*[e["data_file"]["file_path"] for e in data_e])
    dels = spark.read.parquet(*[e["data_file"]["file_path"] for e in del_e])
    joined = (
        data.withColumn(
            "_fp",
            F.url_decode(
                F.regexp_replace(F.col("_metadata.file_path"), "^file:(//)?", "")
            ),
        )
        .withColumn("_pos", F.col("_metadata.row_index"))
        .join(
            dels,
            (F.col("_fp") == dels["file_path"]) & (F.col("_pos") == dels["pos"]),
            "left_anti",
        )
    )
    external = sorted(r["id"] for r in joined.select("id").collect())
    engine = sorted(r["id"] for r in read_iceberg(spark, out).select("id").collect())
    assert external == engine == list(range(40))


def test_cli_maintenance_verbs(spark, tmp_path, capsys, monkeypatch):
    """datalake iceberg-delete / iceberg-compact / iceberg-expire drive
    the same lifecycle end-to-end through the CLI surface."""
    import json

    from redpanda_spark import cli

    out = _mk_table(spark, tmp_path, n=50, parts=4)
    root = str(tmp_path / "root")
    # reuse the session the fixture already built
    monkeypatch.setattr(
        "redpanda_spark.session.get_spark", lambda *a, **k: spark
    )
    assert cli.main(["--root", root, "datalake", "iceberg-delete", out, "id >= 40"]) == 0
    assert json.loads(capsys.readouterr().out)["deleted_rows"] == 10
    assert cli.main(["--root", root, "datalake", "iceberg-compact", out]) == 0
    assert json.loads(capsys.readouterr().out)["new_files"] >= 1
    assert cli.main(["--root", root, "datalake", "iceberg-expire", out, "--keep-last", "1"]) == 0
    assert json.loads(capsys.readouterr().out)["expired"] == 2
    got = sorted(r["id"] for r in read_iceberg(spark, out).select("id").collect())
    assert got == list(range(40))


def test_merge_upsert_updates_and_inserts(spark, tmp_path):
    from redpanda_spark.sources.iceberg_maintain import merge_upsert

    out = _mk_table(spark, tmp_path, n=60)
    updates = spark.range(50, 71).select(
        F.col("id"),
        (F.col("id") * 1000).alias("v"),
        F.to_timestamp(F.lit("2024-03-01 10:00:00")).alias("_hour"),
    )
    res = merge_upsert(spark, out, updates, ["id"])
    assert res["matched_rows"] == 10 and res["inserted_rows"] == 11

    rows = {r["id"]: r["v"] for r in read_iceberg(spark, out).collect()}
    assert len(rows) == 71
    assert all(rows[i] == i * 10 for i in range(50))
    assert all(rows[i] == i * 1000 for i in range(50, 71))

    t = traverse(out)
    assert t["schema_errors"] == []
    assert t["summary"]["operation"] == "overwrite"
    assert t["position_delete_count"] == 10


def test_merge_upsert_cdc_chain_then_compact(spark, tmp_path):
    """Two micro-batch-style upserts touching the same key: the second
    position-deletes the FIRST upsert's file (not just original files);
    compaction then folds everything clean."""
    from redpanda_spark.sources.iceberg_maintain import merge_upsert

    out = _mk_table(spark, tmp_path, n=20)

    def batch(v_mult):
        return spark.range(5, 10).select(
            F.col("id"),
            (F.col("id") * v_mult).alias("v"),
            F.to_timestamp(F.lit("2024-03-01 11:00:00")).alias("_hour"),
        )

    merge_upsert(spark, out, batch(100), ["id"])
    merge_upsert(spark, out, batch(7000), ["id"])
    rows = {r["id"]: r["v"] for r in read_iceberg(spark, out).collect()}
    assert len(rows) == 20
    assert all(rows[i] == i * 7000 for i in range(5, 10))
    assert all(rows[i] == i * 10 for i in list(range(5)) + list(range(10, 20)))

    compact_data_files(spark, out, target_bytes=64 * 1024 * 1024)
    expire_snapshots(out, keep_last=1)
    rows2 = {r["id"]: r["v"] for r in read_iceberg(spark, out).collect()}
    assert rows2 == rows
    t = traverse(out)
    assert t["schema_errors"] == []
    assert t["position_delete_count"] == 0


def test_merge_upsert_pure_insert_and_noop(spark, tmp_path):
    from redpanda_spark.sources.iceberg_maintain import merge_upsert

    out = _mk_table(spark, tmp_path, n=10)
    inserts = spark.range(100, 105).select(
        F.col("id"),
        (F.col("id") * 10).alias("v"),
        F.to_timestamp(F.lit("2024-03-01 10:00:00")).alias("_hour"),
    )
    res = merge_upsert(spark, out, inserts, ["id"])
    assert res["matched_rows"] == 0 and res["inserted_rows"] == 5
    assert read_iceberg(spark, out).count() == 15

    empty = inserts.where(F.lit(False))
    res = merge_upsert(spark, out, empty, ["id"])
    assert res["snapshot_id"] is None
    assert read_iceberg(spark, out).count() == 15


def test_streaming_cdc_upsert_into_iceberg(spark, tmp_path):
    """CDC stream -> lakehouse: foreachBatch calls merge_upsert per
    micro-batch. After the stream drains, the table holds exactly the
    latest version of every key, and every intermediate state was a
    committed snapshot (exactly-once through the hint-flip commit
    point)."""
    from redpanda_spark.sources.iceberg_maintain import merge_upsert

    out = _mk_table(spark, tmp_path, n=10)
    src_dir = str(tmp_path / "cdc")
    # batch 1: update ids 3,4 ; batch 2: update id 4 again + insert 40
    b1 = spark.createDataFrame([(3, 333), (4, 444)], ["id", "v"])
    b2 = spark.createDataFrame([(4, 4444), (40, 400)], ["id", "v"])
    for b in (b1, b2):
        b.select(
            "id", "v", F.to_timestamp(F.lit("2024-03-01 10:00:00")).alias("_hour")
        ).coalesce(1).write.mode("append").parquet(src_dir)

    schema = "id long, v long, _hour timestamp"

    def apply_cdc(batch_df, batch_id):
        if batch_df.take(1):
            merge_upsert(spark, out, batch_df, ["id"])

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
        .writeStream.foreachBatch(apply_cdc)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    rows = {r["id"]: r["v"] for r in read_iceberg(spark, out).collect()}
    assert len(rows) == 11
    assert rows[3] == 333 and rows[40] == 400
    # id 4: either batch order gives the LAST writer's value because each
    # upsert position-deletes the prior copy
    assert rows[4] in (444, 4444)
    t = traverse(out)
    assert t["schema_errors"] == []


# -- equality deletes (round 8) --------------------------------------------


def _eq_fixture(spark, tmp_path):
    """Export a small table, return (lake_root, ice_root)."""
    from redpanda_spark.sources.datalake import write_datalake
    from redpanda_spark.sources.iceberg_export import export_iceberg

    lake = str(tmp_path / "lake")
    ice = str(tmp_path / "ice")
    df = spark.createDataFrame(
        [
            (i, f"u{i % 3}", float(i), "2024-03-01 10:00:00")
            for i in range(12)
        ],
        "id long, user string, v double, h string",
    ).select("id", "user", "v", F.to_timestamp(F.col("h")).alias("_hour"))
    write_datalake(df, lake)
    export_iceberg(spark, lake, ice)
    return lake, ice


def test_equality_delete_roundtrip(spark, tmp_path):
    """content=2 + equality_ids end to end: matching rows disappear from
    reads; rows appended AFTER the delete survive (strict sequence
    rule); the conformance reader still walks the chain."""
    from redpanda_spark.sources.datalake import write_datalake
    from redpanda_spark.sources.iceberg_export import export_iceberg, read_iceberg
    from redpanda_spark.sources.iceberg_maintain import equality_delete

    lake, ice = _eq_fixture(spark, tmp_path)
    res = equality_delete(spark, ice, ["user"], [{"user": "u1"}])
    assert res["deleted_keys"] == 1
    out = read_iceberg(spark, ice)
    users = {r["user"] for r in out.collect()}
    assert users == {"u0", "u2"} and out.count() == 8
    # append AFTER the delete: new u1 rows are NOT hidden (seq rule)
    df2 = spark.createDataFrame(
        [(100, "u1", 1.0, "2024-03-01 11:00:00")],
        "id long, user string, v double, h string",
    ).select("id", "user", "v", F.to_timestamp(F.col("h")).alias("_hour"))
    write_datalake(df2, lake)
    export_iceberg(spark, lake, ice)
    out2 = read_iceberg(spark, ice)
    assert out2.count() == 9
    assert out2.where("user = 'u1'").count() == 1
    assert out2.where("id = 100").count() == 1
    # multi-column keys + null-safe matching
    equality_delete(
        spark, ice, ["user", "id"], [{"user": "u0", "id": 0}]
    )
    out3 = read_iceberg(spark, ice)
    assert out3.count() == 8 and out3.where("id = 0").count() == 0
    # independent conformance traversal still green on the table
    import subprocess, sys

    r = subprocess.run(
        [sys.executable, "tools/iceberg_conformance.py", ice],
        capture_output=True,
        text=True,
        cwd="/root/repo",
    )
    assert r.returncode == 0, r.stdout + r.stderr


def test_equality_delete_composes_with_position_deletes(spark, tmp_path):
    from redpanda_spark.sources.iceberg_export import read_iceberg
    from redpanda_spark.sources.iceberg_maintain import delete_where, equality_delete

    _lake, ice = _eq_fixture(spark, tmp_path)
    delete_where(spark, ice, "id = 3")  # positional
    equality_delete(spark, ice, ["user"], [{"user": "u2"}])  # by key
    out = read_iceberg(spark, ice)
    assert out.count() == 12 - 1 - 4  # id3 (a u0 row) + the four u2 rows
    assert out.where("user = 'u2'").count() == 0
    assert out.where("id = 3").count() == 0


def test_compaction_refuses_equality_deletes(spark, tmp_path):
    import pytest

    from redpanda_spark.sources.iceberg_maintain import (
        compact_data_files,
        equality_delete,
    )

    _lake, ice = _eq_fixture(spark, tmp_path)
    equality_delete(spark, ice, ["user"], [{"user": "u1"}])
    with pytest.raises(ValueError, match="equality delete"):
        compact_data_files(spark, ice, target_bytes=10**9)


def test_equality_delete_errors(spark, tmp_path):
    import pytest

    from redpanda_spark.sources.iceberg_maintain import equality_delete

    _lake, ice = _eq_fixture(spark, tmp_path)
    assert equality_delete(spark, ice, ["user"], [])["snapshot_id"] is None
    with pytest.raises(ValueError, match="unknown key column"):
        equality_delete(spark, ice, ["nope"], [{"nope": 1}])


def test_equality_delete_resolves_by_field_id(spark, tmp_path):
    """Spec §Delete Formats: delete-file columns resolve by parquet
    field_id, not name. Simulate an external v2 table whose key column
    was renamed AFTER the delete file was written: the delete parquet
    carries the old name but the correct field_id — the read must still
    apply it (it used to fail with a missing-column AnalysisException)."""
    import glob

    import pyarrow as pa
    import pyarrow.parquet as papq

    from redpanda_spark.sources.iceberg_export import read_iceberg
    from redpanda_spark.sources.iceberg_maintain import equality_delete

    _lake, ice = _eq_fixture(spark, tmp_path)
    equality_delete(spark, ice, ["user"], [{"user": "u1"}])
    (dfile,) = glob.glob(os.path.join(ice, "data", "eq-delete-*.parquet"))
    tbl = papq.read_table(dfile)
    fld = tbl.schema.field(0)
    renamed = pa.table(
        {"user_before_rename": tbl.column(0)},
        schema=pa.schema(
            [pa.field("user_before_rename", fld.type, metadata=fld.metadata)]
        ),
    )
    papq.write_table(renamed, dfile)
    out = read_iceberg(spark, ice)
    assert {r["user"] for r in out.collect()} == {"u0", "u2"}
    assert out.count() == 8


def test_export_after_delete_carries_delete_manifests(spark, tmp_path):
    """Composition regression (found by the equality-delete work): an
    incremental export AFTER a maintenance delete must carry the prior
    snapshot's delete manifests forward — otherwise the new snapshot
    silently resurrects deleted rows."""
    from redpanda_spark.sources.datalake import write_datalake

    out = _mk_table(spark, tmp_path, n=40)
    delete_where(spark, out, "id < 10")
    assert read_iceberg(spark, out).count() == 30
    # new lake snapshot + incremental export
    lake = str(tmp_path / "lake")
    df2 = spark.range(100, 105).select(
        F.col("id"),
        (F.col("id") * 10).alias("v"),
        F.to_timestamp(F.lit("2024-03-01 12:00:00")).alias("_hour"),
    )
    write_datalake(df2, lake)
    export_iceberg(spark, lake, out)
    got = read_iceberg(spark, out)
    assert got.count() == 35  # 30 survivors + 5 new; deletes NOT resurrected
    assert got.where("id < 10").count() == 0
    t = traverse(out)
    assert t["schema_errors"] == []


def _current_meta_path(ice):
    md = os.path.join(ice, "metadata")
    hint = os.path.join(md, "version-hint.text")
    v = open(hint).read().strip()
    return os.path.join(md, f"v{v}.metadata.json")


def test_read_resolves_data_columns_by_field_id(spark, tmp_path):
    """Spec §Column Projection: data-file columns resolve against the
    current schema by parquet field_id (rename survival), name-match
    fallback for files without ids (the name-mapping analog), and
    null-fill for columns added after a file was written."""
    import glob
    import json as _json

    import pyarrow as pa
    import pyarrow.parquet as papq

    from redpanda_spark.sources.iceberg_export import read_iceberg

    _lake, ice = _eq_fixture(spark, tmp_path)
    meta = _json.load(open(_current_meta_path(ice)))
    cur = next(
        s for s in meta["schemas"] if s["schema-id"] == meta["current-schema-id"]
    )
    ids = {f["name"]: f["id"] for f in cur["fields"]}
    # simulate an EXTERNAL writer's file: rewrite one data parquet with
    # field_id metadata and a stale physical name for `user`
    dfiles = sorted(
        p
        for p in glob.glob(os.path.join(ice, "data", "**", "*.parquet"), recursive=True)
        if "eq-delete" not in p and "delete-" not in os.path.basename(p)
    )
    target = dfiles[0]
    tbl = papq.read_table(target)
    fields, cols = [], {}
    for fld in tbl.schema:
        phys = "user_v1" if fld.name == "user" else fld.name
        logical = fld.name
        fields.append(
            pa.field(
                phys,
                fld.type,
                nullable=True,
                metadata={b"PARQUET:field_id": str(ids[logical]).encode()},
            )
        )
        cols[phys] = tbl.column(logical)
    papq.write_table(pa.table(cols, schema=pa.schema(fields)), target)
    out = read_iceberg(spark, ice)
    rows = out.collect()
    assert len(rows) == 12
    # the rewritten file's users still land in the CURRENT `user` column
    assert {r["user"] for r in rows} == {"u0", "u1", "u2"}
    assert all(r["user"] is not None for r in rows)
    # add-column evolution: a field added after every file was written
    # null-fills everywhere
    cur["fields"] = cur["fields"] + [
        {"id": 999, "name": "added_later", "type": "long", "required": False}
    ]
    with open(_current_meta_path(ice), "w") as f:
        _json.dump(meta, f)
    out2 = read_iceberg(spark, ice)
    assert "added_later" in out2.columns
    got = out2.select("user", "added_later").collect()
    assert len(got) == 12 and all(r["added_later"] is None for r in got)
    assert out2.schema["added_later"].dataType.simpleString() == "bigint"


def test_maintenance_lifecycle_on_uri_root(spark, tmp_path):
    """The FULL maintenance lifecycle on a URI (Hadoop FileSystem) table
    root — position delete, equality delete, upsert, compaction, expiry
    with GC — committing and reading back correctly at every step.
    Driven on file:// so the JVM path is real; this is the object-store
    deployment every real Iceberg table lives on."""
    from redpanda_spark.sources.datalake import write_datalake
    from redpanda_spark.sources.iceberg_maintain import (
        equality_delete,
        merge_upsert,
    )

    lake = "file://" + str(tmp_path / "lake")
    out = "file://" + str(tmp_path / "ice")
    df = spark.range(0, 40).select(
        F.col("id"),
        (F.col("id") * 10).alias("v"),
        F.when(F.col("id") % 2 == 0, F.to_timestamp(F.lit("2024-03-01 10:00:00")))
        .otherwise(F.to_timestamp(F.lit("2024-03-01 11:00:00")))
        .alias("_hour"),
    ).repartition(4)
    write_datalake(df, lake)
    export_iceberg(spark, lake, out)

    # position delete
    res = delete_where(spark, out, "id >= 36")
    assert res["deleted_rows"] == 4
    assert {r["id"] for r in read_iceberg(spark, out).collect()} == set(range(36))

    # upsert: replace v for ids 2..5, insert 100..103
    upd = spark.range(0, 8).select(
        (F.when(F.col("id") < 4, F.col("id") + 2).otherwise(F.col("id") + 96)).alias(
            "id"
        ),
        F.lit(-1).cast("long").alias("v"),
        F.to_timestamp(F.lit("2024-03-01 10:00:00")).alias("_hour"),
    )
    res = merge_upsert(spark, out, upd, ["id"])
    assert res["matched_rows"] == 4 and res["inserted_rows"] == 4
    rows = {r["id"]: r["v"] for r in read_iceberg(spark, out).collect()}
    assert all(rows[i] == -1 for i in (2, 3, 4, 5, 100, 101, 102, 103))
    assert len(rows) == 40  # 0..35 plus the four inserts

    # compaction: everything is small, so bins form; rows unchanged
    res = compact_data_files(spark, out, target_bytes=1 << 30, small_bytes=1 << 30)
    assert res["new_files"] >= 1
    rows2 = {r["id"]: r["v"] for r in read_iceberg(spark, out).collect()}
    assert rows2 == rows

    # equality delete (by key, no positions) — after compaction, which
    # by design refuses tables carrying equality deletes
    res = equality_delete(spark, out, ["id"], [{"id": 0}, {"id": 1}])
    assert res["deleted_keys"] == 2
    rows_eq = {r["id"]: r["v"] for r in read_iceberg(spark, out).collect()}
    assert set(rows_eq) == set(rows) - {0, 1}

    # expiry: keep only the latest snapshot; GC must delete real files
    res = expire_snapshots(out, keep_last=1, spark=spark)
    assert res["expired"] >= 3 and res["files_deleted"] > 0
    rows3 = {r["id"]: r["v"] for r in read_iceberg(spark, out).collect()}
    assert rows3 == rows_eq
