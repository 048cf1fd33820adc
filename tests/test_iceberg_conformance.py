"""Iceberg v2 export spec-conformance via a genuinely INDEPENDENT reader.

``tools/iceberg_conformance.py`` shares no code with the exporter
(`redpanda_spark/sources/iceberg_export.py`) or its Avro codec
(`redpanda_spark/registry/avro_codec.py`): its Avro binary decoder + OCF
framing are written directly from the public Apache Avro 1.11 spec, and
its traversal + required-field-id checks from the public Apache Iceberg
table spec v2. If the writer emitted self-consistent-but-wrong bytes,
this reader cannot inherit the bug.

Reference parity target: `src/v/iceberg/table_metadata.cc`,
`filesystem_catalog.cc` (the reference's Iceberg metadata chain).
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from tools.iceberg_conformance import read_ocf, traverse


def _mk_lake(spark, path, lo, hi, hour):
    from redpanda_spark.sources.datalake import write_datalake

    df = spark.range(lo, hi).select(
        F.col("id"),
        (F.col("id") * 10).alias("v"),
        F.to_timestamp(F.lit(hour)).alias("_hour"),
    )
    write_datalake(df, path)


def test_independent_reader_traverses_committed_chain(spark, tmp_path):
    """version-hint → vN.metadata.json → manifest-list → manifest →
    data files: the whole chain read by the from-spec implementation,
    record counts matching both the engine and the parquet footers."""
    from redpanda_spark.sources.iceberg_export import export_iceberg

    lake = str(tmp_path / "lake")
    out = str(tmp_path / "ice")
    _mk_lake(spark, lake, 0, 8, "2024-03-01 10:00:00")
    export_iceberg(spark, lake, out)

    res = traverse(out)
    assert res["schema_errors"] == []
    assert res["version"] == 1
    assert res["live_record_count"] == 8
    assert set(res["entry_statuses"]) == {1}  # first snapshot: all ADDED
    for f in res["data_files"]:
        assert os.path.exists(f["file_path"])
        assert f["file_path"].startswith(os.path.join(out, "data"))
        assert os.path.getsize(f["file_path"]) == f["file_size_in_bytes"]
        # the manifest's record_count must match the parquet footer an
        # arbitrary engine would trust for scan planning
        assert pq.read_metadata(f["file_path"]).num_rows == f["record_count"]
        assert f["file_format"] == "PARQUET"
        assert f["content"] == 0  # data, not deletes

    # snapshot summary totals agree with what the reader counted
    assert int(res["summary"]["total-records"]) == 8


def test_independent_reader_incremental_snapshot_statuses(spark, tmp_path):
    """After an incremental export the independent reader sees the new
    version, EXISTING + ADDED entries, a grown snapshot-log, and the
    full live row count."""
    from redpanda_spark.sources.iceberg_export import export_iceberg

    lake = str(tmp_path / "lake")
    out = str(tmp_path / "ice")
    _mk_lake(spark, lake, 0, 6, "2024-03-01 10:00:00")
    export_iceberg(spark, lake, out)
    _mk_lake(spark, lake, 6, 10, "2024-03-01 11:00:00")
    export_iceberg(spark, lake, out)

    res = traverse(out)
    assert res["schema_errors"] == []
    assert res["version"] == 2
    assert res["sequence_number"] == 2
    assert res["live_record_count"] == 10
    assert 0 in res["entry_statuses"] and 1 in res["entry_statuses"]
    assert len(res["snapshot_log"]) == 2
    assert len(res["metadata_log"]) == 1


def test_independent_ocf_decoder_agrees_with_jvm_avro(spark, tmp_path):
    """Decoder cross-validation: the from-spec OCF reader and the OFFICIAL
    Apache Avro JVM library (bundled with Spark) must see the same record
    count in both container files — two independent decoders agreeing on
    the writer's bytes."""
    from redpanda_spark.sources.iceberg_export import export_iceberg

    lake = str(tmp_path / "lake")
    out = str(tmp_path / "ice")
    _mk_lake(spark, lake, 0, 8, "2024-03-01 10:00:00")
    export_iceberg(spark, lake, out)

    import json

    meta_dir = os.path.join(out, "metadata")
    v = int(open(os.path.join(meta_dir, "version-hint.text")).read().strip())
    md = json.load(open(os.path.join(meta_dir, f"v{v}.metadata.json")))
    [snap] = md["snapshots"]
    _, _, manifests = read_ocf(snap["manifest-list"])
    jvm = spark._jvm
    for path in [snap["manifest-list"]] + [m["manifest_path"] for m in manifests]:
        _, _, mine = read_ocf(path)
        rdr = jvm.org.apache.avro.file.DataFileReader(
            jvm.java.io.File(path),
            jvm.org.apache.avro.generic.GenericDatumReader(),
        )
        n = 0
        while rdr.hasNext():
            rdr.next()
            n += 1
        assert n == len(mine), (path, n, len(mine))


def test_rest_catalog_registration_flow(spark, tmp_path):
    """The REST-catalog client registers an exported table's CURRENT
    metadata-location against a live (in-process) HTTP server speaking
    the Iceberg REST catalog shapes: config handshake, namespace create
    (409 tolerated), RegisterTableRequest. Also covers dry_run."""
    import json
    import threading
    from http.server import BaseHTTPRequestHandler, HTTPServer

    from redpanda_spark.sources.iceberg_catalog import (
        CatalogError,
        register_table,
    )
    from redpanda_spark.sources.iceberg_export import export_iceberg

    lake = str(tmp_path / "lake")
    out = str(tmp_path / "ice")
    _mk_lake(spark, lake, 0, 6, "2024-03-01 10:00:00")
    export_iceberg(spark, lake, out)

    seen = []

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def _reply(self, code, body):
            raw = json.dumps(body).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(raw)))
            self.end_headers()
            self.wfile.write(raw)

        def do_GET(self):
            seen.append(("GET", self.path, None))
            self._reply(200, {"defaults": {}, "overrides": {}})

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            body = json.loads(self.rfile.read(n) or b"{}")
            seen.append(("POST", self.path, body))
            if self.path.endswith("/v1/namespaces"):
                self._reply(409, {"error": {"message": "exists"}})
            else:
                self._reply(200, {"metadata-location": body.get("metadata-location")})

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        uri = f"http://127.0.0.1:{srv.server_port}"
        res = register_table(out, uri, "lake.prod", "events")
        assert [s[0] for s in seen] == ["GET", "POST", "POST"]
        assert seen[0][1] == "/v1/config"
        assert seen[1][2] == {"namespace": ["lake", "prod"], "properties": {}}
        reg = seen[2]
        assert reg[1] == "/v1/namespaces/lake%1Fprod/register"
        assert reg[2]["name"] == "events"
        # points at the CURRENT committed metadata, which must exist
        assert reg[2]["metadata-location"].endswith("v1.metadata.json")
        assert os.path.exists(reg[2]["metadata-location"])
        assert res["responses"][1]["status"] == 409  # benign exists
        assert res["responses"][2]["status"] == 200
    finally:
        srv.shutdown()

    # dry run: request plan only, no I/O
    dr = register_table(out, "http://nowhere.invalid", "ns", "t", dry_run=True)
    assert len(dr["requests"]) == 3 and dr["responses"] == []

    # unreachable catalog surfaces cleanly
    import pytest as _pytest

    with _pytest.raises(CatalogError, match="unreachable"):
        register_table(out, "http://127.0.0.1:9", "ns", "t", timeout_s=2)


def test_crash_between_state_and_hint_cannot_poison_next_export(spark, tmp_path):
    """The export-state file is written BEFORE the hint flip; a crash in
    that window (or a hint rollback) must not let the next export mark
    the aborted attempt's files EXISTING under a never-committed snapshot
    id. The state cache is stamped with its hint version and rebuilt from
    the committed manifests on mismatch; the conformance reader now flags
    dangling snapshot references, so the failure mode is visible."""
    from redpanda_spark.sources.iceberg_export import export_iceberg, read_iceberg

    lake = str(tmp_path / "lake")
    out = str(tmp_path / "ice")
    hint = os.path.join(out, "metadata", "version-hint.text")

    _mk_lake(spark, lake, 0, 8, "2024-03-01 10:00:00")
    export_iceberg(spark, lake, out)                       # v1 committed

    _mk_lake(spark, lake, 8, 12, "2024-03-01 11:00:00")
    export_iceberg(spark, lake, out)                       # v2 committed
    # simulate the crash window: metadata+state for v2 exist, but the
    # commit point never flipped
    with open(hint, "w") as f:
        f.write("1")

    _mk_lake(spark, lake, 12, 20, "2024-03-01 12:00:00")
    summary = export_iceberg(spark, lake, out)             # retries as v2
    assert summary["n_rows"] == 20

    res = traverse(out)
    assert res["schema_errors"] == []                      # no dangling refs
    assert res["live_record_count"] == 20
    # hour-2 and hour-3 files were never committed before, so they must be
    # ADDED (status 1) in this snapshot, not EXISTING under a ghost id
    committed = {s["snapshot-id"] for s in
                 __import__("json").load(open(summary["metadata_path"]))["snapshots"]}
    assert res["snapshot_id"] in committed
    assert read_iceberg(spark, out).count() == 20


def test_stale_state_without_crash_is_equivalent(spark, tmp_path):
    """Deleting the state cache entirely must change nothing: the rebuild
    path reproduces the same EXISTING/ADDED split the cache would give."""
    from redpanda_spark.sources.iceberg_export import export_iceberg

    lake = str(tmp_path / "lake")
    out = str(tmp_path / "ice")
    _mk_lake(spark, lake, 0, 8, "2024-03-01 10:00:00")
    export_iceberg(spark, lake, out)
    os.remove(os.path.join(out, "metadata", "_export_state.json"))
    _mk_lake(spark, lake, 8, 14, "2024-03-01 11:00:00")
    export_iceberg(spark, lake, out)

    res = traverse(out)
    assert res["schema_errors"] == []
    assert res["live_record_count"] == 14
    # hour-1 files are EXISTING (rebuilt state found them), hour-2 ADDED
    assert set(res["entry_statuses"]) == {0, 1}
    existing_rows = sum(
        f["record_count"]
        for f, s in zip(res["data_files"], res["entry_statuses"])
        if s == 0
    )
    assert existing_rows == 8  # exactly the v1 rows stayed EXISTING


def test_footer_field_ids_helper(tmp_path):
    """r9 regression (self-review): the shared footer reader must (a)
    raise on unreadable footers — ArrowInvalid subclasses ValueError, NOT
    OSError, so callers' malformation fallbacks must catch ValueError —
    without caching the failure, and (b) return field_id metadata when
    present, cached by path."""
    import pytest
    import pyarrow as pa
    import pyarrow.parquet as papq

    from redpanda_spark.sources.iceberg_export import _footer_field_ids

    _footer_field_ids.cache_clear()
    # malformed footer → ArrowInvalid (a ValueError), never silently empty
    bad = tmp_path / "not_parquet.parquet"
    bad.write_bytes(b"this is not a parquet file at all")
    with pytest.raises(ValueError):
        _footer_field_ids(str(bad))
    # missing file → I/O error propagates (transient-blip class)
    with pytest.raises(OSError):
        _footer_field_ids(str(tmp_path / "ghost.parquet"))
    # failures are NOT cached: a fixed file reads fine at the same path
    assert _footer_field_ids.cache_info().currsize == 0
    # real footer with field_id metadata
    good = tmp_path / "good.parquet"
    schema = pa.schema(
        [
            pa.field("k", pa.int64(), metadata={b"PARQUET:field_id": b"1"}),
            pa.field("v", pa.string(), metadata={b"PARQUET:field_id": b"2"}),
            pa.field("no_id", pa.string()),
        ]
    )
    papq.write_table(
        pa.table({"k": [1], "v": ["a"], "no_id": ["b"]}, schema=schema),
        str(good),
    )
    fids, names, type_pairs = _footer_field_ids(str(good))
    assert dict(fids) == {1: "k", 2: "v"}
    assert names == frozenset({"k", "v", "no_id"})
    assert dict(type_pairs)["k"] == "int64"
    assert _footer_field_ids.cache_info().currsize >= 1
    # rewrite-in-place at the SAME path must not serve the stale mapping
    # (ADVICE r9: cache is keyed by (path, mtime, size), not path alone)
    import os as _os_mod
    import time as _time_mod

    schema2 = pa.schema(
        [pa.field("k", pa.int64(), metadata={b"PARQUET:field_id": b"7"})]
    )
    papq.write_table(pa.table({"k": [9]}, schema=schema2), str(good))
    st = _os_mod.stat(str(good))
    _os_mod.utime(str(good), ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000))
    fids2, names2, _ = _footer_field_ids(str(good))
    assert dict(fids2) == {7: "k"}
    assert names2 == frozenset({"k"})


def test_read_flat_layout_resolves_partition_from_manifest(spark, tmp_path):
    """Spec Column Projection rule 2: an identity-partition column absent
    from the data files resolves from the MANIFEST's partition struct —
    hive-style `_hour=` directories are a layout convention, not the
    spec. Flatten an exported table's layout (move every data file out of
    its partition dir, patch the manifests) and the reader must still
    produce the `_hour` values, with partition-pruning-equivalent
    filters still correct."""
    import shutil

    from redpanda_spark.sources.iceberg_export import (
        _current_metadata,
        avro_ocf_read,
        avro_ocf_write,
        read_iceberg,
    )

    lake = str(tmp_path / "lake")
    out = str(tmp_path / "ice")
    _mk_lake(spark, lake, 0, 6, "2024-03-01 10:00:00")
    _mk_lake(spark, lake, 6, 10, "2024-03-01 11:00:00")
    from redpanda_spark.sources.iceberg_export import export_iceberg

    export_iceberg(spark, lake, out)
    expected = {
        (r["id"], r["v"], str(r["_hour"]))
        for r in read_iceberg(spark, out).collect()
    }
    assert len(expected) == 10 and len({e[2] for e in expected}) == 2

    # flatten: data/_hour=X/part.parquet -> data/flat-N.parquet
    meta = _current_metadata(out)
    snap = next(
        s
        for s in meta["snapshots"]
        if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    _ls, _lm, manifests = avro_ocf_read(snap["manifest-list"])
    n = 0
    for mf in manifests:
        es, em, entries = avro_ocf_read(mf["manifest_path"])
        for e in entries:
            src = e["data_file"]["file_path"]
            dst = os.path.join(out, "data", f"flat-{n}.parquet")
            n += 1
            shutil.move(src, dst)
            e["data_file"]["file_path"] = dst
        avro_ocf_write(mf["manifest_path"], es, entries, meta=em)
    for sub in os.listdir(os.path.join(out, "data")):
        p = os.path.join(out, "data", sub)
        if os.path.isdir(p) and not os.listdir(p):
            os.rmdir(p)

    got_df = read_iceberg(spark, out)
    got = {(r["id"], r["v"], str(r["_hour"])) for r in got_df.collect()}
    assert got == expected
    # a filter on the manifest-derived partition column still works
    assert (
        got_df.where(
            F.col("_hour") == F.to_timestamp(F.lit("2024-03-01 11:00:00"))
        ).count()
        == 4
    )


def test_type_promoted_files_scan_in_separate_groups(spark, tmp_path):
    """Iceberg spec type promotion (int->long): a table can hold data
    files written BEFORE a promotion (physical int32) alongside files
    written after (int64) under the same column name and field id. The
    reader must not lump them into one scan group keyed by names alone —
    a single inferred footer schema would misread the other file — and
    each group must cast up to the CURRENT schema type so the union is
    type-stable (ADVICE r9)."""
    import pyarrow as pa
    import pyarrow.parquet as papq

    from redpanda_spark.sources.iceberg_export import (
        _current_metadata,
        avro_ocf_read,
        export_iceberg,
        read_iceberg,
    )

    lake = str(tmp_path / "lake")
    out = str(tmp_path / "ice")
    _mk_lake(spark, lake, 0, 4, "2024-03-01 10:00:00")
    _mk_lake(spark, lake, 4, 8, "2024-03-01 11:00:00")
    export_iceberg(spark, lake, out)
    expected = {
        (r["id"], r["v"]) for r in read_iceberg(spark, out).collect()
    }
    assert len(expected) == 8

    # demote ONE data file's physical columns to int32 (a pre-promotion
    # file), keeping the field_id metadata the reader resolves by
    meta = _current_metadata(out)
    snap = next(
        s
        for s in meta["snapshots"]
        if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    _ls, _lm, manifests = avro_ocf_read(snap["manifest-list"])
    paths = []
    for mf in manifests:
        _es, _em, entries = avro_ocf_read(mf["manifest_path"])
        paths.extend(e["data_file"]["file_path"] for e in entries)
    victim = sorted(paths)[0]
    tbl = papq.read_table(victim)
    demoted_fields = []
    for fld in tbl.schema:
        t = pa.int32() if pa.types.is_int64(fld.type) else fld.type
        demoted_fields.append(
            pa.field(fld.name, t, fld.nullable, fld.metadata)
        )
    demoted = tbl.cast(pa.schema(demoted_fields, tbl.schema.metadata))
    papq.write_table(demoted, victim)

    got_df = read_iceberg(spark, out)
    assert dict(got_df.dtypes)["id"] == "bigint"
    got = {(r["id"], r["v"]) for r in got_df.collect()}
    assert got == expected


def test_export_and_read_on_uri_root(spark, tmp_path):
    """The whole Iceberg chain — export (data copy, Avro manifests,
    metadata.json, version hint, export state), incremental re-export,
    and the metadata-driven read — must work when BOTH the lake and the
    table root are URI (Hadoop FileSystem) paths, the deployment the
    reference's Iceberg committer targets (object storage). Driven on
    file:// so the JVM path is real; data-file paths are stored in the
    plain filesystem form Spark's _metadata.file_path normalizes to, so
    position-delete anti-joins keep working unchanged."""
    from redpanda_spark.sources.datalake import read_datalake
    from redpanda_spark.sources.iceberg_export import (
        export_iceberg,
        read_iceberg,
    )

    lake = "file://" + str(tmp_path / "lake")
    out = "file://" + str(tmp_path / "ice")
    _mk_lake(spark, lake, 0, 8, "2024-03-01 10:00:00")
    res = export_iceberg(spark, lake, out)
    assert res["n_files"] >= 1 and res["n_rows"] == 8

    got = {
        (r["id"], r["v"])
        for r in read_iceberg(spark, out).select("id", "v").collect()
    }
    assert got == {(i, i * 10) for i in range(8)}

    # incremental export: a second engine snapshot appends an Iceberg
    # snapshot; prior files enter as EXISTING (state machinery on URI)
    _mk_lake(spark, lake, 8, 12, "2024-03-01 11:00:00")
    res2 = export_iceberg(spark, lake, out)
    assert res2["snapshot_id"] != res["snapshot_id"]
    got2 = {
        r["id"] for r in read_iceberg(spark, out).select("id").collect()
    }
    assert got2 == set(range(12))
    # time travel across the URI export still works
    got1 = {
        r["id"]
        for r in read_iceberg(spark, out, snapshot_id=res["snapshot_id"])
        .select("id")
        .collect()
    }
    assert got1 == set(range(8))
    # idempotent re-export of the already-exported snapshot
    res3 = export_iceberg(spark, lake, out, snapshot_id=res2["snapshot_id"])
    assert res3["snapshot_id"] == res2["snapshot_id"]
    # equality with the lake view the export derives from
    lake_rows = {
        (r["id"], r["v"])
        for r in read_datalake(spark, lake).select("id", "v").collect()
    }
    assert {
        (r["id"], r["v"])
        for r in read_iceberg(spark, out).select("id", "v").collect()
    } == lake_rows
