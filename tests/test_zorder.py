"""Z-order layout (operators/zorder.py): Morton-key correctness and the
actual pruning win measured from real parquet footers."""

from __future__ import annotations

import glob

import pyarrow.parquet as papq
from pyspark.sql import functions as F

from redpanda_spark.operators.zorder import (
    spread_bits16,
    zorder_key,
    zorder_write,
    zvalue2,
)
from redpanda_spark.sources.tables import load_table


def _morton_ref(x: int, y: int) -> int:
    z = 0
    for i in range(16):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_spread_and_interleave_match_reference(spark):
    rows = [(0, 0), (1, 0), (0, 1), (65535, 65535), (12345, 54321), (255, 256)]
    df = spark.createDataFrame(rows, ["x", "y"]).withColumn(
        "z", zvalue2(F.col("x"), F.col("y"))
    )
    for r in df.collect():
        assert r["z"] == _morton_ref(r["x"], r["y"]), (r["x"], r["y"])


def test_zorder_key_partition_invariant(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    a = sorted(map(tuple, zorder_key(ev, "user_id", "event_id").collect()))
    b = sorted(
        map(tuple, zorder_key(ev.repartition(7), "user_id", "event_id").collect())
    )
    assert a == b


def _overlap_file_count(path: str, col: str, lo: int, hi: int) -> int:
    """Files a reader must open for `col BETWEEN lo AND hi`, judged by
    parquet row-group min/max — what predicate pushdown actually uses."""
    n = 0
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = papq.ParquetFile(f)
        idx = md.schema_arrow.get_field_index(col)
        mn = min(md.metadata.row_group(i).column(idx).statistics.min
                 for i in range(md.metadata.num_row_groups))
        mx = max(md.metadata.row_group(i).column(idx).statistics.max
                 for i in range(md.metadata.num_row_groups))
        if mx >= lo and mn <= hi:
            n += 1
    return n


def test_zorder_layout_prunes_both_dimensions(spark, sf_dir, tmp_path):
    """The point of the layout: after z-ordering on (user_id, event_id),
    a narrow predicate on EITHER column touches a small fraction of the
    files — while the ts-ordered natural layout only prunes its sort
    leader. Measured from real footers, not asserted by construction."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    n_files = 16
    natural = str(tmp_path / "natural")
    zpath = str(tmp_path / "zorder")
    # natural: what a log naturally looks like — clustered by arrival
    # (event_id), so user_id stats are useless
    ev.repartitionByRange(n_files, "event_id").write.parquet(natural)
    zorder_write(ev, "user_id", "event_id", zpath, n_files=n_files)

    stats = ev.agg(
        F.min("user_id"), F.max("user_id"), F.min("event_id"), F.max("event_id")
    ).collect()[0]
    u_lo = stats[0] + (stats[1] - stats[0]) * 45 // 100
    u_hi = stats[0] + (stats[1] - stats[0]) * 55 // 100

    nat_files = _overlap_file_count(natural, "user_id", u_lo, u_hi)
    z_files = _overlap_file_count(zpath, "user_id", u_lo, u_hi)
    # natural layout: every file overlaps a 10% user_id slice
    assert nat_files == n_files
    # z-order: the same slice lives in a fraction of the files
    assert z_files <= n_files // 2

    # and the second dimension still prunes (z-order is not a plain
    # sort). Bound is looser than the leader's: repartitionByRange cuts
    # at sampled quantiles, so segment edges straddle z-prefix cells —
    # a 10% slab touches its ~2-of-4 quarter rows plus straddlers.
    e_lo = stats[2] + (stats[3] - stats[2]) * 45 // 100
    e_hi = stats[2] + (stats[3] - stats[2]) * 55 // 100
    assert _overlap_file_count(zpath, "event_id", e_lo, e_hi) <= 10

    # the layout is a pure reorganization: same rows
    assert (
        spark.read.parquet(zpath).orderBy("event_id").collect()
        == ev.orderBy("event_id").collect()
    )
