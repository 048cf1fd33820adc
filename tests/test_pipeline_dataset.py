"""Dataset-assembly operators (pipeline/dataset.py): determinism, budget
boundaries, packing arithmetic, redaction byte-exactness."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from redpanda_spark.pipeline.dataset import (
    BUCKETS,
    assign_split,
    pack_offsets,
    pii_counts,
    redact_pii,
    split_bucket,
    weighted_mix,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, source=s, n_tokens=t) for i, s, t in rows]
    )


def test_split_deterministic_under_repartition(spark):
    df = _docs(spark, [(i, "a", 10) for i in range(200)])
    one = {r["doc_id"]: r["split"] for r in assign_split(df).collect()}
    other = {
        r["doc_id"]: r["split"]
        for r in assign_split(df.repartition(7, "doc_id")).collect()
    }
    assert one == other  # split is a pure function of the id, not layout


def test_split_fractions_roughly_hold(spark):
    df = _docs(spark, [(i, "a", 1) for i in range(5000)])
    counts = dict(
        assign_split(df, weights={"train": 0.8, "val": 0.2})
        .groupBy("split")
        .count()
        .collect()
    )
    assert 0.75 < counts["train"] / 5000 < 0.85
    assert counts["train"] + counts["val"] == 5000


def test_split_bucket_range(spark):
    df = _docs(spark, [(i, "a", 1) for i in range(1000)])
    mn, mx = (
        df.select(split_bucket("doc_id").alias("b"))
        .agg(F.min("b"), F.max("b"))
        .first()
    )
    assert 0 <= mn and mx < BUCKETS


def test_weighted_mix_budget_boundary(spark):
    # source a: budget 30 tokens; docs of 10 tokens in priority order →
    # exactly 3 kept, the 4th (which would hit 40 > 30) dropped
    df = _docs(spark, [(i, "a", 10) for i in range(10)])
    out = weighted_mix(df, {"a": 1.0}, 30).collect()
    assert len(out) == 3
    assert max(r["cum_tokens"] for r in out) == 30


def test_weighted_mix_unlisted_source_excluded(spark):
    df = _docs(spark, [(1, "a", 5), (2, "b", 5)])
    out = weighted_mix(df, {"a": 1.0}, 100).collect()
    assert {r["source"] for r in out} == {"a"}


def test_pack_offsets_contiguous_per_source(spark):
    df = _docs(spark, [(i, "s", 100) for i in range(10)])
    rows = {r["doc_id"]: r for r in pack_offsets(df, 256).collect()}
    # offsets are contiguous in id order
    for i in range(10):
        assert rows[i]["start_off"] == i * 100
    # doc 2 occupies tokens [200, 300) → crosses the 256 boundary
    assert rows[2]["begin_win"] == 0 and rows[2]["end_win"] == 1
    assert rows[2]["spans"] == 2
    assert rows[0]["spans"] == 1


def test_pack_offsets_empty_doc(spark):
    df = _docs(spark, [(0, "s", 256), (1, "s", 0), (2, "s", 10)])
    rows = {r["doc_id"]: r for r in pack_offsets(df, 256).collect()}
    # the empty doc sits at offset 256 (window 1) and spans exactly 1
    assert rows[1]["start_off"] == 256
    assert rows[1]["begin_win"] == rows[1]["end_win"] == 1
    assert rows[1]["spans"] == 1


def test_redact_pii_all_kinds(spark):
    df = spark.createDataFrame(
        [
            Row(
                s="mail a.b+c@x-corp.io then 10.1.2.3 and 555-123-4567 done"
            )
        ]
    )
    counted = df.select(
        *[v.alias(k) for k, v in pii_counts("s").items()],
        redact_pii("s").alias("red"),
    ).first()
    assert counted["email"] == 1
    assert counted["ipv4"] == 1
    assert counted["phone"] == 1
    assert counted["red"] == "mail [PII] then [PII] and [PII] done"


def test_redact_idempotent(spark):
    df = spark.createDataFrame([Row(s="x user@host.com y")])
    once = df.select(redact_pii("s").alias("r"))
    twice = once.select(redact_pii("r").alias("r"))
    assert once.first()["r"] == twice.first()["r"] == "x [PII] y"


# -- benchmark decontamination ----------------------------------------------


def test_contamination_pairs_and_decontaminate(spark):
    from pyspark.sql import Row

    from redpanda_spark.pipeline.decontaminate import (
        contamination_pairs,
        decontaminate,
    )

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="the quick brown fox jumps over the lazy dog"),
            Row(doc_id=2, text="completely unrelated training text here today"),
            Row(doc_id=3, text="short one"),  # < n tokens: can't be flagged
        ]
    )
    bench = spark.createDataFrame(
        [
            Row(doc_id=100, text="question: the quick brown fox jumps where"),
            Row(doc_id=101, text="no overlap with anything at all whatsoever"),
        ]
    )
    pairs = contamination_pairs(docs, bench, n=3).collect()
    assert {(r["doc_id"], r["bench_id"]) for r in pairs} == {(1, 100)}
    # "the quick brown", "quick brown fox", "brown fox jumps" = 3 shared
    assert pairs[0]["common_ngrams"] == 3

    clean = decontaminate(docs, bench, n=3)
    assert sorted(r["doc_id"] for r in clean.collect()) == [2, 3]


def test_decontaminate_benchmark_side_broadcasts(spark):
    """The tiny benchmark side must broadcast — the corpus side then
    streams through a hash probe without shuffling document grams."""
    from pyspark.sql import Row

    from redpanda_spark.pipeline.decontaminate import contamination_pairs

    docs = spark.createDataFrame(
        [Row(doc_id=i, text=f"alpha beta gamma delta {i}") for i in range(50)]
    )
    bench = spark.createDataFrame([Row(doc_id=0, text="alpha beta gamma delta x")])
    plan = contamination_pairs(docs, bench, n=3)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_stratified_sample_deterministic_and_nested(spark):
    from redpanda_spark.pipeline.dataset import stratified_sample

    docs = spark.createDataFrame(
        [(i, "s0" if i % 2 == 0 else "s1") for i in range(1000)],
        "doc_id long, source string",
    )
    a = stratified_sample(docs, {"s0": 0.2, "s1": 0.6})
    b = stratified_sample(docs, {"s0": 0.2, "s1": 0.6})
    ids_a = sorted(r["doc_id"] for r in a.collect())
    assert ids_a == sorted(r["doc_id"] for r in b.collect())  # reproducible
    # rates land near target per stratum
    n0 = a.where(F.col("source") == "s0").count()
    n1 = a.where(F.col("source") == "s1").count()
    assert abs(n0 / 500 - 0.2) < 0.06 and abs(n1 / 500 - 0.6) < 0.06
    # nested: the 20% sample of s1 is a subset of the 60% sample
    small = stratified_sample(docs, {"s1": 0.2})
    assert {r["doc_id"] for r in small.collect()} <= {
        r["doc_id"] for r in a.where(F.col("source") == "s1").collect()
    }
    # unknown strata default to dropped
    assert stratified_sample(docs, {}).count() == 0
    # narrow plan: no Exchange
    plan = a._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_shuffle_deterministic_is_stable_bijection(spark, sf_dir):
    from redpanda_spark.pipeline.dataset import shuffle_deterministic
    from redpanda_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    a = shuffle_deterministic(docs, seed="s1").select("doc_id", "shuffle_pos")
    b = shuffle_deterministic(docs, seed="s1").select("doc_id", "shuffle_pos")
    ra = {r["doc_id"]: r["shuffle_pos"] for r in a.collect()}
    rb = {r["doc_id"]: r["shuffle_pos"] for r in b.collect()}
    assert ra == rb  # same seed -> identical order
    assert sorted(ra.values()) == list(range(1, len(ra) + 1))  # dense 1..n
    rc = {
        r["doc_id"]: r["shuffle_pos"]
        for r in shuffle_deterministic(docs, seed="s2").collect()
    }
    assert rc != ra  # different seed -> different order


# -- chunking / mixture / upsample / fetch byte budget (round 6) -----------


def test_chunk_documents_overlap_and_tail(spark):
    from redpanda_spark.pipeline.dataset import chunk_documents

    docs = spark.createDataFrame(
        [Row(doc_id=1, text="a b c d e f g"), Row(doc_id=2, text="x"),
         Row(doc_id=3, text="")],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, window_tokens=3, stride=2).collect()
    by = {}
    for r in out:
        by.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["chunk_text"], r["n_tokens"], r["n_chunks"])
        )
    # doc1: starts 0,2,4,6 -> 4 chunks, last is the 1-token tail
    assert by[1] == [
        (0, "a b c", 3, 4), (1, "c d e", 3, 4),
        (2, "e f g", 3, 4), (3, "g", 1, 4),
    ]
    # short doc: one chunk; empty doc: no chunks
    assert by[2] == [(0, "x", 1, 1)]
    assert 3 not in by


def test_mixture_plan_caps_and_deficit(spark):
    from redpanda_spark.pipeline.dataset import mixture_plan

    docs = spark.createDataFrame(
        [Row(source="a", n_tokens=100), Row(source="a", n_tokens=100),
         Row(source="b", n_tokens=50)],
        "source string, n_tokens long",
    )
    out = {r["source"]: r for r in
           mixture_plan(docs, {"a": 0.5, "b": 0.5}, 1000).collect()}
    # a: target 500 > available 200 -> rate capped at 1.0, epochs 2.5
    assert out["a"]["target_tokens"] == 500
    assert out["a"]["sample_rate"] == 1.0
    assert out["a"]["epochs"] == 2.5
    assert out["a"]["deficit_tokens"] == 300
    # b: target 500 > available 50 -> epochs 10
    assert out["b"]["epochs"] == 10.0


def test_upsample_deterministic_and_bounded(spark):
    from redpanda_spark.pipeline.dataset import upsample_by_quality

    docs = spark.createDataFrame(
        [Row(doc_id=i, w=2.5) for i in range(200)], "doc_id long, w double"
    )
    a = upsample_by_quality(docs, "w").groupBy("doc_id").count().collect()
    b = upsample_by_quality(docs, "w").groupBy("doc_id").count().collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # reproducible
    counts = {r["doc_id"]: r["count"] for r in a}
    assert set(counts.values()) <= {2, 3}  # floor=2 plus hash-decided extra
    frac = sum(1 for v in counts.values() if v == 3) / len(counts)
    assert 0.3 < frac < 0.7  # ~0.5 of ids get the fractional copy
    # runaway weights are clamped
    big = spark.createDataFrame([Row(doc_id=1, w=1e9)], "doc_id long, w double")
    assert upsample_by_quality(big, "w", max_copies=4).count() == 4


def test_fetch_max_bytes_first_record_always_returns(spark):
    from redpanda_spark.operators import log as LOG

    rows = [
        Row(partition=0, offset=i, key=None, value=bytes(100)) for i in range(5)
    ]
    log = spark.createDataFrame(
        rows, "partition int, offset long, key binary, value binary"
    )
    # budget 250: records cost 116 each -> keep offsets 0,1,2 (cum-before
    # 0,116,232 < 250; offset 3 starts at 348)
    got = [r["offset"] for r in
           LOG.fetch_max_bytes(log, 250, partition=0).collect()]
    assert got == [0, 1, 2]
    # budget smaller than one record: the first record still returns
    got = [r["offset"] for r in
           LOG.fetch_max_bytes(log, 10, partition=0, start_offset=3).collect()]
    assert got == [3]
