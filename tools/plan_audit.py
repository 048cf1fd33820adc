"""Physical-plan audit for the headline queries.

For each query: capture `.explain("formatted")` and flag scale smells —
 - parquet scans with no pushed filters where the query clearly filters,
 - scans reading every column (no pruning) for narrow projections,
 - CartesianProduct / BroadcastNestedLoopJoin,
 - sort-merge joins whose build side is a tiny dim table (should broadcast),
 - missing WholeStageCodegen spans (expression fell out of codegen).

Usage: python tools/plan_audit.py [sf_dir] [query ...]
Prints one line per query: OK or the list of flags; exits non-zero if any
query has a flag marked severe (cartesian / nested-loop).
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from redpanda_spark.plans.queries import QUERIES
from redpanda_spark.session import get_spark


def plan_text(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


# Queries whose plans legitimately contain an "expensive" operator: the
# brute-force ANN paths are *intentional* bounded cross products (the small
# query set is broadcast against the corpus — that IS the baseline design).
EXPECTED = {
    "ann_topk": {"nested-loop-join"},
    "ann_ivf": {"nested-loop-join"},
    "emb_near_dup": {"nested-loop-join"},
    # Scalar-subquery shapes: the build side is a 1-row global aggregate
    # broadcast against the probe (Q11's HAVING threshold, Q22's avg
    # balance). A 1-row BroadcastNestedLoopJoin is exactly how Spark runs
    # scalar subqueries — bounded work, scale-safe.
    "tpch_q11ish": {"nested-loop-join"},
    "tpch_q22ish": {"nested-loop-join"},
    # BM25: the corpus-stats row (N, avgdl, per-term df) is a 1-row
    # global aggregate broadcast-crossed into the scoring scan — the
    # same bounded scalar-subquery shape.
    "doc_bm25": {"nested-loop-join"},
    # bigram-LM scorer: the vocabulary size is a 1-row global aggregate
    # broadcast-crossed into the model probabilities — same bounded
    # scalar-subquery shape as Q11/Q22.
    "doc_perplexity": {"nested-loop-join"},
    "corpus_report": {"nested-loop-join"},
    # Hybrid retrieval composes two already-adjudicated shapes: the dense
    # leg's 1-row query-vector broadcast cross (ann_topk) and BM25's
    # 1-row corpus-stats cross. The fusion full-outer join runs on two
    # <=50-row frames (Spark cannot broadcast a full outer, hence a tiny
    # sort-merge — bounded by k, not by the corpus).
    "doc_hybrid_search": {"nested-loop-join"},
    # Semantic decontamination: the benchmark embedding set (small by
    # definition) broadcast-crosses the corpus scan — the same bounded
    # probe shape as the brute-force ANN legs (ann_topk/emb_near_dup).
    "decontaminate_semantic": {"nested-loop-join"},
    # DSIR: two 1-row broadcast crosses — the global count totals into
    # the vocab-sized weight table, and the scalar score-quantile
    # threshold back onto the scored docs. Same bounded scalar-subquery
    # shape as Q11/Q22/doc_bm25.
    "pipeline_dsir": {"nested-loop-join"},
    # Curriculum schedule: the cumulative start_token prefix sum runs
    # over the per-stage aggregate — rows = the configured stage count
    # (a handful), bounded by construction rather than by a plan-visible
    # limit. A per-stage window over K stages is scale-safe.
    "pipeline_curriculum": {"unbounded-global-window"},
    # ACL audit: the pattern-match join (literal/prefixed resource names)
    # is inherently non-equi, so Spark runs a BroadcastNestedLoopJoin —
    # against the BINDINGS table, which is tiny by nature (tens to
    # thousands of rows, controller metadata in the reference). Bounded
    # build side broadcast against the request scan: scale-safe, and the
    # gate query additionally collapses requests to distinct decision
    # tuples before the join.
    "acl_authorize": {"nested-loop-join"},
    # Bulk assignment: the deterministic subscription derivation joins
    # members x topics on a modulo predicate (non-equi), with the TOPICS
    # side broadcast — partition-count metadata (25 rows here; a topic
    # catalog in production). The assignment computation itself is
    # window + equi-join, output-linear.
    "group_bulk_assignment": {"nested-loop-join"},
}


def _tree_depth(line: str) -> int:
    m = re.match(r"^((?:[:+\-| ]{3})*)", line)
    return len(m.group(1)) // 3


def window_smells(logical: str) -> list[str]:
    """Partition-less Window over unbounded input = single-partition
    global pass (WindowExec moves ALL rows to one task). Bounded = a
    GlobalLimit/TakeOrderedAndProject in the subtree (the limit-first
    two-phase top-k shape) — a window over k rows is fine at any scale.
    Detection: logical `Window [exprs], [part], [order]` prints two
    bracket groups when the partition spec is empty, three otherwise.
    With exactly two groups the second may be EITHER spec (empty arg
    lists are omitted): sort specs always carry ASC/DESC markers, so a
    marker-free second group is a partition spec (partitionBy with no
    orderBy — parallel by key, not a smell)."""
    lines = logical.splitlines()
    out = []
    for i, ln in enumerate(lines):
        m = re.search(r"(?:^|- )Window (\[.*)$", ln)
        if not m:
            continue
        ngroups = m.group(1).count("], [") + 1
        if ngroups >= 3:
            continue  # both specs present: partitioned, parallel by key
        if ngroups == 2:
            tail = m.group(1).rsplit("], [", 1)[-1]
            if not re.search(r"\b(ASC|DESC)\b", tail):
                continue  # lone spec is a partition spec: parallel by key
        # ngroups == 1 (no specs at all) or an order-only spec: the window
        # runs unpartitioned — check whether its input is bounded
        d = _tree_depth(ln)
        bounded = False
        for nxt in lines[i + 1:]:
            if _tree_depth(nxt) <= d:
                break
            # WindowGroupLimit: Spark 4's InferWindowGroupLimit turns a
            # rank()<=k filter into a per-partition top-k below the window
            # — bounded input without a visible GlobalLimit
            if (
                "GlobalLimit" in nxt
                or "TakeOrderedAndProject" in nxt
                or "WindowGroupLimit" in nxt
            ):
                bounded = True
                break
        if not bounded:
            out.append("unbounded-global-window")
    return out


def audit(name: str, df) -> list[str]:
    txt = plan_text(df)
    flags: list[str] = []
    expected = EXPECTED.get(name, set())

    def flag(kind: str):
        if kind in expected:
            flags.append(f"note:expected-{kind}")
        else:
            flags.append(f"SEVERE:{kind}")

    if "CartesianProduct" in txt:
        flag("cartesian-product")
    if "BroadcastNestedLoopJoin" in txt:
        flag("nested-loop-join")
    if "PushedFilters: []" in txt and re.search(r"\(\d+\) Filter", txt):
        # note only: some filters (UDF, post-shuffle) legitimately can't push
        flags.append("note:unpushed-filter")
    # (Codegen spans aren't visible through an unexecuted AdaptiveSparkPlan,
    # so no codegen check here — AQE hides them until the final plan.)
    n_smj = txt.count("SortMergeJoin")
    if n_smj:
        flags.append(f"note:{n_smj}-sort-merge-join")
    # Unbounded fetch must not GLOBALLY sort (a Sort with global=true
    # implies a merge of the whole scanned range). A range exchange +
    # per-task local sort is the intended shape: same single-exchange cost
    # as a hash repartition but a hot topic partition splits across tasks
    # (operators/log.py::fetch).
    if name == "log_fetch" and re.search(r"Sort \[[^\]]*\], true", txt):
        flags.append("SEVERE:fetch-global-sort")
    try:
        logical = df._jdf.queryExecution().optimizedPlan().toString()
    except Exception:
        logical = ""
    for w in window_smells(logical):
        flag(w)
    return flags


def main():
    args = sys.argv[1:]
    sf_dir = args[0] if args else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    only = set(args[1:])
    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    severe = 0
    for name in sorted(QUERIES):
        if only and name not in only:
            continue
        if name.startswith("stream_"):
            continue  # streaming plans are audited via their batch twins
        try:
            df = QUERIES[name](spark, sf_dir)
            flags = audit(name, df)
        except Exception as e:  # pragma: no cover
            print(f"ERR  {name}: {type(e).__name__}: {e}")
            severe += 1
            continue
        if any(f.startswith("SEVERE") for f in flags):
            severe += 1
        print(f"{'FLAG' if flags else 'ok  '} {name}: {', '.join(flags) or 'clean'}")
    spark.stop()
    sys.exit(1 if severe else 0)


if __name__ == "__main__":
    main()
