"""Generate sf1 fixtures (10x sf0.1) for scale validation.

The driver ships sf0.001/0.01/0.1 only; every 100-TB-scale claim in
COVERAGE.md was extrapolated from sf0.1. This tool materializes a 10x
scale-up so bench.py can carry an `sf1` block and the dedup ladder can be
oracle-checked value-for-value at 6M lineitem rows / 50k documents
(`python tools/check_oracle.py <sf1_dir> dedup_minhash dedup_cluster ...`).

Scale-up semantics (copy index k = 0..9, copy 0 byte-identical rows):
- Fact/entity keys shift by k * (max_key + 1) per entity, applied to BOTH
  sides of every FK (l_orderkey <-> o_orderkey, o_custkey <-> c_custkey,
  l_partkey/l_suppkey <-> part/supplier), so join cardinalities scale
  linearly and no query's FK semantics change.
- nation/region stay single-copy: dimensions don't scale with volume, and
  each copy's customers/suppliers reference the shared dimension — the
  realistic shape (and the broadcast-join shape) at 100 TB.
- documents: copy 0 is verbatim; copies k>0 get a per-copy seeded word
  shuffle. Shingle/minhash similarity is order-sensitive, so shuffling
  kills cross-copy near-duplicates (otherwise every doc would acquire 9
  planted twins and the pair count would grow quadratically instead of
  linearly) while identical texts WITHIN a copy shuffle identically
  (seeded by content), preserving the planted intra-copy dup structure.
- embeddings: copies roll the vector by k positions — norm-preserving,
  distribution-preserving, and decorrelated from the original, so ANN /
  semantic-dedup structure scales instead of degenerating.
- events: ids/users shift; timestamps keep the original window so event-
  time density grows 10x (the scale-up a busier topic actually produces).

Determinism: pure functions of (row, k) — rerunning yields identical
bytes-level content modulo parquet encoding.
"""

from __future__ import annotations

import os
import random
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
COPIES = 10


def _base(con, table, col):
    return con.execute(
        f"SELECT max({col}) + 1 FROM read_parquet('{SRC}/{table}.parquet')"
    ).fetchone()[0]


def make_sf1(out_dir: str) -> None:
    """10x scale-up of sf0.1 (sf1)."""
    make_scale(out_dir, COPIES)


def make_sf10(out_dir: str) -> None:
    """100x scale-up of sf0.1 (sf10): 60M lineitem rows / 500k documents —
    one measured decade beyond sf1, so spill behavior, AQE skew splits,
    and NSW shard counts are data, not extrapolation (r9 verdict item 5).
    Same FK-consistent scaling; pure function of (row, k) as for sf1."""
    make_scale(out_dir, 100)


def make_scale(out_dir: str, copies: int) -> None:
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")
    if copies > 100:
        # sf100+: an order-preserving COPY materializes the whole cross
        # join (~100 GB at copies=1000, an OOM); dropping insertion order
        # lets DuckDB stream row groups to parquet under a bounded memory
        # cap. Row order within the output changes, which nothing
        # consumes — every engine query is order-independent and both
        # engines read the same files — so sf1/sf10 keep the byte-stable
        # ordered path and only the big scale-ups stream.
        con.execute("SET preserve_insertion_order = false")
        con.execute("SET memory_limit = '24GB'")
    b_ord = _base(con, "orders", "o_orderkey")
    b_cust = _base(con, "customer", "c_custkey")
    b_supp = _base(con, "supplier", "s_suppkey")
    b_part = _base(con, "part", "p_partkey")
    b_evt = _base(con, "events", "event_id")
    b_user = _base(con, "events", "user_id")
    b_vec = _base(con, "embeddings", "vec_id")

    copies_rel = f"(SELECT unnest(range({copies})) AS k)"

    def gen(table: str, select: str) -> None:
        dst = os.path.join(out_dir, f"{table}.parquet")
        con.execute(
            f"COPY (SELECT {select} FROM read_parquet('{SRC}/{table}.parquet'),"
            f" {copies_rel}) TO '{dst}' (FORMAT PARQUET)"
        )
        print(f"  {table}: wrote {dst}")

    # dimensions that don't scale: verbatim copy
    for t in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet'))"
            f" TO '{os.path.join(out_dir, t + '.parquet')}' (FORMAT PARQUET)"
        )
        print(f"  {t}: single-copy")

    gen("customer", f"c_custkey + k*{b_cust} AS c_custkey, c_name,"
        " c_nationkey, c_acctbal, c_mktsegment")
    gen("supplier", f"s_suppkey + k*{b_supp} AS s_suppkey, s_name,"
        " s_nationkey, s_acctbal")
    gen("part", f"p_partkey + k*{b_part} AS p_partkey, p_name, p_brand,"
        " p_type, p_size, p_retailprice")
    gen("orders", f"o_orderkey + k*{b_ord} AS o_orderkey,"
        f" o_custkey + k*{b_cust} AS o_custkey, o_orderstatus,"
        " o_totalprice, o_orderdate, o_orderpriority")
    gen("lineitem", f"l_orderkey + k*{b_ord} AS l_orderkey,"
        f" l_partkey + k*{b_part} AS l_partkey,"
        f" l_suppkey + k*{b_supp} AS l_suppkey,"
        " l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,"
        " l_returnflag, l_linestatus, l_shipdate")
    gen("events", f"event_id + k*{b_evt} AS event_id, ts,"
        f" user_id + k*{b_user} AS user_id, event_type, value, props")
    # roll the vector by k mod dim: list_concat(tail, head); roll 0 is
    # identity (k mod dim, not k: at 100 copies a raw k past the 64-dim
    # length would clamp the slices and silently emit the UNROLLED vector,
    # planting cross-copy exact twins in embedding space)
    gen("embeddings", f"vec_id + k*{b_vec} AS vec_id,"
        " CASE WHEN k % len(embedding) = 0 THEN embedding ELSE"
        "   list_concat(embedding[(k % len(embedding))+1:len(embedding)],"
        "               embedding[1:(k % len(embedding))])"
        " END AS embedding, label")

    _gen_documents(out_dir, copies)
    print(f"x{copies} fixtures ready under {out_dir}")


def _gen_documents(out_dir: str, copies: int = COPIES) -> None:
    b_doc = duckdb.connect().execute(
        f"SELECT max(doc_id) + 1 FROM read_parquet('{SRC}/documents.parquet')"
    ).fetchone()[0]
    t = pq.read_table(f"{SRC}/documents.parquet")
    doc_id = t.column("doc_id").to_pylist()
    text = t.column("text").to_pylist()
    lang = t.column("lang").to_pylist()
    source = t.column("source").to_pylist()
    n_chars = t.column("n_chars").to_pylist()
    ids, txts, langs, srcs, ncs = [], [], [], [], []
    for k in range(copies):
        for i in range(len(doc_id)):
            ids.append(doc_id[i] + k * b_doc)
            if k == 0:
                txts.append(text[i])
                ncs.append(n_chars[i])
            else:
                words = text[i].split(" ")
                # content-seeded: identical texts shuffle identically
                # within a copy, keeping planted intra-copy duplicates
                rng = random.Random(f"sf1-{k}-{text[i]}")
                rng.shuffle(words)
                s = " ".join(words)
                txts.append(s)
                ncs.append(len(s))
            langs.append(lang[i])
            srcs.append(source[i])
    out = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(txts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(srcs, pa.string()),
            "n_chars": pa.array(ncs, pa.int64()),
        }
    )
    # explicit row groups (guide §6): pyarrow's default writes ONE row
    # group for 500k docs (sf10), and a Spark scan can't split inside a
    # row group — 14 nominal splits but a single task reads every row.
    # 50k rows ≈ 6 MB per group keeps the scan parallel at every scale.
    pq.write_table(
        out, os.path.join(out_dir, "documents.parquet"), row_group_size=50_000
    )
    print(f"  documents: {len(ids)} rows (copy-0 verbatim, k>0 word-shuffled)")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--copies")]
    copies = COPIES
    for a in sys.argv[1:]:
        if a.startswith("--copies="):
            copies = int(a.split("=", 1)[1])
    out = args[0] if args else os.environ.get(
        "SPARK_GRAFT_SF1_DIR", "/root/repo/.fixtures/sf1"
    )
    make_scale(out, copies)
