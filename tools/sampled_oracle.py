"""Sampled-exact oracles for the pair-expansion-bounded dedup queries.

The full DuckDB oracles for dedup_minhash / dedup_incremental /
dedup_cluster / doc_ngram_topk are Theta(sum c^2) (or a full corpus-wide
bigram aggregate), which bounds their CHECKED decade to ~sf1 even though
the engine's MEASURED decade is sf100. This tool closes that gap: the
engine runs the real catalog query at FULL scale, and a deterministic
hash-stratified sample of its output is verified EXACTLY in DuckDB —
each check is designed so restriction-to-the-sample commutes with the
query semantics:

  dedup_minhash     pair membership is pairwise (signatures are per-doc),
                    so pairs whose MIN id lands in the stratum are exactly
                    DuckDB's pairs from (stratum shingles x full shingles).
  dedup_incremental doc d survives iff NO doc a < d has jaccard >= t with
                    it; for sampled d that killer scan runs exactly
                    against the FULL corpus.
  dedup_cluster     whole CLUSTERS are sampled (by canonical id). DuckDB
                    recomputes every exact-jaccard edge incident to the
                    sampled members against the FULL corpus: any edge
                    leaving the engine's cluster refutes closure, and a
                    recursive-CTE transitive closure over the members
                    must reproduce the engine's partition + sizes.
  doc_ngram_topk    the claimed top-20 counts are recomputed exactly over
                    the full corpus, and no bigram in a hash stratum may
                    beat the 20th (count desc, bigram asc tie-break).

Usage: python tools/sampled_oracle.py [sf_dir] [check ...]
  (defaults: /root/testdata/sf0.01, all four checks)

Pass-criterion per check: exact set equality (or exact bound) — same
strictness as tools/check_oracle.py, on the sampled stratum.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from redpanda_spark.plans.queries import _INC_SPLIT, QUERIES

# Knuth multiplicative hash on the doc id — portable (plain BIGINT
# arithmetic on both sides) and uncorrelated with the sequential-id
# layout, unlike `doc_id % m` (near-dup docs often have adjacent ids).
MOD = 16
RESIDUE = 7


def _sampled(ids):
    return ((ids * 2654435761) % 4294967296) % MOD == RESIDUE


SQL_SAMPLED = f"((({{col}}) * 2654435761) % 4294967296) % {MOD} = {RESIDUE}"

# Shared shingle base: 3-gram shingles (the dedup/minhash.py convention;
# docs under 3 tokens contribute their whole text) + per-doc distinct.
SHINGLES = r"""
CREATE TEMP TABLE sh AS
SELECT doc_id AS id, unnest(list_distinct(
  list_transform(range(len(toks) - 2),
    i -> toks[i + 1] || ' ' || toks[i + 2] || ' ' || toks[i + 3]))) AS s
FROM (SELECT doc_id,
        list_filter(string_split_regex(trim(text), '\s+'), t -> t != '') AS toks
      FROM documents)
WHERE len(toks) >= 3
UNION ALL
SELECT doc_id AS id, list_aggregate(toks, 'string_agg', ' ') AS s
FROM (SELECT doc_id,
        list_filter(string_split_regex(trim(text), '\s+'), t -> t != '') AS toks
      FROM documents)
WHERE len(toks) < 3;
CREATE TEMP TABLE sizes AS SELECT id, COUNT(*) AS sz FROM sh GROUP BY id;
"""


def _ensure_shingles(con):
    if not con.execute(
        "SELECT count(*) FROM information_schema.tables "
        "WHERE table_name = 'sh'"
    ).fetchone()[0]:
        con.execute(SHINGLES)


def check_minhash(spark, con, sf_dir):
    eng = QUERIES["dedup_minhash"](spark, sf_dir).toPandas()
    eng = eng[_sampled(eng["id_a"])]
    got = {
        (int(a), int(b), round(float(j), 6))
        for a, b, j in zip(eng["id_a"], eng["id_b"], eng["jaccard"])
    }
    _ensure_shingles(con)
    want = {
        (int(a), int(b), round(float(j), 6))
        for a, b, j in con.execute(f"""
            SELECT a.id, b.id,
              ROUND(CAST(COUNT(*) AS DOUBLE)
                    / (sa.sz + sb.sz - COUNT(*)), 6) AS j
            FROM sh a JOIN sh b ON a.s = b.s AND a.id < b.id
            JOIN sizes sa ON sa.id = a.id
            JOIN sizes sb ON sb.id = b.id
            WHERE {SQL_SAMPLED.format(col='a.id')}
            GROUP BY a.id, b.id, sa.sz, sb.sz
            HAVING CAST(COUNT(*) AS DOUBLE)
                   / (sa.sz + sb.sz - COUNT(*)) >= 0.5
        """).fetchall()
    }
    assert got == want, (
        f"minhash sampled pairs differ: engine-only={got - want} "
        f"oracle-only={want - got}"
    )
    return len(got)


def check_incremental(spark, con, sf_dir):
    eng = QUERIES["dedup_incremental"](spark, sf_dir).toPandas()
    got = {int(d) for d in eng["doc_id"] if _sampled(int(d))}
    _ensure_shingles(con)
    want = {
        int(r[0])
        for r in con.execute(f"""
            WITH killed AS (
              SELECT DISTINCT d.id
              FROM sh d JOIN sh a ON a.s = d.s AND a.id < d.id
              JOIN sizes sd ON sd.id = d.id
              JOIN sizes sa ON sa.id = a.id
              WHERE d.id >= {_INC_SPLIT}
                AND {SQL_SAMPLED.format(col='d.id')}
              GROUP BY d.id, a.id, sd.sz, sa.sz
              HAVING CAST(COUNT(*) AS DOUBLE)
                     / (sd.sz + sa.sz - COUNT(*)) >= 0.5
            )
            SELECT doc_id FROM documents
            WHERE doc_id >= {_INC_SPLIT}
              AND {SQL_SAMPLED.format(col='doc_id')}
              AND doc_id NOT IN (SELECT id FROM killed)
        """).fetchall()
    }
    assert got == want, (
        f"incremental sampled survivors differ: engine-only={got - want} "
        f"oracle-only={want - got}"
    )
    return len(got)


def check_cluster(spark, con, sf_dir):
    eng = QUERIES["dedup_cluster"](spark, sf_dir).toPandas()
    sample = eng[_sampled(eng["canonical_id"])]
    members = {int(i) for i in sample["id"]}
    if not members:
        raise AssertionError("cluster sample is empty — lower MOD")
    engine_map = {
        int(i): (int(c), int(n))
        for i, c, n in zip(
            sample["id"], sample["canonical_id"], sample["cluster_size"]
        )
    }
    _ensure_shingles(con)
    con.execute("DROP TABLE IF EXISTS m_ids")
    con.execute("CREATE TEMP TABLE m_ids (id BIGINT)")
    con.executemany("INSERT INTO m_ids VALUES (?)", [(i,) for i in members])
    # every exact-jaccard edge incident to a sampled member, vs the FULL
    # corpus — closure: no edge may leave the member set
    edges = con.execute("""
        SELECT x.id AS u, y.id AS v
        FROM sh x JOIN sh y ON x.s = y.s AND x.id <> y.id
        JOIN sizes sx ON sx.id = x.id
        JOIN sizes sy ON sy.id = y.id
        WHERE x.id IN (SELECT id FROM m_ids)
        GROUP BY x.id, y.id, sx.sz, sy.sz
        HAVING CAST(COUNT(*) AS DOUBLE)
               / (sx.sz + sy.sz - COUNT(*)) >= 0.5
    """).fetchall()
    leaks = {(u, v) for u, v in edges if v not in members}
    assert not leaks, (
        f"cluster closure violated: edges leave the sampled clusters: "
        f"{sorted(leaks)[:10]}"
    )
    # transitive closure over the sampled subgraph must reproduce the
    # engine's partition (canonical = min id) and sizes
    con.execute("DROP TABLE IF EXISTS m_edges")
    con.execute("CREATE TEMP TABLE m_edges (u BIGINT, v BIGINT)")
    con.executemany("INSERT INTO m_edges VALUES (?, ?)", edges)
    comp = con.execute("""
        WITH RECURSIVE walk(u, lbl) AS (
          SELECT u, u FROM m_edges
          UNION
          SELECT e.v, w.lbl FROM walk w JOIN m_edges e ON e.u = w.u
          WHERE w.lbl < e.v
        ),
        c AS (SELECT u AS id, MIN(lbl) AS canonical_id FROM walk GROUP BY u)
        SELECT id, canonical_id, CAST(cnt AS BIGINT)
        FROM c JOIN (SELECT canonical_id, COUNT(*) AS cnt
                     FROM c GROUP BY canonical_id) USING (canonical_id)
    """).fetchall()
    oracle_map = {int(i): (int(c), int(n)) for i, c, n in comp}
    assert engine_map == oracle_map, (
        "sampled clusters differ: "
        f"engine-only={dict(set(engine_map.items()) - set(oracle_map.items()))} "
        f"oracle-only={dict(set(oracle_map.items()) - set(engine_map.items()))}"
    )
    return len(engine_map)


def check_ngram_topk(spark, con, sf_dir):
    eng = QUERIES["doc_ngram_topk"](spark, sf_dir).toPandas()
    claimed = [
        (int(r), str(b), int(c))
        for r, b, c in zip(eng["rank"], eng["bigram"], eng["cnt"])
    ]
    grams = [b for _, b, _ in claimed]
    ph = ", ".join("?" for _ in grams)
    # (a) the claimed counts, recomputed exactly over the full corpus
    exact = dict(con.execute(f"""
        WITH toks AS (
          SELECT list_filter(string_split_regex(trim(text), '\\s+'),
                             t -> t != '') AS t
          FROM documents),
        bi AS (
          SELECT t[i] || ' ' || t[i + 1] AS bigram
          FROM (SELECT t, unnest(generate_series(1, len(t) - 1)) AS i
                FROM toks WHERE len(t) >= 2))
        SELECT bigram, COUNT(*) FROM bi
        WHERE bigram IN ({ph}) GROUP BY bigram
    """, grams).fetchall())
    for rank, b, c in claimed:
        assert exact.get(b) == c, (
            f"top-{rank} bigram {b!r}: engine cnt {c} != exact {exact.get(b)}"
        )
    # claimed ordering must match the (cnt DESC, bigram ASC) contract
    resorted = sorted(claimed, key=lambda t: (-t[2], t[1]))
    assert claimed == resorted, "top-k ordering violates the tie-break"
    # (b) no bigram in the stratum beats the 20th place
    r20, b20, c20 = claimed[-1]
    best = con.execute(f"""
        WITH toks AS (
          SELECT list_filter(string_split_regex(trim(text), '\\s+'),
                             t -> t != '') AS t
          FROM documents),
        bi AS (
          SELECT t[i] || ' ' || t[i + 1] AS bigram
          FROM (SELECT t, unnest(generate_series(1, len(t) - 1)) AS i
                FROM toks WHERE len(t) >= 2))
        SELECT bigram, COUNT(*) AS cnt FROM bi
        WHERE hash(bigram) % {MOD} = {RESIDUE}
          AND bigram NOT IN ({ph})
        GROUP BY bigram ORDER BY cnt DESC, bigram LIMIT 1
    """, grams).fetchall()
    if best:
        bb, bc = best[0]
        assert bc < c20 or (bc == c20 and bb > b20), (
            f"stratum bigram {bb!r} (cnt {bc}) beats claimed 20th "
            f"{b20!r} (cnt {c20})"
        )
    return len(claimed)


CHECKS = {
    "dedup_minhash": check_minhash,
    "dedup_incremental": check_incremental,
    "dedup_cluster": check_cluster,
    "doc_ngram_topk": check_ngram_topk,
}


def main():
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:]) or set(CHECKS)
    from redpanda_spark.session import get_spark

    spark = get_spark("sampled-oracle")
    con = duckdb.connect()
    # Large-SF knobs: the shared shingle table is Theta(corpus tokens) —
    # at sf100 that exceeds RAM, so give DuckDB a spill dir and a bounded
    # memory budget (insertion order is irrelevant to set-compares).
    con.execute("SET preserve_insertion_order=false")
    if os.environ.get("SAMPLED_DUCKDB_MEM"):
        con.execute(
            f"SET memory_limit='{os.environ['SAMPLED_DUCKDB_MEM']}'"
        )
    if os.environ.get("SAMPLED_DUCKDB_TMP"):
        con.execute(
            f"SET temp_directory='{os.environ['SAMPLED_DUCKDB_TMP']}'"
        )
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    n_fail = 0
    for name, fn in CHECKS.items():
        if name not in only:
            continue
        t0 = time.time()
        try:
            n = fn(spark, con, sf_dir)
            print(f"ok   {name}: {n} sampled values exact "
                  f"[{time.time() - t0:.1f}s]")
        except AssertionError as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
    print(f"{len(only) - n_fail} ok, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
