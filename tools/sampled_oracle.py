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

Usage: python tools/sampled_oracle.py [sf_dir] [check ...] [--numpy] [--mod N]
  (defaults: /root/testdata/sf0.01, all four checks, DuckDB backend)

Pass-criterion per check: exact set equality (or exact bound) — same
strictness as tools/check_oracle.py, on the sampled stratum.

Backends. The DuckDB backend joins shingle postings (sh x sh), whose
intermediate is Theta(sum over shingles of c_sampled*c_full) — on this
synthetic corpus the shingle vocabulary is tiny (~30k distinct at any
SF) and every posting list is huge, so the join intermediate grows
quadratically in SF and dies around sf100 (r11: 51 GB spill / 55-min
compute). The --numpy backend computes the SAME exact math by inverted-
index counting: DuckDB still builds the shared shingle table (the one
tokenization convention), numpy turns it into postings arrays, and each
sampled doc's exact intersection counts against the FULL corpus come
from one concatenate+unique over its own postings — O(sum of the
sampled docs' posting lists) total, no pair materialization. Both
backends are CI-pinned to agree with the engine at sf0.01
(tests/test_sampled_oracle.py), which also cross-validates them against
each other; --numpy is the scale path (sf100 in minutes).

--mod N widens/narrows the stratum (default 16). At sf100 the checked
stratum uses --mod 256 for minhash/incremental (posting lists are ~10x
sf10's, so 1/256 of docs keeps the scan in minutes while still checking
~20k docs exactly); cluster keeps --mod 16 (its cost is per MEMBER of
the sampled clusters — tiny at any SF with the numpy backend).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np

from redpanda_spark.plans.queries import _INC_SPLIT, QUERIES

# Knuth multiplicative hash on the doc id — portable (plain BIGINT
# arithmetic on both sides) and uncorrelated with the sequential-id
# layout, unlike `doc_id % m` (near-dup docs often have adjacent ids).
MOD = 16
RESIDUE = 7


def _sampled(ids):
    return ((ids * 2654435761) % 4294967296) % MOD == RESIDUE


def _sql_sampled(col: str) -> str:
    return f"((({col}) * 2654435761) % 4294967296) % {MOD} = {RESIDUE}"


class _FmtSampled:
    """Keeps the historical `SQL_SAMPLED.format(col=...)` call sites while
    MOD stays runtime-adjustable (--mod)."""

    def format(self, col: str) -> str:
        return _sql_sampled(col)


SQL_SAMPLED = _FmtSampled()

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


# -- numpy postings backend (the scale path) --------------------------------

# LSH S-curve adjudication. dedup_minhash/incremental/cluster generate
# candidates with banded MinHash-LSH (32 hashes, bands=pick_bands(32,0.5)
# => 8 bands x 4 rows) and exact-verify every candidate, so they can have
# FALSE NEGATIVES only, and only with the S-curve's miss probability
# (1-j^r)^b — near 0 for strong pairs, material right at the threshold.
# Below sf100 every real pair on this corpus is a high-jaccard planted
# dup and the engine's output equals the exact oracle outright (asserted
# at sf0.01/0.1/1/10). sf100 is the first scale with BORDERLINE pairs
# (chance cross-copy overlaps at j 0.5-0.6, found by this oracle in r12),
# where exact recall is not a property banded LSH has at any bounded
# cost. The scale checks therefore verify the three invariants a correct
# LSH implementation actually guarantees:
#   1. PRECISION, exactly: every engine pair/kill is a true >=t pair
#      (engine - oracle must be empty for pairs; a survivor the oracle
#      keeps must never be dropped by the engine).
#   2. RECALL in the certain region, exactly: every oracle pair with
#      j >= J_CERTAIN (miss probability <= 1e-4 per pair) must be found.
#   3. Boundary misses consistent with theory: each miss must lie in
#      [t, J_CERTAIN) and carry a non-negligible S-curve miss
#      probability; every miss is PRINTED with its jaccard and miss
#      probability so the record shows exactly what was not found.
# Any systematic regression (a missed strong pair, a false positive, a
# false drop) still fails loudly; at <= sf10 the boundary region is
# empty on this corpus, so these checks degrade to the old exact
# equality there (CI-pinned at sf0.01).

_LSH_HASHES = 32
_LSH_THRESHOLD = 0.5


def _lsh_params() -> tuple[int, int]:
    from redpanda_spark.dedup.minhash import pick_bands

    bands = pick_bands(_LSH_HASHES, _LSH_THRESHOLD)
    return bands, _LSH_HASHES // bands


def _miss_probability(j: float) -> float:
    bands, rows = _lsh_params()
    return (1.0 - j**rows) ** bands


def _j_certain(eps: float = 1e-4) -> float:
    """Smallest jaccard whose per-pair miss probability is <= eps."""
    bands, rows = _lsh_params()
    return (1.0 - eps ** (1.0 / bands)) ** (1.0 / rows)


_MISS_PROB_FLOOR = 1e-4  # a "boundary" miss must be at least this likely


def _adjudicate_misses(kind: str, missed: list[tuple], n_found: int) -> None:
    """missed: [(what, jaccard, miss_probability), ...] — every engine
    miss, with the probability LSH theory assigns to exactly that miss
    (the S-curve term for a pair; the product over all killers for a
    surviving doc). Fails unless each miss is a genuine boundary event;
    prints the full miss list either way (the record must show what was
    missed)."""
    jc = _j_certain()
    for what, j, prob in sorted(missed):
        print(
            f"# {kind}: boundary miss {what} j={j:.6f} "
            f"miss_prob={prob:.4f}",
            file=sys.stderr,
        )
    bad = [
        (what, j, prob)
        for what, j, prob in missed
        if j >= jc or prob < _MISS_PROB_FLOOR
    ]
    assert not bad, (
        f"{kind}: misses outside the S-curve boundary region "
        f"(j_certain={jc:.3f}): {bad} — a real recall regression, not "
        "LSH probability"
    )
    # a flood of boundary misses is a regression even if each is
    # individually plausible: bound by the worst-case boundary miss rate
    assert len(missed) <= max(5, (n_found + len(missed)) // 2), (
        f"{kind}: {len(missed)} misses vs {n_found} found — "
        "beyond any plausible S-curve miss rate"
    )


class _PostingsIndex:
    """Exact inverted index over the SAME shared shingle table the DuckDB
    checks use (one tokenization convention, two executors). Holds, per
    shingle code, the sorted doc-id posting list; per doc, its shingle
    codes; and every doc's distinct-shingle count. `partners(d)` returns
    the EXACT jaccard of d against every corpus doc sharing >= 1 shingle
    — one concatenate + unique over d's posting lists, never a pair
    join."""

    def __init__(self, con):
        _ensure_shingles(con)
        con.execute(
            "CREATE TEMP TABLE IF NOT EXISTS shdict AS "
            "SELECT s, row_number() OVER () - 1 AS code "
            "FROM (SELECT DISTINCT s FROM sh)"
        )
        tbl = con.execute(
            "SELECT sh.id AS id, d.code AS code FROM sh JOIN shdict d USING (s)"
        ).arrow()
        ids = tbl["id"].to_numpy().astype(np.int64)
        codes = tbl["code"].to_numpy().astype(np.int64)
        self.n_docs_slot = int(ids.max()) + 1
        # doc sizes (distinct shingles per doc — sh is per-doc distinct)
        self.sizes = np.bincount(ids, minlength=self.n_docs_slot)
        # postings: ids sorted by code
        order = np.argsort(codes, kind="stable")
        self.post_ids = ids[order]
        post_codes = codes[order]
        n_codes = int(codes.max()) + 1
        counts = np.bincount(post_codes, minlength=n_codes)
        self.post_off = np.concatenate(([0], np.cumsum(counts)))
        # doc -> its shingle codes
        order = np.argsort(ids, kind="stable")
        self.doc_codes = codes[order]
        doc_counts = np.bincount(ids[order], minlength=self.n_docs_slot)
        self.doc_off = np.concatenate(([0], np.cumsum(doc_counts)))

    def partners(self, d: int):
        """(partner_ids, jaccard) for every doc sharing >= 1 shingle with
        d, exact, d itself excluded."""
        if d + 1 >= len(self.doc_off):  # doc id beyond the shingled range
            return np.empty(0, np.int64), np.empty(0, np.float64)
        cs = self.doc_codes[self.doc_off[d] : self.doc_off[d + 1]]
        if not len(cs):
            return np.empty(0, np.int64), np.empty(0, np.float64)
        cand = np.concatenate(
            [self.post_ids[self.post_off[c] : self.post_off[c + 1]] for c in cs]
        )
        uniq, inter = np.unique(cand, return_counts=True)
        keep = uniq != d
        uniq, inter = uniq[keep], inter[keep]
        union = self.sizes[uniq] + len(cs) - inter
        return uniq, inter / union


_IDX_CACHE: dict[int, _PostingsIndex] = {}


def _index(con) -> _PostingsIndex:
    key = id(con)
    if key not in _IDX_CACHE:
        t0 = time.time()
        _IDX_CACHE[key] = _PostingsIndex(con)
        print(f"# postings index built in {time.time() - t0:.1f}s",
              file=sys.stderr)
    return _IDX_CACHE[key]


def _doc_ids(con) -> np.ndarray:
    """All corpus doc ids (from the documents table, not the shingle
    index — a zero-shingle doc still exists, can never be killed, and
    must count as a survivor exactly as in the SQL oracle)."""
    return np.array(
        [r[0] for r in con.execute("SELECT doc_id FROM documents").fetchall()],
        dtype=np.int64,
    )


def check_minhash_np(spark, con, sf_dir):
    """Same stratum + commuting argument as check_minhash (pair
    membership is pairwise, restriction on the MIN id commutes); the
    exact-jaccard pair set comes from the postings index. PRECISION and
    certain-region recall are exact; boundary misses are adjudicated
    against the S-curve (see the adjudication note above)."""
    eng = QUERIES["dedup_minhash"](spark, sf_dir).toPandas()
    eng = eng[_sampled(eng["id_a"])]
    got = {
        (int(a), int(b), round(float(j), 6))
        for a, b, j in zip(eng["id_a"], eng["id_b"], eng["jaccard"])
    }
    idx = _index(con)
    doc_ids = _doc_ids(con)
    sample = doc_ids[_sampled(doc_ids)]
    want = set()
    for a in sample:
        ids, j = idx.partners(int(a))
        hit = (ids > a) & (j >= 0.5)
        for b, jj in zip(ids[hit], j[hit]):
            want.add((int(a), int(b), round(float(jj), 6)))
    false_pos = got - want
    assert not false_pos, (
        f"minhash FALSE POSITIVES (precision break): {false_pos}"
    )
    _adjudicate_misses(
        "dedup_minhash",
        [((a, b), j, _miss_probability(j)) for a, b, j in want - got],
        len(got),
    )
    return len(got)


def check_incremental_np(spark, con, sf_dir):
    """Same stratum + commuting argument as check_incremental (for each
    sampled d the killer scan runs against the FULL corpus)."""
    eng = QUERIES["dedup_incremental"](spark, sf_dir).toPandas()
    got = {int(d) for d in eng["doc_id"] if _sampled(int(d))}
    idx = _index(con)
    doc_ids = _doc_ids(con)
    sample = doc_ids[(doc_ids >= _INC_SPLIT) & _sampled(doc_ids)]
    want = set()
    killer_j: dict[int, np.ndarray] = {}
    for d in sample:
        ids, j = idx.partners(int(d))
        kill = (ids < d) & (j >= 0.5)
        if not np.any(kill):
            want.add(int(d))
        else:
            killer_j[int(d)] = j[kill]
    false_drops = want - got
    assert not false_drops, (
        f"incremental FALSE DROPS (precision break — the engine killed "
        f"docs with no true >=0.5 killer): {false_drops}"
    )
    # an engine-only survivor means EVERY one of its true killers was an
    # LSH miss: the event's probability is the product of the per-killer
    # S-curve terms
    missed = []
    for d in got - want:
        js = killer_j[d]
        prob = float(np.prod([_miss_probability(float(x)) for x in js]))
        missed.append((d, float(js.max()), prob))
    _adjudicate_misses("dedup_incremental", missed, len(got & want))
    return len(got)


def _union_find(members, edges):
    parent = {u: u for u in members}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return {u: find(u) for u in members}


def check_cluster_np(spark, con, sf_dir):
    """Same stratum + closure argument as check_cluster, with the edge
    set split by the S-curve: every exact-jaccard edge incident to a
    member of a sampled cluster is recomputed against the FULL corpus.
    The engine partition must be SANDWICHED between the closure of the
    certain edges (j >= J_CERTAIN: the engine must have merged these —
    a certain edge crossing engine clusters, or leaving the member set,
    is a hard failure) and the closure of ALL true edges (the engine
    must never merge what the oracle doesn't connect). Boundary edges
    the engine didn't realize are adjudicated and printed. Canonical
    (min member) and sizes are checked within every engine cluster.
    At <= sf10 no boundary edges exist, so this is the old exact
    partition equality."""
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
    # internal consistency: canonical = min member, size = member count
    by_can: dict[int, list[int]] = {}
    for i, (c, n) in engine_map.items():
        by_can.setdefault(c, []).append(i)
    for c, us in by_can.items():
        assert c == min(us), f"canonical {c} is not the min of {sorted(us)}"
        sizes = {engine_map[u][1] for u in us}
        assert sizes == {len(us)}, (
            f"cluster {c}: size field {sizes} != member count {len(us)}"
        )
    jc = _j_certain()
    idx = _index(con)
    all_edges, certain_edges, boundary_miss = [], [], []
    for u in sorted(members):
        ids, j = idx.partners(u)
        hit = j >= 0.5
        for v, jj in zip(ids[hit], j[hit]):
            v, jj = int(v), float(jj)
            if v not in members:
                # an edge leaving the sampled clusters: certain => the
                # engine failed closure outright; boundary => a missed
                # merge with an unsampled cluster, adjudicated below
                assert jj < jc, (
                    f"cluster closure violated by a CERTAIN edge "
                    f"({u}, {v}, j={jj:.6f})"
                )
                boundary_miss.append(
                    ((u, v), jj, _miss_probability(jj))
                )
                continue
            all_edges.append((u, v, jj))
            if jj >= jc:
                certain_edges.append((u, v))
    root_all = _union_find(members, [(u, v) for u, v, _ in all_edges])
    root_cert = _union_find(members, certain_edges)
    for u in members:
        cu = engine_map[u][0]
        # lower bound: certain edges must all be realized
        assert engine_map[root_cert[u]][0] == cu, (
            f"certain edge chain {u}~{root_cert[u]} crosses engine "
            f"clusters {engine_map[root_cert[u]][0]} vs {cu}"
        )
        # upper bound: the engine may never merge beyond the true edges
        assert root_all[u] == root_all[cu], (
            f"engine merged {u} into {cu} with no true edge path"
        )
    # engine clusters that split a true component = missed boundary edges
    for u, v, jj in all_edges:
        if u < v and engine_map[u][0] != engine_map[v][0]:
            boundary_miss.append(((u, v), jj, _miss_probability(jj)))
    _adjudicate_misses("dedup_cluster", boundary_miss, len(engine_map))
    return len(engine_map)


CHECKS = {
    "dedup_minhash": check_minhash,
    "dedup_incremental": check_incremental,
    "dedup_cluster": check_cluster,
    "doc_ngram_topk": check_ngram_topk,
}

NP_CHECKS = {
    "dedup_minhash": check_minhash_np,
    "dedup_incremental": check_incremental_np,
    "dedup_cluster": check_cluster_np,
    "doc_ngram_topk": check_ngram_topk,  # linear oracle: DuckDB fine at sf100
}


def main():
    args = sys.argv[1:]
    use_np = "--numpy" in args
    if use_np:
        args.remove("--numpy")
    if "--mod" in args:
        i = args.index("--mod")
        globals()["MOD"] = int(args[i + 1])
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    checks = NP_CHECKS if use_np else CHECKS
    only = set(args[1:]) or set(checks)
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
    for name, fn in checks.items():
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
