"""Distributed BPE tokenizer training (Sennrich et al. 2016, arXiv:1508.07909).

The published trick makes corpus-scale training tractable: BPE merges
operate on the WORD-FREQUENCY table, not the corpus. One pass over the
documents builds (word, freq) — at 100 TB that is the only corpus-sized
shuffle, and it is a map-side-combinable count. Every merge iteration then
runs on the vocabulary table (millions of rows, not billions):

  1. explode each word's symbol array into adjacent pairs, weighted by
     the word's corpus frequency — one shuffle on the pair key, partial
     aggregation collapses the hot pairs map-side;
  2. take the argmax pair (ties broken lexicographically) — a 1-row
     driver collect, the only driver-side state (the merge table itself,
     `n_merges` rows);
  3. apply the merge to every word's symbol array with a pure-JVM
     `aggregate` fold (no UDF): rebuild the array joining adjacent
     (a, b) into ab.

Iteration count = n_merges (a hyperparameter, typically 10k-100k); each
iteration is one aggregation over the vocab table. Lineage is truncated
per iteration with localCheckpoint, same as dedup/cluster.py.

Encoding with a trained merge list is a narrow per-row fold (apply merges
in rank order) — provided here for completeness; production serving would
bake the merges into a broadcast map.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_WS = r"\s+"


def word_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over the corpus — the single corpus-sized pass."""
    from redpanda_spark.sources.tables import parallelize_narrow

    # the token explode + count is the corpus-sized pass; spread 1-2
    # input splits over the cores first (no-op at scale)
    docs = parallelize_narrow(docs)
    w = F.explode(
        F.filter(F.split(F.trim(F.col(text_col)), _WS), lambda t: t != "")
    ).alias("word")
    return docs.select(w).groupBy("word").agg(F.count(F.lit(1)).alias("freq"))


def _init_symbols(vocab: DataFrame) -> DataFrame:
    """Split each word into single-character symbols with an end-of-word
    marker on the last (the classic formulation, so merges can distinguish
    word-final units)."""
    chars = F.split(F.col("word"), "")
    sym = F.transform(
        chars,
        lambda c, i: F.when(i == F.size(chars) - 1, F.concat(c, F.lit("</w>"))).otherwise(c),
    )
    return vocab.select("word", "freq", sym.alias("sym"))


def pair_counts(sym: DataFrame) -> DataFrame:
    """Frequency-weighted adjacent-pair counts over the symbol table."""
    pairs = F.expr("transform(slice(sym, 1, size(sym) - 1), (s, i) -> struct(s AS a, sym[i + 1] AS b))")
    ex = sym.where(F.size("sym") >= 2).select(
        "freq", F.explode(pairs).alias("p")
    )
    return (
        ex.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("freq").alias("cnt"))
    )


def merge_fold_expr(sym_expr, a: str, b: str):
    """THE merge fold (shared by training apply and encoding): rebuild a
    symbol array with adjacent (a, b) joined into ab — greedy
    left-to-right, as a JVM `aggregate` expression, no Python on the
    path."""
    la, lb = F.lit(a), F.lit(b)

    def fold(acc, s):
        return F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == la)
            & (s == lb),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.concat(la, lb))),
        ).otherwise(F.concat(acc, F.array(s)))

    return F.aggregate(sym_expr, F.array().cast("array<string>"), fold)


def _apply_merge(sym: DataFrame, a: str, b: str) -> DataFrame:
    return sym.withColumn("sym", merge_fold_expr(F.col("sym"), a, b))


def train_bpe(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_freq: int = 1,
) -> list[tuple[str, str, int]]:
    """Learn `n_merges` merge rules; returns [(a, b, weighted_count), ...]
    in learned order. Deterministic: argmax ties break on (a, b)
    lexicographically."""
    sym = _init_symbols(word_freqs(docs, text_col)).localCheckpoint(eager=True)
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        top = (
            pair_counts(sym)
            .where(F.col("cnt") >= min_freq)
            .orderBy(F.col("cnt").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, cnt = top[0]["a"], top[0]["b"], int(top[0]["cnt"])
        merges.append((a, b, cnt))
        sym = _apply_merge(sym, a, b).localCheckpoint(eager=True)
    return merges


def encode_bpe(
    df: DataFrame,
    merges: list[tuple[str, str, int]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Apply a trained merge list to text: per-word symbol fold through the
    merges in rank order; emits the token count per row (the serving-side
    statistic). All-JVM narrow expressions — at scale the merge list is a
    few-kB literal baked into the plan."""
    words = F.filter(F.split(F.trim(F.col(text_col)), _WS), lambda t: t != "")
    chars_of = lambda w: F.split(w, "")  # noqa: E731
    sym_of = lambda w: F.transform(  # noqa: E731
        chars_of(w),
        lambda c, i: F.when(
            i == F.size(chars_of(w)) - 1, F.concat(c, F.lit("</w>"))
        ).otherwise(c),
    )

    def fold_merges(sym_expr):
        cur = sym_expr
        for a, b, _ in merges:
            cur = merge_fold_expr(cur, a, b)
        return cur

    n_tokens = F.aggregate(
        F.transform(words, lambda w: F.size(fold_merges(sym_of(w)))),
        F.lit(0),
        lambda acc, n: acc + n,
    )
    return df.withColumn(out_col, n_tokens)
