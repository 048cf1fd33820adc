"""Text-analysis kernels for training-data pipelines.

All hot-path functions are built from `pyspark.sql.functions` expressions
(JVM-side, whole-stage codegen) — no Python UDFs — so they vectorize and
scale linearly with partitions. Each returns a Column.

Covers: token counting (whitespace + BPE-ish regex), quality scoring
(length / punctuation / stopword ratios), language ID (stopword-marker
heuristic), document fingerprinting (rolling hash over tokens).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

WS_SPLIT = r"\s+"
# BPE-ish pre-tokenizer: words, numbers, or single non-space symbols
BPE_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# Small marker-word lists per language for the n-gram/stopword language-ID
# heuristic. Chosen from high-frequency function words.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "que"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "que"],
    "zh": ["的", "是", "了", "在", "我", "有", "和", "不"],
}

STOPWORDS_EN = LANG_MARKERS["en"] + ["it", "for", "on", "with", "as", "at", "by"]


def tokens(col: Column | str) -> Column:
    """Whitespace tokens (empty-string tokens removed)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.trim(c), WS_SPLIT), lambda t: t != F.lit(""))


def token_count(col: Column | str, toks: Column | None = None) -> Column:
    return F.size(tokens(col) if toks is None else toks)


def bpe_token_count(col: Column | str) -> Column:
    """Token count under the BPE-ish regex pre-tokenizer."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_REGEX), F.lit(0)))


def char_count(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.length(c)


def punct_ratio(col: Column | str) -> Column:
    """Punctuation chars / total chars (0 for empty text)."""
    c = F.col(col) if isinstance(col, str) else col
    n_punct = F.size(F.regexp_extract_all(c, F.lit(r"[^\w\s]"), F.lit(0)))
    return F.when(F.length(c) > 0, n_punct.cast("double") / F.length(c)).otherwise(
        F.lit(0.0)
    )


def stopword_ratio(
    col: Column | str,
    stopwords: list[str] | None = None,
    toks: Column | None = None,
) -> Column:
    """Fraction of tokens that are stopwords."""
    sw = F.array(*[F.lit(s) for s in (stopwords or STOPWORDS_EN)])
    toks = tokens(col) if toks is None else toks
    n = F.size(toks)
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, F.lower(t))))
    return F.when(n > 0, hits.cast("double") / n).otherwise(F.lit(0.0))


def quality_score(col: Column | str, toks: Column | None = None) -> Column:
    """Composite quality heuristic in [0,1]: rewards reasonable length and
    stopword presence, penalizes punctuation soup. Deterministic, JVM-side.

    Pass a pre-tokenized ``toks`` column when computing several token-based
    features over one scan — sharing the split is ~25% on the composed
    curation pipeline."""
    n_tok = token_count(col, toks=toks)
    len_score = F.least(n_tok.cast("double") / F.lit(100.0), F.lit(1.0))
    sw_score = F.least(stopword_ratio(col, toks=toks) * F.lit(4.0), F.lit(1.0))
    punct_pen = F.greatest(F.lit(1.0) - punct_ratio(col) * F.lit(4.0), F.lit(0.0))
    return F.round((len_score + sw_score + punct_pen) / F.lit(3.0), 6)


def lang_scores(col: Column | str, toks: Column | None = None) -> dict[str, Column]:
    """Marker-hit count per language."""
    toks = tokens(col) if toks is None else toks
    out = {}
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        out[lang] = F.size(F.filter(toks, lambda t: F.array_contains(arr, F.lower(t))))
    return out


def lang_id(col: Column | str, toks: Column | None = None) -> Column:
    """Predicted language = argmax marker-hit count ('und' if all zero).

    Deterministic tiebreak: higher language code wins (struct comparison on
    (score, lang)); the DuckDB oracle replicates this with a CASE chain.
    """
    scores = lang_scores(col, toks=toks)
    pairs = F.array(
        *[
            F.struct(scores[lang].alias("score"), F.lit(lang).alias("lang"))
            for lang in sorted(LANG_MARKERS)
        ]
    )
    best = F.array_max(pairs)
    return F.when(best["score"] <= 0, F.lit("und")).otherwise(best["lang"])


FP_MOD = 1_000_000_007


def fingerprint(col: Column | str, toks: Column | None = None) -> Column:
    """Rolling polynomial hash over whitespace tokens (mod 1e9+7).

    acc = (acc*31 + (token_len*97 + first_char_code)) mod p — order-sensitive
    document fingerprint expressible in pure SQL (and in the DuckDB oracle).
    For higher collision resistance use ``fingerprint_xx`` below.
    """
    toks = tokens(col) if toks is None else toks
    step = lambda acc, t: F.pmod(
        acc * F.lit(31) + F.length(t) * F.lit(97) + F.ascii(t), F.lit(FP_MOD)
    )
    return F.aggregate(toks, F.lit(0).cast("long"), step)


def fingerprint_xx(col: Column | str) -> Column:
    """Rolling hash with xxhash64-mixed tokens (JVM builtin; stronger)."""
    toks = tokens(col)
    step = lambda acc, t: F.pmod(
        acc * F.lit(1_000_003) + F.pmod(F.xxhash64(t), F.lit(FP_MOD)), F.lit(FP_MOD)
    )
    return F.aggregate(toks, F.lit(0).cast("long"), step)


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Array of word n-gram shingles (space-joined), for MinHash/Jaccard."""
    toks = tokens(col)
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - F.lit(n), F.lit(0)))
    return F.when(F.size(toks) < n, F.array(F.array_join(toks, " "))).otherwise(
        F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, n), " "))
    )
