"""Generate a dataset datasheet (markdown) for a documents corpus.

Runs the catalog's corpus statistics queries — the one-row report,
per-source perplexity spread, language/quality distribution, duplicate
rates — and renders the "datasheet for datasets" style summary that
released corpora publish.

Usage: python tools/datasheet.py [sf_dir] [out.md]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from redpanda_spark.plans.queries import QUERIES
from redpanda_spark.session import get_spark


def render(sf_dir: str) -> str:
    spark = get_spark("datasheet")
    spark.sparkContext.setLogLevel("ERROR")
    rep = QUERIES["corpus_report"](spark, sf_dir).collect()[0]
    ppl = QUERIES["doc_perplexity"](spark, sf_dir).collect()
    cur = QUERIES["curation_dedup"](spark, sf_dir).collect()
    lines = [
        "# Dataset datasheet",
        "",
        f"Source: `{sf_dir}` (documents table)",
        "",
        "## Corpus",
        "",
        "| metric | value |",
        "|---|---|",
        f"| documents | {rep['n_docs']:,} |",
        f"| tokens (whitespace) | {rep['n_tokens']:,} |",
        f"| languages detected | {rep['n_langs']} |",
        f"| sources | {rep['n_sources']} |",
        f"| mean quality score | {rep['avg_quality']} |",
        f"| exact duplicate rate | {rep['exact_dup_rate']:.2%} |",
        f"| chars per doc (min-max) | {rep['min_chars']}-{rep['max_chars']} |",
        "",
        "## Near-duplicate clusters (MinHash-LSH, keep-one policy)",
        "",
        "| source | docs | kept | kept tokens |",
        "|---|---|---|---|",
    ]
    for r in cur:
        lines.append(
            f"| {r['source']} | {r['n_docs']:,} | {r['n_kept']:,} "
            f"| {r['kept_tokens']:,} |"
        )
    lines += [
        "",
        "## Language-model fit (bigram cross-entropy, lower = cleaner)",
        "",
        "| source | docs | avg | min | max |",
        "|---|---|---|---|---|",
    ]
    for r in ppl:
        lines.append(
            f"| {r['source']} | {r['n_docs']:,} | {r['avg_ce']} "
            f"| {r['min_ce']} | {r['max_ce']} |"
        )
    lines.append("")
    return "\n".join(lines)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    md = render(sf_dir)
    if len(sys.argv) > 2:
        with open(sys.argv[2], "w") as f:
            f.write(md)
        print(f"wrote {sys.argv[2]}")
    else:
        print(md)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
