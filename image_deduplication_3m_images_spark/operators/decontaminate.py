"""Benchmark decontamination — flag training docs sharing word n-grams with
an evaluation set (the GPT-3 appendix-C / PaLM-style contamination check).

Scale shape: the eval set is small and fixed (benchmarks), the corpus is
100 TB.  So the eval side is reduced to ONE row holding its distinct-gram
array and broadcast; the corpus side is a PURE MAP — each doc builds its
distinct gram array in-expression (no explode), intersects it with the
broadcast array, and emits a count.  Zero corpus shuffles, zero UDFs; the
whole check rides inside the scan's codegen stage.

Reference analog: none (image pipeline); target-side LLM-data-pipeline
extension (SURVEY.md §2.8).  The n-gram formula is shared verbatim with
``boilerplate_ngrams`` (operators/dedup.py) and both DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_ngrams_expr(text_col, n: int):
    """Distinct word ``n``-grams of a text column as ONE array expression —
    empty array (not null, not a negative-range artifact) for docs shorter
    than ``n`` tokens."""
    toks = F.filter(F.split(text_col, " "), lambda t: t != F.lit(""))
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    return F.array_distinct(
        F.when(F.size(toks) >= n, grams).otherwise(
            F.expr("CAST(array() AS array<string>)")
        )
    )


def contamination_flags(
    corpus: DataFrame,
    eval_df: DataFrame,
    n: int = 5,
    min_hits: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(corpus, eval set) -> (id, n_hits, is_contaminated) for every corpus
    doc.  ``n_hits`` counts DISTINCT eval n-grams the doc contains;
    ``is_contaminated`` is ``n_hits >= min_hits``.

    The eval gram set must be broadcast-sized (real benchmarks are ~10^5-10^6
    grams); the corpus may be arbitrarily large — it is never shuffled.
    """
    eval_grams = (
        eval_df.select(
            F.explode(word_ngrams_expr(F.col(text_col), n)).alias("g")
        )
        .agg(F.collect_set("g").alias("eval_grams"))
    )
    return (
        corpus.select(
            id_col, word_ngrams_expr(F.col(text_col), n).alias("_grams")
        )
        .crossJoin(F.broadcast(eval_grams))
        .select(
            id_col,
            F.size(F.array_intersect("_grams", "eval_grams")).alias("n_hits"),
            (
                F.size(F.array_intersect("_grams", "eval_grams"))
                >= F.lit(min_hits)
            ).alias("is_contaminated"),
        )
    )
