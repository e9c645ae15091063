"""Unit tests for the Gopher repetition signals and the C4-style
cross-document boilerplate n-gram detector (operators/dedup.py).

Hand-computed expectations on tiny literal corpora; oracle-parity at sf
scale is covered by tools/parity_check.py via the registered queries
``repetition_stats`` / ``boilerplate_ngrams``.
"""

from __future__ import annotations

import pytest

from image_deduplication_3m_images_spark.operators.dedup import (
    boilerplate_ngrams,
    repetition_stats,
)


def _rows(df):
    return {r["doc_id"]: r.asDict() for r in df.collect()}


def test_repetition_stats_hand_computed(spark):
    docs = spark.createDataFrame(
        [
            (1, "a a b"),          # 3 toks, 2 distinct; bigrams: "a a", "a b"
            (2, "x"),              # 1 tok -> no bigrams
            (3, ""),               # split("") -> [""] filtered -> 0 toks
            (4, "w w w w"),        # all same; bigram "w w" x3
            (5, "a  b"),           # double space -> empty token filtered
        ],
        ["doc_id", "text"],
    )
    got = _rows(repetition_stats(docs))

    assert got[1]["n_tokens"] == 3 and got[1]["n_distinct"] == 2
    assert got[1]["n_bigrams"] == 2 and got[1]["top_bigram_count"] == 1
    assert got[1]["dup_token_frac"] == pytest.approx(1 / 3)
    assert got[1]["top_bigram_frac"] == pytest.approx(0.5)

    assert got[2]["n_tokens"] == 1 and got[2]["n_bigrams"] == 0
    assert got[2]["dup_token_frac"] == 0.0 and got[2]["top_bigram_frac"] == 0.0

    assert got[3]["n_tokens"] == 0 and got[3]["dup_token_frac"] == 0.0

    assert got[4]["n_tokens"] == 4 and got[4]["n_distinct"] == 1
    assert got[4]["n_bigrams"] == 3 and got[4]["top_bigram_count"] == 3
    assert got[4]["dup_token_frac"] == pytest.approx(0.75)
    assert got[4]["top_bigram_frac"] == pytest.approx(1.0)

    # empty tokens from repeated separators never form bigrams
    assert got[5]["n_tokens"] == 2 and got[5]["n_bigrams"] == 1


def test_repetition_stats_row_preserving(spark):
    docs = spark.createDataFrame(
        [(i, "tok " * (i % 4)) for i in range(40)], ["doc_id", "text"]
    )
    out = repetition_stats(docs)
    assert out.count() == 40  # left join: docs without bigrams still emitted


def test_boilerplate_ngrams_threshold_and_counts(spark):
    footer = "all rights reserved by example corp"   # 6 toks -> 2 x 5-grams
    docs = spark.createDataFrame(
        [
            (1, "unique one text here now " + footer),
            (2, "other words entirely different here " + footer),
            (3, footer),
            (4, "seen twice only in this doc pair"),
            (5, "seen twice only in this doc pair"),
        ],
        ["doc_id", "text"],
    )
    got = {r["ngram"]: r for r in boilerplate_ngrams(docs, min_docs=3).collect()}
    # both 5-grams of the footer appear in docs 1,2,3; nothing else reaches 3 docs
    assert set(got) == {
        "all rights reserved by example",
        "rights reserved by example corp",
    }
    for r in got.values():
        assert r["n_docs"] == 3 and r["n_occurrences"] == 3


def test_boilerplate_ngrams_occurrences_count_repeats_within_doc(spark):
    gram = "a b c d e"
    docs = spark.createDataFrame(
        [
            (1, gram + " " + gram),  # the 5-gram occurs at offsets 0 and 6 (and straddles)
            (2, gram),
            (3, gram),
        ],
        ["doc_id", "text"],
    )
    got = {r["ngram"]: r for r in boilerplate_ngrams(docs, min_docs=3).collect()}
    r = got[gram]
    assert r["n_docs"] == 3
    assert r["n_occurrences"] == 4  # two in doc 1, one each in docs 2 and 3
