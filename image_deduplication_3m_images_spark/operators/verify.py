"""Pairwise verification of LSH candidate pairs.

Reference analog: the filter-refine stages 2-4 — color verification, global
cosine refinement, local-descriptor ratio test
(``/root/reference/modules/deduplication.py:1207-1283,1460-1532``).  Webtext
mapping (SURVEY.md §2.3):

  * J3 MinHash Jaccard estimate  <- wavelet similarity (mean equal positions)
  * J4 SimHash Hamming distance  <- global-embedding cosine
  * J7 exact-substring containment <- local keypoint verification

J3/J4 are pure codegen'd column expressions over the joined signatures; J7 is
the single place both texts are needed — built-in ``contains`` on the joined
texts (JVM fast path) or an Arrow-batched ``mapInPandas`` variant for very
long documents (the "suffix-array" slot; CPython's Boyer-Moore-ish ``in`` is
the per-batch kernel).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from image_deduplication_3m_images_spark.config import DedupConfig


def join_signatures(
    pairs: DataFrame, sig_df: DataFrame, id_col: str = "doc_id", cols=("minhash", "simhash")
) -> DataFrame:
    """Attach both sides' signatures to (id_a, id_b) pairs.

    Two equi-joins on the id; at scale the signatures table is bucketed by id
    so these become shuffle-free bucketed joins (SURVEY.md §4.2 stage 4).
    """
    a = sig_df.select(
        F.col(id_col).alias("id_a"), *[F.col(c).alias(f"{c}_a") for c in cols]
    )
    b = sig_df.select(
        F.col(id_col).alias("id_b"), *[F.col(c).alias(f"{c}_b") for c in cols]
    )
    return pairs.join(a, "id_a").join(b, "id_b")


def sig_matches_expr(mh_a, mh_b):
    """Number of equal MinHash positions (int) — integer-exact, so the oracle
    comparison never hits float drift.  jaccard_est = matches / num_perm.
    """
    return F.aggregate(
        F.zip_with(mh_a, mh_b, lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, x: acc + x,
    )


def hamming_expr(sh_a, sh_b):
    return F.bit_count(sh_a.bitwiseXOR(sh_b))


def verify_pairs(
    pairs: DataFrame,
    sig_df: DataFrame,
    cfg: DedupConfig,
    id_col: str = "doc_id",
    texts_df: DataFrame | None = None,
    text_col: str = "text",
    use_arrow_containment: bool = False,
) -> DataFrame:
    """candidate pairs -> verified pairs with evidence columns.

    verdict: ``verified = (jaccard_est >= t AND hamming <= h) OR containment``
    — containment rescues true dups whose extra boilerplate dilutes Jaccard
    (FIXTURES.md containment pairs), mirroring how the reference's local-
    feature stage rescued crops/edits that global cosine rejected.
    """
    joined = join_signatures(pairs, sig_df, id_col)
    matches = sig_matches_expr(F.col("minhash_a"), F.col("minhash_b"))
    out = joined.select(
        "id_a",
        "id_b",
        matches.alias("sig_matches"),
        hamming_expr(F.col("simhash_a"), F.col("simhash_b")).alias("hamming"),
    )
    # OR-of-evidence verdict: MinHash Jaccard is the primary test; a tight
    # SimHash Hamming radius rescues near-identical docs whose MinHash was
    # unlucky; containment rescues boilerplate-wrapped/contained true dups.
    # (The reference's conjunctive stage cascade over-filters light edits —
    # its stage-2 color pass rejecting true dups was a documented bug class,
    # /root/reference/MEMORY_FIXES_SUMMARY.md.)
    min_matches = math.ceil(cfg.jaccard_threshold * cfg.num_perm)  # 0.8*128 -> 103
    sim_ok = (F.col("sig_matches") >= F.lit(min_matches)) | (
        F.col("hamming") <= F.lit(cfg.hamming_max)
    )
    if texts_df is None:
        return out.withColumn("containment", F.lit(False)).withColumn(
            "verified", sim_ok
        )

    out = with_containment(out, texts_df, id_col, text_col, use_arrow_containment)
    return out.withColumn("verified", sim_ok | F.col("containment"))


def with_containment(
    pairs: DataFrame,
    texts_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    use_arrow: bool = False,
) -> DataFrame:
    """containment = one text is an exact substring of the other (J7).

    Only ever evaluated on candidate pairs (post-LSH), never all pairs.
    """
    ta = texts_df.select(F.col(id_col).alias("id_a"), F.col(text_col).alias("_text_a"))
    tb = texts_df.select(F.col(id_col).alias("id_b"), F.col(text_col).alias("_text_b"))
    joined = pairs.join(ta, "id_a").join(tb, "id_b")
    if not use_arrow:
        contain = F.contains(F.col("_text_b"), F.col("_text_a")) | F.contains(
            F.col("_text_a"), F.col("_text_b")
        )
        return joined.withColumn("containment", contain).drop("_text_a", "_text_b")

    schema = joined.drop("_text_a", "_text_b").schema.add("containment", "boolean")

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            a = pdf["_text_a"]
            b = pdf["_text_b"]
            pdf = pdf.drop(columns=["_text_a", "_text_b"])
            pdf["containment"] = [
                (x in y) or (y in x) for x, y in zip(a, b)
            ]
            yield pdf

    return joined.mapInPandas(_kernel, schema)
