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


def melt_assemble(
    pairs: DataFrame, sig_df: DataFrame, id_col: str, cols
) -> DataFrame:
    """Assemble per-pair payload columns with ONE corpus scan + ONE shuffle.

    The pair list is "melted" into two rows per pair (one per member id) and
    broadcast; the corpus table is scanned ONCE, each row map-side joined
    against the melt (rows not in any pair never leave the scan), and a
    groupBy(id_a, id_b) reassembles the two sides as ``<col>_a``/``<col>_b``.

    vs the previous two-sliver shape (two full corpus scans + a sort-merge
    join of WIDE slivers): half the scanned bytes, one shuffle whose rows
    are exactly the payload-carrying pair members (hits move once, never
    the corpus), and no wide sort.  Requires the pair set to be broadcast-
    small — which LSH guarantees and the caller's byte guard enforces; the
    non-broadcast fallback is the plain two-join path in join_signatures.

    ``max(when(...))`` per side is exact: each (id_a, id_b, side) group has
    exactly one payload row (sig ids are unique), so max just selects it —
    and Max is a declarative spill-safe aggregate for every payload type
    used here (binary / long / string / array).
    """
    m = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("id_a").alias("_mid"),
                    F.col("id_a"),
                    F.col("id_b"),
                    F.lit(True).alias("_is_a"),
                ),
                F.struct(
                    F.col("id_b").alias("_mid"),
                    F.col("id_a"),
                    F.col("id_b"),
                    F.lit(False).alias("_is_a"),
                ),
            )
        ).alias("m")
    ).select("m.*")
    hits = sig_df.select(
        F.col(id_col).alias("_mid"), *[F.col(c) for c in cols]
    ).join(F.broadcast(m), "_mid")
    aggs = []
    for c in cols:
        aggs.append(F.max(F.when(F.col("_is_a"), F.col(c))).alias(f"{c}_a"))
        aggs.append(F.max(F.when(~F.col("_is_a"), F.col(c))).alias(f"{c}_b"))
    return hits.groupBy("id_a", "id_b").agg(*aggs)


def join_signatures(
    pairs: DataFrame,
    sig_df: DataFrame,
    id_col: str = "doc_id",
    cols=("minhash", "simhash"),
    prefilter_broadcast: bool = False,
) -> DataFrame:
    """Attach both sides' signatures to (id_a, id_b) pairs.

    ``prefilter_broadcast``: when the pair set is broadcast-small, use the
    melt_assemble shape — ONE corpus scan, pair membership tested map-side
    against the broadcast melt, one shuffle of exactly the payload-carrying
    hit rows.  (History: round 4 ran two semi-filtered corpus scans feeding
    a sort-merge join of wide slivers; the 2M event logs showed the two
    scans dominating the stage — tsum 173 s + 70 s at N vs 22 s for the
    join itself — so the single-scan melt replaced it.)

    Without the prefilter (pair set too big to broadcast) the plain two-join
    path runs: both joins shuffle, fully spillable, no driver bottleneck —
    the shape that survives a pathological pair explosion.
    """
    if prefilter_broadcast:
        return melt_assemble(pairs.select("id_a", "id_b"), sig_df, id_col, cols)
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


def sig_matches_packed_expr(bin_a, bin_b, num_perm: int = 128):
    """Equal-position count over big-endian-packed MinHash binaries as a
    PURE column expression: 128 binary-substring equality compares summed.

    MEASURED AND REJECTED as the pipeline default: at num_perm=128 the
    deep Add chain is codegen-hostile (pages e2e 11-13 s -> 33-67 s in a
    same-window A/B at 20k docs), so ``verify_pairs`` keeps the
    batch-vectorized Arrow kernel (``sig_matches_packed``), which the same
    A/B measured at full speed.  Kept, tested (byte-equality with the
    kernel is pinned in tests/test_packed_signatures.py), and documented
    for narrow signatures (num_perm <= ~32), where a short expression
    chain beats an Arrow round-trip."""
    import functools
    import operator

    return functools.reduce(
        operator.add,
        (
            (F.substring(bin_a, j * 8 + 1, 8) == F.substring(bin_b, j * 8 + 1, 8))
            .cast("int")
            for j in range(num_perm)
        ),
    )


_MATCHES_PACKED = None


def sig_matches_packed(bin_a, bin_b):
    """Equal-position count over big-endian-packed MinHash binaries.

    Arrow-batched pandas UDF — runs only on candidate PAIRS (a tiny fraction
    of the corpus), where the per-element list-conversion cost that packing
    avoids would not matter; np.frombuffer makes it allocation-free.
    """
    global _MATCHES_PACKED
    if _MATCHES_PACKED is None:

        @F.pandas_udf("int")
        def matches_udf(a: pd.Series, b: pd.Series) -> pd.Series:
            import numpy as np

            if len(a) == 0:
                return pd.Series(np.empty(0, dtype=np.int32))
            # all signatures are equal-length packed buffers: concatenate
            # into ONE (n, num_perm) view and compare the whole batch in a
            # single vectorized pass (no per-pair Python)
            xa = np.frombuffer(b"".join(a), dtype=">i8").reshape(len(a), -1)
            ya = np.frombuffer(b"".join(b), dtype=">i8").reshape(len(b), -1)
            return pd.Series((xa == ya).sum(axis=1).astype(np.int32))

        _MATCHES_PACKED = matches_udf
    return _MATCHES_PACKED(bin_a, bin_b)


def verify_pairs(
    pairs: DataFrame,
    sig_df: DataFrame,
    cfg: DedupConfig,
    id_col: str = "doc_id",
    texts_df: DataFrame | None = None,
    text_col: str = "text",
    use_arrow_containment: bool = False,
    prefilter_broadcast: bool = False,
    defer_containment: bool = False,
    release: list | None = None,
) -> DataFrame:
    """candidate pairs -> verified pairs with evidence columns.

    verdict: ``verified = (jaccard_est >= t AND hamming <= h) OR containment``
    — containment rescues true dups whose extra boilerplate dilutes Jaccard
    (FIXTURES.md containment pairs), mirroring how the reference's local-
    feature stage rescued crops/edits that global cosine rejected.

    ``prefilter_broadcast``: see join_signatures — pass True whenever the
    pair set is small enough to broadcast (the pipeline's byte guard
    decides); the corpus then never shuffles.

    ``defer_containment`` (pipeline fast path; requires prefilter_broadcast
    and texts): containment is a RESCUE term — it can only flip the verdict
    of pairs that FAIL the signature tests.  With defer on, the first pass
    assembles only signatures (text never rides the wide shuffle), and only
    the failing residue (a fraction of the pairs) gets a second, text-only
    assembly.  The ``verified`` flag is bit-identical to the full form;
    the ``containment`` column is then "containment where it could matter"
    (False for sim-passing pairs, whose containment was never evaluated) —
    callers needing the audit column on every pair use defer off.

    ``release``: the deferred path persists an intermediate frame the result
    depends on; pass a list to receive it and ``unpersist`` once the result
    is materialized/checkpointed.  Without it the cache is left to Spark's
    LRU — fine for one-shot jobs, but a long-lived driver calling this per
    micro-batch would accumulate one dead cached frame per call.
    """
    with_text = texts_df is not None
    packed = "minhash_bin" in sig_df.columns
    mh_col = "minhash_bin" if packed else "minhash"
    if defer_containment and with_text and prefilter_broadcast and (
        text_col in sig_df.columns
    ):
        return _verify_deferred(
            pairs, sig_df, cfg, id_col, text_col, mh_col, use_arrow_containment,
            release=release,
        )
    if with_text and text_col in sig_df.columns:
        # one join per side carrying signatures AND text together — half the
        # shuffles of separate signature/text joins
        joined = join_signatures(
            pairs, sig_df, id_col, cols=(mh_col, "simhash", text_col),
            prefilter_broadcast=prefilter_broadcast,
        )
    else:
        joined = join_signatures(
            pairs, sig_df, id_col, cols=(mh_col, "simhash"),
            prefilter_broadcast=prefilter_broadcast,
        )
    if packed:
        matches = sig_matches_packed(F.col("minhash_bin_a"), F.col("minhash_bin_b"))
    else:
        matches = sig_matches_expr(F.col("minhash_a"), F.col("minhash_b"))
    evidence = [
        matches.alias("sig_matches"),
        hamming_expr(F.col("simhash_a"), F.col("simhash_b")).alias("hamming"),
    ]
    if with_text and text_col in sig_df.columns:
        contain = F.contains(
            F.col(f"{text_col}_b"), F.col(f"{text_col}_a")
        ) | F.contains(F.col(f"{text_col}_a"), F.col(f"{text_col}_b"))
        if use_arrow_containment:
            out = joined.select(
                "id_a",
                "id_b",
                *evidence,
                F.col(f"{text_col}_a").alias("_text_a"),
                F.col(f"{text_col}_b").alias("_text_b"),
            )
            out = _arrow_containment(out)
        else:
            out = joined.select(
                "id_a", "id_b", *evidence, contain.alias("containment")
            )
        min_matches = math.ceil(cfg.jaccard_threshold * cfg.num_perm)
        sim_ok = (F.col("sig_matches") >= F.lit(min_matches)) | (
            F.col("hamming") <= F.lit(cfg.hamming_max)
        )
        return out.withColumn("verified", sim_ok | F.col("containment"))

    out = joined.select("id_a", "id_b", *evidence)
    # OR-of-evidence verdict: MinHash Jaccard is the primary test; a tight
    # SimHash Hamming radius rescues near-identical docs whose MinHash was
    # unlucky; containment rescues boilerplate-wrapped/contained true dups.
    # (The reference's conjunctive stage cascade over-filters light edits —
    # its stage-2 color pass rejecting true dups was a documented bug class,
    # /root/reference/MEMORY_FIXES_SUMMARY.md.)
    min_matches = math.ceil(cfg.jaccard_threshold * cfg.num_perm)  # 0.7*128 -> 90
    sim_ok = (F.col("sig_matches") >= F.lit(min_matches)) | (
        F.col("hamming") <= F.lit(cfg.hamming_max)
    )
    if texts_df is None:
        return out.withColumn("containment", F.lit(False)).withColumn(
            "verified", sim_ok
        )

    out = with_containment(out, texts_df, id_col, text_col, use_arrow_containment)
    return out.withColumn("verified", sim_ok | F.col("containment"))


def _verify_deferred(
    pairs: DataFrame,
    sig_df: DataFrame,
    cfg: DedupConfig,
    id_col: str,
    text_col: str,
    mh_col: str,
    use_arrow_containment: bool,
    release: list | None = None,
) -> DataFrame:
    """Two-pass verification: signatures first, text only for the residue.

    Pass A: melt-assemble (minhash, simhash) — ONE narrow corpus scan, text
    never shuffles — then the signature verdict.  The narrow result (four
    scalar columns per pair) is persisted and materialized ONCE so the
    residue branch and the final join both read the cache instead of
    re-running the corpus scan.

    Pass B: pairs failing the signature tests get a text-only melt assembly
    (scans just the text column, for residue members only) and the
    containment check; a left join folds the rescue verdict back.

    The cache is a few MB per million pairs (ids + two ints); pass
    ``release`` to unpersist it once the stage is checkpointed (otherwise
    it is left to Spark's LRU — one dead frame per call on a long-lived
    driver).
    """
    matches_fn = sig_matches_packed if mh_col == "minhash_bin" else sig_matches_expr
    assembled = melt_assemble(
        pairs.select("id_a", "id_b"), sig_df, id_col, (mh_col, "simhash")
    )
    min_matches = math.ceil(cfg.jaccard_threshold * cfg.num_perm)
    pass_a = assembled.select(
        "id_a",
        "id_b",
        matches_fn(F.col(f"{mh_col}_a"), F.col(f"{mh_col}_b")).alias("sig_matches"),
        hamming_expr(F.col("simhash_a"), F.col("simhash_b")).alias("hamming"),
    ).withColumn(
        "_sim_ok",
        (F.col("sig_matches") >= F.lit(min_matches))
        | (F.col("hamming") <= F.lit(cfg.hamming_max)),
    ).persist()
    pass_a.count()  # materialize once, before the plan forks below
    if release is not None:
        release.append(pass_a)

    residue = pass_a.where(~F.col("_sim_ok")).select("id_a", "id_b")
    resid_texts = melt_assemble(residue, sig_df, id_col, (text_col,))
    if use_arrow_containment:
        rescued = _arrow_containment(
            resid_texts.select(
                "id_a",
                "id_b",
                F.col(f"{text_col}_a").alias("_text_a"),
                F.col(f"{text_col}_b").alias("_text_b"),
            )
        )
    else:
        rescued = resid_texts.select(
            "id_a",
            "id_b",
            (
                F.contains(F.col(f"{text_col}_b"), F.col(f"{text_col}_a"))
                | F.contains(F.col(f"{text_col}_a"), F.col(f"{text_col}_b"))
            ).alias("containment"),
        )
    return (
        pass_a.join(rescued, ["id_a", "id_b"], "left")
        .select(
            "id_a",
            "id_b",
            "sig_matches",
            "hamming",
            F.coalesce("containment", F.lit(False)).alias("containment"),
            (F.col("_sim_ok") | F.coalesce("containment", F.lit(False))).alias(
                "verified"
            ),
        )
    )


def _arrow_containment(df: DataFrame) -> DataFrame:
    """Arrow-batched containment kernel over a frame with _text_a/_text_b.

    The "suffix-array slot": CPython's two-way/Boyer-Moore `in` is the
    per-batch substring kernel; swap in a suffix-automaton here for
    pathological long-doc workloads.
    """
    schema = df.drop("_text_a", "_text_b").schema.add("containment", "boolean")

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            a = pdf["_text_a"]
            b = pdf["_text_b"]
            pdf = pdf.drop(columns=["_text_a", "_text_b"])
            pdf["containment"] = [(x in y) or (y in x) for x, y in zip(a, b)]
            yield pdf

    return df.mapInPandas(_kernel, schema)


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

    return _arrow_containment(joined)
