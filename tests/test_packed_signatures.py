"""Packed-signature equivalence: the hot pipeline returns MinHash/band keys
as binary cells (Arrow list-conversion costs ~4us/element — measured 55 s per
100k docs for array<long>(128)); these tests pin byte-level equivalence with
the array path and the JVM band-key expression.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from image_deduplication_3m_images_spark.config import DedupConfig
from image_deduplication_3m_images_spark.functions.signatures import (
    band_keys_from_packed_expr,
    make_extract_signature_packed_udf,
    make_extract_signature_udf,
)
from image_deduplication_3m_images_spark.operators.lsh import band_key_expr
from image_deduplication_3m_images_spark.operators.verify import (
    sig_matches_expr,
    sig_matches_packed,
)
from image_deduplication_3m_images_spark.sources.pages_fixture import (
    generate_pages,
    pages_dataframe,
)

CFG = DedupConfig()


def _both(spark, n=80):
    pages = pages_dataframe(spark, generate_pages(n_rows=n, seed=5)).cache()
    arr = pages.select(
        "url", make_extract_signature_udf(CFG)(F.col("html")).alias("s")
    ).select("url", "s.text", "s.n_shingles", "s.minhash", "s.simhash")
    packed = pages.select(
        "url", make_extract_signature_packed_udf(CFG)(F.col("html")).alias("s")
    ).select("url", "s.text", "s.n_shingles", "s.minhash_bin", "s.simhash")
    return arr, packed


def test_packed_minhash_bytes_equal_array(spark):
    arr, packed = _both(spark)
    a = {r["url"]: r for r in arr.collect()}
    p = {r["url"]: r for r in packed.collect()}
    assert a.keys() == p.keys()
    for url in a:
        assert a[url]["text"] == p[url]["text"]
        assert a[url]["n_shingles"] == p[url]["n_shingles"]
        assert a[url]["simhash"] == p[url]["simhash"]
        unpacked = np.frombuffer(p[url]["minhash_bin"], dtype=">i8").tolist()
        assert unpacked == list(a[url]["minhash"])


def test_packed_band_keys_equal_jvm_expr(spark):
    """The packed-binary band-key expression (conv/hex unpack -> md5) must
    byte-match the array-path band_key_expr formula (which the DuckDB oracle
    mirrors)."""
    arr, packed = _both(spark)
    jvm = arr.select(
        "url",
        F.array(
            *[band_key_expr(F.col("minhash"), b, CFG.rows_per_band) for b in range(CFG.bands)]
        ).alias("keys"),
    )
    unp = packed.select(
        "url",
        band_keys_from_packed_expr(F.col("minhash_bin"), CFG).alias("keys"),
    )
    a = {r["url"]: list(r["keys"]) for r in jvm.collect()}
    b = {r["url"]: list(r["keys"]) for r in unp.collect()}
    assert a == b
    # the single-parse SQL-string form (what the pipeline passes) must be
    # byte-identical to the compositional Column form
    unp_s = packed.select(
        "url",
        band_keys_from_packed_expr("minhash_bin", CFG).alias("keys"),
    )
    c = {r["url"]: list(r["keys"]) for r in unp_s.collect()}
    assert a == c


def test_packed_matches_equal_array_matches(spark):
    arr, packed = _both(spark)
    pa = arr.alias("x").crossJoin(arr.alias("y")).where(F.col("x.url") < F.col("y.url")).limit(200)
    m1 = {
        (r["xu"], r["yu"]): r["m"]
        for r in pa.select(
            F.col("x.url").alias("xu"), F.col("y.url").alias("yu"),
            sig_matches_expr(F.col("x.minhash"), F.col("y.minhash")).alias("m"),
        ).collect()
    }
    pb = packed.alias("x").crossJoin(packed.alias("y")).where(F.col("x.url") < F.col("y.url")).limit(200)
    m2 = {
        (r["xu"], r["yu"]): r["m"]
        for r in pb.select(
            F.col("x.url").alias("xu"), F.col("y.url").alias("yu"),
            sig_matches_packed(F.col("x.minhash_bin"), F.col("y.minhash_bin")).alias("m"),
        ).collect()
    }
    shared = set(m1) & set(m2)
    assert len(shared) >= 100
    for k in shared:
        assert m1[k] == m2[k]

def test_packed_matches_expr_equals_arrow_kernel(spark):
    """The pure-JVM substring-equality matches expression must byte-match
    the Arrow kernel AND the array-path expression on every pair."""
    from image_deduplication_3m_images_spark.operators.verify import (
        sig_matches_packed_expr,
    )

    arr, packed = _both(spark)
    pb = (
        packed.alias("x")
        .crossJoin(packed.alias("y"))
        .where(F.col("x.url") < F.col("y.url"))
        .limit(300)
    )
    rows = pb.select(
        F.col("x.url").alias("xu"), F.col("y.url").alias("yu"),
        sig_matches_packed(F.col("x.minhash_bin"), F.col("y.minhash_bin")).alias("m_udf"),
        sig_matches_packed_expr(
            F.col("x.minhash_bin"), F.col("y.minhash_bin"), CFG.num_perm
        ).alias("m_expr"),
    ).collect()
    assert len(rows) >= 100
    for r in rows:
        assert r["m_udf"] == r["m_expr"], (r["xu"], r["yu"])


def test_pipeline_verify_stage_single_python_boundary(spark):
    """The verify stage's only Python is the ONE batch-vectorized Arrow
    matches kernel — hamming/containment/verdict are codegen exprs, and no
    row-at-a-time BatchEvalPython ever appears.  (The zero-Python
    expression variant was measured slower at 128 perms — see
    sig_matches_packed_expr — so exactly one ArrowEvalPython is the
    intended shape.)"""
    from image_deduplication_3m_images_spark.config import DedupConfig
    from image_deduplication_3m_images_spark.operators.verify import verify_pairs
    from image_deduplication_3m_images_spark.plans.dedupe import build_signatures
    from image_deduplication_3m_images_spark.sources.pages_fixture import (
        generate_pages,
        pages_dataframe,
    )
    import io
    from contextlib import redirect_stdout

    pages = pages_dataframe(spark, generate_pages(n_rows=60, seed=5))
    sig = build_signatures(pages, DedupConfig()).localCheckpoint(eager=True)
    pairs = spark.createDataFrame(
        [(r1, r2) for r1, r2 in zip(*[iter(sorted(x["url"] for x in sig.select("url").collect()))] * 2)][:10],
        ["id_a", "id_b"],
    )
    out = verify_pairs(
        F.broadcast(pairs), sig, DedupConfig(), id_col="url",
        texts_df=sig.select("url", "text"), prefilter_broadcast=True,
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    import re

    ids = set(re.findall(r"\((\d+)\) ArrowEvalPython", plan))
    assert len(ids) == 1, f"expected exactly one Arrow boundary, got {ids}"
    assert "BatchEvalPython" not in plan, plan[:1500]


def test_verify_deferred_containment_equivalent_verdicts(spark):
    """defer_containment: identical (id_a, id_b, sig_matches, hamming,
    verified) to the full form; `containment` may be False where the full
    form says True ONLY for pairs that already pass the signature tests
    (the rescue was not needed) — never the other way around."""
    from image_deduplication_3m_images_spark.operators.lsh import candidate_pairs
    from image_deduplication_3m_images_spark.operators.verify import verify_pairs
    from image_deduplication_3m_images_spark.plans.dedupe import build_signatures

    pages = pages_dataframe(spark, generate_pages(n_rows=200, seed=7))
    sig = build_signatures(pages, CFG).localCheckpoint(eager=True)
    pairs = candidate_pairs(sig, CFG, id_col="url").select("id_a", "id_b")
    kw = dict(
        id_col="url", texts_df=sig.select("url", "text"), prefilter_broadcast=True
    )
    full = verify_pairs(F.broadcast(pairs), sig, CFG, **kw).collect()
    defer = verify_pairs(
        F.broadcast(pairs), sig, CFG, defer_containment=True, **kw
    ).collect()
    fm = {(r["id_a"], r["id_b"]): r for r in full}
    dm = {(r["id_a"], r["id_b"]): r for r in defer}
    assert fm.keys() == dm.keys() and fm, f"{len(fm)} vs {len(dm)} pairs"
    # the fixture must actually exercise the rescue path
    assert any(r["containment"] and not (r["sig_matches"] >= 90 or r["hamming"] <= 3) for r in full)
    for k, f in fm.items():
        d = dm[k]
        assert (f["sig_matches"], f["hamming"], f["verified"]) == (
            d["sig_matches"], d["hamming"], d["verified"]
        ), (k, f, d)
        if f["containment"] != d["containment"]:
            # only allowed on sim-passing pairs, and only full=True/defer=False
            assert f["containment"] and not d["containment"], (k, f, d)
            assert f["sig_matches"] >= 90 or f["hamming"] <= 3, (k, f, d)
