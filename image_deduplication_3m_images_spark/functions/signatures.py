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


def _batch_signatures(texts: pd.Series, cfg: DedupConfig) -> pd.DataFrame:
    """Vectorized batch kernel.

    Per batch: md5 runs once per UNIQUE token (webtext vocabulary is Zipfian,
    so the cache hit rate is high); shingle hashes are a Horner fold over the
    token-hash array (k fused numpy ops over all windows); the MinHash matrix
    and SimHash bit counts are pure uint64 numpy.  No per-shingle Python.
    """
    a = np.array(cfg.perm_a, dtype=np.uint64)[None, :]
    b = np.array(cfg.perm_b, dtype=np.uint64)[None, :]
    k = cfg.shingle_k
    prime = np.uint64(MINHASH_PRIME)
    c = np.uint64(HORNER_C)

    n_out = np.empty(len(texts), dtype=np.int32)
    mh_out: list[np.ndarray] = []
    sh_out = np.empty(len(texts), dtype=np.int64)

    md5 = hashlib.md5

    # Tokenize + hash the whole batch columnar: factorize the flat token
    # stream (C hash table), md5 only each UNIQUE token, fancy-index back.
    split_lists = [
        [t for t in (x or "").split(" ") if t] for x in texts
    ]
    lens = np.fromiter(map(len, split_lists), dtype=np.int64, count=len(split_lists))
    import itertools

    flat = pd.Series(
        list(itertools.chain.from_iterable(split_lists)), dtype=object
    )
    if len(flat):
        codes, uniq = pd.factorize(flat, sort=False)
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

    for i in range(len(texts)):
        th = th_flat[bounds[i] : bounds[i + 1]]
        n = th.size
        if n == 0:
            h64 = np.zeros(1, dtype=np.uint64)
        elif n < k:
            h = int(th[0])
            for j in range(1, n):
                h = (h * HORNER_C + int(th[j])) & 0xFFFFFFFFFFFFFFFF
            h64 = np.array([h], dtype=np.uint64)
        else:
            h64 = th[0 : n - k + 1].copy()
            for j in range(1, k):
                h64 = h64 * c + th[j : n - k + 1 + j]
        h32 = h64 >> np.uint64(32)
        # MinHash: (S,128) affine matrix, min over shingle axis.
        mh = fast_mod(h32[:, None] * a + b).min(axis=0).astype(np.int64)
        # SimHash: majority vote per bit (strict majority; ties -> 0).
        ones = ((h64[:, None] >> _BIT_COLS) & np.uint64(1)).sum(axis=0, dtype=np.int64)
        set_bits = (2 * ones) > h64.size
        n_out[i] = h64.size if n < k else n - k + 1
        mh_out.append(mh)
        sh_out[i] = np.int64((set_bits.astype(np.uint64) * weights).sum(dtype=np.uint64))

    return pd.DataFrame(
        {"n_shingles": n_out, "minhash": mh_out, "simhash": sh_out}
    )


EXTRACT_SIGNATURE_STRUCT = StructType(
    [StructField("text", StringType(), False)] + list(SIGNATURE_STRUCT.fields)
)

# Packed variant: Arrow/Catalyst conversion of LIST columns costs ~4us per
# ELEMENT (measured: returning array<long>(128) for 100k docs = 55 s vs 0.3 s
# for scalars) — so the hot pipeline returns the 128 MinHash values as ONE
# 1 KiB binary cell and the 16 LSH band keys as ONE 128 B binary cell.
# Big-endian packing so `hex(substring(...))` unpacks JVM-side.
PACKED_SIGNATURE_STRUCT = StructType(
    [
        StructField("text", StringType(), False),
        StructField("n_shingles", IntegerType(), False),
        StructField("simhash", LongType(), False),
        StructField("minhash_bin", BinaryType(), False),
        StructField("band_keys_bin", BinaryType(), False),
    ]
)


def _band_keys(mh: np.ndarray, cfg: DedupConfig) -> bytes:
    """16 LSH band keys, each = first 15 hex chars of md5 of the '_'-joined
    decimal signature slice — EXACTLY `band_key_expr` in operators/lsh.py and
    the DuckDB oracle's bands CTE; packed big-endian uint64."""
    r = cfg.rows_per_band
    md5 = hashlib.md5
    keys = np.empty(cfg.bands, dtype=np.uint64)
    for b in range(cfg.bands):
        joined = "_".join(str(v) for v in mh[b * r : (b + 1) * r])
        keys[b] = int(md5(joined.encode("utf-8")).hexdigest()[:15], 16)
    return keys.byteswap().tobytes()  # big-endian


def make_extract_signature_packed_udf(cfg: DedupConfig):
    """Fused ``html -> struct<text,n_shingles,simhash,minhash_bin,band_keys_bin>``
    — the hot-pipeline variant (see PACKED_SIGNATURE_STRUCT rationale)."""
    from image_deduplication_3m_images_spark.functions.text import _extract_text_pd

    @F.pandas_udf(PACKED_SIGNATURE_STRUCT)
    def packed_udf(html: pd.Series) -> pd.DataFrame:
        texts = _extract_text_pd(html)
        sig = _batch_signatures(texts, cfg)
        mh_bin = [m.astype(">i8").tobytes() for m in sig["minhash"]]
        bk_bin = [_band_keys(m, cfg) for m in sig["minhash"]]
        return pd.DataFrame(
            {
                "text": texts.reset_index(drop=True),
                "n_shingles": sig["n_shingles"],
                "simhash": sig["simhash"],
                "minhash_bin": mh_bin,
                "band_keys_bin": bk_bin,
            }
        )

    return packed_udf


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
