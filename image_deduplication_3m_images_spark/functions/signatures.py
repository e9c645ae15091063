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
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from image_deduplication_3m_images_spark.config import MINHASH_PRIME, DedupConfig

SIGNATURE_STRUCT = StructType(
    [
        StructField("n_shingles", IntegerType(), False),
        StructField("minhash", ArrayType(LongType(), False), False),
        StructField("simhash", LongType(), False),
    ]
)

_BIT_COLS = np.arange(64, dtype=np.uint64)[None, :]


def _batch_signatures(texts: pd.Series, cfg: DedupConfig) -> pd.DataFrame:
    a = np.array(cfg.perm_a, dtype=np.uint64)[None, :]
    b = np.array(cfg.perm_b, dtype=np.uint64)[None, :]
    k = cfg.shingle_k
    prime = np.uint64(MINHASH_PRIME)

    n_out = np.empty(len(texts), dtype=np.int32)
    mh_out: list[np.ndarray] = []
    sh_out = np.empty(len(texts), dtype=np.int64)

    md5 = hashlib.md5
    for i, text in enumerate(texts):
        toks = [t for t in (text or "").split(" ") if t]
        if len(toks) >= k:
            digs = [
                md5(" ".join(toks[j : j + k]).encode("utf-8")).hexdigest()
                for j in range(len(toks) - k + 1)
            ]
        else:
            digs = [md5(" ".join(toks).encode("utf-8")).hexdigest()]
        h64 = np.array([int(d[:16], 16) for d in digs], dtype=np.uint64)
        h32 = h64 >> np.uint64(32)  # first 8 hex chars == top 32 bits of first 16
        # MinHash: (S,128) affine matrix, min over shingle axis.
        mh = ((h32[:, None] * a + b) % prime).min(axis=0).astype(np.int64)
        # SimHash: majority vote per bit (strict majority; ties -> 0).
        ones = ((h64[:, None] >> _BIT_COLS) & np.uint64(1)).sum(axis=0, dtype=np.int64)
        set_bits = (2 * ones) > len(digs)
        packed = np.uint64(0)
        for pos in np.nonzero(set_bits)[0]:
            packed |= np.uint64(1) << np.uint64(pos)
        n_out[i] = len(digs)
        mh_out.append(mh)
        sh_out[i] = np.int64(packed)

    return pd.DataFrame(
        {"n_shingles": n_out, "minhash": mh_out, "simhash": sh_out}
    )


EXTRACT_SIGNATURE_STRUCT = StructType(
    [StructField("text", StringType(), False)] + list(SIGNATURE_STRUCT.fields)
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
