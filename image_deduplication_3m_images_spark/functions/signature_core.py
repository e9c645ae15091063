"""Signature math shared by the pandas UDFs, the pure-Python test oracle and
the DuckDB oracle SQL.  No Spark imports here — importable everywhere.

Webtext analog of the reference's per-item feature extractors:

* shingling + MinHash  <- wavelet perceptual hash
  (``/root/reference/modules/feature_extraction.py:278-315``)
* SimHash              <- global EfficientNet embedding
  (``/root/reference/modules/feature_extraction.py:206-237``)

All hashes derive from md5 of the *token* (cacheable across a batch — webtext
vocabulary is Zipfian, so most token hashes are cache hits) combined by a
Horner rolling hash per shingle window, so the exact same integers are
reproducible in SQL (md5 + ``list_reduce`` Horner in DuckDB).
"""

from __future__ import annotations

import hashlib

import numpy as np

from image_deduplication_3m_images_spark.config import MINHASH_PRIME, DedupConfig


def tokenize(text: str) -> list[str]:
    """Split on single spaces, drop empty tokens.

    Matches ``split(text, ' ')`` + non-empty filter in both Spark SQL and
    DuckDB (``list_filter(string_split(text,' '), x -> x <> '')``).
    """
    return [t for t in text.split(" ") if t]


def shingles(text: str, k: int) -> list[str]:
    """k-gram token shingles; degenerate inputs (< k tokens) yield one shingle
    that is the whole (space-joined) text — documented constant behavior, never
    an exception (reference analog: None-feature guards,
    ``/root/reference/modules/deduplication.py:236-237,1466-1476``).
    """
    toks = tokenize(text)
    if len(toks) >= k:
        return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    return [" ".join(toks)]


# Horner multiplier for rolling shingle hashes over token hashes.  Must be
# < 2**31 so the DuckDB oracle's HUGEINT intermediate (acc*C + x < 2**95)
# never overflows; 1000003 is the classic CPython string-hash prime.
HORNER_C = 1000003


def token_hash(token: str) -> int:
    """64-bit token hash: first 16 hex chars of md5(token) — the primitive
    shared with the DuckDB oracle (``('0x'||substr(md5(t),1,16))::UBIGINT``)."""
    return int(hashlib.md5(token.encode("utf-8")).hexdigest()[:16], 16)


def shingle_hashes_from_tokens(th: np.ndarray, k: int) -> np.ndarray:
    """uint64 shingle hashes: Horner fold ``h = h*C + t`` (mod 2**64, numpy
    natural wraparound) over each window of k token hashes.

    Degenerate inputs: fewer than k tokens -> ONE shingle folding all tokens;
    zero tokens -> [0].  Vectorized: k fused array ops over all windows.
    """
    th = th.astype(np.uint64)
    n = th.size
    c = np.uint64(HORNER_C)
    if n == 0:
        return np.zeros(1, dtype=np.uint64)
    if n < k:
        h = int(th[0])  # python ints: intended mod-2**64 wrap without warnings
        for j in range(1, n):
            h = (h * HORNER_C + int(th[j])) & 0xFFFFFFFFFFFFFFFF
        return np.array([h], dtype=np.uint64)
    h = th[0 : n - k + 1].copy()
    for j in range(1, k):
        h = h * c + th[j : n - k + 1 + j]
    return h


def shingle_hashes(text: str, k: int) -> np.ndarray:
    """uint64 shingle-hash array for a text: md5 token hashes -> Horner
    windows.  MinHash uses the top 32 bits (h >> 32), SimHash all 64.
    """
    toks = tokenize(text)
    th = np.array([token_hash(t) for t in toks], dtype=np.uint64)
    return shingle_hashes_from_tokens(th, k)


def minhash_from_h32(h32: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized MinHash: min over shingles of (a_j*h + b_j) mod P, per j.

    Shapes: h32 (S,), a/b (128,) -> result (128,) int64.  The (S,128) product
    matrix stays in uint64 (max value < 2**63, proven in config.py).
    """
    if h32.size == 0:
        h32 = np.zeros(1, dtype=np.uint64)
    prod = h32[:, None] * a[None, :] + b[None, :]  # (S, 128) uint64, no overflow
    return (prod % np.uint64(MINHASH_PRIME)).min(axis=0).astype(np.int64)


def simhash_from_h64(h64: np.ndarray) -> int:
    """64-bit SimHash: bit b is set iff strictly more than half of the shingle
    hashes have bit b set (ties -> 0).  Returned as *signed* int64 (two's
    complement) so it round-trips through a Spark/DuckDB BIGINT column.
    """
    if h64.size == 0:
        h64 = np.zeros(1, dtype=np.uint64)
    n = h64.size
    bits = (h64[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
    ones = bits.sum(axis=0, dtype=np.int64)  # (64,)
    set_bits = (2 * ones) > n
    unsigned = np.uint64(0)
    for pos in np.nonzero(set_bits)[0]:
        unsigned |= np.uint64(1) << np.uint64(pos)
    return int(np.int64(unsigned))


def signature_py(text: str, cfg: DedupConfig) -> dict:
    """Pure-Python/NumPy single-row oracle used by unit tests (FIXTURES.md §4:
    'signature determinism') and mirrored by the vectorized UDF batch path.
    """
    a = np.array(cfg.perm_a, dtype=np.uint64)
    b = np.array(cfg.perm_b, dtype=np.uint64)
    h64 = shingle_hashes(text, cfg.shingle_k)
    h32 = h64 >> np.uint64(32)
    toks = tokenize(text)
    n_sh = max(len(toks) - cfg.shingle_k + 1, 1) if toks else 1
    return {
        "n_shingles": n_sh,
        "minhash": minhash_from_h32(h32, a, b).tolist(),
        "simhash": simhash_from_h64(h64),
    }


def hamming64(x: int, y: int) -> int:
    return bin((x ^ y) & 0xFFFFFFFFFFFFFFFF).count("1")


def jaccard_est(sig_a: list[int], sig_b: list[int]) -> float:
    """Fraction of equal signature positions — the MinHash Jaccard estimator
    (reference analog: ``compute_wavelet_similarity`` = mean(hash1 == hash2),
    ``/root/reference/modules/deduplication.py:234-238``).
    """
    eq = sum(1 for x, y in zip(sig_a, sig_b) if x == y)
    return eq / len(sig_a)
