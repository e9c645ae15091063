"""Micro-bench for the worker-persistent token-hash memo
(``functions/signatures.py``) — VERDICT r4 item 4's evidence condition: show the
memo's win on repeat-heavy prose AND that a high-entropy (low-repeat)
vocabulary pays no tail vs plain per-unique hashing.

Pure-pandas: times ``_batch_signatures`` directly (the exact kernel the
pandas UDFs wrap), so no Spark/Arrow noise — this isolates the Python
md5-per-unique-token term the memo targets.

Scenarios (B batches each, same doc/token shape):
  prose_cold    memo cleared before EVERY batch  — the round-4 per-batch cost
  prose_warm    memo persists across batches     — the round-5 worker behavior
  hient_plain   memo cleared before every batch  — baseline per-unique hashing
  hient_escape  memo pre-filled with 100k foreign keys — the adaptive gate
                must route to the no-insert escape path; claim: wall ~=
                hient_plain (no tail), memo never grows

Usage: python BENCH/memo_bench.py [docs_per_batch] [batches] [repeats]
Prints one JSON line; paste the summary into BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, ".")

from image_deduplication_3m_images_spark.config import DedupConfig  # noqa: E402
from image_deduplication_3m_images_spark.functions import signatures as S  # noqa: E402

CFG = DedupConfig()
TOKENS_PER_DOC = 200


def prose_batches(n_docs: int, batches: int, seed: int) -> list[pd.Series]:
    """Zipf-sampled shared vocabulary — webtext prose shape."""
    rng = np.random.default_rng(seed)
    vocab = np.array([f"w{i}" for i in range(50_000)], dtype=object)
    ranks = np.arange(1, len(vocab) + 1, dtype=np.float64)
    p = (1.0 / ranks) / (1.0 / ranks).sum()
    out = []
    for _ in range(batches):
        idx = rng.choice(len(vocab), size=(n_docs, TOKENS_PER_DOC), p=p)
        out.append(pd.Series([" ".join(row) for row in vocab[idx]]))
    return out

def high_entropy_batches(n_docs: int, batches: int, seed: int) -> list[pd.Series]:
    """Unique-everywhere tokens (ids/urls/numbers shape): uniques ~= tokens,
    near-zero cross-batch repeats — the memo's worst case."""
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(batches):
        v = rng.integers(1 << 62, size=(n_docs, TOKENS_PER_DOC))
        out.append(
            pd.Series([" ".join(f"t{int(x):x}" for x in row) for row in v])
        )
    return out


def run(batch_list: list[pd.Series], *, persist: bool, prefill: int = 0) -> float:
    S._TOKEN_HASH_MEMO.clear()
    if prefill:
        S._TOKEN_HASH_MEMO.update({f"\x00f{i}": i for i in range(prefill)})
    t0 = time.perf_counter()
    for b in batch_list:
        if not persist and not prefill:
            S._TOKEN_HASH_MEMO.clear()
        S._batch_signatures(b, CFG)
    return time.perf_counter() - t0


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    batches = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    prose = prose_batches(n_docs, batches, seed=1)
    hient = high_entropy_batches(n_docs, batches, seed=2)

    res: dict[str, list[float]] = {k: [] for k in (
        "prose_cold", "prose_warm", "hient_plain", "hient_escape")}
    for _ in range(repeats):
        res["prose_cold"].append(run(prose, persist=False))
        res["prose_warm"].append(run(prose, persist=True))
        res["hient_plain"].append(run(hient, persist=False))
        res["hient_escape"].append(run(hient, persist=True, prefill=100_000))
        # escape path must not have grown the memo past the prefill
        assert len(S._TOKEN_HASH_MEMO) == 100_000, len(S._TOKEN_HASH_MEMO)
    S._TOKEN_HASH_MEMO.clear()

    best = {k: min(v) for k, v in res.items()}
    print(json.dumps({
        "metric": "signature_kernel_memo_microbench",
        "docs_per_batch": n_docs, "batches": batches,
        "tokens_per_doc": TOKENS_PER_DOC, "repeats": repeats,
        "best_wall_s": {k: round(v, 3) for k, v in best.items()},
        "all_walls_s": {k: [round(x, 3) for x in v] for k, v in res.items()},
        "prose_speedup_warm_vs_cold": round(best["prose_cold"] / best["prose_warm"], 3),
        "hient_escape_overhead_vs_plain": round(
            best["hient_escape"] / best["hient_plain"] - 1.0, 4),
    }))


if __name__ == "__main__":
    main()
