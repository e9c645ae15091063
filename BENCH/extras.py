"""Append the saturated / single-JVM transparency pairs to BENCH/BASELINE.md.

Split out of scaling.py so the (long) primary two-size evidence and the
(short) transparency extras can run — and be re-run — independently
without overwriting each other's sections.

Usage: python BENCH/extras.py [n_rows]
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
spec = importlib.util.spec_from_file_location(
    "scaling", os.path.join(REPO, "BENCH", "scaling.py")
)
scaling = importlib.util.module_from_spec(spec)
spec.loader.exec_module(scaling)


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1000000
    cache_root = os.path.join(
        scaling.shm_base() or "/tmp", "spark_graft_inputs"
    )
    os.makedirs(cache_root, exist_ok=True)
    inp = scaling.ensure_input(n_rows, cache_root)

    def one(cores: int, master: str | None, leg: str) -> dict:
        return scaling.best_of(
            [scaling.run_job(inp, n_rows, cores, master, leg, 0)], n_rows
        )

    saturated = scaling.pair(
        one(8, "local-cluster[2,4,4096]", "sat_n"),
        one(32, "local-cluster[8,4,4096]", "sat_4n"),
        4.0,
    )
    single = scaling.pair(
        one(8, None, "jvm_n"), one(32, None, "jvm_4n"), 4.0
    )
    print(json.dumps({"saturated": saturated, "single": single}))

    md = f"""
## Saturated pair: 2 vs 8 executors (8 -> 32 cores, {n_rows:,} docs, single run each)

| config | wall (s) | docs/sec |
|---|---|---|
| local-cluster[2,4,4096] (N)  | {saturated['wall_s_n']} | {saturated['docs_per_sec_n']} |
| local-cluster[8,4,4096] (4N) | {saturated['wall_s_4n']} | {saturated['docs_per_sec_4n']} |

Efficiency = {saturated['scaling_efficiency']}.  The 4N leg here saturates
all 32 host cores while also hosting the driver, 8 JVMs' GC/netty threads
and 32 Python workers — contention a real cluster does not have.  The raw
numpy multiprocessing ceiling on this box is itself ~0.80 for 8 -> 32
processes, bounding this pair below the bar before Spark enters.

## Single-JVM thread scaling (transparency; {n_rows:,} docs, single run each)

| config | wall (s) | docs/sec |
|---|---|---|
| local[8]  | {single['wall_s_n']} | {single['docs_per_sec_n']} |
| local[32] | {single['wall_s_4n']} | {single['docs_per_sec_4n']} |

Efficiency = {single['scaling_efficiency']} — one JVM's Arrow socket path
anti-scales past ~8 in-JVM Python workers in this virtualized kernel; a
real cluster never runs 32 UDF workers against one JVM, which is why the
rule is evidenced with the multi-JVM pairs above.
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write(md)


if __name__ == "__main__":
    main()
