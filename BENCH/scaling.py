"""Two-parallelism scaling run — the sandbox evidence for the north rule's
"throughput scaling efficiency >= 0.8 between N and 4N executors".

Runs the identical pages pipeline (jobs/dedupe.py --fixture N) in separate
JVMs at local[8] and local[32] (N and 4N cores), reports docs/sec at both and
efficiency = (throughput_32 / throughput_8) / 4, and rewrites BENCH/BASELINE.md.

Usage: python BENCH/scaling.py [n_rows]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_once(cores: int, n_rows: int) -> dict:
    # /dev/shm models the distributed fast storage a real cluster checkpoints
    # to; a single local disk would serialize all 32 threads' stage writes
    base = "/dev/shm" if os.access("/dev/shm", os.W_OK) else None
    with tempfile.TemporaryDirectory(dir=base) as wh:
        out = subprocess.run(
            [
                sys.executable,
                os.path.join(REPO, "jobs", "dedupe.py"),
                "--fixture",
                str(n_rows),
                "--warehouse",
                wh,
                "--cores",
                str(cores),
                "--no-resume",
            ],
            capture_output=True,
            text=True,
            cwd=REPO,
            check=True,
        )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 300000
    lo, hi = 8, 32
    r_lo = run_once(lo, n_rows)
    r_hi = run_once(hi, n_rows)
    eff = (r_hi["docs_per_sec"] / r_lo["docs_per_sec"]) / (hi / lo)
    result = {
        "n_rows": n_rows,
        "cores_n": lo,
        "cores_4n": hi,
        "docs_per_sec_n": r_lo["docs_per_sec"],
        "docs_per_sec_4n": r_hi["docs_per_sec"],
        "wall_s_n": r_lo["wall_s"],
        "wall_s_4n": r_hi["wall_s"],
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(result))
    md = f"""# BENCH — two-parallelism scaling evidence (north rule)

Same job (`jobs/dedupe.py --fixture {n_rows}`), same deterministic input,
two parallelism levels in fresh JVMs (`local[{lo}]` stands in for an
N-executor cluster, `local[{hi}]` for 4N — no real cluster in this sandbox).

| cores | wall (s) | docs/sec |
|---|---|---|
| {lo} (N)  | {r_lo['wall_s']} | {r_lo['docs_per_sec']} |
| {hi} (4N) | {r_hi['wall_s']} | {r_hi['docs_per_sec']} |

**Scaling efficiency = (docs/sec@4N ÷ docs/sec@N) ÷ 4 = {eff:.3f}**
(north-rule gate: >= 0.8 means near-linear; >= 0.25 means any speedup at all;
the number above is what this build measured.)

Pipeline summary at {hi} cores: {json.dumps({k: r_hi[k] for k in ('n_clusters','n_dup_clusters','max_cluster_size') if k in r_hi})}

Reproduce: `python BENCH/scaling.py {n_rows}`
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)


if __name__ == "__main__":
    main()
