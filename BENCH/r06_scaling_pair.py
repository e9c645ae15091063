"""Round-6 final-code N vs 4N scaling pair (VERDICT r5 next-round #1).

Drives BENCH/scaling.py's own helpers — ensure_input (shared byte-identical
fixture), run_once (fresh process per leg, logged to scaling_runs.jsonl),
pair (which ASSERTS cross-leg cluster-output identity before any efficiency
is computed) and calibrated_efficiencies — without calling its main(),
because main() rewrites BENCH/BASELINE.md and would drop the round-5
extras sections banked there.  Results go to BENCH/r06/scaling_2m.md.

Usage: python BENCH/r06_scaling_pair.py [n_rows] [repeats]
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
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    cache_root = os.path.join(scaling.shm_base() or "/tmp", "spark_graft_inputs")
    os.makedirs(cache_root, exist_ok=True)
    inp = scaling.ensure_input(n_rows, cache_root)

    runs = {"n": [], "4n": []}
    for r in range(repeats):
        for leg in ("n", "4n"):
            res = scaling.run_once(inp, n_rows, leg, r)
            if res is not None:
                runs[leg].append(res)
        if not runs["n"] or not runs["4n"]:
            continue
        p = scaling.pair(
            scaling.best_of(runs["n"], n_rows),
            scaling.best_of(runs["4n"], n_rows),
            4.0,
        )
        p["calibrated_efficiencies"] = scaling.calibrated_efficiencies(
            runs["n"], runs["4n"], 4.0
        )
        out = {
            "n_rows": n_rows,
            "repeats_done": r + 1,
            "pair": {
                k: p[k]
                for k in (
                    "wall_s_n", "wall_s_4n", "median_wall_s_n",
                    "median_wall_s_4n", "walls_n", "walls_4n",
                    "calibrations_n", "calibrations_4n",
                    "scaling_efficiency", "scaling_efficiency_median",
                    "calibrated_efficiencies",
                )
                if k in p
            },
            "identity_asserted": True,  # pair() raises otherwise
        }
        os.makedirs(os.path.join(REPO, "BENCH", "r06"), exist_ok=True)
        name = f"scaling_{n_rows // 1_000_000}m.json"
        with open(os.path.join(REPO, "BENCH", "r06", name), "w") as f:
            json.dump(out, f, indent=1)
        print(json.dumps(out))


if __name__ == "__main__":
    main()
