"""Stage iteration lab: re-run CHOSEN pipeline stages against a pre-built
warehouse under any master, with Spark event logging for scaling-loss
attribution.  Diagnostic tooling only — the graded numbers come from
BENCH/scaling.py (fresh full runs).

Usage:
  python BENCH/stage_lab.py <leg> <stages_csv> [input_path]
    leg        n | 4n | 32   (local-cluster[1,2,4096] / [4,2,4096] / local[32])
    stages_csv comma list of stage tables to force-recompute
               (e.g. verified_pairs,report) — deleted from a COPY of the
               lab warehouse, so the pristine copy is reusable
    input      default /dev/shm/spark_graft_inputs/pages_2000000

Prereq: /dev/shm/lab_wh built once via
  python jobs/dedupe.py --input <input> --cores 32 --warehouse /dev/shm/lab_wh --no-resume
Event logs land in /tmp/spark-events; analyze with BENCH/evlog.py.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LAB_WH = "/dev/shm/lab_wh"
RUN_WH = "/dev/shm/lab_run"
EVDIR = "/tmp/spark-events"

LEGS = {
    "n": (2, "local-cluster[1,2,4096]"),
    "4n": (8, "local-cluster[4,2,4096]"),
    "32": (32, None),
}


def main() -> None:
    leg = sys.argv[1]
    stages = sys.argv[2].split(",") if len(sys.argv) > 2 and sys.argv[2] else []
    input_path = (
        sys.argv[3] if len(sys.argv) > 3
        else "/dev/shm/spark_graft_inputs/pages_2000000"
    )
    cores, master = LEGS[leg]

    if os.path.exists(RUN_WH):
        shutil.rmtree(RUN_WH)
    shutil.copytree(LAB_WH, RUN_WH)
    for s in stages:
        p = os.path.join(RUN_WH, s)
        if os.path.exists(p):
            shutil.rmtree(p)

    os.makedirs(EVDIR, exist_ok=True)
    env = dict(os.environ)
    env["SPARK_GRAFT_EXTRA_CONF"] = (
        f"spark.eventLog.enabled=true;spark.eventLog.dir=file://{EVDIR}"
    )
    cmd = [
        sys.executable, os.path.join(REPO, "jobs", "dedupe.py"),
        "--input", input_path, "--cores", str(cores),
        "--warehouse", RUN_WH,
    ]
    if master:
        cmd += ["--master", master]
    t0 = time.time()
    out = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True, text=True)
    wall = time.time() - t0
    if out.returncode != 0:
        print(out.stderr[-4000:])
        sys.exit(1)
    print(out.stdout.strip().splitlines()[-1])
    print(f"LAB leg={leg} recomputed={stages} wall={wall:.1f}s")
    evs = sorted(
        (os.path.join(EVDIR, f) for f in os.listdir(EVDIR)),
        key=os.path.getmtime,
    )
    if evs:
        print(f"eventlog: {evs[-1]}")


if __name__ == "__main__":
    main()
