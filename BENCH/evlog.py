"""Spark event-log analyzer: per-job / per-stage wall, task-time sums, and
straggler shape — attributes WHERE a leg's wall clock goes.

Usage: python BENCH/evlog.py <eventlog file> [min_stage_s]
"""

from __future__ import annotations

import io
import json
import os
import subprocess
import sys


def open_eventlog(path: str):
    """Accept a plain file, a rolling-eventlog dir, or a .zstd file."""
    if os.path.isdir(path):
        cands = sorted(
            f for f in os.listdir(path) if f.startswith("events_")
        )
        path = os.path.join(path, cands[-1])
    if path.endswith(".zstd"):
        out = subprocess.run(
            ["zstd", "-dc", path], capture_output=True, check=True
        )
        return io.StringIO(out.stdout.decode())
    return open(path)


def main() -> None:
    path = sys.argv[1]
    min_s = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5

    jobs = {}       # id -> dict
    stages = {}     # id -> dict
    tasks = {}      # stage id -> list of task wall_s
    app_start = None

    with open_eventlog(path) as f:
        for line in f:
            try:
                e = json.loads(line)
            except json.JSONDecodeError:
                continue
            ev = e.get("Event")
            if ev == "SparkListenerApplicationStart":
                app_start = e["Timestamp"]
            elif ev == "SparkListenerJobStart":
                jobs[e["Job ID"]] = {
                    "t0": e["Submission Time"],
                    "stages": [s["Stage ID"] for s in e["Stage Infos"]],
                    "desc": (e.get("Properties") or {}).get(
                        "spark.job.description", ""
                    )[:60],
                }
            elif ev == "SparkListenerJobEnd":
                if e["Job ID"] in jobs:
                    jobs[e["Job ID"]]["t1"] = e["Completion Time"]
            elif ev == "SparkListenerStageCompleted":
                si = e["Stage Info"]
                stages[si["Stage ID"]] = {
                    "name": si["Stage Name"].split("\n")[0][:70],
                    "tasks": si["Number of Tasks"],
                    "t0": si.get("Submission Time"),
                    "t1": si.get("Completion Time"),
                }
            elif ev == "SparkListenerTaskEnd":
                ti = e["Task Info"]
                sid = e["Stage ID"]
                tasks.setdefault(sid, []).append(
                    (ti["Finish Time"] - ti["Launch Time"]) / 1e3
                )

    print(f"{'job':>4} {'wall_s':>8}  {'stages':<18} desc")
    for jid in sorted(jobs):
        j = jobs[jid]
        if "t1" not in j:
            continue
        w = (j["t1"] - j["t0"]) / 1e3
        if w < min_s:
            continue
        rel = (j["t0"] - app_start) / 1e3 if app_start else 0
        print(f"{jid:>4} {w:8.1f}  @{rel:7.1f}s {j['stages']}")
        for sid in sorted(j["stages"]):
            s = stages.get(sid)
            if not s or not s.get("t0"):
                continue
            sw = (s["t1"] - s["t0"]) / 1e3
            if sw < min_s:
                continue
            ts = sorted(tasks.get(sid, []))
            tsum = sum(ts)
            tmax = ts[-1] if ts else 0.0
            tmed = ts[len(ts) // 2] if ts else 0.0
            print(
                f"      stage {sid:>4} {sw:7.1f}s tasks={s['tasks']:<4}"
                f" tsum={tsum:7.1f}s tmed={tmed:6.2f}s tmax={tmax:7.2f}s"
                f"  {s['name']}"
            )


if __name__ == "__main__":
    main()
