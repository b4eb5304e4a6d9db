#!/usr/bin/env python3
"""Summarize a Spark event log: per-SQL-execution and per-job wall time.

Usage: python3 tools/evlog.py /tmp/ev/<appid> [--jobs]
Prints SQL executions (desc, duration) and the gaps (driver-side time
between jobs), which is where planning/codegen/collect overhead hides.
"""
import json, sys

def main(path, show_jobs=False):
    jobs = {}       # id -> (t0, t1, desc)
    sqls = {}       # id -> (t0, t1, desc)
    order = []
    with open(path) as f:
        for line in f:
            try:
                e = json.loads(line)
            except json.JSONDecodeError:
                continue
            ev = e.get("Event", "")
            if ev == "SparkListenerJobStart":
                jid = e["Job ID"]
                desc = e.get("Properties", {}).get("spark.job.description", "")
                jobs[jid] = [e["Submission Time"], None, desc]
            elif ev == "SparkListenerJobEnd":
                jid = e["Job ID"]
                if jid in jobs:
                    jobs[jid][1] = e["Completion Time"]
            elif ev.endswith("SparkListenerSQLExecutionStart"):
                sid = e["executionId"]
                sqls[sid] = [e["time"], None, e.get("description", "")[:90]]
                order.append(sid)
            elif ev.endswith("SparkListenerSQLExecutionEnd"):
                sid = e["executionId"]
                if sid in sqls:
                    sqls[sid][1] = e["time"]
    print("== SQL executions ==")
    tot = 0.0
    for sid in order:
        t0, t1, d = sqls[sid]
        if t1 is None:
            continue
        dur = (t1 - t0) / 1000.0
        tot += dur
        print(f"{dur:8.2f}s  #{sid}  {d}")
    print(f"   total SQL exec time: {tot:.2f}s")
    if show_jobs:
        print("== Jobs ==")
        prev_end = None
        for jid in sorted(jobs):
            t0, t1, d = jobs[jid]
            if t1 is None:
                continue
            gap = (t0 - prev_end) / 1000.0 if prev_end else 0.0
            prev_end = t1
            print(f"job {jid:4d} {(t1-t0)/1000.0:8.2f}s  gap-before {gap:7.2f}s  {d[:70]}")

if __name__ == "__main__":
    main(sys.argv[1], "--jobs" in sys.argv)
