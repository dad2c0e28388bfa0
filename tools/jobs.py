#!/usr/bin/env python3
"""Summarize a Spark event log per JOB: duration, description, stages.

Usage: python3 tools/jobs.py [appId|latest] [minSecs]

Complements stages.py — broadcast/AQE-subquery stages carry useless stage
names, but their JOB description records the SQL call site that fired them.
"""
import json, glob, os, sys

app = sys.argv[1] if len(sys.argv) > 1 else "latest"
min_secs = float(sys.argv[2]) if len(sys.argv) > 2 else 0.3

logs = sorted(glob.glob("/tmp/spark-events/*"), key=os.path.getmtime)
if app == "latest":
    if not logs:
        sys.exit("no event logs in /tmp/spark-events — enable spark.eventLog.enabled")
    path = logs[-1]
else:
    path = f"/tmp/spark-events/{app}"
    if not os.path.exists(path):
        sys.exit(f"no event log at {path} — try 'latest' or one of: "
                 + ", ".join(os.path.basename(p) for p in logs[-5:]))


def lines(p):
    parts = sorted(glob.glob(os.path.join(p, "events_*"))) if os.path.isdir(p) else [p]
    for part in parts:
        if part.endswith(".zstd"):
            import subprocess
            proc = subprocess.run(["zstd", "-dc", part], capture_output=True,
                                  text=True, check=True)
            yield from proc.stdout.splitlines()
        else:
            with open(part) as f:
                yield from f


jobs = {}
for line in lines(path):
    try:
        ev = json.loads(line)
    except json.JSONDecodeError:
        continue
    e = ev.get("Event")
    if e == "SparkListenerJobStart":
        jid = ev["Job ID"]
        props = ev.get("Properties", {}) or {}
        jobs[jid] = {
            "start": ev.get("Submission Time", 0),
            "end": None,
            "desc": (props.get("spark.job.description", "") or
                     props.get("callSite.short", ""))[:90],
            "stages": [s["Stage ID"] for s in ev.get("Stage Infos", [])],
        }
    elif e == "SparkListenerJobEnd":
        jid = ev["Job ID"]
        if jid in jobs:
            jobs[jid]["end"] = ev.get("Completion Time", 0)

print(f"{os.path.basename(path)}  jobs={len(jobs)}")
print(f"{'jid':>4} {'secs':>8}  {'stages':<18} desc")
for jid, j in sorted(jobs.items()):
    if j["end"] is None:
        continue
    dur = (j["end"] - j["start"]) / 1000.0
    if dur < min_secs:
        continue
    st = ",".join(map(str, j["stages"][:6])) + ("…" if len(j["stages"]) > 6 else "")
    print(f"{jid:>4} {dur:>8.2f}  {st:<18} {j['desc']}")
