#!/usr/bin/env python3
"""Summarize a Spark event log: per-stage duration, shuffle, spill.

Usage: python3 tools/stages.py [appId|latest] [minSecs]
"""
import json, glob, os, sys

app = sys.argv[1] if len(sys.argv) > 1 else "latest"
min_secs = float(sys.argv[2]) if len(sys.argv) > 2 else 0.3

logs = sorted(glob.glob("/tmp/spark-events/*"), key=os.path.getmtime)
path = logs[-1] if app == "latest" else f"/tmp/spark-events/{app}"


def lines(p):
    # Spark 4 rolling logs are directories of events_* part files (zstd by default)
    parts = sorted(glob.glob(os.path.join(p, "events_*"))) if os.path.isdir(p) else [p]
    for part in parts:
        if part.endswith(".zstd"):
            import subprocess
            try:
                proc = subprocess.run(["zstd", "-dc", part], capture_output=True,
                                      text=True, check=True)
            except FileNotFoundError:
                sys.exit("error: zstd binary not found — cannot decompress " + part)
            except subprocess.CalledProcessError as e:
                sys.exit(f"error: zstd failed on {part} (rc={e.returncode}): {e.stderr.strip()}")
            yield from proc.stdout.splitlines()
        else:
            with open(part) as f:
                yield from f


stages = {}
events = []
for line in lines(path):
    try:
        events.append(json.loads(line))
    except json.JSONDecodeError:
        continue
# two passes: TaskEnd events stream BEFORE their StageCompleted event
for ev in events:
    if ev.get("Event") == "SparkListenerStageCompleted":
        si = ev["Stage Info"]
        sid = si["Stage ID"]
        dur = (si.get("Completion Time", 0) - si.get("Submission Time", 0)) / 1000.0
        # first graft frame in the call-site stack — far more telling than the
        # generic stage name for broadcast/subquery stages
        details = si.get("Details", "")
        site = next((ln.strip() for ln in details.split("\n")
                     if "graft" in ln and "Spec" not in ln), "")[:60]
        stages[sid] = {
            "name": (si["Stage Name"].split("\n")[0][:40] + " | " + site)[:110],
            "dur": dur,
            "tasks": si["Number of Tasks"],
            "read": 0, "write": 0, "spill": 0, "out": 0,
            "cpu": 0.0, "maxtask": 0.0, "recr": 0, "recw": 0,
        }
for ev in events:
    if ev.get("Event") == "SparkListenerTaskEnd":
        sid = ev["Stage ID"]
        if sid in stages and ev.get("Task Metrics"):
            m = ev["Task Metrics"]
            s = stages[sid]
            s["read"] += m.get("Shuffle Read Metrics", {}).get("Remote Bytes Read", 0) + \
                         m.get("Shuffle Read Metrics", {}).get("Local Bytes Read", 0)
            s["recr"] += m.get("Shuffle Read Metrics", {}).get("Total Records Read", 0) + \
                         m.get("Input Metrics", {}).get("Records Read", 0)
            s["write"] += m.get("Shuffle Write Metrics", {}).get("Shuffle Bytes Written", 0)
            s["recw"] += m.get("Shuffle Write Metrics", {}).get("Shuffle Records Written", 0)
            s["spill"] += m.get("Disk Bytes Spilled", 0)
            s["out"] += m.get("Output Metrics", {}).get("Records Written", 0)
            s["cpu"] += m.get("Executor CPU Time", 0) / 1e9
            s["maxtask"] = max(s["maxtask"], m.get("Executor Run Time", 0) / 1e3)

def mb(b): return f"{b/1e6:8.1f}MB"

total = sum(s["dur"] for s in stages.values())
print(f"{os.path.basename(path)}  stages={len(stages)}  sum_stage_secs={total:.1f}")
print(f"{'sid':>4} {'secs':>7} {'cpu_s':>7} {'maxT':>6} {'tasks':>5} {'recR':>9} {'recW':>9} {'shufR':>10} {'spill':>10}  name")
for sid, s in sorted(stages.items(), key=lambda kv: -kv[1]["dur"]):
    if s["dur"] < min_secs:
        continue
    print(f"{sid:>4} {s['dur']:>7.2f} {s['cpu']:>7.1f} {s['maxtask']:>6.1f} {s['tasks']:>5} "
          f"{s['recr']:>9} {s['recw']:>9} {mb(s['read'])} {mb(s['spill'])}  {s['name']}")
