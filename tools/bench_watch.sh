#!/bin/bash
# Round-long healthy-window watcher (round-9 verdict #4a; BENCH_NOTES
# protocol). The host's healthy windows — if they exist at all — have never
# coincided with a bounded pre-bench gate (7 h of polling in round 9 peaked
# at par_eff_mem 0.42 vs the 0.55 bar), so instead of gating each bench run,
# this loop runs for the WHOLE round and fires ONE official bench the moment
# the window actually clears, then exits.
#
#   nohup tools/bench_watch.sh >/dev/null 2>&1 &
#
# Polls a cheap process-parallel memory-bandwidth probe (the same shape as
# tools/hosthealth.py's mem probe — the number that correlates with bench
# inflation). Skips the firing when any JVM is running: concurrent JVMs
# contaminate both the probe and the bench (one JVM at a time).
#
# Env: MIN_MEM (default 0.55), POLL seconds (default 120),
#      OUT artifact path (default /root/repo/BENCH_healthy_window.json),
#      LOG (default /tmp/bench_watch.log).
set -u
MIN_MEM="${MIN_MEM:-0.55}"
OUT="${OUT:-/root/repo/BENCH_healthy_window.json}"
LOG="${LOG:-/tmp/bench_watch.log}"
POLL="${POLL:-120}"
cd /root/repo || exit 1

probe() {
  python3 - <<'EOF'
import os, time
from concurrent.futures import ProcessPoolExecutor
import numpy as np

def memwork(_=None):
    a = np.zeros(4_000_000, dtype=np.int64)
    h = 0
    for _ in range(4):
        a += 1
        h += int(a[::8].sum())
    return h

n = os.cpu_count() or 1
with ProcessPoolExecutor(n) as ex:
    list(ex.map(abs, range(n)))   # spawn+import outside the timed region
    memwork()                     # warm single
    t0 = time.time(); memwork(); single = time.time() - t0
    t0 = time.time(); list(ex.map(memwork, range(n))); par = time.time() - t0
print(f"{single/par:.3f}")
EOF
}

echo "$(date +%F' '%H:%M:%S) watcher started (min_mem=$MIN_MEM poll=${POLL}s)" >> "$LOG"
while true; do
  eff=$(probe)
  ts=$(date +%H:%M:%S)
  if pgrep -x java >/dev/null 2>&1; then
    echo "$ts mem_eff=$eff (JVM busy; not firing)" >> "$LOG"
  elif python3 -c "exit(0 if float('$eff') >= float('$MIN_MEM') else 1)"; then
    echo "$ts mem_eff=$eff >= $MIN_MEM -- firing official bench" >> "$LOG"
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_PROBE_WAIT_SEC=0 \
      SPARK_GRAFT_BENCH_ATTEMPTS=1 sbt -batch "runMain graft.Bench" \
      > /tmp/bench_watch_run.log 2>&1
    grep '"metric"' /tmp/bench_watch_run.log | tail -1 > "$OUT"
    echo "$(date +%H:%M:%S) bench done -> $OUT" >> "$LOG"
    exit 0
  else
    echo "$ts mem_eff=$eff < $MIN_MEM" >> "$LOG"
  fi
  sleep "$POLL"
done
