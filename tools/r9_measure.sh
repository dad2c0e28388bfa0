#!/bin/bash
# Round-9 gated measurement sequence (BENCH_NOTES protocol): poll host
# health until the window is HEALTHY by Bench's own thresholds (par_eff_mem
# >= 0.55, par_eff_cpu >= 0.75), then run — back-to-back in ONE window —
#   1. flagship-five docs queries at sf0.01 / sf0.1 / sf1  (scaling table)
#   2. graft.Rehearsal at sf0.1                 (multi-day ingest + compaction payoff)
#   3. tools/duck_bench.py                      (DuckDB head-to-head, same window)
#   4. full sf0.1 headline profile              (in-round record attempt)
# Health is re-probed between steps so a mid-sequence collapse is visible in
# the log. If no healthy window appears within MAX_WAIT_MIN, the sequence
# runs anyway (windows have been scarce for days) — the embedded probes then
# document what it measured.
#
# Serializes with everything else via the one-JVM-rule: a flock guarantees a
# single instance (two pollers ran concurrently on 2026-08-15 and would have
# fired into each other), and after the gate opens the script additionally
# waits for any foreign JVM (interactive sbt / check.py) to exit before the
# timed steps start, so polling can overlap interactive work safely.
set -u
cd /root/repo
exec 9>/tmp/r9_measure.lock
flock -n 9 || { echo "r9_measure.sh already running - refusing to double-start" >&2; exit 1; }
LOG=${LOG:-/tmp/r9_measure.log}
MAX_WAIT_MIN=${MAX_WAIT_MIN:-240}
POLL_SEC=${POLL_SEC:-150}
FLAGSHIP=jac_self_docs_ws_t05,jac_self_docs_ws_t09,dedup_minhash_docs,dedup_cluster_docs,pipeline_curate_docs,lm_bigram_docs,substring_dup_docs

probe() { # prints "cpu mem" efficiencies
  python3 tools/hosthealth.py 2>/dev/null | awk '
    /-proc (cpu|mem):/ {
      for (i = 1; i < NF; i++) if ($i == "efficiency") v = $(i + 1)
      if ($0 ~ /-proc cpu:/) cpu = v; else mem = v
    }
    END { print cpu + 0, mem + 0 }'
}

exec >>"$LOG" 2>&1
echo "=== r9 measurement sequence started $(date) ==="
t0=$(date +%s)
while true; do
  read -r cpu mem < <(probe)
  echo "$(date +%H:%M:%S) gate probe: cpu=$cpu mem=$mem"
  ok=$(awk -v c="$cpu" -v m="$mem" 'BEGIN { print (c >= 0.75 && m >= 0.55) ? 1 : 0 }')
  [ "$ok" = 1 ] && { echo "gate OPEN"; break; }
  waited=$(( ($(date +%s) - t0) / 60 ))
  [ "$waited" -ge "$MAX_WAIT_MIN" ] && { echo "gate TIMEOUT after ${waited} min - running anyway (annotate!)"; break; }
  sleep "$POLL_SEC"
done

# one-JVM rule: never start the timed steps while an interactive sbt/Spark
# JVM is live (probes read low under contention AND the measurement would be
# contended). Waits up to 30 min, then proceeds annotated.
jvm_wait_t0=$(date +%s)
while pgrep -f 'java.*(sbt-launch|graft\.)' >/dev/null 2>&1; do
  w=$(( ($(date +%s) - jvm_wait_t0) / 60 ))
  [ "$w" -ge 30 ] && { echo "foreign JVM still live after ${w} min - proceeding anyway (annotate!)"; break; }
  echo "$(date +%H:%M:%S) foreign JVM live - waiting before timed steps"
  sleep 60
done

run_bench() { # run_bench <sfdir> <extra env...>
  local sfdir=$1; shift
  env SPARK_GRAFT_SF_DIR="$sfdir" SPARK_GRAFT_RECALL=0 \
      SPARK_GRAFT_PROBE_WAIT_SEC=0 SPARK_GRAFT_BENCH_ATTEMPTS=1 "$@" \
      sbt -batch "runMain graft.Bench" 2>&1 | grep -E '"metric"|\[bench\]' | tail -40
}

echo "--- step 1: flagship five, three scales ---"
echo "[sf0.01]";  run_bench /root/testdata/sf0.01 SPARK_GRAFT_QUERIES=$FLAGSHIP
echo "[sf0.1]";   run_bench /root/testdata/sf0.1  SPARK_GRAFT_QUERIES=$FLAGSHIP
echo "[sf1]";     run_bench /root/repo/data/sf1   SPARK_GRAFT_QUERIES=$FLAGSHIP SPARK_GRAFT_SHUFFLE_PARTITIONS=64
read -r cpu mem < <(probe); echo "post-step-1 probe: cpu=$cpu mem=$mem"

echo "--- step 2: multi-day ingest rehearsal (sf0.1) ---"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Rehearsal" 2>&1 \
  | grep -vE '^\[info\] (welcome|loading|compiling|done |running)' | grep -E '^\[info\]|^\[error\]' | tail -30
read -r cpu mem < <(probe); echo "post-step-2 probe: cpu=$cpu mem=$mem"

echo "--- step 3: DuckDB head-to-head (sf0.1, same window) ---"
python3 tools/duck_bench.py /root/testdata/sf0.1 /tmp/verify_out/oracle_sql.json
read -r cpu mem < <(probe); echo "post-step-3 probe: cpu=$cpu mem=$mem"

echo "--- step 4: full sf0.1 headline profile ---"
env SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_PROBE_WAIT_SEC=0 \
    SPARK_GRAFT_BENCH_ATTEMPTS=1 sbt -batch "runMain graft.Bench" 2>&1 \
  | grep -E '"metric"|\[bench\]' | tail -45
read -r cpu mem < <(probe); echo "post-step-4 probe: cpu=$cpu mem=$mem"
echo "=== r9 measurement sequence finished $(date) ==="
