#!/bin/bash
# Round-close sf1 FLAGSHIP GATE (round-12 verdict #6, widened to NINE
# flagships by round-14 verdict #3 so every major family has a tracked
# decade ratio): jac_self_docs_ws_t05 / _t09, dedup_minhash_docs,
# dedup_cluster_docs, pipeline_curate_docs (the original five), plus
# ann_pq_ivf_trained_refined_topk (ANN/PQ), jac_rs_cust_supp_q3_t03 (R×S
# jaccard — needs the sf1 customer/supplier fixtures from
# tools/make_sf1_tpch.py), mm_wav_keep_docs (multimodal + generic Hamming
# lifecycle), dedup_simhash_docs (SimHash banding). Calibration QUARTET
# (trio + calib_jac_docs_slice since r15) forced in-session
# (SPARK_GRAFT_CALIBRATE=1), normalized by the pinned sf1 quartet epoch
# (Bench.calibrationRefSec — r15 re-pin, chained to the round-11 trio pin
# via the per-probe times; see BENCH_NOTES round 15).
# Scale regressions (e.g. the sf1 broadcast->SMJ shift at the 64 MB
# value-table threshold) become a tracked per-round number instead of an
# archaeology exercise: record the calibrated walls in BENCH_NOTES'
# close-out next to the previous round's.
#
# Usage: tools/sf1_gate.sh            (full artifact -> /tmp/sf1_gate.json)
# Knobs: SPARK_GRAFT_BENCH_RUNS (default 3 = warm best-of-3),
#        SPARK_GRAFT_PROBE_WAIT_SEC (default 0 - calibration normalizes the
#        window; set >0 to gate on a healthy one), SPARK_GRAFT_BENCH_OUT.
#
# Requires data/sf1/{documents,embeddings}.parquet (tracked fixtures); the
# flagship five and the calibration trio touch nothing else.
set -eu
cd "$(dirname "$0")/.."
test -f data/sf1/documents.parquet || { echo "data/sf1/documents.parquet missing" >&2; exit 1; }
test -f data/sf1/embeddings.parquet || { echo "data/sf1/embeddings.parquet missing" >&2; exit 1; }
test -f data/sf1/customer.parquet || { echo "data/sf1/customer.parquet missing - run tools/make_sf1_tpch.py" >&2; exit 1; }
test -f data/sf1/supplier.parquet || { echo "data/sf1/supplier.parquet missing - run tools/make_sf1_tpch.py" >&2; exit 1; }

ADD_OPENS="--add-opens java.base/java.io=ALL-UNNAMED \
--add-opens java.base/java.lang=ALL-UNNAMED \
--add-opens java.base/java.lang.invoke=ALL-UNNAMED \
--add-opens java.base/java.lang.reflect=ALL-UNNAMED \
--add-opens java.base/java.net=ALL-UNNAMED \
--add-opens java.base/java.nio=ALL-UNNAMED \
--add-opens java.base/java.util=ALL-UNNAMED \
--add-opens java.base/java.util.concurrent=ALL-UNNAMED \
--add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED \
--add-opens java.base/sun.nio.ch=ALL-UNNAMED \
--add-opens java.base/sun.nio.cs=ALL-UNNAMED \
--add-opens java.base/sun.security.action=ALL-UNNAMED \
--add-opens java.base/sun.util.calendar=ALL-UNNAMED"

exec env \
  SPARK_GRAFT_SF_DIR="$PWD/data/sf1" \
  SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
  SPARK_GRAFT_SHUFFLE_PARTITIONS="${SPARK_GRAFT_SHUFFLE_PARTITIONS:-64}" \
  SPARK_GRAFT_QUERIES=jac_self_docs_ws_t05,jac_self_docs_ws_t09,dedup_minhash_docs,dedup_cluster_docs,pipeline_curate_docs,ann_pq_ivf_trained_refined_topk,jac_rs_cust_supp_q3_t03,mm_wav_keep_docs,dedup_simhash_docs \
  SPARK_GRAFT_CALIBRATE=1 \
  SPARK_GRAFT_RECALL=0 \
  SPARK_GRAFT_BENCH_RUNS="${SPARK_GRAFT_BENCH_RUNS:-3}" \
  SPARK_GRAFT_PROBE_WAIT_SEC="${SPARK_GRAFT_PROBE_WAIT_SEC:-0}" \
  SPARK_GRAFT_BENCH_OUT="${SPARK_GRAFT_BENCH_OUT:-/tmp/sf1_gate.json}" \
  java $ADD_OPENS -Xmx64g -Dspark.ui.enabled=false \
    -cp "target/scala-2.13/classes:/opt/spark/jars/*" graft.Bench
