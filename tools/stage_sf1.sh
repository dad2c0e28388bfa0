#!/bin/bash
# Stage the sf1 PROFILE directory: the 10x documents/embeddings fixtures are
# tracked in git (tools/make_sf1.py / make_sf1_embeddings.py); the remaining
# tables are verbatim sf0.1 copies so the FULL 35-query headline can run at
# "sf1" (docs/embeddings-side queries see 10x data; TPC-H/event-side queries
# see sf0.1 — annotate ratios accordingly: only docs/embeddings ratios are
# scaling signals).
set -eu
cd "$(dirname "$0")/.."
for t in region nation customer supplier part orders lineitem events; do
  cp -f "/root/testdata/sf0.1/$t.parquet" "data/sf1/$t.parquet"
done
echo "staged data/sf1 ($(ls data/sf1 | wc -l) tables)"
