#!/usr/bin/env bash
# Submit the index build to a running Ray cluster (north rule: the same
# job at N-node and 4N-node cluster sizes; see BASELINE.md for the
# sandbox stand-in measurement).
#
#   RAY_ADDRESS=http://<head>:8265 ./jobs/submit.sh s3://bucket/corpus s3://bucket/index-v1
set -euo pipefail
INPUT=${1:?corpus path}
INDEX=${2:?index output dir (shared storage)}
ray job submit \
  --working-dir "$(dirname "$0")/.." \
  --no-wait \
  -- python jobs/build_job.py --input "$INPUT" --index "$INDEX"
