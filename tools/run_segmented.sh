#!/bin/bash
# Segmented long-run driver: the axon tunnel can WEDGE a TPU process after
# ~1h of continuous stepping (observed twice, 2026-08-17), so long
# train_sanity runs execute as bounded segments with checkpoint+resume.
# A wedged segment is killed by `timeout` and the loop resumes from the
# last checkpoint — cost of a wedge is ≤ one segment, not the run.
#
# Usage: tools/run_segmented.sh <total_steps> <ckpt_dir> <out_jsonl> [extra args...]
set -u
TOTAL=$1; CKPT=$2; OUT=$3; shift 3
SEG=${SEG:-2000}            # steps per segment (~14 min + compile)
SEG_TIMEOUT=${SEG_TIMEOUT:-1800}
COOLDOWN=${COOLDOWN:-90}    # tunnel lease release between processes

for attempt in $(seq 1 40); do
  timeout -k 30 "$SEG_TIMEOUT" python tools/train_sanity.py "$TOTAL" 500 \
    --out "$OUT" --ckpt-dir "$CKPT" --resume --segment-steps "$SEG" "$@"
  rc=$?
  if [ "$rc" -eq 0 ]; then
    echo "{\"segmented_run\": \"complete\", \"attempts\": $attempt}"
    exit 0
  elif [ "$rc" -eq 3 ]; then
    echo "{\"segment\": $attempt, \"status\": \"ok\"}"
  else
    echo "{\"segment\": $attempt, \"status\": \"killed rc=$rc (wedge?)\"}"
  fi
  sleep "$COOLDOWN"
done
echo '{"segmented_run": "gave up after 40 segments"}'
exit 1
