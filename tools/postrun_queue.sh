#!/bin/bash
# Hardened serial TPU job queue (VERDICT r4 weak #5 / task 7).
#
# r4's postrun runner had two failure modes this fixes:
#   1. `cmd | tee log; echo exit=$?` reported TEE's status — a crashing
#      item logged `exit=0` (tools/r4_postrun.sh:17-19).  Here the item's
#      own status is taken from PIPESTATUS[0].
#   2. a mid-queue stall/crash silently ate every later item.  Here each
#      completed item writes a done-marker; re-running the queue skips
#      completed items and resumes at the first unfinished one, and a
#      failing item is recorded in FAILED (queue continues — later items
#      are independent TPU jobs).
#
# usage: postrun_queue.sh <queue.txt> <state_dir>
#   queue.txt: one shell command per line ('#' comments / blanks ignored).
#     Items needing a bound runtime should carry their own `timeout N`.
#   state_dir: markers + logs + FAILED list live here (survives reruns).
set -u
QUEUE="$1"
STATE="$2"
mkdir -p "$STATE"
: > "$STATE/FAILED.tmp"
i=0
while IFS= read -r cmd; do
  case "$cmd" in ''|\#*) continue ;; esac
  i=$((i + 1))
  id=$(printf 'item%02d' "$i")
  marker="$STATE/$id.done"
  log="$STATE/$id.log"
  if [ -f "$marker" ]; then
    echo "=== $id already done ($(head -c 80 "$marker")) — skip"
    continue
  fi
  echo "=== $(date +%H:%M:%S) $id :: $cmd"
  set -o pipefail
  bash -c "$cmd" 2>&1 | tee "$log"
  rc=${PIPESTATUS[0]}
  set +o pipefail
  echo "--- $(date +%H:%M:%S) $id exit=$rc"
  if [ "$rc" -eq 0 ]; then
    echo "$cmd" > "$marker"
  else
    echo "!!! $id FAILED rc=$rc — continuing with later items"
    echo "$id rc=$rc :: $cmd" >> "$STATE/FAILED.tmp"
  fi
done < "$QUEUE"
mv "$STATE/FAILED.tmp" "$STATE/FAILED"
if [ -s "$STATE/FAILED" ]; then
  echo "queue finished with failures:"
  cat "$STATE/FAILED"
  exit 1
fi
echo "queue finished clean ($i items)"
