#!/bin/bash
# Segmented long-run driver: the axon tunnel can WEDGE a TPU process
# mid-run (observed three times, 2026-08-17: zero CPU, blocked forever in a
# device call). Long train_sanity runs therefore execute as bounded
# segments with checkpoint+resume AND a log-staleness watchdog: if the
# JSONL log stops advancing for STALE_S seconds, the segment is killed and
# the loop resumes from the last checkpoint — a wedge costs minutes, not
# the run.
#
# Usage: tools/run_segmented.sh <total_steps> <ckpt_dir> <out_jsonl> [extra args...]
set -u
TOTAL=$1; CKPT=$2; OUT=$3; shift 3
SEG=${SEG:-2000}           # steps per segment invocation
STALE_S=${STALE_S:-600}    # no log progress for this long → kill segment
GRACE_S=${GRACE_S:-1200}   # allowance for compile+restore before first log
                           # (full-scale FIRST compile is ~10 min on this
                           # 1-core box; 420 s killed healthy compiling
                           # segments — train_sanity now also uses the
                           # persistent compile cache so resumes are fast)
COOLDOWN=${COOLDOWN:-90}   # tunnel lease release between processes
LOG_EVERY=${LOG_EVERY:-100}  # heartbeat steps; keep LOG_EVERY*s_per_step
                             # WELL below STALE_S (hash-DDF steps run >3 s
                             # — 100-step heartbeat outlived the 300 s
                             # window and the watchdog killed healthy
                             # segments at ~step 95, before the first
                             # checkpoint: futile restart-from-zero loop)

HEART="$CKPT.heartbeat"    # touched ONLY by logged steps — NOT by startup
                           # provenance writes to $OUT (those collapsed the
                           # compile grace into the staleness window and
                           # killed healthy compiling segments, r4)
mkdir -p "$(dirname "$HEART")" 2>/dev/null

for attempt in $(seq 1 60); do
  # log every $LOG_EVERY steps: the staleness watchdog needs a heartbeat
  # faster than STALE_S even when steps run slow (a 250-step interval at
  # >1.2 s/step outlives the window and the watchdog kills a HEALTHY run)
  python tools/train_sanity.py "$TOTAL" "$LOG_EVERY" \
    --out "$OUT" --ckpt-dir "$CKPT" --resume --heartbeat "$HEART" \
    --segment-steps "$SEG" --ckpt-every 500 "$@" &
  pid=$!
  start=$(date +%s)
  rc=""
  while true; do
    sleep 20
    if ! kill -0 "$pid" 2>/dev/null; then
      wait "$pid"; rc=$?
      break
    fi
    now=$(date +%s)
    # staleness relative to the most recent of (segment start, last
    # HEARTBEAT) — only logged steps count as progress for THIS segment
    last=$start
    if [ -f "$HEART" ]; then
      mt=$(stat -c %Y "$HEART")
      [ "$mt" -gt "$last" ] && last=$mt
    fi
    age=$(( now - last ))
    limit=$STALE_S
    [ "$last" = "$start" ] && limit=$GRACE_S  # still compiling/restoring
    if [ "$age" -gt "$limit" ]; then
      echo "{\"segment\": $attempt, \"status\": \"stale ${age}s — killing wedged pid $pid\"}"
      # SIGINT first: a clean interpreter exit releases the tunnel lease
      # immediately; SIGKILL poisons it for 15-20 min (PERF.md r3)
      kill -INT "$pid" 2>/dev/null; sleep 30
      kill -0 "$pid" 2>/dev/null && kill -9 "$pid" 2>/dev/null
      rc=99
      break
    fi
  done
  if [ "$rc" = "0" ]; then
    echo "{\"segmented_run\": \"complete\", \"attempts\": $attempt}"
    exit 0
  fi
  echo "{\"segment\": $attempt, \"rc\": $rc}"
  sleep "$COOLDOWN"
done
echo '{"segmented_run": "gave up after 60 segments"}'
exit 1
