#!/bin/bash
# Round-4 post-long-run TPU queue. Run ONLY after the 20k segmented run has
# exited (one TPU process at a time — CLAUDE.md hazards). Items are ordered
# by judge priority (VERDICT r3): eval-protocol metrics first, then the
# NeRF-OSR protocol exercise, then the perf A/Bs. 75 s gaps between TPU
# processes (tunnel-lease hygiene, .claude/skills/verify/SKILL.md).
set -u
cd /root/repo
GAP=75
CKPT=${CKPT:-/root/ckpts/r4_var}
PRIOR=${PRIOR:-checkpoints/reni_prior_variational}

run() { # run <logfile> <cmd...>
  local log=$1; shift
  echo "=== $(date +%H:%M:%S) :: $*" | tee -a "$log"
  timeout 2400 "$@" 2>&1 | tee -a "$log"
  echo "--- exit=$? $(date +%H:%M:%S)" | tee -a "$log"
  sleep "$GAP"
}

bench() { # bench <outfile> [ENV=V ...] — stdout JSON line → outfile
  local out=$1; shift
  echo "=== $(date +%H:%M:%S) :: bench $* -> $out" | tee -a /tmp/r4_post_bench.log
  timeout 2400 env "$@" python bench.py > "$out" 2>>/tmp/r4_post_bench.log
  echo "--- exit=$? $(date +%H:%M:%S)" | tee -a /tmp/r4_post_bench.log
  cat "$out" | tee -a /tmp/r4_post_bench.log
  sleep "$GAP"
}

mkdir -p results/panels_r4

# 1. First-ever eval-image metrics from a trained checkpoint (VERDICT task 1)
run /tmp/r4_post_eval.log python tools/eval_from_ckpt.py \
  --ckpt-dir "$CKPT" --prior-dir "$PRIOR" \
  --num-eval-cameras 4 --fit-steps 250 \
  --out results/r4_eval_variational.json --panels results/panels_r4

# 2. NeRF-OSR relighting protocol on the same checkpoint (VERDICT task 8)
run /tmp/r4_post_proto.log python -m neusky_tpu.cli eval neusky \
  --data /tmp/nerfosr_fixture8 --scene site1 \
  --session-holdout-indices 0,0 --load-dir "$CKPT" --protocol nerfosr \
  --output results/r4_nerfosr_protocol.json \
  --model.illumination_prior_dir "$PRIOR"

# 3-6. Perf A/Bs (VERDICT task 4). Box must be QUIET during these.
bench results/r4_bench_base2.json
bench results/r4_bench_fusedgt.json NEUSKY_FUSED_GT=1
bench results/r4_bench_bf16tables.json NEUSKY_BF16_TABLES=1
bench results/r4_bench_fused_bf16t.json NEUSKY_FUSED_GT=1 NEUSKY_BF16_TABLES=1
echo "postrun queue complete $(date)"
