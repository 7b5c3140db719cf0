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
bench results/r4_bench_visremat.json NEUSKY_FUSED_GT=1 NEUSKY_VIS_REMAT=dots

# 7. Fused-GT training-quality A/B: 2k steps, same prior/config as the long
#    run's first 2k steps (results/r4_long_variational.jsonl is the control
#    arm). Compare psnr/ddf_depth_psnr/loss at matched steps before any
#    default flip.
echo "=== $(date +%H:%M:%S) :: fused-GT 2k quality arm" | tee -a /tmp/r4_post_ab.log
NEUSKY_FUSED_GT=1 bash tools/run_segmented.sh 2000 /root/ckpts/r4_fused2k \
  results/r4_ab_fusedgt.jsonl --prior-dir checkpoints/reni_prior_variational \
  2>&1 | tail -5 | tee -a /tmp/r4_post_ab.log
sleep "$GAP"

# 8. DDF hash-vs-nerf quality A/B at a FEASIBLE grid (VERDICT task 5): the
#    nerf arm is again the long run's first 2k steps.
echo "=== $(date +%H:%M:%S) :: DDF-hash 2k quality arm" | tee -a /tmp/r4_post_ab.log
NEUSKY_DDF_ENCODING=hash NEUSKY_DDF_HASH_LEVELS=8 NEUSKY_DDF_HASH_LOG2=15 \
  LOG_EVERY=25 STALE_S=900 \
  bash tools/run_segmented.sh 2000 /root/ckpts/r4_ddfhash2k \
  results/r4_ab_ddfhash2k.jsonl --prior-dir checkpoints/reni_prior_variational \
  2>&1 | tail -5 | tee -a /tmp/r4_post_ab.log
# 9. GT-illumination ceiling probe (VERDICT task 6): oracle light table in
#    place of RENI — the synthetic-scene PSNR ceiling becomes a measured
#    number ("post-fix run reaches Y of ceiling Z").
echo "=== $(date +%H:%M:%S) :: GT-illumination ceiling 5k" | tee -a /tmp/r4_post_ab.log
bash tools/run_segmented.sh 5000 /root/ckpts/r4_ceiling \
  results/r4_ceiling.jsonl --gt-illumination \
  2>&1 | tail -5 | tee -a /tmp/r4_post_ab.log
echo "postrun queue complete $(date)"
