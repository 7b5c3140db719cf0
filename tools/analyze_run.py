"""Summarise train_sanity JSONL logs into the PERF.md validation table.

Usage:
  python tools/analyze_run.py /tmp/long_run_nerf.jsonl [/tmp/run_hash.jsonl ...]

Prints a markdown table of PSNR / DDF-depth-PSNR / s_val / loss at the
milestone steps (1.5k/5k/10k/20k) plus monotonicity checks (VERDICT r1
task 6: "PSNR@{1.5k, 5k, 10k, 20k}, monotone s_val anneal").
No JAX imports — safe to run next to a live TPU process.
"""

from __future__ import annotations

import json
import sys

MILESTONES = (500, 1500, 5000, 10000, 15000, 20000)


def load(path):
    recs = [json.loads(line) for line in open(path) if line.strip()]
    return {r["step"]: r for r in recs}, recs


def summarise(path):
    by_step, recs = load(path)
    name = recs[0].get("ddf_encoding", "?") if recs else "?"
    rows = []
    for m in MILESTONES:
        r = by_step.get(m)
        if r:
            rows.append(
                f"| {m} | {r['psnr']:.2f} | {r['ddf_depth_psnr']:.2f} "
                f"| {r['s_val']:.4f} | {r['total_loss']:.3f} |"
            )
    svals = [r["s_val"] for r in recs]
    psnrs = [r["psnr"] for r in recs]
    # s_val anneal: allow tiny upticks (stochastic), flag real reversals
    reversals = sum(
        1 for a, b in zip(svals, svals[1:]) if b > a * 1.25 and b > 0.01
    )
    print(f"\n### {path}  (ddf_encoding={name}, {len(recs)} records)")
    print("| step | train PSNR | DDF depth PSNR | s_val | loss |")
    print("|---|---|---|---|---|")
    print("\n".join(rows))
    last = recs[-1]
    print(
        f"final: step {last['step']}, PSNR {last['psnr']:.2f}, "
        f"DDF {last['ddf_depth_psnr']:.2f}, s_val {last['s_val']:.5f}"
    )
    print(
        f"s_val reversals>25%: {reversals}; "
        f"PSNR trend {psnrs[0]:.2f} → max {max(psnrs):.2f}"
    )


def compare(paths):
    """Side-by-side A/B at shared milestone steps (e.g. DDF hash vs nerf,
    VERDICT r1 task 7)."""
    runs = []
    for p in paths:
        by_step, recs = load(p)
        runs.append((recs[0].get("ddf_encoding", p) if recs else p, by_step))
    steps = sorted(set.intersection(*(set(b) for _, b in runs)) & set(MILESTONES))
    if not steps:
        return
    print("\n### A/B comparison (shared milestones)")
    hdr = " | ".join(f"{n} psnr / ddf-psnr" for n, _ in runs)
    print(f"| step | {hdr} |")
    print("|" + "---|" * (len(runs) + 1))
    def fmt(rec, key):
        v = rec.get(key)
        return f"{v:.2f}" if isinstance(v, (int, float)) else "—"

    for s in steps:
        cells = " | ".join(
            f"{fmt(b[s], 'psnr')} / {fmt(b[s], 'ddf_depth_psnr')}" for _, b in runs
        )
        print(f"| {s} | {cells} |")


if __name__ == "__main__":
    for p in sys.argv[1:]:
        summarise(p)
    if len(sys.argv) > 2:
        compare(sys.argv[1:])
