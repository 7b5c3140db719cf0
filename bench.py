"""Benchmark: rays/sec/chip of the joint NeuSky training step on real TPU.

Counts the FULL joint step — scene ray batch + DDF-fit batch + sky rays —
matching the reference's step semantics (``neusky_pipeline.py:240-291``,
SURVEY §6).  Canonical scale: 1024 scene rays, 512(→492 icosphere)
illumination directions, full-size fields (hash 16×2^19, SDF 2×256,
DDF FiLM 5×256, RENI latent 100 w/ 6 attention layers), proposal
(256, 96) → 48 NeuS samples.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline derivation (no published numbers exist — SURVEY §6): the reference
trains 100,001 joint steps of (1024 scene + 1024 DDF + 256 sky) rays on a
single 24 GB CUDA GPU; at a representative ~1.2 steps/s that is ≈2,800
rays/s. ``vs_baseline`` = measured / 2800.
"""

from __future__ import annotations

import json
import time

A100_BASELINE_RAYS_PER_SEC = 2800.0


def main():
    import os
    import signal

    # persistent compile cache: full-scale executables take minutes to build
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")

    # The device tunnel can wedge so hard that even jax.devices() blocks
    # forever (observed r2). Emit a parseable failure line instead of
    # hanging whoever invoked us.
    def _dead(_sig, _frm):
        print(
            json.dumps(
                {
                    "metric": "joint_train_rays_per_sec_per_chip",
                    "value": 0.0,
                    "unit": "rays/s",
                    "vs_baseline": 0.0,
                    "error": "device tunnel unresponsive (init watchdog)",
                }
            ),
            flush=True,
        )
        os._exit(2)

    signal.signal(signal.SIGALRM, _dead)
    signal.alarm(600)

    import jax

    jax.devices()  # fail fast here, not mid-bench
    signal.alarm(0)
    import jax.numpy as jnp
    import numpy as np

    from neusky_tpu.data.datamanager import DataManager, DataManagerConfig
    from neusky_tpu.data.pixel_sampler import PixelSamplerConfig
    from neusky_tpu.data.synthetic import SyntheticSceneConfig, generate_synthetic_scene
    from neusky_tpu.engine.optimizers import (
        build_optimizer,
        default_neusky_optimizer_groups,
    )
    from neusky_tpu.models.neusky import NeuSkyModel
    from neusky_tpu.models.pipeline import PipelineConfig
    from neusky_tpu.configs.neusky_config import neusky_model_config
    from neusky_tpu.parallel.mesh import make_train_step_split
    from neusky_tpu.sampling.ddf_sampler import DDFSamplerConfig

    from neusky_tpu.configs.env_overrides import (
        apply_env_knobs,
        effective_summary,
        knob_summary,
    )

    # bench measures with the bf16 FiLM mapping ON (+5.5% throughput,
    # quiet-box r3 A/B) while the TRAINING default stays OFF until the
    # convergence-quality A/B lands (r3 advisor finding; fields/ddf.py).
    # The effective values are recorded in the output JSON either way.
    os.environ.setdefault("NEUSKY_BF16_MAPPING", "1")

    # A/B knobs for perf experiments (no code edits between runs) — shared
    # with tools/train_sanity.py so bench and training A/Bs see one config
    cfg = apply_env_knobs(neusky_model_config(num_train_data=8, num_eval_data=2))
    model = NeuSkyModel(cfg)
    pipe = PipelineConfig(
        visibility_train_sampler=DDFSamplerConfig(
            num_samples_on_sphere=8, num_rays_per_sample=128,
            only_sample_upper_hemisphere=True, concentration=20.0,
        ),
        num_sky_rays=256,
    )

    scene = generate_synthetic_scene(
        SyntheticSceneConfig(num_cameras=8, width=64, height=64)
    )
    dm = DataManager(
        DataManagerConfig(
            pixel_sampler=PixelSamplerConfig(images_per_batch=8, rays_per_image=128),
            num_sky_rays=256,
            # C++ prefetch sampler (native/batch_sampler.cpp); numpy fallback
            use_native_sampler=os.environ.get("NEUSKY_BENCH_NATIVE", "1")
            not in ("0", "", "false"),
        ),
        scene["cameras"], scene["images"], scene["masks"],
    )

    params = model.init(jax.random.PRNGKey(0))
    from neusky_tpu.engine.checkpoint import load_illumination_prior

    params = load_illumination_prior(params, cfg)  # frozen trained decoder
    optimizer = build_optimizer(params, default_neusky_optimizer_groups(100001))
    opt_state = optimizer.init(params)
    if os.environ.get("NEUSKY_BENCH_SPLIT", ""):
        # split compilation: scene grad + DDF-fit grad + one summed update —
        # numerically identical to the fused step (tested) with lower peak
        # HBM; apply's output layouts pinned to its inputs (mesh.py)
        step_fn = make_train_step_split(
            model, pipe, optimizer,
            example_params=params, example_opt_state=opt_state,
        )
    else:
        # one executable for the whole joint step (scene+DDF grads+update):
        # fits HBM since the pad-free table layout, ~8% faster than split
        from neusky_tpu.parallel.mesh import make_train_step

        step_fn = make_train_step(model, pipe, optimizer)

    rng = jax.random.PRNGKey(1)
    batch = dm.next_train(0)

    # rays per joint step (reference semantics)
    s = pipe.visibility_train_sampler
    n_scene = (
        batch["ray_bundle"].origins.shape[0]
        if "ray_bundle" in batch
        else batch["pixel_coords"].shape[0]
    )
    n_sky = (
        batch["sky_ray_bundle"].origins.shape[0]
        if "sky_ray_bundle" in batch
        else batch["sky_cam_idx"].shape[0]
    )
    rays_per_step = (
        n_scene + s.num_samples_on_sphere * s.num_rays_per_sample + n_sky
    )

    # warmup / compile: 3 steps — step 0 compiles, step 1 must NOT recompile
    # (apply's outputs are layout-pinned to its inputs; a recompile here
    # would mean the layout fixed point regressed — see parallel/mesh.py)
    for w in range(3):
        params, opt_state, aux = step_fn(
            params, opt_state, batch, rng, np.float32(w)
        )
    jax.block_until_ready(aux["total_loss"])

    import sys

    trace_dir = None
    if "--trace" in sys.argv:
        trace_dir = os.environ.get("NEUSKY_TRACE_DIR", "/tmp/jtrace")
        jax.profiler.start_trace(trace_dir)

    # 36 steps/loop: each loop ends in a block_until_ready pipeline drain
    # (~1 step of latency) that continuous training only pays at log
    # intervals (every 250 steps) — short loops systematically underestimate
    # steady-state throughput (12-step loops read ~3% low).
    n_steps = 3 if trace_dir else int(os.environ.get("NEUSKY_BENCH_STEPS", "36"))
    n_repeats = 1 if trace_dir else int(os.environ.get("NEUSKY_BENCH_REPEATS", "3"))
    per_step = os.environ.get("NEUSKY_BENCH_VERBOSE", "") != ""

    # Wall-clock on this 1-core box lies under load (PERF.md); the r2 bench
    # regression (5011→2366 rays/s) was indistinguishable from contamination
    # because a single 20-step loop was all we had.  Median of k independent
    # loops + stddev + loadavg make a contaminated run self-identifying.
    load_before = os.getloadavg()[0]
    rates = []
    step_i = 0
    # rep 0 is a DISCARDED warm-up loop: even after the warm-up steps above,
    # the first measured loop still absorbs residual one-time work
    # (persistent-cache write-out, donation-alias executable variants) —
    # observed 1704 rays/s vs 5555/5556 for loops 2-3 on a quiet box.
    n_discard = 0 if trace_dir else 1
    for rep in range(n_repeats + n_discard):
        t0 = time.perf_counter()
        for _ in range(n_steps):
            ts = time.perf_counter()
            batch = dm.next_train(step_i)
            tb = time.perf_counter()
            rng, k = jax.random.split(rng)
            params, opt_state, aux = step_fn(
                params, opt_state, batch, k, np.float32(step_i + 1)
            )
            step_i += 1
            if per_step:
                jax.block_until_ready(aux["total_loss"])
                print(
                    f"step {step_i - 1}: batch {tb - ts:.3f}s  "
                    f"step {time.perf_counter() - tb:.3f}s",
                    file=sys.stderr,
                )
        jax.block_until_ready(aux["total_loss"])
        if rep >= n_discard:
            rates.append(rays_per_step * n_steps / (time.perf_counter() - t0))

    if trace_dir:
        jax.profiler.stop_trace()
        print(f"trace written to {trace_dir}", file=sys.stderr)

    rates_sorted = sorted(rates)
    rays_per_sec = rates_sorted[len(rates_sorted) // 2]  # median loop rate
    mean = sum(rates) / len(rates)
    stddev = (sum((r - mean) ** 2 for r in rates) / len(rates)) ** 0.5
    load_after = os.getloadavg()[0]

    out = {
        "metric": "joint_train_rays_per_sec_per_chip",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        # the headline is the ABSOLUTE single-chip rate; the multiplier
        # divides by a DERIVED baseline (no published reference number
        # exists) and compares a v5e chip to BASELINE.md's v5p-8 north-star
        # phrasing — both uncertainties are stated here rather than hidden
        "absolute_rays_per_sec": round(rays_per_sec, 1),
        "chip": "tpu-v5e (1 chip via axon tunnel)",
        "vs_baseline": round(rays_per_sec / A100_BASELINE_RAYS_PER_SEC, 3),
        "baseline_note": (
            "denominator 2800 rays/s is an ESTIMATE (reference publishes no "
            "throughput; derived from 100k steps x 2304 rays at ~1.2 steps/s "
            "on a 24GB CUDA GPU, BASELINE.md) — at +/-30% on that step-rate "
            "guess the multiplier spans "
            f"{round(rays_per_sec / (A100_BASELINE_RAYS_PER_SEC * 1.3), 2)}-"
            f"{round(rays_per_sec / (A100_BASELINE_RAYS_PER_SEC * 0.7), 2)}x"
        ),
        "loop_rates": [round(r, 1) for r in rates],
        "stddev": round(stddev, 1),
        "loadavg_before": round(load_before, 2),
        "loadavg_after": round(load_after, 2),
        "steps_per_loop": n_steps,
    }
    knobs = knob_summary()
    if knobs:
        out["knobs"] = knobs
    out["effective"] = effective_summary(cfg)
    # contamination guards: a loaded box (anything beyond this process on a
    # 1-core machine) or unstable loop rates mean the number is not a real
    # device-throughput measurement — say so in the JSON rather than letting
    # a garbage value masquerade as a regression (VERDICT r2 item 5)
    if len(rates) > 1 and stddev / max(mean, 1e-9) > 0.10:
        out["warning"] = (
            f"unstable: loop-rate stddev {stddev:.0f} is "
            f"{100 * stddev / mean:.0f}% of mean — box contention suspected"
        )
    if load_before > 1.5:
        out["warning"] = (
            f"contaminated: loadavg {load_before:.2f} before bench on a "
            "1-core box — wall-clock rate unreliable"
        )
    if trace_dir:
        out["traced"] = True
        out["warning"] = (
            "PROFILER RUN — 3 steps under jax.profiler; value is NOT a "
            "throughput measurement"
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
