"""Training-dynamics sanity run: canonical-scale NeuSky on the synthetic
sphere scene, on the real chip.

Validates that the full optimisation stack (fused step, Pallas scatter,
stochastic-corner proposal gradients, forward-mode SDF gradients) actually
*trains* — train PSNR must climb and the DDF depth PSNR must follow the
scene.  Prints one JSON line per log interval.

Usage:  python tools/train_sanity.py [num_steps] [log_every]
                [--ddf-encoding nerf|hash] [--out results.jsonl]

``--ddf-encoding`` drives the VERDICT r1 A/B: the reference uses a hash
grid for the DDF position encoding (``configs/neusky_config.py:165``);
this build defaults to frequency encoding for scatter-row reasons and the
A/B quantifies the quality impact (DDF depth PSNR + shadow fidelity).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("steps", nargs="?", type=int, default=1500)
    ap.add_argument("log_every", nargs="?", type=int, default=100)
    # default None = "keep the config/env-knob value": an explicit CLI
    # default of "nerf" silently OVERRODE NEUSKY_DDF_ENCODING=hash after
    # apply_env_knobs — the r4 postrun DDF-hash A/B arm ran the CONTROL
    # config because of exactly this (caught r5; results/r4_ab_ddfhash2k
    # .jsonl is a control-config run, superseded by r5_ab_ddfhash2k)
    ap.add_argument("--ddf-encoding", choices=("nerf", "hash"), default=None)
    ap.add_argument("--out", default=None, help="also append JSON records here")
    ap.add_argument(
        "--shadow-out", default=None,
        help="render a sun shadow map of eval camera 0 at the end → PNG "
        "(the 'shadows look like shadows' check, VERDICT r1 task 6)",
    )
    ap.add_argument(
        "--ckpt-dir", default=None, help="save a final orbax checkpoint here"
    )
    ap.add_argument(
        "--ckpt-every", type=int, default=0,
        help="also checkpoint every N steps (guards long runs against "
        "tunnel wedges — see .claude/skills/verify/SKILL.md)",
    )
    ap.add_argument(
        "--resume", action="store_true",
        help="resume from the latest checkpoint in --ckpt-dir",
    )
    ap.add_argument(
        "--heartbeat", default=None,
        help="touch this file at every logged step / checkpoint — the "
        "run_segmented.sh watchdog watches ITS mtime (not --out's: "
        "startup provenance writes to --out would collapse the compile "
        "grace window into the staleness window, killing healthy "
        "compiling segments — observed r4)",
    )
    ap.add_argument(
        "--prior-dir", default=None,
        help="override illumination_prior_dir (e.g. to A/B the variational "
        "retrain against the legacy autodecoder prior); a prior shipping "
        "no init_latent.npz trains with ZERO-init latents — the "
        "reference's semantics, valid only for a variational prior",
    )
    ap.add_argument(
        "--gt-illumination", action="store_true",
        help="ceiling probe: oracle per-direction light table + analytic "
        "sky background instead of the RENI fit "
        "(NeuSkyModelConfig.gt_illumination_probe) — establishes the "
        "synthetic-scene PSNR ceiling so 'converged' is quantified",
    )
    ap.add_argument(
        "--eval-images", type=int, default=0,
        help="render this many held-out eval cameras (same split recipe as "
        "tools/eval_from_ckpt.py: angle offset π/8, height 0.5) at every "
        "segment boundary and at completion, after a test-time latent fit "
        "across ALL eval images (the r5-fixed eval path) — logs "
        "eval_psnr_mean / per-image eval_psnr to --out so long runs are "
        "tracked on the metric the reference reports "
        "(``neusky_pipeline.py:392-444``), not train-batch PSNR",
    )
    ap.add_argument(
        "--eval-fit-steps", type=int, default=150,
        help="Adam steps for the per-boundary eval-latent fit",
    )
    ap.add_argument(
        "--tiny", action="store_true",
        help="CPU-feasible rehearsal: tiny model + 16px scene (same code "
        "path, same flags — used to smoke the segmented/eval wiring "
        "without the TPU)",
    )
    ap.add_argument(
        "--segment-steps", type=int, default=0,
        help="exit cleanly (after a checkpoint) once this many steps ran in "
        "THIS invocation — long runs go as a bash resume-loop of bounded "
        "segments because the device tunnel can wedge a process after "
        "~1h of continuous stepping (see .claude/skills/verify/SKILL.md); "
        "exit code 3 means 'segment done, more steps remain'",
    )
    args = ap.parse_args()
    num_steps, log_every = args.steps, args.log_every

    # persistent compile cache: segmented long runs re-enter this script
    # every few thousand steps; without the cache EVERY segment pays the
    # full ~10 min step-fn compile (and run_segmented.sh's grace window
    # killed healthy compiling segments — observed r3)
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from neusky_tpu.configs.neusky_config import neusky_model_config
    from neusky_tpu.data.datamanager import DataManager, DataManagerConfig
    from neusky_tpu.data.pixel_sampler import PixelSamplerConfig
    from neusky_tpu.data.synthetic import SyntheticSceneConfig, generate_synthetic_scene
    from neusky_tpu.engine.optimizers import (
        build_optimizer,
        default_neusky_optimizer_groups,
    )
    from neusky_tpu.models.neusky import NeuSkyModel
    from neusky_tpu.models.pipeline import PipelineConfig
    from neusky_tpu.parallel.mesh import make_train_step
    from neusky_tpu.sampling.ddf_sampler import DDFSamplerConfig

    import dataclasses

    from neusky_tpu.configs.env_overrides import (
        apply_env_knobs,
        effective_summary,
        knob_summary,
    )

    # same env A/B knobs as bench.py (NEUSKY_BENCH_BF16, NEUSKY_EXACT_*, …)
    # so training-dynamics A/Bs run the exact config the bench measures
    if args.tiny:
        from neusky_tpu.configs.tiny_config import tiny_model_config

        cfg = apply_env_knobs(tiny_model_config(num_train_data=8, num_eval_data=2))
    else:
        cfg = apply_env_knobs(neusky_model_config(num_train_data=8, num_eval_data=2))
    scene_px = 16 if args.tiny else 64
    if (
        args.ddf_encoding is not None
        and args.ddf_encoding != cfg.ddf.field.position_encoding_type
    ):
        cfg = dataclasses.replace(
            cfg,
            ddf=dataclasses.replace(
                cfg.ddf,
                field=dataclasses.replace(
                    cfg.ddf.field,
                    position_encoding_type=args.ddf_encoding,
                ),
            ),
        )
    if args.gt_illumination:
        cfg = dataclasses.replace(cfg, gt_illumination_probe=True)
    if args.prior_dir:
        cfg = dataclasses.replace(cfg, illumination_prior_dir=args.prior_dir)
    if args.eval_images:
        # eval-latent slots are sized by num_eval_data at init; keep
        # --eval-images constant across the segments of one run (the
        # checkpoint carries the [N, D, 3] eval_latents group)
        cfg = dataclasses.replace(cfg, num_eval_data=args.eval_images)
    # provenance AFTER all config overrides so the logged effective config
    # is the one that actually trains
    prov = {"env_knobs": knob_summary(), "effective": effective_summary(cfg)}
    if args.gt_illumination:
        prov["gt_illumination_probe"] = True
    if args.prior_dir:
        prov["prior_dir"] = args.prior_dir
    print(json.dumps(prov), flush=True)
    if args.out:
        with open(args.out, "a") as f:
            f.write(json.dumps(prov) + "\n")
    model = NeuSkyModel(cfg)
    pipe = PipelineConfig(
        visibility_train_sampler=DDFSamplerConfig(
            num_samples_on_sphere=8, num_rays_per_sample=128,
            only_sample_upper_hemisphere=True, concentration=20.0,
        ),
        num_sky_rays=256,
    )
    scene = generate_synthetic_scene(
        SyntheticSceneConfig(num_cameras=8, width=scene_px, height=scene_px)
    )
    dm = DataManager(
        DataManagerConfig(
            pixel_sampler=PixelSamplerConfig(images_per_batch=8, rays_per_image=128),
            num_sky_rays=256,
        ),
        scene["cameras"], scene["images"], scene["masks"],
    )

    params = model.init(jax.random.PRNGKey(0))
    from neusky_tpu.engine.checkpoint import load_illumination_prior

    params = load_illumination_prior(params, cfg)
    optimizer = build_optimizer(params, default_neusky_optimizer_groups(num_steps + 1))
    opt_state = optimizer.init(params)
    step_fn = make_train_step(model, pipe, optimizer)

    def beat():
        if args.heartbeat:
            with open(args.heartbeat, "w") as f:
                f.write("eval")

    _eval_state = {}

    def run_boundary_eval(eval_params, at_step):
        """Held-out eval-image PSNR via the r5-fixed eval path (fit cycles
        EVERY eval image — ``engine/eval_loop.py``).  Runs after the
        boundary checkpoint is saved, on a COPY of params (the fit's
        latent updates never enter training state).  Touches the
        heartbeat between phases: the first boundary pays the fit-scan +
        render compiles, which would otherwise outlive the watchdog's
        staleness window."""
        if not args.eval_images:
            return
        from neusky_tpu.engine.eval_loop import (
            eval_image_metrics,
            fit_eval_latents,
            make_render_chunk_fn,
        )

        if not _eval_state:
            es = generate_synthetic_scene(
                SyntheticSceneConfig(
                    num_cameras=args.eval_images, width=scene_px, height=scene_px,
                    angle_offset=float(np.pi / 8.0), camera_height=0.5,
                )
            )
            _eval_state["dm"] = DataManager(
                DataManagerConfig(
                    pixel_sampler=PixelSamplerConfig(
                        images_per_batch=min(8, args.eval_images),
                        rays_per_image=128,
                    ),
                    num_sky_rays=256,
                ),
                scene["cameras"], scene["images"], scene["masks"],
                eval_cameras=es["cameras"], eval_images=es["images"],
                eval_masks=es["masks"],
            )
            _eval_state["chunk"] = make_render_chunk_fn(model)
        edm = _eval_state["dm"]
        chunk_fn, chunk = _eval_state["chunk"]
        k_fit, k_render = jax.random.split(
            jax.random.fold_in(jax.random.PRNGKey(5), at_step)
        )
        beat()
        t_ev = time.perf_counter()
        fit_params, fit_losses = fit_eval_latents(
            model, eval_params, edm, k_fit, steps=args.eval_fit_steps
        )
        beat()
        psnrs = []
        for ei in range(args.eval_images):
            m = eval_image_metrics(
                model, fit_params, edm, ei, k_render, chunk_fn, chunk
            )
            m.pop("outputs", None)
            psnrs.append(float(m["psnr"]))
            beat()
        rec = {
            "eval_at": at_step,
            "eval_psnr": [round(p, 3) for p in psnrs],
            "eval_psnr_mean": round(float(np.mean(psnrs)), 3),
            "eval_fit_loss_last": round(float(fit_losses[-1]), 5),
            "eval_seconds": round(time.perf_counter() - t_ev, 1),
        }
        print(json.dumps(rec), flush=True)
        if args.out:
            with open(args.out, "a") as f:
                f.write(json.dumps(rec) + "\n")

    start = 0
    if args.resume and args.ckpt_dir:
        from neusky_tpu.engine.checkpoint import latest_step, load_checkpoint

        if latest_step(args.ckpt_dir) is not None:
            params, opt_state, start = load_checkpoint(
                args.ckpt_dir, None, params, opt_state
            )
            dm.reseed(start)  # fresh batch stream, not a replay of 0..N
            print(json.dumps({"resumed_from": start}), flush=True)

    rng = jax.random.fold_in(jax.random.PRNGKey(1), start)
    t0 = time.perf_counter()
    for i in range(start, num_steps):
        batch = dm.next_train(i)
        rng, k = jax.random.split(rng)
        params, opt_state, aux = step_fn(
            params, opt_state, batch, k, np.float32(i)
        )
        if args.ckpt_every and args.ckpt_dir and (i + 1) % args.ckpt_every == 0:
            from neusky_tpu.engine.checkpoint import save_checkpoint

            save_checkpoint(args.ckpt_dir, i + 1, params, opt_state)
        if (
            args.segment_steps
            and args.ckpt_dir
            and (i + 1) - start >= args.segment_steps
            and (i + 1) < num_steps
        ):
            from neusky_tpu.engine.checkpoint import save_checkpoint

            save_checkpoint(args.ckpt_dir, i + 1, params, opt_state)
            run_boundary_eval(params, i + 1)
            print(json.dumps({"segment_done_at": i + 1}), flush=True)
            sys.exit(3)
        if (i + 1) % log_every == 0 or i == start:
            rec = {
                "step": i + 1,
                "ddf_encoding": cfg.ddf.field.position_encoding_type,
                "psnr": round(float(aux["metrics"]["psnr"]), 3),
                **(
                    {"psnr_fg": round(float(aux["metrics"]["psnr_fg"]), 3)}
                    if "psnr_fg" in aux["metrics"] else {}
                ),
                "ddf_depth_psnr": round(float(aux["metrics"]["ddf_depth_psnr"]), 3),
                "total_loss": round(float(aux["total_loss"]), 4),
                "s_val": round(float(aux["metrics"]["s_val"]), 5),
                "elapsed_s": round(time.perf_counter() - t0, 1),
            }
            # per-loss breakdown for the losses that diagnose WHERE the
            # error lives (sky vs foreground vs geometry) — the 10.3-PSNR
            # plateau question is unanswerable from total_loss alone
            for k2 in ("sky_pixel_loss", "rgb_l1_loss", "fg_mask_loss",
                       "eikonal_loss"):
                if k2 in aux.get("loss_dict", {}):
                    rec[k2] = round(float(aux["loss_dict"][k2]), 5)
            print(json.dumps(rec), flush=True)
            if args.out:
                with open(args.out, "a") as f:
                    f.write(json.dumps(rec) + "\n")
            if args.heartbeat:
                with open(args.heartbeat, "w") as f:
                    f.write(str(i + 1))

    if args.ckpt_dir:
        from neusky_tpu.engine.checkpoint import save_checkpoint

        save_checkpoint(args.ckpt_dir, num_steps, params, opt_state)
        print(json.dumps({"ckpt": args.ckpt_dir, "step": num_steps}), flush=True)
    run_boundary_eval(params, num_steps)

    if args.shadow_out:
        from neusky_tpu.engine.render_features import render_shadow_map

        cams = scene["cameras"]
        rb = cams.generate_rays(0)
        h, w = int(cams.height), int(cams.width)
        sm = render_shadow_map(
            model, params, rb, jax.random.PRNGKey(7),
            azimuth_deg=45.0, elevation_deg=45.0,
        )
        img = np.clip(sm["shadow_map"].reshape(h, w), 0.0, 1.0)
        from neusky_tpu.utils.viz import save_png

        save_png(args.shadow_out, np.stack([img] * 3, axis=-1))
        print(
            json.dumps(
                {
                    "shadow_out": args.shadow_out,
                    "shadow_mean": round(float(img.mean()), 4),
                    "shadow_std": round(float(img.std()), 4),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
