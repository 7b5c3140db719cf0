"""Full eval protocol on a trained canonical-synthetic checkpoint.

The reference's currency is full-image eval PSNR/SSIM/LPIPS after
test-time latent fitting (``neusky_model.py:1079-1154``,
``pipelines/neusky_pipeline.py:392-444``).  This tool points that
machinery at a checkpoint produced by ``tools/train_sanity.py`` /
``tools/run_segmented.sh`` on the canonical synthetic scene:

  1. rebuild the exact train-time model config (same env knobs);
  2. build a NOVEL-view eval split (camera ring azimuth-offset from the
     train ring, same sphere + sky);
  3. restore the checkpoint;
  4. ``fit_eval_latents`` (seeded from the prior's ``init_latent.npz`` —
     the r4 eval-seeding fix) and render every eval image;
  5. per-image + mean PSNR/SSIM/LPIPS/MSE, GT-layer metrics (albedo PSNR
     after per-channel LSQ rescale, normal MAE, scale-shift depth MSE —
     ``neusky_model.py:1177-1254``), committed panel PNGs.

Usage:
  python tools/eval_from_ckpt.py --ckpt-dir /tmp/ckpt_r4_20k \
      --out results/r4_eval_20k.json --panels results/panels_r4
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt-dir", required=True)
    ap.add_argument("--out", default="results/eval_from_ckpt.json")
    ap.add_argument("--panels", default=None, help="directory for panel PNGs")
    ap.add_argument("--fit-steps", type=int, default=250)
    ap.add_argument("--num-eval-cameras", type=int, default=2)
    ap.add_argument("--width", type=int, default=64)
    ap.add_argument("--chunk-size", type=int, default=4096)
    ap.add_argument(
        "--tiny", action="store_true",
        help="evaluate a neusky-tiny checkpoint (CPU-feasible REHEARSAL of "
        "the full eval protocol — same code path, tiny model; used to "
        "de-risk the TPU run against the real checkpoint)",
    )
    ap.add_argument(
        "--no-fit", action="store_true",
        help="skip the test-time latent fit (render with checkpoint latents)",
    )
    ap.add_argument(
        "--prior-dir", default=None,
        help="illumination_prior_dir the checkpoint was TRAINED with (must "
        "match tools/train_sanity.py --prior-dir): fit_eval_latents seeds "
        "from ITS init_latent.npz — seeding from a different prior's latent "
        "restarts the dead-plateau fit the seed exists to avoid (PERF.md r4)",
    )
    args = ap.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")

    import jax
    import numpy as np

    from neusky_tpu.configs.env_overrides import (
        apply_env_knobs,
        effective_summary,
        knob_summary,
    )
    from neusky_tpu.configs.neusky_config import neusky_model_config
    from neusky_tpu.data.datamanager import DataManager, DataManagerConfig
    from neusky_tpu.data.pixel_sampler import PixelSamplerConfig
    from neusky_tpu.data.synthetic import (
        SyntheticSceneConfig,
        generate_synthetic_scene,
    )
    from neusky_tpu.engine.checkpoint import load_param_subtrees
    from neusky_tpu.engine.eval_loop import (
        fit_eval_latents,
        make_render_chunk_fn,
        render_camera,
    )
    from neusky_tpu.engine.eval_panels import image_metrics_and_panels
    from neusky_tpu.models.neusky import NeuSkyModel

    # identical model config to tools/train_sanity.py (same knobs) so the
    # checkpoint restores exactly
    n_train = 6 if args.tiny else 8
    if args.tiny:
        from neusky_tpu.configs.tiny_config import tiny_model_config

        cfg = apply_env_knobs(
            tiny_model_config(n_train, args.num_eval_cameras)
        )
    else:
        cfg = apply_env_knobs(
            neusky_model_config(
                num_train_data=n_train, num_eval_data=args.num_eval_cameras
            )
        )
    if args.prior_dir:
        import dataclasses

        cfg = dataclasses.replace(cfg, illumination_prior_dir=args.prior_dir)
    model = NeuSkyModel(cfg)

    train_scene = generate_synthetic_scene(
        SyntheticSceneConfig(num_cameras=n_train, width=64, height=64)
    )
    # eval ring: azimuth midpoints between train cameras + a different
    # height — genuinely novel viewpoints of the same scene
    eval_scene = generate_synthetic_scene(
        SyntheticSceneConfig(
            num_cameras=args.num_eval_cameras,
            width=args.width, height=args.width,
            angle_offset=float(np.pi / 8.0),
            camera_height=0.5,
        )
    )
    dm = DataManager(
        DataManagerConfig(
            pixel_sampler=PixelSamplerConfig(
                images_per_batch=n_train, rays_per_image=128
            ),
            num_sky_rays=256,
        ),
        train_scene["cameras"], train_scene["images"], train_scene["masks"],
        eval_cameras=eval_scene["cameras"],
        eval_images=eval_scene["images"],
        eval_masks=eval_scene["masks"],
    )

    params = model.init(jax.random.PRNGKey(0))
    params = load_param_subtrees(Path(args.ckpt_dir), None, params)
    print(f"restored checkpoint from {args.ckpt_dir}", file=sys.stderr)

    rng = jax.random.PRNGKey(11)
    fit_first = fit_last = None
    if not args.no_fit:
        rng, k = jax.random.split(rng)
        t0 = time.perf_counter()
        params, losses = fit_eval_latents(
            model, params, dm, k, steps=args.fit_steps,
            sample_region="full_image",
        )
        fit_first, fit_last = float(losses[0]), float(losses[-1])
        print(
            json.dumps(
                {
                    "eval_latent_fit": {
                        "steps": args.fit_steps,
                        "loss_first": fit_first,
                        "loss_last": fit_last,
                        "seconds": round(time.perf_counter() - t0, 1),
                    }
                }
            ),
            flush=True,
        )

    chunk_fn, chunk_size = make_render_chunk_fn(model, args.chunk_size)
    h = w = args.width
    albedo_gt = np.broadcast_to(
        np.asarray(SyntheticSceneConfig().albedo, np.float32), (h, w, 3)
    )
    per_image = []
    panels_dir = Path(args.panels) if args.panels else None
    if panels_dir:
        panels_dir.mkdir(parents=True, exist_ok=True)
    for i in range(args.num_eval_cameras):
        rb, batch = dm.eval_image_bundle(i)
        rng, k = jax.random.split(rng)
        t0 = time.perf_counter()
        outputs = render_camera(model, params, rb, i, k, chunk_fn, chunk_size)
        dt = time.perf_counter() - t0
        metrics, images = image_metrics_and_panels(
            model, params, outputs, batch, h, w, latent_slot=i,
            gt_layers={
                "albedo": albedo_gt,
                "normal": eval_scene["normals"][i],
                "depth": eval_scene["depths"][i],
            },
        )
        metrics["num_rays_per_sec"] = h * w / dt
        per_image.append({"image_idx": i, **metrics})
        print(json.dumps({"image": i, **{k2: round(float(v), 4) for k2, v in metrics.items()}}), flush=True)
        if panels_dir:
            from neusky_tpu.utils.viz import save_png

            for name, img in images.items():
                arr = np.asarray(img, np.float32)
                if arr.ndim == 2:
                    arr = np.stack([arr] * 3, -1)
                save_png(str(panels_dir / f"eval{i}_{name}.png"), np.clip(arr, 0, 1))

    keys = [k2 for k2 in per_image[0] if k2 != "image_idx" and per_image[0][k2] is not None]
    mean = {k2: float(np.mean([p[k2] for p in per_image])) for k2 in keys}
    if len(per_image) > 1 and "num_rays_per_sec" in mean:
        mean["num_rays_per_sec"] = float(
            np.mean([p["num_rays_per_sec"] for p in per_image[1:]])
        )
    from neusky_tpu.engine import metrics as M

    result = {
        "ckpt_dir": args.ckpt_dir,
        "ckpt_step": json.loads(
            (Path(args.ckpt_dir) / "latest.json").read_text()
        ).get("step"),
        "fit_steps": 0 if args.no_fit else args.fit_steps,
        "fit_loss_first": fit_first,
        "fit_loss_last": fit_last,
        "per_image": per_image,
        "mean": mean,
        "lpips_flavour": M.lpips_flavour(),
        "eval_split": {
            "num_cameras": args.num_eval_cameras,
            "angle_offset_rad": float(np.pi / 8.0),
            "camera_height": 0.5,
            "width": args.width,
        },
        "env_knobs": knob_summary(),
        "effective": effective_summary(cfg),
        "prior_dir": cfg.illumination_prior_dir,
    }
    out_path = Path(args.out)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_text(json.dumps(result, indent=2))
    print(json.dumps({"mean": {k2: round(v, 4) for k2, v in mean.items()}}))
    print(f"wrote {out_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
