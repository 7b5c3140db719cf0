"""Convergence post-mortem for a train_sanity checkpoint on the synthetic
scene: decomposes WHERE the error lives.

Prints JSON records:
  - geometry: SDF residual on the true sphere surface (r=0.4), estimated
    radius along probe rays (GT scene: neusky_tpu/data/synthetic.py)
  - illumination: decoded HDR envmap stats for train latent 0 vs the GT
    sun (intensity 2.5 at a known direction) + ambient/sky colour
  - albedo: field albedo at surface points vs GT (0.7, 0.4, 0.3)
  - losses: every individual loss term on a fixed train batch

Usage:
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
      python tools/diagnose_ckpt.py /tmp/ckpt_r3_20k
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt_dir")
    ap.add_argument("--ddf-encoding", choices=("nerf", "hash"), default="nerf")
    args = ap.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from neusky_tpu.configs.neusky_config import neusky_model_config
    from neusky_tpu.data.datamanager import DataManager, DataManagerConfig
    from neusky_tpu.data.pixel_sampler import PixelSamplerConfig
    from neusky_tpu.data.synthetic import SyntheticSceneConfig, generate_synthetic_scene
    from neusky_tpu.engine.checkpoint import load_checkpoint
    from neusky_tpu.engine.optimizers import (
        build_optimizer,
        default_neusky_optimizer_groups,
    )
    from neusky_tpu.models.neusky import NeuSkyModel

    cfg = neusky_model_config(num_train_data=8, num_eval_data=2)
    if args.ddf_encoding != cfg.ddf.field.position_encoding_type:
        cfg = dataclasses.replace(
            cfg, ddf=dataclasses.replace(
                cfg.ddf, field=dataclasses.replace(
                    cfg.ddf.field, position_encoding_type=args.ddf_encoding)))
    model = NeuSkyModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    optimizer = build_optimizer(params, default_neusky_optimizer_groups(10))
    opt_state = optimizer.init(params)
    params, _, step = load_checkpoint(args.ckpt_dir, None, params, opt_state)
    print(json.dumps({"loaded_step": int(step)}), flush=True)

    sc = SyntheticSceneConfig(num_cameras=8, width=64, height=64)
    scene = generate_synthetic_scene(sc)

    # ---- geometry: SDF residual on the GT sphere surface -------------
    key = jax.random.PRNGKey(0)
    d = jax.random.normal(key, (512, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    surf = jnp.asarray(sc.sphere_center) + sc.sphere_radius * d

    def sdf_at(pts):
        return model.field.apply(
            params["fields"], pts, method=model.field.sdf_only
        )

    sdf_surf = np.asarray(sdf_at(surf)).reshape(-1)
    # estimated radius: bisection along each probe direction
    lo = jnp.full((512,), 0.05)
    hi = jnp.full((512,), 0.9)
    for _ in range(24):
        mid = 0.5 * (lo + hi)
        s = sdf_at(jnp.asarray(sc.sphere_center) + mid[:, None] * d).reshape(-1)
        inside = s < 0
        lo = jnp.where(inside, mid, lo)
        hi = jnp.where(inside, hi, mid)
    radius_est = np.asarray(0.5 * (lo + hi))
    print(json.dumps({
        "sdf_surface_rms": round(float(np.sqrt((sdf_surf ** 2).mean())), 5),
        "sdf_surface_mean": round(float(sdf_surf.mean()), 5),
        "radius_est_mean": round(float(radius_est.mean()), 4),
        "radius_est_std": round(float(radius_est.std()), 4),
        "radius_gt": sc.sphere_radius,
    }), flush=True)

    # ---- illumination: decoded envmap for train latent 0 -------------
    from neusky_tpu.fields.reni import freeze_decoder_params

    n_dirs = 2048
    k = jax.random.PRNGKey(1)
    dirs = jax.random.normal(k, (n_dirs, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    g = params["illumination_field"]
    z0 = jnp.repeat(g["train_latents"][0:1], n_dirs, axis=0)
    s0 = jnp.repeat(g["train_scale"][0:1], n_dirs, axis=0)
    dec = params["illumination_decoder"]
    if cfg.illumination.fixed_decoder:
        dec = freeze_decoder_params(dec)
    out = model.illumination.apply(dec, dirs, z0, s0, None)
    hdr = np.asarray(model.illumination.unnormalise(out["rgb"]))
    sun = np.asarray(sc.sun_direction, np.float64)
    sun /= np.linalg.norm(sun)
    cos_to_sun = np.asarray(dirs) @ sun
    near_sun = cos_to_sun > 0.95
    away_sun = cos_to_sun < 0.5
    upper = np.asarray(dirs)[:, 2] > 0
    print(json.dumps({
        "hdr_min": round(float(hdr.min()), 4),
        "hdr_mean": round(float(hdr.mean()), 4),
        "hdr_max": round(float(hdr.max()), 4),
        "hdr_near_sun_mean": round(float(hdr[near_sun].mean()), 4) if near_sun.any() else None,
        "hdr_away_sun_mean": round(float(hdr[away_sun].mean()), 4),
        "hdr_upper_mean": round(float(hdr[upper].mean()), 4),
        "train_scale_0": round(float(g["train_scale"][0]), 4),
        "latent_norm_0": round(float(jnp.linalg.norm(g["train_latents"][0])), 4),
        "gt_sun_intensity": sc.sun_intensity,
        "gt_ambient": sc.ambient,
    }), flush=True)

    # ---- albedo at surface points vs GT -------------------------------
    rs_pts = surf * (1.0 - 1e-3)
    _, geo_feat = model.field.apply(params["fields"], rs_pts, method=model.field.geo)
    alb = np.asarray(
        model.field.apply(params["fields"], rs_pts, geo_feat, method=model.field.colour)
    )[:, :3].reshape(-1, 3)
    print(json.dumps({
        "albedo_mean": [round(float(x), 4) for x in alb.mean(0)],
        "albedo_std": [round(float(x), 4) for x in alb.std(0)],
        "albedo_gt": list(sc.albedo),
    }), flush=True)

    # ---- per-loss values on a fixed train batch -----------------------
    from neusky_tpu.models.pipeline import PipelineConfig
    from neusky_tpu.sampling.ddf_sampler import DDFSamplerConfig

    dm = DataManager(
        DataManagerConfig(
            pixel_sampler=PixelSamplerConfig(images_per_batch=8, rays_per_image=128),
            num_sky_rays=256,
        ),
        scene["cameras"], scene["images"], scene["masks"],
    )
    from neusky_tpu.models.pipeline import batch_ray_bundle

    batch = dm.next_train(0)
    rng = jax.random.PRNGKey(42)
    outputs = model.forward(
        params, rng, batch_ray_bundle(batch), batch["image_indices"],
        batch["ray_image_idx"], step=np.float32(step), train=True,
    )
    losses = model.loss_dict(params, outputs, batch)
    metrics = model.metrics_dict(params, outputs, batch)
    rec = {k: round(float(v), 5) for k, v in losses.items()}
    rec["psnr"] = round(float(metrics["psnr"]), 3)
    rec["s_val"] = round(float(metrics["s_val"]), 5)
    # per-region train-batch error (rgb vs image, sky mask ch 3)
    pred = np.asarray(outputs["rgb"])
    img = np.asarray(batch["image"])
    skym = np.asarray(batch["mask"][..., 3]) > 0.5
    err = ((pred - img) ** 2).mean(-1)
    rec["batch_mse_sky"] = round(float(err[skym].mean()), 5)
    rec["batch_mse_fg"] = round(float(err[~skym].mean()), 5)
    rec["accum_mean_fg"] = round(float(np.asarray(outputs["accumulation"]).reshape(-1)[~skym].mean()), 4)
    rec["accum_mean_sky"] = round(float(np.asarray(outputs["accumulation"]).reshape(-1)[skym].mean()), 4)
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
