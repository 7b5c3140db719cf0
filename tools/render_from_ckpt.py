"""Render eval views + shadow map from a train_sanity checkpoint and report
image-space PSNR vs the synthetic-scene GT.  Diagnostic companion to
``tools/train_sanity.py`` (train-batch PSNR is MC-noisy; this is the real
image metric on a fixed camera).

Usage:
  python tools/render_from_ckpt.py /tmp/ckpt_long_nerf --cam 0 \
      --out-prefix /tmp/longrun_eval [--ddf-encoding nerf]
Works on CPU (env-pin it next to a live TPU process) or TPU.
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
    ap.add_argument("--cam", type=int, default=0)
    ap.add_argument("--out-prefix", default="/tmp/ckpt_render")
    ap.add_argument("--ddf-encoding", choices=("nerf", "hash"), default="nerf")
    ap.add_argument("--chunk-size", type=int, default=4096)
    args = ap.parse_args()

    import dataclasses

    import jax
    import numpy as np

    from neusky_tpu.configs.neusky_config import neusky_model_config
    from neusky_tpu.data.synthetic import SyntheticSceneConfig, generate_synthetic_scene
    from neusky_tpu.engine.checkpoint import load_checkpoint
    from neusky_tpu.engine.eval_loop import render_camera
    from neusky_tpu.engine.optimizers import (
        build_optimizer,
        default_neusky_optimizer_groups,
    )
    from neusky_tpu.engine.render_features import render_shadow_map
    from neusky_tpu.models.neusky import NeuSkyModel
    from neusky_tpu.utils.viz import apply_depth_colormap, save_png

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

    # eval renders read EVAL latents (fit via fit_eval_latents in the real
    # protocol); train_sanity never fits them, so for diagnosing the TRAIN
    # fit copy the train latents/scales into the eval slots (cameras are
    # shared between splits in the synthetic scene).
    g = params["illumination_field"]
    n_eval = params["eval_latents"]["eval_latents"].shape[0]
    params = dict(params)
    params["eval_latents"] = {
        "eval_latents": g["train_latents"][:n_eval],
        "eval_scale": g["train_scale"][:n_eval],
    }

    scene = generate_synthetic_scene(
        SyntheticSceneConfig(num_cameras=8, width=64, height=64)
    )
    cams = scene["cameras"]
    h, w = int(cams.height), int(cams.width)
    rb = cams.generate_rays(args.cam)
    outs = render_camera(
        model, params, rb, args.cam, jax.random.PRNGKey(3),
        chunk_size=args.chunk_size,
    )
    pred = np.clip(np.asarray(outs["rgb"]).reshape(h, w, 3), 0, 1)
    gt = np.asarray(scene["images"][args.cam]).reshape(h, w, 3)
    mse = float(np.mean((pred - gt) ** 2))
    psnr = -10.0 * np.log10(max(mse, 1e-10))
    # error decomposition: sky vs foreground (mask ch 3 = sky)
    sky = np.asarray(scene["masks"][args.cam]).reshape(h, w, 4)[..., 3] > 0.5
    err = np.mean((pred - gt) ** 2, axis=-1)
    rec = {
        "step": int(step),
        "cam": args.cam,
        "image_psnr": round(psnr, 3),
        "mse": round(mse, 5),
        "mse_sky": round(float(err[sky].mean()) if sky.any() else -1, 5),
        "mse_fg": round(float(err[~sky].mean()) if (~sky).any() else -1, 5),
        "accum_mean": round(float(np.asarray(outs["accumulation"]).mean()), 4),
    }

    save_png(f"{args.out_prefix}_rgb.png", pred)
    save_png(f"{args.out_prefix}_gt.png", gt)
    save_png(
        f"{args.out_prefix}_err.png",
        np.repeat((err / max(err.max(), 1e-6))[..., None], 3, -1),
    )
    save_png(
        f"{args.out_prefix}_depth.png",
        np.asarray(apply_depth_colormap(
            np.asarray(outs["depth"]).reshape(h, w, 1),
            accumulation=np.asarray(outs["accumulation"]).reshape(h, w, 1),
        )),
    )
    sm = render_shadow_map(
        model, params, rb, jax.random.PRNGKey(7),
        azimuth_deg=45.0, elevation_deg=45.0,
    )
    shadow = np.clip(np.asarray(sm["shadow_map"]).reshape(h, w), 0, 1)
    save_png(f"{args.out_prefix}_shadow.png", np.stack([shadow] * 3, -1))
    rec["shadow_mean"] = round(float(shadow.mean()), 4)
    rec["shadow_std"] = round(float(shadow.std()), 4)
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
