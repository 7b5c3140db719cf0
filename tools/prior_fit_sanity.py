"""CPU-scale validation that the model fits the sky THROUGH the trained
frozen RENI++ prior.

Motivation: the 20k canonical on-chip validation was found to have trained
against a random decoder (fixed — ``engine/checkpoint.py::
load_illumination_prior``), and the device tunnel outage blocked the
corrected rerun.  This tool answers the narrow question on CPU: with the
CANONICAL illumination prior (latent_dim=100 decoder, loaded frozen) and
reduced geometry fields, does joint training drive the SKY error down and
the image PSNR up?

Usage:
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    python tools/prior_fit_sanity.py [steps] [--out out.jsonl]

Prints one JSON line per log interval and a final record with the rendered
image PSNR + sky/fg MSE split.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("steps", nargs="?", type=int, default=400)
    ap.add_argument("log_every", nargs="?", type=int, default=50)
    ap.add_argument("--out", default=None)
    ap.add_argument("--no-prior", action="store_true",
                    help="ablation: keep the random frozen decoder")
    args = ap.parse_args()

    import jax
    import numpy as np

    from neusky_tpu.configs.neusky_config import neusky_model_config
    from neusky_tpu.data.datamanager import DataManager, DataManagerConfig
    from neusky_tpu.data.pixel_sampler import PixelSamplerConfig
    from neusky_tpu.data.synthetic import SyntheticSceneConfig, generate_synthetic_scene
    from neusky_tpu.engine.checkpoint import load_illumination_prior
    from neusky_tpu.engine.eval_loop import render_camera
    from neusky_tpu.engine.optimizers import (
        build_optimizer,
        default_neusky_optimizer_groups,
    )
    from neusky_tpu.fields.ddf import DDFFieldConfig
    from neusky_tpu.fields.density_field import DensityFieldConfig
    from neusky_tpu.fields.sdf_albedo import SDFAlbedoFieldConfig
    from neusky_tpu.models.ddf_model import DDFModelConfig
    from neusky_tpu.models.neusky import NeuSkyModel
    from neusky_tpu.models.pipeline import PipelineConfig
    from neusky_tpu.ops.hashgrid import HashGridConfig
    from neusky_tpu.parallel.mesh import make_train_step
    from neusky_tpu.sampling.ddf_sampler import DDFSamplerConfig
    from neusky_tpu.sampling.proposal import ProposalSamplerConfig

    small_hash = HashGridConfig(
        num_levels=8, features_per_level=2, log2_hashmap_size=15,
        base_res=4, max_res=256,
    )
    cfg = neusky_model_config(
        num_train_data=8, num_eval_data=2,
        # CANONICAL illumination (must match the shipped prior's decoder)
        # — everything else shrinks to CPU scale
        sdf_field=SDFAlbedoFieldConfig(
            num_layers=2, hidden_dim=64, geo_feat_dim=64,
            num_layers_color=2, hidden_dim_color=64,
            bias=0.1, beta_init=0.1, hash=small_hash,
            contraction_order="l2", stochastic_table_grads=True,
        ),
        proposal=ProposalSamplerConfig(
            num_proposal_samples=(64, 32), num_final_samples=24,
        ),
        proposal_fields=(
            DensityFieldConfig(hidden_dim=16, num_layers=2, hash=small_hash),
            DensityFieldConfig(hidden_dim=16, num_layers=2, hash=small_hash),
        ),
        num_illumination_directions=64,
        visibility_query_chunk=4096,
    )
    cfg = dataclasses.replace(
        cfg,
        ddf=dataclasses.replace(
            cfg.ddf,
            field=DDFFieldConfig(
                conditioning="FiLM", position_encoding_type="nerf",
                direction_encoding_type="nerf", hidden_layers=3,
                hidden_features=64, mapping_layers=3, mapping_features=64,
            ),
        ),
    )
    model = NeuSkyModel(cfg)
    pipe = PipelineConfig(
        visibility_train_sampler=DDFSamplerConfig(
            num_samples_on_sphere=4, num_rays_per_sample=32,
            only_sample_upper_hemisphere=True, concentration=20.0,
        ),
        num_sky_rays=64,
    )
    scene = generate_synthetic_scene(
        SyntheticSceneConfig(num_cameras=8, width=48, height=48)
    )
    dm = DataManager(
        DataManagerConfig(
            pixel_sampler=PixelSamplerConfig(images_per_batch=8, rays_per_image=32),
            num_sky_rays=64,
        ),
        scene["cameras"], scene["images"], scene["masks"],
    )

    params = model.init(jax.random.PRNGKey(0))
    if not args.no_prior:
        params = load_illumination_prior(params, cfg)
    optimizer = build_optimizer(params, default_neusky_optimizer_groups(args.steps + 1))
    opt_state = optimizer.init(params)
    step_fn = make_train_step(model, pipe, optimizer)

    def emit(rec):
        print(json.dumps(rec), flush=True)
        if args.out:
            with open(args.out, "a") as f:
                f.write(json.dumps(rec) + "\n")

    rng = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    for i in range(args.steps):
        batch = dm.next_train(i)
        rng, k = jax.random.split(rng)
        params, opt_state, aux = step_fn(
            params, opt_state, batch, k, np.float32(i)
        )
        if (i + 1) % args.log_every == 0 or i == 0:
            emit({
                "step": i + 1,
                "prior": not args.no_prior,
                "psnr": round(float(aux["metrics"]["psnr"]), 3),
                "sky_pixel_loss": round(
                    float(aux["loss_dict"].get("sky_pixel_loss", float("nan"))), 5
                ),
                "total_loss": round(float(aux["total_loss"]), 4),
                "elapsed_s": round(time.perf_counter() - t0, 1),
            })

    # final image render: copy train latents into eval slots, split error
    g = params["illumination_field"]
    n_eval = params["eval_latents"]["eval_latents"].shape[0]
    params = dict(params)
    params["eval_latents"] = {
        **params["eval_latents"],
        "eval_latents": g["train_latents"][:n_eval],
        "eval_scale": g["train_scale"][:n_eval],
    }
    h = w = 48
    rb = scene["cameras"].generate_rays(0)
    outs = render_camera(model, params, rb, 0, jax.random.PRNGKey(3),
                         chunk_size=h * w)
    pred = np.clip(np.asarray(outs["rgb"]).reshape(h, w, 3), 0, 1)
    gt = np.asarray(scene["images"][0]).reshape(h, w, 3)
    sky = np.asarray(scene["masks"][0]).reshape(h, w, 4)[..., 3] > 0.5
    err = np.mean((pred - gt) ** 2, axis=-1)
    mse = float(err.mean())
    emit({
        "final_image_psnr": round(-10.0 * float(np.log10(max(mse, 1e-10))), 3),
        "mse_sky": round(float(err[sky].mean()) if sky.any() else -1, 5),
        "mse_fg": round(float(err[~sky].mean()) if (~sky).any() else -1, 5),
        "prior": not args.no_prior,
    })


if __name__ == "__main__":
    main()
