"""Can the frozen trained RENI++ prior fit the synthetic scene's constant
sky colour by latent optimisation alone?

Isolates the sky-convergence question from the full model: optimises a
single latent [L,3] (+ log-scale) against the synthetic sky colour with
the exact ``sky_pixel_loss`` formula (``models/losses.py``), Adam lr 1e-2
(the canonical ``illumination_field`` group lr).

  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python tools/probe_sky_fit.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from neusky_tpu.configs.neusky_config import neusky_model_config
    from neusky_tpu.engine.checkpoint import load_illumination_prior
    from neusky_tpu.fields.reni import freeze_decoder_params
    from neusky_tpu.models import losses as L
    from neusky_tpu.models.neusky import NeuSkyModel
    from neusky_tpu.core.colour import linear_to_sRGB

    cfg = neusky_model_config(num_train_data=1, num_eval_data=1)
    # NEUSKY_PRIOR_DIR: probe an alternative prior (e.g. the r4
    # variational retrain) without editing the canonical config
    alt = os.environ.get("NEUSKY_PRIOR_DIR", "")
    if alt:
        import dataclasses

        cfg = dataclasses.replace(cfg, illumination_prior_dir=alt)
        print(json.dumps({"prior_dir": alt}), flush=True)
    model = NeuSkyModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    params = load_illumination_prior(params, cfg)
    dec = freeze_decoder_params(params["illumination_decoder"])

    sky_srgb = jnp.array([0.35, 0.55, 0.95])  # data/synthetic.py sky_colour

    k = jax.random.PRNGKey(2)
    dirs = jax.random.normal(k, (512, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    # upper hemisphere only: sky rays always have z>0 in the synthetic scene
    dirs = dirs.at[:, 2].set(jnp.abs(dirs[:, 2]))

    latent0 = params["illumination_field"]["train_latents"][0]
    scale0 = params["illumination_field"]["train_scale"][0]
    state = {"z": latent0, "s": scale0}

    def decode(st):
        n = dirs.shape[0]
        z = jnp.repeat(st["z"][None], n, axis=0)
        s = jnp.repeat(st["s"][None], n, axis=0)
        out = model.illumination.apply(dec, dirs, z, s, None)
        return model.illumination.unnormalise(out["rgb"])  # [n,3] HDR linear

    def loss_fn(st):
        pred = linear_to_sRGB(decode(st))
        gt = jnp.tile(sky_srgb[None], (dirs.shape[0], 1))
        mask = jnp.ones((dirs.shape[0], 1))
        return L.sky_pixel_loss(pred, gt, mask, cfg.losses.sky_pixel_cosine_weight)

    opt = optax.adam(1e-2)
    ost = opt.init(state)

    @jax.jit
    def step(st, ost):
        l, g = jax.value_and_grad(loss_fn)(st)
        up, ost = opt.update(g, ost)
        return optax.apply_updates(st, up), ost, l

    gnorm = jax.grad(loss_fn)(state)
    print(json.dumps({
        "grad_norm_z": round(float(jnp.linalg.norm(gnorm["z"])), 6),
        "grad_s": round(float(gnorm["s"]), 6),
        "loss_init": round(float(loss_fn(state)), 5),
    }), flush=True)

    for i in range(1, 801):
        state, ost, l = step(state, ost)
        if i % 100 == 0 or i == 1:
            pred = linear_to_sRGB(decode(state))
            mse = float(jnp.mean((pred - sky_srgb[None]) ** 2))
            print(json.dumps({
                "step": i, "loss": round(float(l), 6),
                "sky_srgb_mse": round(mse, 6),
                "pred_mean": [round(float(x), 3) for x in pred.mean(0)],
                "scale": round(float(state["s"]), 4),
                "z_norm": round(float(jnp.linalg.norm(state["z"])), 3),
            }), flush=True)


if __name__ == "__main__":
    main()
