"""Fit the NeuSky init latent for a trained RENI++ prior checkpoint.

Why this exists: the reference initialises per-image sky latents at ZERO
(``/root/reference/neusky/models/neusky_model.py:261-263``) and that works
because the published RENI++ prior is a *variational* autodecoder (the
reference checkpoint carries ``train_mu``/``train_logvar``,
``neusky_model.py:288-293``) whose KL term conditions the latent space so
z=0 decodes to a plausible mean sky.  The in-framework prior
(``engine/reni_trainer.py``, kl_weight 1e-5) is effectively unregularised:
its z=0 decodes to 1.4-2.1 in the normalised log-HDR domain — clipped to
the domain max, exp(8) ≈ 3000 linear radiance — so every sky pixel starts
double-saturated and the sky loss is a flat line (r3 diagnosis,
``tools/probe_sky_fit.py``).

This tool restores the functional property the reference relies on:
fit one latent z* (decoder FROZEN, smooth log-HDR objective — the same
procedure as the held-out quality gate) to the *log-domain mean* of the
prior's own training corpus, and store it beside the checkpoint as
``init_latent.npz``.  ``engine.checkpoint.load_illumination_prior``
broadcasts it into ``train_latents`` / ``eval_latents`` at model init,
making "init" mean "mean sky" exactly as it does for the reference.

Usage (CPU-safe; never touches the device tunnel):
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
      python tools/fit_prior_init_latent.py \
      [--prior checkpoints/reni_prior_latent100] [--num-skies 32]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--prior", default="checkpoints/reni_prior_latent100")
    ap.add_argument("--num-skies", type=int, default=32,
                    help="corpus size to average (match the prior's "
                    "quality.json num_skies)")
    ap.add_argument("--width", type=int, default=128)
    ap.add_argument("--seed", type=int, default=0,
                    help="corpus seed (match the prior training run)")
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument(
        "--ldr", action="store_true",
        help="fit z* through the CLIPPED sRGB render path to the "
        "LDR-exposed corpus mean (each sky auto-exposed so its 98th "
        "percentile linear = 1, tonemapped, averaged in sRGB). The "
        "log-domain mean of HDR skies exponentiates far above LDR range, "
        "so a log-domain z* decodes saturated through linear_to_sRGB and "
        "the in-model sky fit starts in the clip's flat valley (r4 "
        "diagnosis, PERF.md); the LDR fit starts sub-saturation with "
        "every pixel's gradient alive.",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from neusky_tpu.configs.neusky_config import neusky_model_config
    from neusky_tpu.data.sky_generator import generate_sky_corpus
    from neusky_tpu.engine.checkpoint import load_illumination_prior
    from neusky_tpu.engine.reni_trainer import fit_latents_to_envmaps
    from neusky_tpu.fields.reni import RENIField
    from neusky_tpu.models.neusky import NeuSkyModel

    cfg = neusky_model_config(num_train_data=1, num_eval_data=1)
    prior = Path(args.prior)
    if str(prior) != cfg.illumination_prior_dir:
        import dataclasses

        cfg = dataclasses.replace(cfg, illumination_prior_dir=str(prior))
    model = NeuSkyModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    params = load_illumination_prior(params, cfg, init_latent=False)
    decoder = params["illumination_decoder"]

    corpus = generate_sky_corpus(args.num_skies, width=args.width, seed=args.seed)
    field = RENIField(cfg.illumination)

    if args.ldr:
        import optax

        from neusky_tpu.core.colour import linear_to_sRGB
        from neusky_tpu.sampling.illumination import EquirectangularSampler

        nc = corpus.shape[0]
        q = np.quantile(corpus.reshape(nc, -1), 0.98, axis=1)[
            :, None, None, None
        ]
        exposed = corpus / np.maximum(q, 1e-8)

        def srgb_np(x):
            x = np.clip(x, 0.0, None)
            return np.clip(
                np.where(
                    x <= 0.0031308,
                    12.92 * x,
                    1.055 * np.power(np.maximum(x, 1e-8), 1 / 2.4) - 0.055,
                ),
                0.0,
                1.0,
            )

        target = srgb_np(exposed).mean(axis=0)  # [H, W, 3] in [0, 1]
        h, w = target.shape[:2]
        sampler = EquirectangularSampler(width=w)
        dirs = jnp.asarray(np.asarray(sampler()).reshape(h * w, 3))
        tgt = jnp.asarray(target.reshape(h * w, 3).astype(np.float32))

        opt = optax.adam(1e-2)
        z0 = jnp.zeros((cfg.illumination.latent_dim, 3))

        @jax.jit
        def run(z, rng):
            state = opt.init(z)

            def body(carry, k):
                z, state = carry
                pix = jax.random.randint(k, (2048,), 0, h * w)

                def loss(z):
                    out = field.apply(decoder, dirs[pix], z)["rgb"]
                    pred = linear_to_sRGB(field.unnormalise(out))
                    return jnp.mean((pred - tgt[pix]) ** 2)

                g = jax.grad(loss)(z)
                updates, state = opt.update(g, state, z)
                return (z + updates, state), None

            (z, _), _ = jax.lax.scan(
                body, (z, state), jax.random.split(rng, args.steps)
            )
            return z

        z = np.asarray(run(z0, jax.random.PRNGKey(args.seed)))
        out_full = field.apply(decoder, dirs, jnp.asarray(z))["rgb"]
        pred_full = np.asarray(linear_to_sRGB(field.unnormalise(out_full)))
        ldr_mse = float(np.mean((pred_full - np.asarray(tgt)) ** 2))
        fit_psnr = 10.0 * float(np.log10(1.0 / max(ldr_mse, 1e-12)))
        # the fit can never be less saturated than its own target (the
        # exposed-corpus mean keeps genuinely bright sun/horizon regions):
        # gate RELATIVE to the target's unsaturated fraction
        target_frac_unsat = float((np.asarray(tgt) < 0.999).mean())
    else:
        # mean in the LOG domain (geometric mean of radiance): this is the
        # domain the decoder is trained in, so its mean is the natural
        # "origin" sky — an arithmetic linear mean would be sun-dominated.
        mean_sky = np.exp(np.log(np.maximum(corpus, 1e-8)).mean(axis=0))[None]

        z, psnr = fit_latents_to_envmaps(
            field, decoder, mean_sky.astype(np.float32), steps=args.steps,
        )
        z = np.asarray(z[0])
        fit_psnr = float(psnr[0])

    # sanity: decoded stats at z* must be in-domain (|out| <= 1 nearly
    # everywhere) and mid-brightness
    dirs = np.stack(np.meshgrid(np.linspace(-1, 1, 16), np.linspace(-1, 1, 16)), -1)
    k = jax.random.PRNGKey(3)
    d = jax.random.normal(k, (1024, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    out = field.apply(decoder, d, jnp.asarray(z))["rgb"]
    hdr = np.asarray(field.unnormalise(out))
    raw = np.asarray(out)
    srgb_view = np.clip(
        np.where(
            hdr <= 0.0031308,
            12.92 * hdr,
            1.055 * np.power(np.maximum(hdr, 1e-8), 1 / 2.4) - 0.055,
        ),
        0.0,
        1.0,
    )
    stats = {
        "mode": "ldr" if args.ldr else "log_domain",
        "fit_psnr": round(fit_psnr, 3),
        "raw_out_min": round(float(raw.min()), 4),
        "raw_out_max": round(float(raw.max()), 4),
        "raw_out_frac_in_domain": round(float((np.abs(raw) <= 1.0).mean()), 4),
        "hdr_mean": round(float(hdr.mean()), 4),
        "hdr_max": round(float(hdr.max()), 4),
        "srgb_frac_unsaturated": round(float((srgb_view < 0.999).mean()), 4),
        "srgb_mean": round(float(srgb_view.mean()), 4),
        "num_skies": args.num_skies,
        "width": args.width,
        "seed": args.seed,
        "steps": args.steps,
    }
    print(json.dumps(stats), flush=True)
    assert stats["raw_out_frac_in_domain"] > 0.95, (
        "fitted init latent still decodes out-of-domain — prior unusable: "
        f"{stats}"
    )
    if args.ldr:
        # the whole point of LDR mode: the seed must start with MOST sky
        # pixels' clip gradient alive — gated relative to the target's own
        # unsaturated fraction (the fit cannot beat its target), floor 0.7
        stats["target_frac_unsaturated"] = round(target_frac_unsat, 4)
        gate = min(0.7, target_frac_unsat - 0.1)
        assert stats["srgb_frac_unsaturated"] > gate, (
            f"LDR-fitted seed still saturates the sRGB clip (gate {gate}): "
            f"{stats}"
        )
    out_path = prior / "init_latent.npz"
    np.savez(out_path, latent=z.astype(np.float32))
    (prior / "init_latent.json").write_text(json.dumps(stats, indent=1))
    print(f"saved {out_path}", flush=True)


if __name__ == "__main__":
    main()
