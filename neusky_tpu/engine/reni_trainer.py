"""RENI++ prior training: fit the sky decoder on HDR environment maps.

The reference consumes a *pretrained* RENI++ checkpoint
(``neusky_model.py:272-300``; ``download_models.py`` fetches it).  In this
environment no pretrained weights exist, so the framework provides the
training path for the prior itself: an autodecoder over a corpus of HDR
equirectangular sky maps — per-image latents Z ∈ R^{D×3} and the shared
SO(2)-equivariant decoder optimised jointly on the normalised log-HDR
reconstruction plus a latent prior (the RENI formulation: latents pulled
toward N(0, I)).

Also provides a torch→jax weight converter skeleton for when a published
checkpoint IS available on disk.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from neusky_tpu.fields.reni import RENIField, RENIFieldConfig
from neusky_tpu.sampling.illumination import EquirectangularSampler


@dataclasses.dataclass(frozen=True)
class RENITrainerConfig:
    field: RENIFieldConfig = RENIFieldConfig(fixed_decoder=False)
    lr: float = 1e-4
    latent_lr: float = 1e-2
    kl_weight: float = 3e-3
    num_steps: int = 50000
    pixels_per_step: int = 2048
    steps_per_call: int = 100
    """Adam steps folded into one jitted ``lax.scan`` dispatch."""
    seed: int = 0
    variational: bool = True
    """Reparameterised variational autodecoder: per-image (mu, logvar)
    posteriors, z sampled each step, analytic KL to N(0, I).  The published
    RENI++ prior is variational (ckpt carries train_mu/train_logvar,
    excluded at ``neusky_model.py:287-300``) — that is WHY the reference
    can zero-init its sky latents (``neusky_model.py:261-263, 1537-1540``):
    z=0 decodes to a mean sky.  The r1-r3 in-framework prior was an
    unregularised autodecoder (kl_weight 1e-5 on ||z||²), whose z=0
    decoded out-of-domain and put every zero-init latent fit through the
    clipped render path on a flat plateau (r3 sky-plateau root cause).
    ``variational=False`` + kl_weight 1e-5 reproduces the old behaviour."""
    logvar_init: float = 0.0
    """Initial per-image log-variance.  0 (std 1) is load-bearing: early
    posterior samples then overlap heavily at the origin, so the decoder
    learns a mean sky at z=0 before the posteriors separate.  A tight init
    (e.g. -4 → std 0.13) never shows the decoder the origin and z=0 stays
    out-of-domain — measured on the quick corpus: z0-decode PSNR vs corpus
    mean sky 5.4 dB (lv -4) vs 18.8 dB (lv 0) at kl 3e-3 (r4 CPU sweep,
    PERF.md)."""


class RENITrainer:
    """Autodecoder training over envmaps [B, H, W, 3] (linear HDR)."""

    def __init__(self, config: RENITrainerConfig, envmaps: np.ndarray):
        self.config = config
        b, h, w, _ = envmaps.shape
        self.num_images = b
        self.field = RENIField(config.field)
        sampler = EquirectangularSampler(width=w)
        self.directions = np.asarray(sampler()).reshape(h * w, 3)
        self.targets = envmaps.reshape(b, h * w, 3)

        rng = jax.random.PRNGKey(config.seed)
        k_init, self.rng = jax.random.split(rng)
        decoder_params = self.field.init(
            k_init,
            jnp.zeros((2, 3)),
            jnp.zeros((2, config.field.latent_dim, 3)),
        )
        self.params = {
            "decoder": decoder_params,
            # "latents" holds the posterior MEANS in variational mode (so
            # every mean-latent consumer — reconstruction_psnr, gates-only
            # refits — works identically in both modes)
            "latents": jnp.zeros((b, config.field.latent_dim, 3)),
        }
        if config.variational:
            self.params["logvar"] = jnp.full(
                (b, config.field.latent_dim, 3), config.logvar_init
            )
        labels = {
            "decoder": jax.tree_util.tree_map(lambda _: "decoder", self.params["decoder"]),
            "latents": "latents",
        }
        if config.variational:
            labels["logvar"] = "latents"
        self.optimizer = optax.multi_transform(
            {
                "decoder": optax.adam(config.lr),
                "latents": optax.adam(config.latent_lr),
            },
            lambda p: {k: labels[k] for k in p},
        )
        self.opt_state = self.optimizer.init(self.params)
        self.step = 0
        self.history = []
        # corpus lives on device ONCE; always passed as jit arguments —
        # closed-over (traced-constant) arrays are re-staged through the
        # device tunnel on every call (PERF.md root cause 7)
        self._dirs_dev = jax.device_put(jnp.asarray(self.directions))
        self._targets_dev = jax.device_put(jnp.asarray(self.targets))
        self._step_fn = self._make_step()

    def _make_step(self):
        field = self.field
        cfg = self.config
        n_pix = self.directions.shape[0]
        num_images = self.num_images

        def loss_fn(params, rng, dirs_all, targets_all):
            # a batch of (image, pixel) pairs — every image's latent trains
            # every step, per-sample latents ride the decoder's [M, D, 3] path
            k_img, k_pix, k_eps = jax.random.split(rng, 3)
            img = jax.random.randint(
                k_img, (cfg.pixels_per_step,), 0, num_images
            )
            pix = jax.random.randint(k_pix, (cfg.pixels_per_step,), 0, n_pix)
            d = dirs_all[pix]
            gt = targets_all[img, pix]
            if cfg.variational:
                mu = params["latents"][img]
                logvar = params["logvar"][img]
                eps = jax.random.normal(k_eps, mu.shape)
                z = mu + eps * jnp.exp(0.5 * logvar)
                # analytic KL(N(mu, sigma²) || N(0, I)), mean over dims
                kl = -0.5 * jnp.mean(
                    1.0
                    + params["logvar"]
                    - params["latents"] ** 2
                    - jnp.exp(params["logvar"])
                )
            else:
                z = params["latents"][img]
                kl = jnp.mean(params["latents"] ** 2)
            out = field.apply(params["decoder"], d, z)
            pred_norm = out["rgb"]
            gt_norm = field.normalise(gt)
            recon = jnp.mean((pred_norm - gt_norm) ** 2)
            return recon + cfg.kl_weight * kl, {"recon": recon, "kl": kl}

        def step_fn(params, opt_state, rng, dirs_all, targets_all):
            def scan_body(carry, k):
                params, opt_state = carry
                (total, aux), grads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(params, k, dirs_all, targets_all)
                updates, opt_state = self.optimizer.update(
                    grads, opt_state, params
                )
                params = jax.tree_util.tree_map(
                    lambda p, u: p + u, params, updates
                )
                aux["total"] = total
                return (params, opt_state), aux

            keys = jax.random.split(rng, cfg.steps_per_call)
            (params, opt_state), auxs = jax.lax.scan(
                scan_body, (params, opt_state), keys
            )
            last = jax.tree_util.tree_map(lambda a: a[-1], auxs)
            return params, opt_state, last

        return jax.jit(step_fn, donate_argnums=(0, 1))

    def run(self, num_steps: Optional[int] = None, log_every: int = 500, log_fn=None):
        requested = num_steps or self.config.num_steps
        per_call = self.config.steps_per_call
        # steps advance in whole scan chunks — round the request up front so
        # the overshoot is explicit (self.step always reflects the true count)
        if requested % per_call:
            requested = (requested // per_call + 1) * per_call
            if log_fn:
                log_fn({"note": f"rounded to {requested} steps (chunks of {per_call})"})
        target = self.step + requested
        while self.step < target:
            self.rng, k = jax.random.split(self.rng)
            self.params, self.opt_state, aux = self._step_fn(
                self.params, self.opt_state, k,
                self._dirs_dev, self._targets_dev,
            )
            self.step += per_call
            if (self.step // per_call) % max(1, log_every // per_call) == 0 or (
                self.step >= target
            ):
                rec = {"step": self.step, **{k2: float(v) for k2, v in aux.items()}}
                self.history.append(rec)
                if log_fn:
                    log_fn(rec)
        return self.history

    # ------------------------------------------------------------------
    # evaluation helpers

    def reconstruction_psnr(self, image_idx: int) -> float:
        """PSNR of the normalised log-HDR reconstruction of one training sky."""
        z = self.params["latents"][image_idx]
        out = self.field.apply(self.params["decoder"], self._dirs_dev, z)
        gt_norm = self.field.normalise(self._targets_dev[image_idx])
        mse = float(jnp.mean((out["rgb"] - gt_norm) ** 2))
        # normalised domain is [-1, 1] → peak-to-peak 2
        return 10.0 * float(np.log10(4.0 / max(mse, 1e-12)))

    def fit_heldout_latents(
        self,
        envmaps: np.ndarray,
        steps: int = 400,
        lr: float = 1e-1,
        pixels_per_step: int = 2048,
        seed: int = 1,
        sky_chunk: int = 4,
    ):
        """Test-time latent fitting on held-out skies with the decoder
        FROZEN — the generalisation gate for the prior (mirrors how NeuSky
        consumes the decoder).  Returns (latents [B, D, 3], psnr [B])."""
        return fit_latents_to_envmaps(
            self.field, self.params["decoder"], envmaps,
            steps=steps, lr=lr, pixels_per_step=pixels_per_step,
            seed=seed, sky_chunk=sky_chunk,
        )

    def decode_envmap(self, latent: jnp.ndarray, width: int = 128) -> np.ndarray:
        """Latent → HDR envmap [H, W, 3] (BASELINE config[0]:
        'RENI++ decode: pretrained latent → 64×128 HDR envmap')."""
        sampler = EquirectangularSampler(width=width)
        d = sampler()
        out = self.field.apply(self.params["decoder"], d, latent)
        hdr = self.field.unnormalise(out["rgb"])
        return np.asarray(hdr).reshape(sampler.height, width, 3)


def fit_latents_to_envmaps(
    field: RENIField,
    decoder_params,
    envmaps: np.ndarray,  # [B, H, W, 3] linear HDR (H == W/2 equirect)
    steps: int = 400,
    lr: float = 1e-1,
    pixels_per_step: int = 2048,
    seed: int = 1,
    sky_chunk: int = 4,
):
    """Fit per-image latents to envmaps with the decoder FROZEN — exactly
    how NeuSky consumes the prior, and the latent source for the
    ``nerf_osr_envmap`` eval mode ("latents come from GT envmaps",
    ``neusky_model.py:1509``).  Returns (latents [B, D, 3], psnr [B]).

    Skies are fitted in host-level chunks of ``sky_chunk``: each sky's
    latent only touches its own pixels, so fitting per-chunk is exact
    (Adam's per-parameter normalisation cancels the 1/B grad scaling).
    Chunking bounds the [C, P, latent_dim, hidden] attention temps —
    in-graph batching over all B (vmap, lax.map, or lax.map+remat) was
    observed to allocate the full [B, ...] temp regardless (3.1 GB at
    B=32, OOM-killing the TPU worker)."""
    b, h, w, _ = envmaps.shape
    sampler = EquirectangularSampler(width=w)
    assert sampler.height == h, "equirect envmaps must be H == W/2"
    dirs = jax.device_put(jnp.asarray(np.asarray(sampler()).reshape(h * w, 3)))
    decoder = jax.tree_util.tree_map(jax.lax.stop_gradient, decoder_params)
    latent_dim = field.config.latent_dim
    n_pix = h * w
    opt = optax.adam(lr)
    c = min(sky_chunk, b)

    @jax.jit
    def run(z, rng, targets):
        state = opt.init(z)

        def body(carry, k):
            z, state = carry
            pix = jax.random.randint(k, (pixels_per_step,), 0, n_pix)

            def loss(z):
                d = dirs[pix]  # [P, 3]
                gt = field.normalise(targets[:, pix])  # [C, P, 3]
                pred = jax.vmap(
                    lambda zz: field.apply(decoder, d, zz)["rgb"]
                )(z)
                return jnp.mean((pred - gt) ** 2)

            g = jax.grad(loss)(z)
            updates, state = opt.update(g, state, z)
            return (z + updates, state), None

        (z, _), _ = jax.lax.scan(body, (z, state), jax.random.split(rng, steps))
        pred = jax.vmap(
            lambda zz: field.apply(decoder, dirs, zz)["rgb"]
        )(z)
        gt = field.normalise(targets)
        mse = jnp.mean((pred - gt) ** 2, axis=(1, 2))
        return z, 10.0 * jnp.log10(4.0 / jnp.maximum(mse, 1e-12))

    flat = envmaps.reshape(b, h * w, 3)
    zs, psnrs = [], []
    for lo in range(0, b, c):
        chunk = flat[lo : lo + c]
        pad = c - chunk.shape[0]
        if pad:
            chunk = np.concatenate([chunk, chunk[-1:].repeat(pad, 0)], 0)
        z0 = jnp.zeros((c, latent_dim, 3))
        z, psnr = run(z0, jax.random.PRNGKey(seed + lo), jnp.asarray(chunk))
        zs.append(np.asarray(z)[: c - pad if pad else c])
        psnrs.append(np.asarray(psnr)[: c - pad if pad else c])
    return np.concatenate(zs, 0), np.concatenate(psnrs, 0)


# torch→jax checkpoint conversion lives in engine/reni_convert.py
# (name-mapped nn.Linear / nn.MultiheadAttention layouts, round-trip
# tested); re-exported here for the original import site.
from neusky_tpu.engine.reni_convert import (  # noqa: E402,F401
    convert_torch_reni_checkpoint,
    params_to_torch_state,
)
