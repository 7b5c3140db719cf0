"""Eval: chunked full-image renders, eval-latent fitting, benchmark protocol.

Rebuilds the reference's eval paths:
  - ``get_outputs_for_camera_ray_bundle`` (``neusky_model.py:1370-1501``):
    chunked forward over a camera's rays — here one fixed-size jitted chunk
    function (compiled once), last chunk padded;
  - ``fit_latent_codes_for_eval`` (``neusky_model.py:1503-1588``): 250 Adam
    steps on eval latents/scales with the decoder frozen;
  - ``get_average_eval_image_metrics`` (``neusky_pipeline.py:392-444``):
    per-image PSNR/SSIM/LPIPS/MSE + rays/sec/fps instrumentation.
"""

from __future__ import annotations

import dataclasses
import itertools
import json
import time
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from neusky_tpu.core.rays import RayBundle
from neusky_tpu.data.datamanager import DataManager
from neusky_tpu.engine import metrics as M
from neusky_tpu.engine.optimizers import build_eval_latent_optimizer
from neusky_tpu.models.neusky import NeuSkyModel
from neusky_tpu.parallel.mesh import make_eval_latent_step


def make_render_chunk_fn(model: NeuSkyModel, chunk_size: int = 4096):
    """Jitted fixed-size eval forward for chunked full-image renders.
    ``rotation`` (optional [3,3]) rotates the illumination decode — the
    envmap eval mode renders with its fitted per-session z-rotation."""

    def chunk_fn(params, rng, ray_bundle, image_idx, rotation=None):
        image_indices = jnp.asarray([image_idx], jnp.int32).reshape(1)
        ray_image_idx = jnp.zeros(
            (ray_bundle.origins.shape[0],), jnp.int32
        )
        out = model.forward(
            params, rng, ray_bundle, image_indices, ray_image_idx,
            step=jnp.asarray(0.0), train=False, rotation=rotation,
        )
        keys = ("rgb", "albedo", "accumulation", "depth", "p2p_dist", "normal")
        return {k: out[k] for k in keys}

    return jax.jit(chunk_fn, static_argnames=()), chunk_size


def render_camera(
    model: NeuSkyModel,
    params,
    camera_ray_bundle: RayBundle,
    image_idx: int,
    rng: jax.Array,
    chunk_fn=None,
    chunk_size: int = 4096,
    rotation=None,
) -> Dict[str, np.ndarray]:
    """Chunked full-image render; returns host numpy per-output maps [N, C]."""
    if chunk_fn is None:
        chunk_fn, chunk_size = make_render_chunk_fn(model, chunk_size)
    n = camera_ray_bundle.origins.shape[0]
    num_chunks = -(-n // chunk_size)
    pad = num_chunks * chunk_size - n
    padded = jax.tree_util.tree_map(
        lambda x: jnp.concatenate(
            [x, jnp.repeat(x[-1:], pad, axis=0)], axis=0
        )
        if pad
        else x,
        camera_ray_bundle,
    )
    outs = []
    for i in range(num_chunks):
        cb = padded.slice(i * chunk_size, chunk_size)
        rng, k = jax.random.split(rng)
        outs.append(
            chunk_fn(params, k, cb, image_idx)
            if rotation is None
            else chunk_fn(params, k, cb, image_idx, rotation)
        )
    merged = {
        k: np.concatenate([np.asarray(o[k]) for o in outs], axis=0)[:n]
        for k in outs[0]
    }
    return merged


def _presampled_adam_scan(optimizer, target0, opt_state, batches, rng, loss_of, aux=None):
    """Shared machinery for test-time fits: stack pre-sampled host batches
    on a leading axis and run the whole Adam loop as ONE jitted
    ``lax.scan`` — a single dispatch + a single device→host transfer (the
    loss trace) instead of per-step round trips (SURVEY §7.3-6).

    ``loss_of(target, aux, batch, i, key) → scalar``; ``aux`` is an
    optional pytree of loop-invariant arrays passed as TRACED ARGUMENTS
    (closed-over arrays re-stage through the device tunnel per call —
    PERF.md root cause 7).  Only the ``cameras`` pytree is treated as a
    compile-time constant batch key."""
    const_keys = {"cameras"}
    stacked = {
        k: np.stack([np.asarray(b[k]) for b in batches])
        for k in batches[0]
        if k not in const_keys
    }
    const = {k: batches[0][k] for k in const_keys if k in batches[0]}
    steps = len(batches)

    def run(target, opt_state, stacked, const, rng, aux):
        def body(carry, xs):
            t, o = carry
            i, bstep = xs
            k = jax.random.fold_in(rng, i)
            batch = {**bstep, **const}

            def loss(t):
                return loss_of(t, aux, batch, i, k)

            total, grads = jax.value_and_grad(loss)(t)
            updates, o = optimizer.update(grads, o, t)
            t = jax.tree_util.tree_map(lambda a, u: a + u, t, updates)
            return (t, o), total

        (target, opt_state), losses = jax.lax.scan(
            body, (target, opt_state), (jnp.arange(steps), stacked)
        )
        return target, losses

    target, losses = jax.jit(run)(target0, opt_state, stacked, const, rng, aux)
    return target, [float(x) for x in np.asarray(losses)]


def fit_eval_latents(
    model: NeuSkyModel,
    params,
    datamanager: DataManager,
    rng: jax.Array,
    image_idx: Optional[int] = None,
    steps: int = 250,
    lr: float = 1e-1,
    lr_final: float = 1e-7,
    sample_region: str = "full_image",
    host_loop: bool = False,
    batch_fn=None,
    scale_only: bool = False,
    init_latent="auto",
):
    """Test-time latent optimisation: resets eval latents / scales to one,
    then ``steps`` Adam updates on the sky+RGB losses with the decoder
    frozen (``neusky_model.py:1503-1588``).

    Latent reset value: the reference resets to ZERO
    (``neusky_model.py:1537-1540``) — valid only because its published
    RENI++ prior is *variational* (z=0 decodes to a mean sky).  The
    in-framework autodecoder prior decodes z=0 out-of-domain (saturated
    sky, provably flat fit loss — r3 diagnosis, ``tools/probe_sky_fit.py``),
    so the reset value here is the prior's fitted mean-sky latent
    ``init_latent.npz`` (``engine.checkpoint.prior_init_latent``), the same
    seed training starts from.  ``init_latent``: "auto" resolves from
    ``model.config.illumination_prior_dir``; pass an explicit [D, 3] array
    or None (zeros — reference-exact, for variational priors).

    Default path: all ``steps`` pixel batches are pre-sampled on host,
    stacked, and the whole Adam loop runs as ONE jitted ``lax.scan`` —
    a single dispatch + a single device→host transfer (the loss trace),
    instead of 250 round trips (SURVEY §7.3-6).  ``host_loop=True`` keeps
    the per-step python loop (used by tests as the reference semantics).

    ``image_idx``: ``None`` (default) cycles EVERY eval image round-robin
    across the fit steps — the reference pulls
    ``next(self.iter_eval_image_dataloader)`` each fit step, which walks
    all eval images (``neusky_datamanager.py:294``), so every per-image
    latent slot receives gradient (the loss indexes latents by
    ``batch["image_indices"]``).  An explicit int restricts the fit to
    that one image's slot (used by targeted tests).  r4's eval table was
    invalidated by the old ``image_idx=0`` default: only slot 0 was fit
    and images 1–3 rendered from the seed latent at PSNR ~5.

    ``batch_fn`` (optional, () → batch dict): overrides the per-step batch
    source — the NeRF-OSR protocol passes
    ``lambda: protocol.lighting_eval_batch("optimise")`` so latents fit on
    the session-holdout pool (``neusky_datamanager.py:309-329``)."""
    if batch_fn is None:
        if image_idx is None:
            n_eval = max(datamanager.num_eval, 1)
            counter = itertools.count()
            batch_fn = lambda: datamanager.eval_latent_batch(
                next(counter) % n_eval, sample_region
            )
        else:
            batch_fn = lambda: datamanager.eval_latent_batch(
                image_idx, sample_region
            )
    if isinstance(init_latent, str) and init_latent == "auto":
        from neusky_tpu.engine.checkpoint import prior_init_latent

        init_latent = prior_init_latent(model.config)
    eval_g = dict(params["eval_latents"])
    cur = eval_g["eval_latents"]
    if init_latent is not None and np.asarray(init_latent).shape == cur.shape[1:]:
        eval_g["eval_latents"] = jnp.broadcast_to(
            jnp.asarray(init_latent, cur.dtype)[None], cur.shape
        )
    else:
        eval_g["eval_latents"] = jnp.zeros_like(cur)
    eval_g["eval_scale"] = jnp.ones_like(eval_g["eval_scale"])
    params = {**params, "eval_latents": eval_g}

    optimizer = build_eval_latent_optimizer(lr, lr_final, steps, scale_only=scale_only)
    opt_state = optimizer.init(params)

    if host_loop:
        step_fn = make_eval_latent_step(model, optimizer)
        losses = []
        for i in range(steps):
            batch = batch_fn()
            rng, k = jax.random.split(rng)
            params, opt_state, total = step_fn(
                params, opt_state, batch, k, jnp.asarray(float(i))
            )
            losses.append(float(total))
        return params, losses

    from neusky_tpu.models.pipeline import eval_latent_loss_fn

    batches = [batch_fn() for _ in range(steps)]

    def loss_of(p, _aux, batch, i, k):
        return eval_latent_loss_fn(
            model, p, k, batch, jnp.asarray(i, jnp.float32)
        )

    return _presampled_adam_scan(
        optimizer, params, opt_state, batches, rng, loss_of
    )


def fit_eval_rotation(
    model: NeuSkyModel,
    params,
    protocol,
    rng: jax.Array,
    gt_latents: jnp.ndarray,  # [S, latent_dim, 3] fitted to the GT envmaps
    steps: int = 250,
    lr: float = 1e-1,
    lr_final: float = 1e-7,
):
    """``nerf_osr_envmap`` eval mode (``neusky_model.py:1509,1553-1568``):
    eval latents are FIXED — fitted beforehand to the sessions' GT envmaps
    (``RENITrainer.fit_heldout_latents`` on the equirect captures) — and
    only a per-session z-rotation (sigmoid-bounded to [0, 2π)) plus the
    eval scale are optimised, on COMPARE-set pixel batches.

    Returns (params with fitted eval scale+latents, gamma [S] radians,
    losses).  The whole Adam loop runs as one jitted ``lax.scan`` over
    pre-sampled batches (same pattern as ``fit_eval_latents``)."""
    import optax

    from neusky_tpu.engine.optimizers import exponential_decay_schedule
    from neusky_tpu.models.pipeline import eval_latent_loss_fn

    s = gt_latents.shape[0]
    # rotation logit init = the model's persistent eval_rotation parameter
    # (ones — matching the reference's Parameter(torch.ones(...)) at
    # ``neusky_model.py:259``; sigmoid saturates, so the start point
    # materially shapes where 250 Adam steps land)
    rot0 = params["eval_latents"].get("eval_rotation")
    if rot0 is None or rot0.shape[0] != s:
        rot0 = jnp.ones((s,))
    q0 = {
        "rot_logit": jnp.asarray(rot0),
        "scale": jnp.ones((s,)),
    }
    sched = exponential_decay_schedule(lr, lr_final, steps)
    optimizer = optax.chain(
        optax.scale_by_adam(eps=1e-15), optax.scale_by_schedule(sched),
        optax.scale(-1.0),
    )
    opt_state = optimizer.init(q0)

    batches = [protocol.lighting_eval_batch("compare") for _ in range(steps)]
    base_eval = dict(params["eval_latents"])
    base_eval["eval_latents"] = gt_latents

    def loss_of(q, aux, batch, i, k):
        full_params, base = aux
        gamma = jax.nn.sigmoid(q["rot_logit"]) * 2.0 * jnp.pi  # [S]
        cg, sg = jnp.cos(gamma), jnp.sin(gamma)
        zeros = jnp.zeros_like(gamma)
        ones = jnp.ones_like(gamma)
        rot = jnp.stack(
            [cg, -sg, zeros, sg, cg, zeros, zeros, zeros, ones], -1
        ).reshape(s, 3, 3)[batch["image_indices"]]  # [U, 3, 3]
        p2 = {
            **full_params,
            "eval_latents": {**base, "eval_scale": q["scale"]},
        }
        return eval_latent_loss_fn(
            model, p2, k, batch, jnp.asarray(i, jnp.float32), rotation=rot
        )

    q, losses = _presampled_adam_scan(
        optimizer, q0, opt_state, batches, rng, loss_of,
        aux=(params, base_eval),
    )
    gamma = np.asarray(jax.nn.sigmoid(q["rot_logit"]) * 2.0 * np.pi)
    out_params = {
        **params,
        "eval_latents": {
            **base_eval,
            "eval_scale": q["scale"],
            "eval_rotation": q["rot_logit"],
        },
    }
    return out_params, gamma, [float(x) for x in np.asarray(losses)]


def eval_image_metrics(
    model: NeuSkyModel,
    params,
    datamanager: DataManager,
    image_idx: int,
    rng: jax.Array,
    chunk_fn=None,
    chunk_size: int = 4096,
    mask_to_building: bool = False,
) -> Dict[str, Any]:
    """One image's metric dict (+ render maps), with the reference's
    rays/sec + fps throughput fields.

    ``mask_to_building``: multiplies pred/gt by mask channel 0 before
    metrics (``neusky_model.py:1135-1154``).  Channel 0 carries the
    NeRF-OSR *test eval (building) mask* ONLY on the test split
    (``data/dataset.py`` substitutes it there); on train/val splits it is
    the static mask — only set this flag when the datamanager's eval data
    is the test split, as the NeRF-OSR protocol does
    (``data/nerfosr_eval.py::compare_image``)."""
    rb, batch = datamanager.eval_image_bundle(image_idx)
    cams = datamanager.eval_cameras or datamanager.train_cameras
    h, w = cams.height, cams.width
    t0 = time.perf_counter()
    outputs = render_camera(
        model, params, rb, image_idx, rng, chunk_fn, chunk_size
    )
    dt = time.perf_counter() - t0

    pred = outputs["rgb"].reshape(h, w, 3)
    gt = np.asarray(batch["image"]).reshape(h, w, 3)
    mask = np.asarray(batch["mask"]).reshape(h, w, 4)
    if mask_to_building:
        pred = pred * mask[..., 0:1]
        gt = gt * mask[..., 0:1]

    num_rays = h * w
    return {
        "psnr": M.psnr(pred, gt),
        "ssim": M.ssim_image(pred, gt),
        "lpips": M.lpips_image(pred, gt),
        "mse": M.mse(pred, gt),
        "num_rays_per_sec": num_rays / dt,
        "fps": 1.0 / dt,
        "outputs": outputs,
    }


def average_eval_metrics(
    model: NeuSkyModel,
    params,
    datamanager: DataManager,
    rng: jax.Array,
    num_images: Optional[int] = None,
    chunk_size: int = 4096,
    fit_latents_first: bool = True,
) -> Dict[str, float]:
    """``get_average_eval_image_metrics`` equivalent (throughput fields
    ``num_rays_per_sec``/``fps`` come from ``eval_image_metrics`` —
    ``neusky_pipeline.py:420-431``)."""
    if fit_latents_first:
        rng, k = jax.random.split(rng)
        params, _ = fit_eval_latents(model, params, datamanager, k)
    chunk_fn, chunk_size = make_render_chunk_fn(model, chunk_size)
    n = num_images or max(datamanager.num_eval, 1)
    per_image = []
    for i in range(n):
        rng, k = jax.random.split(rng)
        m = eval_image_metrics(
            model, params, datamanager, i, k, chunk_fn, chunk_size
        )
        m.pop("outputs")
        per_image.append(m)
    keys = [k for k in per_image[0] if per_image[0][k] is not None]
    out = {k: float(np.mean([m[k] for m in per_image])) for k in keys}
    if len(per_image) > 1:
        # image 0 pays the chunk_fn jit compile; exclude it from throughput
        for k in ("num_rays_per_sec", "fps"):
            out[k] = float(np.mean([m[k] for m in per_image[1:]]))
    return out


# ---------------------------------------------------------------------------
# NeRF-OSR relighting protocol (session holdout → compare, building-masked)


def run_nerfosr_protocol(
    model: NeuSkyModel,
    params,
    protocol,
    rng: jax.Array,
    fit_steps: int = 250,
    chunk_size: int = 4096,
    least_squares_scale: bool = False,
    optimise_compare_eval_scale: bool = False,
    gt_envmaps=None,  # [S, H, W, 3] linear HDR per session → envmap mode
) -> Dict[str, Any]:
    """The full NeRF-OSR relighting benchmark
    (``get_average_eval_image_metrics``, ``neusky_pipeline.py:392-444``):

      1. fit eval latents (one slot per lighting session) on the
         session-holdout optimise pool — or, with
         ``optimise_compare_eval_scale`` (``neusky_model.py:1511-1514,
         1549-1552``), fit ONLY ``eval_scale`` on the COMPARE pool
         (reference-exact, including its quirk that the latents stay at
         their reset zeros);
      2. render every compare image with its session's fitted latent;
      3. metrics restricted to the NeRF-OSR building mask (channel 0 of the
         test-split mask), optional global least-squares scale
         (``least_squares_global_scale``, ``neusky_pipeline.py:93,330-331``
         — a separate knob from the scale fit).
    """
    rng, k_fit = jax.random.split(rng)
    if gt_envmaps is not None:
        # nerf_osr_envmap mode: latents from the sessions' GT envmaps
        # (frozen-decoder fit), then per-session z-rotation + scale on
        # compare batches (``neusky_model.py:1509,1553-1568``)
        from neusky_tpu.engine.reni_trainer import fit_latents_to_envmaps

        gt_latents, envmap_psnr = fit_latents_to_envmaps(
            model.illumination, params["illumination_decoder"],
            np.asarray(gt_envmaps), steps=fit_steps,
        )
        params, gamma, fit_losses = fit_eval_rotation(
            model, params, protocol, k_fit, jnp.asarray(gt_latents),
            steps=fit_steps,
        )
        envmap_info = {
            "envmap_fit_psnr": [float(x) for x in envmap_psnr],
            "session_rotation_rad": [float(g) for g in gamma],
        }
        # the fitted rotation is APPLIED at compare-render time (the
        # reference registers eval_rotation but renders with identity —
        # ``neusky_pipeline.py:423`` never threads it; rendering with the
        # rotation the scale was co-fitted under is the consistent choice,
        # divergence documented here)
        cg, sg = np.cos(gamma), np.sin(gamma)
        session_rot = np.zeros((len(gamma), 3, 3), np.float32)
        session_rot[:, 0, 0] = cg
        session_rot[:, 0, 1] = -sg
        session_rot[:, 1, 0] = sg
        session_rot[:, 1, 1] = cg
        session_rot[:, 2, 2] = 1.0
    else:
        envmap_info = None
        session_rot = None
        fit_pool = "compare" if optimise_compare_eval_scale else "optimise"
        params, fit_losses = fit_eval_latents(
            model, params, None, k_fit, steps=fit_steps,
            batch_fn=lambda: protocol.lighting_eval_batch(fit_pool),
            scale_only=optimise_compare_eval_scale,
        )

    chunk_fn, chunk_size = make_render_chunk_fn(model, chunk_size)
    h, w = protocol.cameras.height, protocol.cameras.width
    per_image = []
    for i in range(len(protocol.compare_indices)):
        image_idx, slot, rb, gt_batch = protocol.compare_image(i)
        rng, k = jax.random.split(rng)
        t0 = time.perf_counter()
        rot = jnp.asarray(session_rot[slot]) if session_rot is not None else None
        out = render_camera(
            model, params, rb, slot, k, chunk_fn, chunk_size, rotation=rot
        )
        dt = time.perf_counter() - t0
        pred = out["rgb"].reshape(h, w, 3)
        gt = np.asarray(gt_batch["image"]).reshape(h, w, 3)
        m = np.asarray(gt_batch["mask"]).reshape(h, w, 4)[..., 0:1]
        pred = pred * m
        gt = gt * m
        if least_squares_scale:
            from neusky_tpu.data.nerfosr_eval import global_least_squares_scale

            pred = np.clip(global_least_squares_scale(pred, gt), 0.0, None)
        per_image.append(
            {
                "image_idx": int(image_idx),
                "session": int(slot),
                "psnr": M.psnr(pred, gt),
                "ssim": M.ssim_image(pred, gt),
                "lpips": M.lpips_image(pred, gt),
                "mse": M.mse(pred, gt),
                "num_rays_per_sec": h * w / dt,
            }
        )
    keys = [k for k in ("psnr", "ssim", "lpips", "mse", "num_rays_per_sec")
            if per_image and per_image[0][k] is not None]
    mean = {k: float(np.mean([p[k] for p in per_image])) for k in keys}
    if len(per_image) > 1 and "num_rays_per_sec" in keys:
        # image 0 pays the chunk_fn jit compile — exclude from throughput
        # (same rule as average_eval_metrics)
        mean["num_rays_per_sec"] = float(
            np.mean([p["num_rays_per_sec"] for p in per_image[1:]])
        )
    out = {
        "per_image": per_image,
        "mean": mean,
        "fit_loss_first": fit_losses[0],
        "fit_loss_last": fit_losses[-1],
        "num_sessions": protocol.num_sessions,
    }
    if envmap_info is not None:
        out.update(envmap_info)
    if "lpips" in keys:
        # random-VGG LPIPS is a valid distance but NOT comparable to
        # published pretrained numbers — always label the flavour
        out["lpips_flavour"] = M.lpips_flavour()
    return out


def _load_session_envmaps(po: Dict[str, Any], width: int = 128) -> np.ndarray:
    """One GT envmap per lighting session → [S, width/2, width, 3] linear
    HDR (sRGB LDR captures are linearised; ``ENV_MAP_CC/<session>/``
    equirect layout, ``nerfosr_cityscapes_dataparser.py:313-334``)."""
    import os

    from PIL import Image

    from neusky_tpu.core.colour import sRGB_to_linear

    files = po.get("envmap_filenames") or []
    if not files:
        raise SystemExit(
            "eval_latent_optimise_method=nerf_osr_envmap needs envmap images "
            "under ENV_MAP_CC/<session>/"
        )
    # slot order comes FROM THE PARSER (session_names[s] ↔ latent slot s)
    sessions = po.get("session_names") or sorted(
        {os.path.basename(os.path.dirname(f)) for f in files}
    )
    out = []
    for s in sessions:
        f = next(
            (x for x in files if os.path.basename(os.path.dirname(x)) == s),
            None,
        )
        if f is None:
            raise SystemExit(
                f"session {s!r} has no png/jpg envmap directly under "
                f"ENV_MAP_CC/{s}/ (found files: {len(files)} across sessions)"
            )
        img = Image.open(f).convert("RGB").resize(
            (width, width // 2), Image.BILINEAR
        )
        ldr = np.asarray(img, np.float32) / 255.0
        out.append(np.asarray(sRGB_to_linear(jnp.asarray(ldr))))
    return np.stack(out)


def run_nerfosr_eval(args, overrides):
    """CLI: checkpoint → session-holdout latent fit → compare-set metrics
    JSON (``cli eval neusky --data ... --protocol nerfosr``)."""
    import dataclasses as dc

    from neusky_tpu.cli import _apply_overrides
    from neusky_tpu.configs import METHOD_REGISTRY
    from neusky_tpu.data.dataparsers.nerfosr import (
        NeRFOSRDataparserConfig,
        parse_holdout_arg,
        parse_nerfosr_scene,
    )
    from neusky_tpu.data.dataset import NeuSkyDataset
    from neusky_tpu.data.nerfosr_eval import NeRFOSREvalProtocol
    from neusky_tpu.engine.checkpoint import load_param_subtrees

    spec = METHOD_REGISTRY[args.method]
    bundle = _apply_overrides(spec.build(), overrides)
    model_config = bundle["model_config"]

    parser_cfg = NeRFOSRDataparserConfig(
        data=args.data, scene=args.scene,
        session_holdout_indices=parse_holdout_arg(
            getattr(args, "session_holdout_indices", "0,0,0,0,0")
        ),
    )
    train_po = parse_nerfosr_scene(parser_cfg, "train")
    test_po = parse_nerfosr_scene(parser_cfg, "test")
    test_data = NeuSkyDataset(test_po, "test", args.downscale).load()

    protocol = NeRFOSREvalProtocol(
        cameras=test_data["cameras"],
        images=test_data["images"],
        masks=test_data["masks"],
        session_to_indices=test_po["session_to_indices"],
        indices_to_session=test_po["indices_to_session"],
        session_holdout_indices=test_po["session_holdout_indices"],
        test_eval_mask_indices=sorted(test_po["test_eval_mask_dict"].keys()),
    )

    # eval-latent slots are per lighting session; train latents must match
    # the training run's shape for the checkpoint restore
    model_config = dc.replace(
        model_config,
        num_train_data=len(train_po["image_filenames"]),
        num_eval_data=protocol.num_sessions,
    )
    model = NeuSkyModel(model_config)
    params = model.init(jax.random.PRNGKey(0))
    if not args.load_dir:
        raise SystemExit("--load-dir required for the nerfosr protocol")
    # everything except the per-image latent groups: eval latents are re-fit
    # from scratch (slot count = lighting sessions here, not the training
    # run's eval split), and TRAIN latents are per-training-image variables —
    # meaningless across datasets and unused by the protocol's eval path, so
    # a checkpoint trained with a different train-image count must still
    # restore (r4 crash: (8,100,3) != (4,100,3) — VERDICT weak #4)
    params = load_param_subtrees(
        Path(args.load_dir), None, params,
        exclude=("eval_latents", "illumination_field"),
    )

    gt_envmaps = None
    if model_config.eval_latent_optimise_method == "nerf_osr_envmap":
        gt_envmaps = _load_session_envmaps(test_po, width=128)

    pipe_cfg = bundle.get("pipeline_config")
    result = run_nerfosr_protocol(
        model, params, protocol, jax.random.PRNGKey(1),
        least_squares_scale=bool(
            getattr(pipe_cfg, "least_squares_global_scale", False)
        ),
        optimise_compare_eval_scale=model_config.optimise_compare_eval_scale,
        gt_envmaps=gt_envmaps,
    )
    # --output is shared across subcommands with the RENDER default
    # ("render.npy"); treat that default as unset here
    raw_out = getattr(args, "output", "")
    if not raw_out or raw_out == "render.npy":
        raw_out = "nerfosr_eval.json"
    out_path = Path(raw_out)
    if out_path.suffix != ".json":
        out_path = out_path.with_suffix(".json")
    out_path.write_text(json.dumps(result, indent=2))
    print(json.dumps(result["mean"]))
    print(f"wrote {out_path}")
    return result


# ---------------------------------------------------------------------------
# CLI glue


def _load_run(args, overrides):
    import dataclasses as dc

    from neusky_tpu.cli import _apply_overrides, _build_datamanager
    from neusky_tpu.configs import METHOD_REGISTRY
    from neusky_tpu.engine.checkpoint import latest_step, load_checkpoint
    from neusky_tpu.engine.optimizers import build_optimizer, default_neusky_optimizer_groups

    spec = METHOD_REGISTRY[args.method]
    bundle = _apply_overrides(spec.build(), overrides)
    model_config = bundle["model_config"]
    dm = _build_datamanager(args, model_config, bundle.get("dataparser", "nerfosr"))
    model_config = dc.replace(
        model_config, num_train_data=dm.num_train, num_eval_data=max(dm.num_eval, 1)
    )
    model = NeuSkyModel(model_config)
    params = model.init(jax.random.PRNGKey(0))
    if args.load_dir:
        optimizer = build_optimizer(
            params, bundle.get("optimizer_groups") or default_neusky_optimizer_groups(10)
        )
        opt_state = optimizer.init(params)
        params, _, _ = load_checkpoint(Path(args.load_dir), None, params, opt_state)
    return model, params, dm


def run_eval(args, overrides):
    model, params, dm = _load_run(args, overrides)
    metrics = average_eval_metrics(
        model, params, dm, jax.random.PRNGKey(1),
        fit_latents_first=dm.num_eval > 0,
    )
    print(json.dumps(metrics))


def run_render(args, overrides):
    model, params, dm = _load_run(args, overrides)
    rb, _ = dm.eval_image_bundle(args.image_idx)
    out = render_camera(
        model, params, rb, args.image_idx, jax.random.PRNGKey(2)
    )
    cams = dm.eval_cameras or dm.train_cameras
    img = out["rgb"].reshape(cams.height, cams.width, 3)
    np.save(args.output, img)
    print(f"saved render to {args.output} ({img.shape})")
