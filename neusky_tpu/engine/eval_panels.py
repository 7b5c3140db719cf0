"""Eval image panels + GT-layer metrics.

Rebuild of ``NeuSkyFactoModel.get_image_metrics_and_images``
(``neusky_model.py:1079-1335``): the combined GT|pred panels (rgb,
accumulation, depth, normal, normalised error, per-proposal depth), the
RENI envmap visualisation (LDR + HDR heatmap), and the synthetic GT-layer
evaluation (albedo PSNR/SSIM with per-channel least-squares rescale, normal
mean-angular-error, depth MSE after scale-shift alignment).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from neusky_tpu.core.colour import linear_to_sRGB
from neusky_tpu.engine import metrics as M
from neusky_tpu.models.neusky import NeuSkyModel
from neusky_tpu.sampling.illumination import EquirectangularSampler
from neusky_tpu.utils.viz import (
    apply_colormap,
    apply_depth_colormap,
    normalised_error_map,
    side_by_side,
)


def normalized_depth_scale_and_shift(
    pred: np.ndarray, gt: np.ndarray, mask: np.ndarray
) -> Tuple[float, float]:
    """Least-squares (scale, shift) aligning pred to gt on masked pixels
    (nerfstudio ``normalized_depth_scale_and_shift``, consumed at
    ``neusky_model.py:1099-1102``)."""
    m = mask.astype(np.float64).reshape(-1)
    p = pred.astype(np.float64).reshape(-1)
    g = gt.astype(np.float64).reshape(-1)
    a00 = np.sum(m * p * p)
    a01 = np.sum(m * p)
    a11 = np.sum(m)
    b0 = np.sum(m * p * g)
    b1 = np.sum(m * g)
    det = a00 * a11 - a01 * a01
    if abs(det) < 1e-12:
        return 1.0, 0.0
    scale = (a11 * b0 - a01 * b1) / det
    shift = (-a01 * b0 + a00 * b1) / det
    return float(scale), float(shift)


def render_reni_envmap(
    model: NeuSkyModel, params, latent_slot: int, width: int = 128,
    use_eval_latents: bool = True,
) -> Dict[str, np.ndarray]:
    """Decode the fitted latent into an envmap panel: sRGB LDR | HDR-mean
    heatmap (``neusky_model.py:1256-1283``)."""
    sampler = EquirectangularSampler(width=width)
    dirs = sampler()
    group = params["eval_latents"] if use_eval_latents else params["illumination_field"]
    key = "eval_latents" if use_eval_latents else "train_latents"
    skey = "eval_scale" if use_eval_latents else "train_scale"
    z = group[key][latent_slot]
    s = group[skey][latent_slot : latent_slot + 1]
    out = model.illumination.apply(
        params["illumination_decoder"], dirs,
        jnp.broadcast_to(z[None], (dirs.shape[0], *z.shape)),
        jnp.broadcast_to(s, (dirs.shape[0],)),
    )
    hdr = np.asarray(model.illumination.unnormalise(out["rgb"]))
    h, w = sampler.height, width
    ldr = np.asarray(linear_to_sRGB(jnp.asarray(hdr))).reshape(h, w, 3)
    hdr_mean = hdr.reshape(h, w, 3).mean(axis=-1, keepdims=True)
    rng = hdr_mean.max() - hdr_mean.min()
    heat = apply_depth_colormap(hdr_mean, near_plane=hdr_mean.min(), far_plane=hdr_mean.max())
    return {"ldr": ldr, "hdr_heatmap": heat, "panel": side_by_side(ldr, heat)}


def image_metrics_and_panels(
    model: NeuSkyModel,
    params,
    outputs: Dict[str, np.ndarray],  # flat [N, C] render maps
    batch: Dict[str, Any],
    height: int,
    width: int,
    latent_slot: int = 0,
    mask_to_building: bool = False,
    gt_layers: Optional[Dict[str, np.ndarray]] = None,
) -> Tuple[Dict[str, float], Dict[str, np.ndarray]]:
    """Metrics dict + images dict (``neusky_model.py:1079-1335``)."""
    H, W = height, width
    rgb = outputs["rgb"].reshape(H, W, 3)
    gt = np.asarray(batch["image"]).reshape(H, W, 3)
    mask = np.asarray(batch["mask"]).reshape(H, W, 4)
    acc = outputs["accumulation"].reshape(H, W, 1)
    depth = outputs["depth"].reshape(H, W, 1)
    normal = outputs["normal"].reshape(H, W, 3)

    images: Dict[str, np.ndarray] = {
        "img": side_by_side(gt, rgb),
        "accumulation": side_by_side(
            apply_colormap(mask[..., 1]), apply_colormap(acc[..., 0])
        ),
        "depth": apply_depth_colormap(depth, accumulation=acc),
        "normal": side_by_side((0 * gt + 0.5), (normal + 1.0) / 2.0),
        "normalised_error": normalised_error_map(rgb, gt),
        "albedo": outputs["albedo"].reshape(H, W, 3),
    }
    for k in outputs:
        if k.startswith("prop_depth_"):
            images[k] = apply_depth_colormap(
                outputs[k].reshape(H, W, 1), accumulation=acc
            )

    rgb_m, gt_m = rgb, gt
    if mask_to_building:
        rgb_m = rgb * mask[..., 0:1]
        gt_m = gt * mask[..., 0:1]
    metrics = {
        "psnr": M.psnr(rgb_m, gt_m),
        "ssim": M.ssim_image(rgb_m, gt_m),
        "mse": M.mse(rgb_m, gt_m),
    }
    lp = M.lpips_image(rgb_m, gt_m)
    if lp is not None:
        metrics["lpips"] = lp

    # envmap panel from the fitted latent
    try:
        env = render_reni_envmap(model, params, latent_slot)
        images["reni_envmap"] = env["panel"]
    except Exception:
        pass

    # ---- GT layer evaluation (synthetic splits, ``:1177-1254``) ----
    fg = mask[..., 1:2]
    if gt_layers:
        if "albedo" in gt_layers:
            gt_alb = np.asarray(linear_to_sRGB(jnp.asarray(gt_layers["albedo"])))
            pred_alb = np.asarray(
                linear_to_sRGB(jnp.asarray(images["albedo"]))
            ).copy()
            sel = fg[..., 0] > 0.5
            if sel.any():
                for c in range(3):
                    p = pred_alb[..., c][sel]
                    g = gt_alb[..., c][sel]
                    denom = float((p * p).sum())
                    if denom > 1e-8:
                        pred_alb[..., c] *= float((g * p).sum()) / denom
            metrics["albedo_psnr"] = M.psnr(pred_alb * fg, gt_alb * fg)
            metrics["albedo_ssim"] = M.ssim_image(pred_alb * fg, gt_alb * fg)
            images["gt_vs_pred_albedo"] = side_by_side(gt_alb, pred_alb)

        if "normal" in gt_layers:
            gt_n = gt_layers["normal"]
            gt_n = gt_n / np.maximum(np.linalg.norm(gt_n, axis=-1, keepdims=True), 1e-12)
            pr_n = normal / np.maximum(np.linalg.norm(normal, axis=-1, keepdims=True), 1e-12)
            sel = fg[..., 0] > 0.5
            if sel.any():
                cos = np.clip((gt_n[sel] * pr_n[sel]).sum(-1), -1, 1)
                metrics["normal_mae"] = float(np.degrees(np.arccos(cos)).mean())
            images["gt_vs_pred_normal"] = side_by_side(
                (gt_n + 1) / 2, (pr_n + 1) / 2
            )

        if "depth" in gt_layers:
            gt_d = gt_layers["depth"].reshape(H, W)
            valid = (gt_d > 0) & (fg[..., 0] > 0.5)
            if valid.any():
                s, t = normalized_depth_scale_and_shift(depth[..., 0], gt_d, valid)
                aligned = depth[..., 0] * s + t
                metrics["depth_mse"] = float(((aligned - gt_d) ** 2)[valid].mean())
                images["gt_vs_pred_depth"] = side_by_side(
                    apply_depth_colormap(gt_d[..., None]),
                    apply_depth_colormap(aligned[..., None]),
                )

    return metrics, images
