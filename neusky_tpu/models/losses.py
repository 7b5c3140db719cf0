"""Loss functions for NeuSky / DDF training — pure, fixed-shape.

Reimplements the loss semantics of the reference
(``neusky_model.py:933-1062`` and the nerfstudio losses it imports):
masked RGB, eikonal, foreground-mask BCE, monosdf normal (L1+cos),
interlevel proposal distillation (mip-NeRF-360 ``lossfun_outer``),
sky-pixel RENI loss (``model_components/losses.py:44-58``), ground-plane,
hashgrid density, visibility-sigmoid, and the DDF loss family
(``ddf_model.py:407-493``).

Loss *selection* is static config — excluded losses compile out entirely
(the reference needs ``find_unused_parameters=True`` in DDP for this;
under jit dead branches simply vanish).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

EPS = 1.0e-7


# ---------- generic ----------

def l1_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(pred - target))


def mse_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - target) ** 2)


def _safe_norm(x: jnp.ndarray, axis=-1, eps: float = 1e-12) -> jnp.ndarray:
    """Norm with finite gradient at 0 (``jnp.linalg.norm`` grad is NaN
    there, which matters for masked all-zero rows)."""
    return jnp.sqrt(jnp.sum(x * x, axis=axis) + eps)


def cosine_colour_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """mean(1 - cosine_similarity) over the colour dim
    (``neusky_model.py:953-955``)."""
    num = jnp.sum(pred * target, axis=-1)
    den = _safe_norm(pred) * _safe_norm(target)
    return jnp.mean(1.0 - num / den)


def binary_cross_entropy(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    pred = jnp.clip(pred, 1e-7, 1.0 - 1e-7)
    return -jnp.mean(target * jnp.log(pred) + (1.0 - target) * jnp.log(1.0 - pred))


# ---------- NeuSky scene losses ----------

def eikonal_loss(gradients: jnp.ndarray) -> jnp.ndarray:
    """((‖∇sdf‖ − 1)²).mean() (``neusky_model.py:958-960``)."""
    return jnp.mean((_safe_norm(gradients) - 1.0) ** 2)


def fg_mask_loss(weights_sum: jnp.ndarray, fg_mask: jnp.ndarray) -> jnp.ndarray:
    """BCE between clipped accumulated weights and the fg label
    (``neusky_model.py:962-967``)."""
    ws = jnp.clip(weights_sum, 1e-3, 1.0 - 1e-3)
    ws = jnp.nan_to_num(ws, nan=0.5)
    return binary_cross_entropy(ws, fg_mask)


def monosdf_normal_loss(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """L1 + (1 − cos) on normals (nerfstudio ``monosdf_normal_loss``,
    used at ``neusky_model.py:974,1000``)."""
    pred_n = pred / _safe_norm(pred)[..., None]
    gt_n = gt / _safe_norm(gt)[..., None]
    l1 = jnp.mean(jnp.sum(jnp.abs(pred_n - gt_n), axis=-1))
    cos = jnp.mean(1.0 - jnp.sum(pred_n * gt_n, axis=-1))
    return l1 + cos


def sky_pixel_loss(
    pred_sky_srgb: jnp.ndarray,
    gt_image: jnp.ndarray,
    sky_mask: jnp.ndarray,
    cosine_weight: float = 0.1,
) -> jnp.ndarray:
    """Masked MSE + α(1 − cos) between decoded sky colour and GT sky pixels
    (``model_components/losses.py:44-58``).  sky_mask: [N, 1]."""
    inputs = pred_sky_srgb * sky_mask
    targets = gt_image * sky_mask
    mse = jnp.mean((inputs - targets) ** 2)
    num = jnp.sum(inputs * targets, axis=-1)
    den = _safe_norm(inputs) * _safe_norm(targets)
    cos_loss = 1.0 - jnp.mean(num / den)
    return mse + cosine_weight * cos_loss


def _outer_measure(
    t0_starts: jnp.ndarray,
    t0_ends: jnp.ndarray,
    t1_starts: jnp.ndarray,
    t1_ends: jnp.ndarray,
    y1: jnp.ndarray,
) -> jnp.ndarray:
    """Sum of y1 over env bins overlapping each query interval (outer measure
    of the mip-NeRF-360 proposal loss).  All args [..., S]."""
    cy1 = jnp.concatenate(
        [jnp.zeros_like(y1[..., :1]), jnp.cumsum(y1, axis=-1)], axis=-1
    )
    # vectorised searchsorted via comparison-count (see sampling/proposal.py)
    idx_lo = (
        jnp.sum(
            (t1_starts[..., None, :] <= t0_starts[..., :, None]).astype(jnp.int32),
            axis=-1,
        )
        - 1
    )
    idx_lo = jnp.clip(idx_lo, 0, y1.shape[-1] - 1)
    idx_hi = jnp.sum(
        (t1_ends[..., None, :] < t0_ends[..., :, None]).astype(jnp.int32), axis=-1
    )
    idx_hi = jnp.clip(idx_hi, 0, y1.shape[-1] - 1)
    cy1_lo = jnp.take_along_axis(cy1, idx_lo, axis=-1)
    cy1_hi = jnp.take_along_axis(cy1, idx_hi + 1, axis=-1)
    return cy1_hi - cy1_lo


def interlevel_loss(weights_list, samples_list) -> jnp.ndarray:
    """Proposal distillation (nerfstudio ``interlevel_loss``, used at
    ``neusky_model.py:987-988``): each proposal histogram must upper-bound
    the (stop-gradient) final histogram on the s-domain."""
    final = samples_list[-1]
    w_final = jax.lax.stop_gradient(weights_list[-1][..., 0])
    c_starts = jax.lax.stop_gradient(final.spacing_starts[..., 0])
    c_ends = jax.lax.stop_gradient(final.spacing_ends[..., 0])
    total = 0.0
    for rs, w in zip(samples_list[:-1], weights_list[:-1]):
        w_outer = _outer_measure(
            c_starts, c_ends, rs.spacing_starts[..., 0], rs.spacing_ends[..., 0], w[..., 0]
        )
        total = total + jnp.mean(
            jnp.clip(w_final - w_outer, 0.0, None) ** 2 / (w_final + EPS)
        )
    return total


def hashgrid_density_loss(grid_alphas: jnp.ndarray) -> jnp.ndarray:
    """L1 pull of random-grid alphas toward zero (empty-space prior,
    ``neusky_model.py:990-993``)."""
    return jnp.mean(jnp.abs(grid_alphas))


def ground_plane_loss(normal_pred: jnp.ndarray, ground_mask: jnp.ndarray) -> jnp.ndarray:
    """monosdf normal loss against +z on ground pixels
    (``neusky_model.py:995-1000``)."""
    up = jnp.array([0.0, 0.0, 1.0])
    gm = ground_mask.reshape(-1, 1)
    return monosdf_normal_loss(normal_pred * gm, jnp.broadcast_to(up, normal_pred.shape) * gm)


def visibility_sigmoid_loss(
    visibility_threshold: jnp.ndarray,
    sigmoid_scale: jnp.ndarray,
    target_min_bias: float,
    target_max_scale: float,
    optimise_bias: bool,
    optimise_scale: bool,
) -> jnp.ndarray:
    """Pull the learnable sigmoid bias/scale toward targets
    (``neusky_model.py:1011-1030``)."""
    loss = 0.0
    if optimise_bias:
        loss = loss + (visibility_threshold - target_min_bias) ** 2
    if optimise_scale:
        loss = loss + (sigmoid_scale / target_max_scale - 1.0) ** 2
    return jnp.squeeze(jnp.asarray(loss))


# ---------- DDF losses (``ddf_model.py:407-493``) ----------

def ddf_depth_loss(
    expected_dist: jnp.ndarray,
    gt_dist: jnp.ndarray,
    mask: jnp.ndarray,
    ddf_radius: float,
    mask_to_circumference: bool = False,
    distance_weight: Optional[jnp.ndarray] = None,
    inverse_depth_weight: bool = False,
    use_l2: bool = False,
) -> jnp.ndarray:
    """Depth supervision with the reference's masking/weighting options."""
    if mask_to_circumference:
        gt = jnp.where(mask == 0, ddf_radius * 2.0, gt_dist)
        pred = expected_dist
    else:
        gt = gt_dist * mask
        pred = expected_dist * mask
    err = (pred - gt) ** 2 if use_l2 else jnp.abs(pred - gt)
    if inverse_depth_weight:
        err = err / (gt + 1e-6)
    if distance_weight is not None:
        err = err * distance_weight
    return jnp.mean(err)


def ddf_sdf_level_loss(sdf_at_termination: jnp.ndarray, mask: jnp.ndarray, use_l2: bool) -> jnp.ndarray:
    """SDF at the predicted termination point should be zero."""
    v = sdf_at_termination * mask
    return jnp.mean(v**2) if use_l2 else jnp.mean(jnp.abs(v))


def ddf_multi_view_loss(expected: jnp.ndarray, max_allowed: jnp.ndarray) -> jnp.ndarray:
    """Penalise predictions exceeding the known distance to a GT surface
    point from another viewpoint (``ddf_model.py:475-483``)."""
    return jnp.mean(jax.nn.relu(expected - max_allowed) ** 2)


def ddf_sky_ray_loss(expected: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """L1 on sky-ray distances (``ddf_model.py:485-490``)."""
    return jnp.mean(jnp.abs(expected - gt))


def ddf_prob_hit_loss(prob: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    return binary_cross_entropy(prob, mask)


def scale_loss_dict(loss_dict: dict, coefficients: dict) -> dict:
    """nerfstudio ``misc.scale_dict`` semantics (``neusky_model.py:1061``)."""
    return {k: v * coefficients.get(k, 1.0) for k, v in loss_dict.items()}
