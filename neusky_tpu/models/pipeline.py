"""Joint training pipeline: scene loss + DDF-fit loss in one jitted graph.

Rebuild of ``neusky/pipelines/neusky_pipeline.py:240-291``
(``get_train_loss_dict``): per step,
  1. the scene batch drives the NeuSky forward + 13 losses;
  2. a fresh vMF sphere-ray batch is rendered against the SDF
     (``generate_ddf_samples``, ``neusky_pipeline.py:493-515``) and the DDF
     is fit to it (depth/sdf/multi-view/sky-ray losses);
  3. everything sums into one scalar — a single backward pass covers the
     full SDF↔DDF↔RENI coupling (the reference needs two module calls and
     DDP ``find_unused_parameters``; under jit it is one graph).

Pure functions of (params, rng, batch, step) — ready for ``jax.jit`` /
``shard_map`` over a device mesh (see ``parallel/``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from neusky_tpu.core.rays import RayBundle
from neusky_tpu.models.ddf_model import ddf_loss_dict, ddf_train_outputs
from neusky_tpu.models.neusky import NeuSkyModel
from neusky_tpu.sampling.ddf_sampler import DDFSamplerConfig, vmf_ddf_samples


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """``NeuSkyPipelineConfig`` equivalents (``neusky_pipeline.py:61-96``)."""

    stop_sdf_gradients: bool = False
    least_squares_global_scale: bool = False
    """Optimal global scale fitted per compare image before metrics
    (``neusky_pipeline.py:93,330-331``) — distinct from the model's
    ``optimise_compare_eval_scale`` (gradient fit of ``eval_scale``)."""
    visibility_accumulation_mask_threshold: float = 0.0
    visibility_train_sampler: DDFSamplerConfig = DDFSamplerConfig(
        num_samples_on_sphere=8, num_rays_per_sample=128,
        only_sample_upper_hemisphere=True, concentration=20.0,
    )
    num_sky_rays: int = 256


def batch_ray_bundle(batch: Dict[str, Any]) -> RayBundle:
    """The batch's scene rays — materialised, or generated in-graph from
    host (cam_idx, pixel_coords) + the cameras pytree (``device_rays``
    batches; avoids per-step eager device dispatch on slow runtimes)."""
    if "ray_bundle" in batch:
        return batch["ray_bundle"]
    return batch["cameras"].generate_rays_at(
        batch["cam_idx"], batch["pixel_coords"]
    )


def batch_sky_bundle(batch: Dict[str, Any]) -> Optional[RayBundle]:
    if "sky_ray_bundle" in batch:
        return batch["sky_ray_bundle"]
    if "sky_cam_idx" in batch:
        return batch["cameras"].generate_rays_at(
            batch["sky_cam_idx"], batch["sky_pixel_coords"]
        )
    return None


def scene_loss_fn(
    model: NeuSkyModel,
    params,
    rng: jax.Array,
    batch: Dict[str, Any],
    step: jnp.ndarray,
) -> Tuple[jnp.ndarray, Dict[str, Any]]:
    """Scene half of the joint step: NeuSky forward + scene losses."""
    outputs = model.forward(
        params,
        rng,
        batch_ray_bundle(batch),
        batch["image_indices"],
        batch["ray_image_idx"],
        step=step,
        train=True,
    )
    return _scene_losses(model, params, outputs, batch)


def _scene_losses(model, params, outputs, batch):
    loss_dict = model.loss_dict(params, outputs, batch, train=True)
    metrics = model.metrics_dict(params, outputs, batch)
    total = jnp.asarray(0.0)
    for v in loss_dict.values():
        total = total + v
    return total, {"loss_dict": loss_dict, "metrics": metrics}


def ddf_fit_loss_fn(
    model: NeuSkyModel,
    pipeline_config: PipelineConfig,
    params,
    rng: jax.Array,
    batch: Dict[str, Any],
    step: jnp.ndarray,
    vis_bundle=None,
    gt=None,
) -> Tuple[jnp.ndarray, Dict[str, Any]]:
    """DDF-fit half: vMF sphere rays rendered against the SDF as GT
    (``generate_ddf_samples``, ``neusky_pipeline.py:493-515``) + DDF losses.

    ``vis_bundle``/``gt`` precomputed by the fused scene+GT pass
    (``forward_with_ddf_gt``) skip the separate GT render here."""
    k_vis_sample, k_vis_gt, k_ddf = jax.random.split(rng, 3)
    if vis_bundle is None:
        vis_bundle = vmf_ddf_samples(
            k_vis_sample,
            pipeline_config.visibility_train_sampler,
            ddf_sphere_radius=model.config.ddf_radius,
        )
    if gt is None:
        gt = model.generate_ddf_ground_truth(
            params, k_vis_gt, vis_bundle,
            mask_threshold=pipeline_config.visibility_accumulation_mask_threshold,
            stop_gradients=pipeline_config.stop_sdf_gradients,
        )
    ddf_batch = dict(gt)
    sky_bundle = batch_sky_bundle(batch)
    if sky_bundle is not None:
        ddf_batch["sky_ray_bundle"] = sky_bundle

    field_params = params["fields"]

    def sdf_at_pos(p):
        return model.field.apply(field_params, p, method=model.field.sdf_only)

    ddf_outputs = ddf_train_outputs(
        model.ddf,
        params["ddf_field"],
        k_ddf,
        vis_bundle,
        ddf_batch,
        sdf_at_pos_fn=sdf_at_pos,
        stop_sdf_gradients=pipeline_config.stop_sdf_gradients,
    )
    vis_losses = ddf_loss_dict(
        model.config.ddf, ddf_outputs, ddf_batch, model.config.ddf_radius
    )
    # DDF depth PSNR metric (``ddf_model.py:381-405``)
    m = ddf_batch["mask"].reshape(-1, 1)
    pred_d = ddf_outputs["expected_termination_dist"].reshape(-1, 1) * m
    gt_d = ddf_batch["termination_dist"].reshape(-1, 1) * m
    mse = jnp.mean((pred_d - gt_d) ** 2)
    metrics = {
        "ddf_depth_psnr": -10.0 * jnp.log10(
            jnp.maximum(mse / (model.config.ddf_radius**2), 1e-10)
        )
    }
    total = jnp.asarray(0.0)
    for v in vis_losses.values():
        total = total + v
    return total, {"loss_dict": vis_losses, "metrics": metrics}


def train_loss_fn(
    model: NeuSkyModel,
    pipeline_config: PipelineConfig,
    params,
    rng: jax.Array,
    batch: Dict[str, Any],
    step: jnp.ndarray,
) -> Tuple[jnp.ndarray, Dict[str, Any]]:
    """One training step's scalar loss + aux (loss dict, metrics) — the
    scene half plus (when fitting the visibility field) the DDF half, as in
    ``get_train_loss_dict`` (``neusky_pipeline.py:240-291``).

    ``batch``:
      - ``ray_bundle``: RayBundle [N]
      - ``image`` [N,3], ``mask`` [N,4]
      - ``image_indices`` [U], ``ray_image_idx`` [N]
      - ``sky_ray_bundle``: RayBundle [K] (optional; for the DDF sky loss)
    """
    k_scene, k_ddf = jax.random.split(rng)
    fit_ddf = model.config.fit_visibility_field and model.ddf is not None
    fused = (
        model.config.fused_ddf_gt_pass
        and fit_ddf
        and not pipeline_config.stop_sdf_gradients
    )
    if fused:
        # one concatenated proposal+field pass produces the scene outputs
        # AND the DDF ground truth (forward_with_ddf_gt docstring for the
        # parity argument); the vMF bundle is drawn with the same key the
        # unfused path would use
        k_vis_sample, _, _ = jax.random.split(k_ddf, 3)
        vis_bundle = vmf_ddf_samples(
            k_vis_sample,
            pipeline_config.visibility_train_sampler,
            ddf_sphere_radius=model.config.ddf_radius,
        )
        outputs, gt = model.forward_with_ddf_gt(
            params, k_scene,
            batch_ray_bundle(batch),
            batch["image_indices"], batch["ray_image_idx"],
            vis_bundle, step=step, train=True,
            gt_mask_threshold=(
                pipeline_config.visibility_accumulation_mask_threshold
            ),
        )
        total, aux = _scene_losses(model, params, outputs, batch)
        ddf_total, ddf_aux = ddf_fit_loss_fn(
            model, pipeline_config, params, k_ddf, batch, step,
            vis_bundle=vis_bundle, gt=gt,
        )
    else:
        total, aux = scene_loss_fn(model, params, k_scene, batch, step)
        ddf_total = ddf_aux = None
        if fit_ddf:
            ddf_total, ddf_aux = ddf_fit_loss_fn(
                model, pipeline_config, params, k_ddf, batch, step
            )
    if ddf_aux is not None:
        total = total + ddf_total
        aux = {
            "loss_dict": {**aux["loss_dict"], **ddf_aux["loss_dict"]},
            "metrics": {**aux["metrics"], **ddf_aux["metrics"]},
        }
    return total, aux


def eval_latent_loss_fn(
    model: NeuSkyModel,
    params,
    rng: jax.Array,
    batch: Dict[str, Any],
    step: jnp.ndarray,
    rotation=None,
) -> jnp.ndarray:
    """Loss for test-time latent fitting (the eval branch of
    ``get_loss_dict``, ``neusky_model.py:1036-1059``): RGB + sky-pixel only,
    decoder frozen, gradients reach ``eval_latents`` only (the optimizer
    masks everything else)."""
    outputs = model.forward(
        params,
        rng,
        batch_ray_bundle(batch),
        batch["image_indices"],
        batch["ray_image_idx"],
        step=step,
        train=False,
        fitting_eval_latents=True,
        rotation=rotation,
    )
    loss_dict = model.loss_dict(
        params, outputs, batch, train=False, fitting_eval_latents=True
    )
    total = jnp.asarray(0.0)
    for v in loss_dict.values():
        total = total + v
    return total
