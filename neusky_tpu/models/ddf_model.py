"""DDF model: spherical directional-distance field with its loss family.

TPU-native rebuild of ``neusky/models/ddf_model.py:53-674``.  The flax
module owns the DDF field; SDF coupling (``get_sdf_at_pos`` of the NeuSky
field, ``ddf_model.py:241-251``) is injected as a function so the two models
stay independently jit-able.

Key behaviours preserved:
  - directions are rotated into a per-point local frame on the sphere so
    the net sees position-independent directions
    (``get_localised_transforms``, ``ddf_model.py:158-181``);
  - multi-view consistency loss: from a random second sphere point, the
    predicted distance toward a known surface point must not exceed the
    true distance (``ddf_model.py:279-322``);
  - sky-ray loss: rays known to hit the sky give exact distances from the
    sphere back to the camera origin (``ddf_model.py:324-363``).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from neusky_tpu.core.rays import RayBundle
from neusky_tpu.core.spherical import random_points_on_unit_sphere, ray_sphere_intersection
from neusky_tpu.fields.ddf import DDFFieldConfig, DirectionalDistanceField
from neusky_tpu.models import losses as L


@dataclasses.dataclass(frozen=True)
class DDFLossConfig:
    depth_l1: bool = True
    depth_l2: bool = False
    sdf_l1: bool = False
    sdf_l2: bool = True
    prob_hit: bool = False
    normal: bool = False
    multi_view: bool = True
    sky_ray: bool = True


@dataclasses.dataclass(frozen=True)
class DDFModelConfig:
    field: DDFFieldConfig = DDFFieldConfig()
    losses: DDFLossConfig = DDFLossConfig()
    loss_coefficients: tuple = (
        ("depth_l1_loss", 1.0),
        ("depth_l2_loss", 0.0),
        ("sdf_l1_loss", 1.0),
        ("sdf_l2_loss", 0.01),
        ("prob_hit_loss", 0.01),
        ("normal_loss", 1.0),
        ("multi_view_loss", 0.01),
        ("sky_ray_loss", 1.0),
    )
    include_depth_loss_scene_center_weight: bool = True
    scene_center_weight_exp: float = 3.0
    scene_center_weight_include_z: bool = False
    mask_to_circumference: bool = False
    inverse_depth_weight: bool = False
    log_depth: bool = False
    compute_normals: bool = False


def get_localised_transforms(positions: jnp.ndarray) -> jnp.ndarray:
    """Local frame at each sphere point such that [0,1,0] faces the origin
    (``ddf_model.py:158-181``).  positions: [M, 3] → [M, 3, 3] whose columns
    are (x_local, y_local, z_local)."""
    up = jnp.array([0.0, 0.0, 1.0])
    p = -positions  # inward
    x_local = jnp.cross(jnp.broadcast_to(up, p.shape), p)
    x_norm = jnp.linalg.norm(x_local, axis=-1, keepdims=True)
    # degenerate at the poles: fall back to the x axis
    x_local = jnp.where(
        x_norm > 1e-6, x_local / jnp.maximum(x_norm, 1e-12), jnp.array([1.0, 0.0, 0.0])
    )
    z_local = jnp.cross(p, x_local)
    z_local = z_local / jnp.maximum(jnp.linalg.norm(z_local, axis=-1, keepdims=True), 1e-12)
    y_local = p
    return jnp.stack([x_local, y_local, z_local], axis=-1)


def localise_directions(positions: jnp.ndarray, directions: jnp.ndarray) -> jnp.ndarray:
    """Components of world directions in the local frame of each position."""
    R = get_localised_transforms(positions)
    return jnp.einsum("mjl,mj->ml", R, directions)


class DDFModel(nn.Module):
    """Flax wrapper: ``__call__(origins, world_directions)`` localises and
    queries the field."""

    config: DDFModelConfig
    ddf_radius: float = 1.0

    def setup(self):
        self.field = DirectionalDistanceField(self.config.field, ddf_radius=self.ddf_radius)

    def __call__(self, origins: jnp.ndarray, directions_world: jnp.ndarray) -> dict:
        local_dirs = localise_directions(origins / self.ddf_radius, directions_world)
        return self.field(origins, local_dirs)


def scene_center_distance_weight(
    config: DDFModelConfig, origins: jnp.ndarray, ddf_radius: float
) -> jnp.ndarray:
    """Scene-centre weighting for the depth loss (``ddf_model.py:224-238``):
    rays passing near the centre matter more."""
    if config.scene_center_weight_include_z:
        d = jnp.linalg.norm(origins, axis=-1)
    else:
        d = jnp.linalg.norm(origins[..., :2], axis=-1)
    d = d / ddf_radius
    return 1.0 - d**config.scene_center_weight_exp


def ddf_predicted_normals(
    model: DDFModel, params, origins: jnp.ndarray, directions_world: jnp.ndarray
) -> jnp.ndarray:
    """Surface normals from ∂(termination distance)/∂origin
    (``ddf_model.py:256-277``): normalise the gradient and orient it
    against the ray direction.  The reference flags its own version as
    broken (``configs/neusky_config.py:199``); this one differentiates the
    *localised* query properly via ``jax.grad``."""

    def dist_sum(o):
        out = model.apply(params, o, directions_world)
        return jnp.sum(out["expected_termination_dist"])

    grads = jax.grad(dist_sum)(origins)
    n_hat = grads / jnp.sqrt(jnp.sum(grads**2, axis=-1, keepdims=True) + 1e-12)
    sign = jnp.sign(
        -jnp.sum(n_hat * directions_world, axis=-1, keepdims=True)
    )
    return sign * n_hat


def ddf_train_outputs(
    model: DDFModel,
    params,
    rng: jax.Array,
    ray_bundle: RayBundle,
    batch: dict,
    sdf_at_pos_fn: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
    stop_sdf_gradients: bool = True,
) -> dict:
    """Training forward: field query + the auxiliary query sets for the
    multi-view and sky-ray losses (``ddf_model.py:183-369``)."""
    cfg = model.config
    origins = ray_bundle.origins
    dirs = ray_bundle.directions
    out = model.apply(params, origins, dirs)
    expected = out["expected_termination_dist"]  # [M]
    outputs = {"expected_termination_dist": expected}
    if "probability_of_hit" in out:
        outputs["expected_probability_of_hit"] = out["probability_of_hit"]

    if cfg.include_depth_loss_scene_center_weight:
        outputs["distance_weight"] = scene_center_distance_weight(
            cfg, origins, model.ddf_radius
        )

    if (cfg.losses.sdf_l1 or cfg.losses.sdf_l2) and sdf_at_pos_fn is not None:
        term_points = origins + dirs * expected[..., None]
        if stop_sdf_gradients:
            sdf_at_term = jax.lax.stop_gradient(sdf_at_pos_fn(jax.lax.stop_gradient(term_points)))
            # NOTE: gradient still flows to the DDF through ``expected`` via
            # the chain below only when not stopped; reference detaches both
            # (``ddf_model.py:244-248``)
        else:
            sdf_at_term = sdf_at_pos_fn(term_points)
        outputs["sdf_at_termination"] = sdf_at_term.reshape(-1, 1)

    if cfg.losses.multi_view and "termination_dist" in batch:
        gt_points = origins + dirs * batch["termination_dist"].reshape(-1, 1)
        k1, _ = jax.random.split(rng)
        sphere_pts = random_points_on_unit_sphere(k1, gt_points.shape[0])
        sphere_pts = sphere_pts.at[:, 2].set(jnp.abs(sphere_pts[:, 2]))
        sphere_pts = sphere_pts * model.ddf_radius
        to_gt = gt_points - sphere_pts
        dist_to_gt = jnp.linalg.norm(to_gt, axis=-1)
        dir_to_gt = to_gt / jnp.maximum(dist_to_gt[..., None], 1e-12)
        mv = model.apply(params, sphere_pts, dir_to_gt)
        outputs["multi_view_expected_termination_dist"] = mv["expected_termination_dist"]
        outputs["multi_view_termination_dist"] = dist_to_gt

    if cfg.losses.sky_ray and "sky_ray_bundle" in batch:
        srb: RayBundle = batch["sky_ray_bundle"]
        cam_o = srb.origins
        cam_d = srb.directions
        pts = ray_sphere_intersection(cam_o, cam_d, model.ddf_radius)
        dist_back = jnp.linalg.norm(cam_o - pts, axis=-1)
        sky = model.apply(params, pts, -cam_d)
        outputs["sky_ray_expected_termination_dist"] = sky["expected_termination_dist"]
        outputs["sky_ray_termination_dist"] = dist_back

    return outputs


def ddf_loss_dict(config: DDFModelConfig, outputs: dict, batch: dict, ddf_radius: float) -> dict:
    """Assemble the DDF loss dict (``ddf_model.py:407-493``)."""
    lc = config.losses
    loss_dict = {}
    expected = outputs["expected_termination_dist"].reshape(-1, 1)
    mask = batch["mask"].reshape(-1, 1)
    gt = batch["termination_dist"].reshape(-1, 1)
    dw = outputs.get("distance_weight")
    if dw is not None:
        dw = dw.reshape(-1, 1)

    if lc.depth_l1:
        loss_dict["depth_l1_loss"] = L.ddf_depth_loss(
            expected, gt, mask, ddf_radius,
            mask_to_circumference=config.mask_to_circumference,
            distance_weight=dw if config.include_depth_loss_scene_center_weight else None,
            inverse_depth_weight=config.inverse_depth_weight,
            use_l2=False,
        )
    if lc.depth_l2:
        loss_dict["depth_l2_loss"] = L.ddf_depth_loss(
            expected, gt, mask, ddf_radius,
            mask_to_circumference=config.mask_to_circumference,
            distance_weight=dw if config.include_depth_loss_scene_center_weight else None,
            inverse_depth_weight=config.inverse_depth_weight,
            use_l2=True,
        )
    if lc.sdf_l1 and "sdf_at_termination" in outputs:
        loss_dict["sdf_l1_loss"] = L.ddf_sdf_level_loss(outputs["sdf_at_termination"], mask, use_l2=False)
    if lc.sdf_l2 and "sdf_at_termination" in outputs:
        loss_dict["sdf_l2_loss"] = L.ddf_sdf_level_loss(outputs["sdf_at_termination"], mask, use_l2=True)
    if lc.prob_hit and "expected_probability_of_hit" in outputs:
        loss_dict["prob_hit_loss"] = L.ddf_prob_hit_loss(
            outputs["expected_probability_of_hit"].reshape(-1, 1), mask
        )
    if lc.multi_view and "multi_view_expected_termination_dist" in outputs:
        loss_dict["multi_view_loss"] = L.ddf_multi_view_loss(
            outputs["multi_view_expected_termination_dist"],
            outputs["multi_view_termination_dist"],
        )
    if lc.sky_ray and "sky_ray_expected_termination_dist" in outputs:
        loss_dict["sky_ray_loss"] = L.ddf_sky_ray_loss(
            outputs["sky_ray_expected_termination_dist"],
            outputs["sky_ray_termination_dist"],
        )
    return L.scale_loss_dict(loss_dict, dict(config.loss_coefficients))
