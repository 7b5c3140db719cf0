"""Standalone DDF training against a frozen NeuSky model.

Rebuild of ``neusky/pipelines/ddf_pipeline.py:79-302`` +
``data/datasets/ddf_dataset.py:47-296``: the scene model is loaded from a
checkpoint and frozen; per step a fresh vMF sphere-ray batch is rendered
against the frozen SDF as ground truth (the dataset is *model-generated*),
plus sky-ray supervision from the original datamanager; only the DDF
parameters are optimised.

TPU note: GT generation and the DDF update fuse into one jitted step; the
frozen scene params are closed over with ``stop_gradient``.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from neusky_tpu.core.rays import RayBundle
from neusky_tpu.core.spherical import look_at_target
from neusky_tpu.data.datamanager import DataManager
from neusky_tpu.engine.optimizers import OptimizerGroupConfig, build_optimizer
from neusky_tpu.models.ddf_model import ddf_loss_dict, ddf_train_outputs
from neusky_tpu.models.neusky import NeuSkyModel
from neusky_tpu.sampling.ddf_sampler import DDFSamplerConfig, vmf_ddf_samples


@dataclasses.dataclass(frozen=True)
class DDFTrainerConfig:
    max_num_iterations: int = 20001
    steps_per_log: int = 100
    sampler: DDFSamplerConfig = DDFSamplerConfig(
        num_samples_on_sphere=8, num_rays_per_sample=128,
        only_sample_upper_hemisphere=True, concentration=20.0,
    )
    num_sky_rays: int = 256
    accumulation_mask_threshold: float = 0.0
    lr: float = 1e-4
    seed: int = 0


class DDFTrainer:
    """Optimises ``params['ddf_field']`` against a frozen scene."""

    def __init__(
        self,
        config: DDFTrainerConfig,
        model: NeuSkyModel,
        frozen_params: Dict,
        datamanager: Optional[DataManager] = None,
    ):
        assert model.ddf is not None, "model config has no DDF"
        self.config = config
        self.model = model
        self.datamanager = datamanager
        self.frozen_scene = jax.tree_util.tree_map(
            jax.lax.stop_gradient, {
                k: v for k, v in frozen_params.items() if k != "ddf_field"
            }
        )
        self.ddf_params = frozen_params["ddf_field"]

        groups = {"ddf_field": OptimizerGroupConfig(
            lr=config.lr, schedule="cosine", max_steps=config.max_num_iterations,
        )}
        self.optimizer = build_optimizer({"ddf_field": self.ddf_params}, groups)
        self.opt_state = self.optimizer.init({"ddf_field": self.ddf_params})
        self.rng = jax.random.PRNGKey(config.seed)
        self.step = 0
        self.history = []
        self._step_fn = self._make_step()

    def _make_step(self) -> Callable:
        model = self.model
        cfg = self.config
        frozen = self.frozen_scene

        def loss_fn(ddf_params, rng, sky_ray_bundle):
            k_sample, k_gt, k_ddf = jax.random.split(rng, 3)
            bundle = vmf_ddf_samples(
                k_sample, cfg.sampler, ddf_sphere_radius=model.config.ddf_radius
            )
            full_params = {**frozen, "ddf_field": ddf_params["ddf_field"]}
            gt = model.generate_ddf_ground_truth(
                full_params, k_gt, bundle,
                mask_threshold=cfg.accumulation_mask_threshold,
                stop_gradients=True,
            )
            batch = dict(gt)
            if sky_ray_bundle is not None:
                if isinstance(sky_ray_bundle, tuple):
                    # device_rays sampler: (cameras, cam_idx, coords) →
                    # generate the bundle in-graph
                    cams, ci, co = sky_ray_bundle
                    sky_ray_bundle = cams.generate_rays_at(ci, co)
                batch["sky_ray_bundle"] = sky_ray_bundle

            def sdf_at_pos(p):
                return jax.lax.stop_gradient(
                    model.field.apply(frozen["fields"], p, method=model.field.sdf_only)
                )

            outputs = ddf_train_outputs(
                model.ddf, ddf_params["ddf_field"], k_ddf, bundle, batch,
                sdf_at_pos_fn=sdf_at_pos, stop_sdf_gradients=True,
            )
            losses = ddf_loss_dict(
                model.config.ddf, outputs, batch, model.config.ddf_radius
            )
            total = jnp.asarray(0.0)
            for v in losses.values():
                total = total + v
            # depth PSNR metric
            m = batch["mask"].reshape(-1, 1)
            pd = outputs["expected_termination_dist"].reshape(-1, 1) * m
            gd = batch["termination_dist"].reshape(-1, 1) * m
            mse = jnp.mean((pd - gd) ** 2)
            psnr = -10.0 * jnp.log10(
                jnp.maximum(mse / model.config.ddf_radius**2, 1e-10)
            )
            return total, {"losses": losses, "depth_psnr": psnr}

        def step_fn(ddf_params, opt_state, rng, sky_ray_bundle):
            (total, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                ddf_params, rng, sky_ray_bundle
            )
            updates, opt_state = self.optimizer.update(grads, opt_state, ddf_params)
            ddf_params = jax.tree_util.tree_map(lambda p, u: p + u, ddf_params, updates)
            aux["total_loss"] = total
            return ddf_params, opt_state, aux

        return jax.jit(step_fn)

    def run(self, num_steps: Optional[int] = None, log_fn=None):
        target = self.step + (num_steps or self.config.max_num_iterations)
        wrapped = {"ddf_field": self.ddf_params}
        while self.step < target:
            self.rng, k = jax.random.split(self.rng)
            sky = (
                self.datamanager.train_sampler.sample_sky_rays(self.config.num_sky_rays)
                if self.datamanager is not None
                else None
            )
            if isinstance(sky, tuple):
                sky = (self.datamanager.train_sampler.cameras, *sky)
            wrapped, self.opt_state, aux = self._step_fn(
                wrapped, self.opt_state, k, sky
            )
            self.step += 1
            if self.step % self.config.steps_per_log == 0 or self.step == target:
                rec = {
                    "step": self.step,
                    "total_loss": float(aux["total_loss"]),
                    "depth_psnr": float(aux["depth_psnr"]),
                    **{k2: float(v) for k2, v in aux["losses"].items()},
                }
                self.history.append(rec)
                if log_fn:
                    log_fn(rec)
        self.ddf_params = wrapped["ddf_field"]
        return self.history

    def render_eval_depth_images(
        self, num_views: int = 8, width: int = 64, height: int = 64
    ):
        """Look-at-origin DDF depth images from sphere viewpoints — the
        DDFDataset's cached eval set (``ddf_dataset.py:100-139``) and the
        eval grid of ``neusky_pipeline.py:334-380``."""
        from neusky_tpu.core.cameras import Cameras, CameraType
        from neusky_tpu.sampling.illumination import IcosahedronSampler

        dirs = IcosahedronSampler(num_directions=42, apply_random_rotation=False)()
        positions = np.asarray(dirs)[:num_views] * self.model.config.ddf_radius
        images = []
        params = {"ddf_field": self.ddf_params}
        for p in positions:
            c2w = look_at_target(
                jnp.asarray(p)[None], jnp.zeros((1, 3))
            )[..., :3, :]
            cam = Cameras(
                camera_to_worlds=c2w,
                fx=jnp.asarray([width / 1.2]), fy=jnp.asarray([width / 1.2]),
                cx=jnp.asarray([width / 2.0]), cy=jnp.asarray([height / 2.0]),
                width=width, height=height,
                camera_type=int(CameraType.PERSPECTIVE),
            )
            rb = cam.generate_rays(0)
            out = self.model.ddf.apply(
                params["ddf_field"], rb.origins, rb.directions
            )
            images.append(
                np.asarray(out["expected_termination_dist"]).reshape(height, width)
            )
        return np.stack(images)
