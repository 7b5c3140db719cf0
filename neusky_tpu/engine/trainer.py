"""Trainer: step loop, cadences, checkpointing, metrics, throughput.

Rebuild of the nerfstudio Trainer responsibilities the reference leans on
(SURVEY §2.2: step loop, eval/save cadences, checkpoint save/load with
surgical sub-tree restore, rays/sec instrumentation at
``neusky_pipeline.py:420-431``), TPU-style:

  - one jitted joint train step (scene + DDF fit) per iteration;
  - host-side batch assembly overlaps device compute via JAX async
    dispatch (the step result is only blocked on when metrics are read);
  - checkpoints via orbax (params / opt_state / step), with sub-tree
    restore helpers mirroring the reference's three surgical loads
    (RENI-decoder-only, model-minus-visibility, DDF-only — SURVEY §5);
  - rays/sec/chip counts the FULL joint step (scene rays + DDF-fit rays +
    sky rays), matching the reference's step semantics.
"""

from __future__ import annotations

import dataclasses
import json
import time
from pathlib import Path
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from neusky_tpu.data.datamanager import DataManager
from neusky_tpu.engine import optimizers as opt_mod
from neusky_tpu.engine.checkpoint import load_checkpoint, save_checkpoint
from neusky_tpu.models.neusky import NeuSkyModel
from neusky_tpu.models.pipeline import PipelineConfig
from neusky_tpu.parallel.mesh import make_train_step


@dataclasses.dataclass(frozen=True)
class TrainerConfig:
    max_num_iterations: int = 100001
    steps_per_save: int = 5000
    steps_per_eval_image: int = 5000
    steps_per_log: int = 100
    mixed_precision: bool = False
    output_dir: str = "outputs/run"
    seed: int = 42
    use_split_step: bool = False
    """Compile the joint step as 3 executables (scene grad / DDF grad /
    update) instead of one fused graph — numerically identical, lower peak
    HBM.  Since the pad-free [L,F,T] table layout the fused graph fits a
    16 GB chip and runs ~8% faster (0.78 vs 0.85 s/step on v5e), so fused
    is the default; flip this on if a larger config OOMs."""


class Trainer:
    def __init__(
        self,
        config: TrainerConfig,
        model: NeuSkyModel,
        pipeline_config: PipelineConfig,
        datamanager: DataManager,
        optimizer_groups: Optional[Dict[str, opt_mod.OptimizerGroupConfig]] = None,
        mesh=None,
    ):
        self.config = config
        self.model = model
        self.pipeline_config = pipeline_config
        self.datamanager = datamanager
        self.mesh = mesh

        rng = jax.random.PRNGKey(config.seed)
        self.rng, init_rng = jax.random.split(rng)
        self.params = model.init(init_rng)
        self._load_illumination_prior()
        groups = optimizer_groups or opt_mod.default_neusky_optimizer_groups(
            config.max_num_iterations
        )
        self.optimizer = opt_mod.build_optimizer(self.params, groups)
        self.opt_state = self.optimizer.init(self.params)
        if config.use_split_step:
            from neusky_tpu.parallel.mesh import make_train_step_split

            self.train_step = make_train_step_split(
                model, pipeline_config, self.optimizer, mesh=mesh,
                example_params=self.params, example_opt_state=self.opt_state,
            )
        else:
            self.train_step = make_train_step(
                model, pipeline_config, self.optimizer, mesh=mesh
            )
        self.step = 0
        self.history: list = []
        self.writer = None  # set via attach_writer
        self._eval_chunk_fn = None

    def attach_writer(self, writer):
        self.writer = writer
        return self

    def _load_illumination_prior(self):
        """See ``engine.checkpoint.load_illumination_prior``."""
        from neusky_tpu.engine.checkpoint import load_illumination_prior

        self.params = load_illumination_prior(self.params, self.model.config)

    # ------------------------------------------------------------------

    def _count_rays(self, batch) -> int:
        if "ray_bundle" in batch:
            n = int(batch["ray_bundle"].origins.shape[0])
        else:  # device_rays batches carry host pixel coords
            n = int(batch["pixel_coords"].shape[0])
        if self.model.config.fit_visibility_field and self.model.ddf is not None:
            s = self.pipeline_config.visibility_train_sampler
            n += s.num_samples_on_sphere * s.num_rays_per_sample
        if "sky_ray_bundle" in batch:
            n += int(batch["sky_ray_bundle"].origins.shape[0])
        elif "sky_cam_idx" in batch:
            n += int(batch["sky_cam_idx"].shape[0])
        return n

    def run(self, num_steps: Optional[int] = None, log_fn: Optional[Callable] = None):
        """Run the training loop for ``num_steps`` (default: to max)."""
        target = self.step + (num_steps or self.config.max_num_iterations)
        t_start = time.perf_counter()
        rays_done = 0
        while self.step < target:
            batch = self.datamanager.next_train(self.step)
            self.rng, step_rng = jax.random.split(self.rng)
            self.params, self.opt_state, aux = self.train_step(
                self.params, self.opt_state, batch, step_rng,
                np.float32(self.step),
            )
            rays_done += self._count_rays(batch)
            self.step += 1

            if self.step % self.config.steps_per_log == 0 or self.step == target:
                total = float(aux["total_loss"])  # blocks on device
                dt = time.perf_counter() - t_start
                record = {
                    "step": self.step,
                    "total_loss": total,
                    "rays_per_sec": rays_done / max(dt, 1e-9),
                    **{k: float(v) for k, v in aux["metrics"].items()},
                    **{k: float(v) for k, v in aux["loss_dict"].items()},
                }
                self.history.append(record)
                if log_fn:
                    log_fn(record)
                if self.writer is not None:
                    self.writer.write_scalars(self.step, record)

            if (
                self.step % self.config.steps_per_eval_image == 0
                and self.datamanager.num_eval > 0
            ):
                self._eval_image_pass()

            if self.step % self.config.steps_per_save == 0:
                self.save()
        return self.history

    def _eval_image_pass(self):
        """Render + score one eval image (``steps_per_eval_image`` cadence,
        with test-time latent fitting — ``neusky_pipeline.py:315-390``)."""
        from neusky_tpu.engine.eval_loop import (
            eval_image_metrics,
            fit_eval_latents,
            make_render_chunk_fn,
        )

        self.rng, k_fit, k_render = jax.random.split(self.rng, 3)
        image_idx = (self.step // self.config.steps_per_eval_image - 1) % max(
            self.datamanager.num_eval, 1
        )
        # fit cycles EVERY eval image (reference: neusky_datamanager.py:294);
        # image_idx only selects which image is *rendered* this eval tick
        params, _ = fit_eval_latents(
            self.model, self.params, self.datamanager, k_fit
        )
        if self._eval_chunk_fn is None:
            self._eval_chunk_fn = make_render_chunk_fn(self.model)
        chunk_fn, chunk = self._eval_chunk_fn
        m = eval_image_metrics(
            self.model, params, self.datamanager, image_idx, k_render,
            chunk_fn, chunk,
        )
        outputs = m.pop("outputs")
        record = {f"eval_{k}": v for k, v in m.items() if v is not None}
        self.history.append({"step": self.step, **record})
        if self.writer is not None:
            self.writer.write_scalars(self.step, record)
            cams = self.datamanager.eval_cameras or self.datamanager.train_cameras
            from neusky_tpu.engine.eval_panels import image_metrics_and_panels

            _, batch = self.datamanager.eval_image_bundle(image_idx)
            _, panels = image_metrics_and_panels(
                self.model, params, outputs, batch, cams.height, cams.width,
                latent_slot=image_idx,
            )
            for name, img in panels.items():
                self.writer.write_image(self.step, name, img)

    # ------------------------------------------------------------------

    def save(self, path: Optional[str] = None):
        out = Path(path or self.config.output_dir)
        save_checkpoint(out, self.step, self.params, self.opt_state)

    def load(self, path: str, step: Optional[int] = None):
        self.params, self.opt_state, self.step = load_checkpoint(
            Path(path), step, self.params, self.opt_state
        )
        if hasattr(self.datamanager, "reseed"):
            self.datamanager.reseed(self.step)  # no batch-stream replay
