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
        groups = optimizer_groups or opt_mod.default_neusky_optimizer_groups(
            config.max_num_iterations
        )
        self.optimizer = opt_mod.build_optimizer(self.params, groups)
        self.opt_state = self.optimizer.init(self.params)
        self.train_step = make_train_step(
            model, pipeline_config, self.optimizer, mesh=mesh
        )
        self.step = 0
        self.history: list = []
        self._rays_per_step = None

    # ------------------------------------------------------------------

    def _count_rays(self, batch) -> int:
        n = int(batch["ray_bundle"].origins.shape[0])
        if self.model.config.fit_visibility_field and self.model.ddf is not None:
            s = self.pipeline_config.visibility_train_sampler
            n += s.num_samples_on_sphere * s.num_rays_per_sample
        if "sky_ray_bundle" in batch:
            n += int(batch["sky_ray_bundle"].origins.shape[0])
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
                jnp.asarray(self.step, jnp.float32),
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

            if self.step % self.config.steps_per_save == 0:
                self.save()
        return self.history

    # ------------------------------------------------------------------

    def save(self, path: Optional[str] = None):
        out = Path(path or self.config.output_dir)
        save_checkpoint(out, self.step, self.params, self.opt_state)

    def load(self, path: str, step: Optional[int] = None):
        self.params, self.opt_state, self.step = load_checkpoint(
            Path(path), step, self.params, self.opt_state
        )
