"""Optimizer groups + LR schedules (optax).

Rebuilds nerfstudio's ``Optimizers``/scheduler machinery as consumed by the
reference (``configs/neusky_config.py:216-237``): five Adam groups with
per-group cosine/exponential schedules, plus frozen groups (eval latents,
RENI decoder) expressed as ``optax.set_to_zero`` under a single
``optax.multi_transform`` — one update call, TPU-friendly.

Schedule semantics:
  - ``CosineDecayScheduler``: linear warmup over ``warm_up_end`` steps, then
    lr·(α + (1−α)·½(1+cos(πt)));
  - ``ExponentialDecayScheduler``: optional sine warmup then geometric
    interpolation lr_init→lr_final over ``max_steps``.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import optax


def cosine_decay_schedule(
    lr_init: float,
    max_steps: int,
    warm_up_end: int = 500,
    learning_rate_alpha: float = 0.05,
):
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = jnp.clip(step / jnp.maximum(warm_up_end, 1), 0.0, 1.0)
        t = jnp.clip(
            (step - warm_up_end) / jnp.maximum(max_steps - warm_up_end, 1), 0.0, 1.0
        )
        decay = learning_rate_alpha + (1.0 - learning_rate_alpha) * 0.5 * (
            1.0 + jnp.cos(jnp.pi * t)
        )
        return lr_init * jnp.where(step < warm_up_end, warm, decay)

    return schedule


def exponential_decay_schedule(
    lr_init: float,
    lr_final: float,
    max_steps: int,
    warmup_steps: int = 0,
    lr_pre_warmup: float = 1e-8,
):
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        if warmup_steps > 0:
            ramp = jnp.sin(
                0.5 * jnp.pi * jnp.clip(step / warmup_steps, 0.0, 1.0)
            )
            warm_lr = lr_pre_warmup + (lr_init - lr_pre_warmup) * ramp
        else:
            warm_lr = jnp.asarray(lr_init)
        t = jnp.clip(
            (step - warmup_steps) / jnp.maximum(max_steps - warmup_steps, 1), 0.0, 1.0
        )
        decay_lr = jnp.exp(
            jnp.log(lr_init) * (1.0 - t) + jnp.log(lr_final) * t
        )
        return jnp.where(step < warmup_steps, warm_lr, decay_lr)

    return schedule


@dataclasses.dataclass(frozen=True)
class OptimizerGroupConfig:
    lr: float = 1e-3
    eps: float = 1e-15
    schedule: str = "cosine"  # cosine | exponential | constant
    lr_final: float = 1e-5
    warm_up_end: int = 500
    warmup_steps: int = 0
    learning_rate_alpha: float = 0.05
    max_steps: int = 100001
    weight_decay: float = 0.0


def _group_schedule(g: OptimizerGroupConfig):
    if g.schedule == "cosine":
        return cosine_decay_schedule(g.lr, g.max_steps, g.warm_up_end, g.learning_rate_alpha)
    if g.schedule == "exponential":
        return exponential_decay_schedule(g.lr, g.lr_final, g.max_steps, g.warmup_steps)
    return lambda step: jnp.asarray(g.lr)


def default_neusky_optimizer_groups(max_steps: int = 100001) -> Dict[str, OptimizerGroupConfig]:
    """The canonical five groups (``configs/neusky_config.py:216-237``)."""
    return {
        "proposal_networks": OptimizerGroupConfig(
            lr=1e-2, schedule="cosine", max_steps=max_steps
        ),
        "fields": OptimizerGroupConfig(lr=1e-3, schedule="cosine", max_steps=max_steps),
        "illumination_field": OptimizerGroupConfig(
            lr=1e-2, schedule="exponential", lr_final=1e-5, max_steps=max_steps
        ),
        "visibility_sigmoid": OptimizerGroupConfig(
            lr=1e-3, schedule="exponential", lr_final=1e-4,
            warmup_steps=4000, max_steps=max_steps,
        ),
        "ddf_field": OptimizerGroupConfig(lr=1e-4, schedule="cosine", max_steps=max_steps),
    }


def param_group_label(path_key: str) -> str:
    """Map a top-level params key to its optimizer group."""
    if path_key.startswith("proposal_networks"):
        return "proposal_networks"
    if path_key in ("eval_latents", "illumination_decoder"):
        return "frozen"
    if path_key == "gt_probe_illumination":
        # ceiling-probe oracle light table trains at the illumination
        # group's LR (it stands in for the RENI latents)
        return "illumination_field"
    return path_key


def build_optimizer(
    params,
    groups: Dict[str, OptimizerGroupConfig],
    frozen_groups: tuple = ("frozen",),
) -> optax.GradientTransformation:
    """One ``multi_transform`` over top-level param keys.

    Groups absent from ``groups`` and groups in ``frozen_groups`` get
    ``set_to_zero`` (eval latents are trained by their own optimizer during
    eval-latent fitting; the RENI decoder is frozen per
    ``fixed_decoder=True``)."""
    top_labels = {k: param_group_label(k) for k in params.keys()}

    def label_fn(p):
        # expand top-level labels to the full param tree structure
        return {
            k: jax.tree_util.tree_map(lambda _: top_labels[k], v)
            for k, v in p.items()
        }

    transforms = {}
    for name, g in groups.items():
        transforms[name] = optax.chain(
            optax.scale_by_adam(eps=g.eps),
            optax.scale_by_schedule(_group_schedule(g)),
            optax.scale(-1.0),
        )
    for fg in set(top_labels.values()):
        if fg not in transforms:
            transforms[fg] = optax.set_to_zero()
    return optax.multi_transform(transforms, label_fn)


def build_eval_latent_optimizer(
    lr: float = 1e-1, lr_final: float = 1e-7, max_steps: int = 250,
    eps: float = 1e-15, scale_only: bool = False,
) -> optax.GradientTransformation:
    """Adam + exponential decay for test-time latent fitting
    (``configs/neusky_config.py:142-147``), masked to the ``eval_latents``
    group only.  ``scale_only=True`` freezes the latent codes too and fits
    just ``eval_scale`` (``optimise_compare_eval_scale``,
    ``neusky_model.py:1511-1514``)."""
    sched = exponential_decay_schedule(lr, lr_final, max_steps)
    inner = optax.chain(
        optax.scale_by_adam(eps=eps), optax.scale_by_schedule(sched), optax.scale(-1.0)
    )
    def label_fn(params):
        def group(k, v):
            if k != "eval_latents":
                return jax.tree_util.tree_map(lambda _: "frozen", v)
            if not scale_only:
                return jax.tree_util.tree_map(lambda _: "eval", v)
            return {
                kk: jax.tree_util.tree_map(
                    lambda _: "eval" if kk == "eval_scale" else "frozen", vv
                )
                for kk, vv in v.items()
            }

        return {k: group(k, v) for k, v in params.items()}

    return optax.multi_transform(
        {"eval": inner, "frozen": optax.set_to_zero()}, label_fn
    )
