"""Device mesh + sharded training step.

TPU-native replacement for the reference's DDP/NCCL data parallelism
(``neusky_pipeline.py:197-200``): a 1-D ``data`` mesh over rays; parameters
replicated; gradients all-reduced by XLA over ICI (inserted automatically
by pjit from the sharding annotations — no explicit collectives needed for
DP).  The illumination-direction axis is the natural second axis if
per-chip memory ever binds (shading is linear over directions → exact
``psum``), left as a future ``shard_map`` specialisation.

Design notes:
  - ``make_train_step`` closes over model + optimizer and returns a jitted
    ``(params, opt_state, batch, rng, step) → (params, opt_state, aux)``
    with donated params/opt_state.
  - Per-device RNG: the rng key is folded with the step so each call is
    deterministic given (seed, step); inside the step JAX's global-view
    semantics keep randomness consistent across the mesh.
  - Scalar batch leaves (image_indices [U], sky rays) are replicated;
    ray-axis leaves are sharded on ``data``.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from neusky_tpu.models.neusky import NeuSkyModel
from neusky_tpu.models.pipeline import (
    PipelineConfig,
    ddf_fit_loss_fn,
    eval_latent_loss_fn,
    scene_loss_fn,
    train_loss_fn,
)


def make_mesh(devices=None, axis_name: str = "data") -> Mesh:
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def _batch_spec(batch: Dict[str, Any], mesh: Mesh, axis_name: str = "data"):
    """Ray-axis leaves → P('data'); everything else replicated.

    The ray axis is identified as any leading axis divisible by the mesh
    size on leaves belonging to the per-ray groups."""
    n_dev = dict(zip(mesh.axis_names, mesh.devices.shape)).get(
        axis_name, mesh.devices.size
    )

    def spec_for(path, leaf):
        key = "/".join(str(p) for p in path)
        if ("image_indices" in key) or leaf.ndim == 0:
            return P()
        if leaf.shape[0] % n_dev == 0 and leaf.shape[0] >= n_dev:
            return P("data")
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, batch)


def shard_batch(batch, mesh: Mesh):
    specs = _batch_spec(batch, mesh)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), batch, specs
    )


def make_train_step(
    model: NeuSkyModel,
    pipeline_config: PipelineConfig,
    optimizer,
    mesh: Optional[Mesh] = None,
    donate: bool = True,
) -> Callable:
    """Jitted joint train step.  With a mesh, params/opt_state are
    replicated and the scene-ray batch is sharded on ``data``; XLA inserts
    the gradient all-reduce."""

    def step_fn(params, opt_state, batch, rng, step):
        def loss(p):
            return train_loss_fn(model, pipeline_config, p, rng, batch, step)

        (total, aux), grads = jax.value_and_grad(loss, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(
            lambda p, u: p + u, params, updates
        )
        aux = dict(aux)
        aux["total_loss"] = total
        return params, opt_state, aux

    donate_argnums = (0, 1) if donate else ()
    if mesh is None:
        return jax.jit(step_fn, donate_argnums=donate_argnums)

    repl = NamedSharding(mesh, P())
    return jax.jit(
        step_fn,
        donate_argnums=donate_argnums,
        in_shardings=(repl, repl, None, repl, repl),
        out_shardings=(repl, repl, None),
    )


def make_train_step_split(
    model: NeuSkyModel,
    pipeline_config: PipelineConfig,
    optimizer,
    mesh: Optional[Mesh] = None,
) -> Callable:
    """Train step compiled as THREE smaller executables (scene grad, DDF-fit
    grad, optimizer apply) with gradients summed before the update —
    numerically identical to the fused step, but each compile unit is far
    smaller (the fused backward overwhelms the TPU compiler at full model
    scale).  Returns a python closure with the same signature as
    ``make_train_step``'s output."""

    def scene_grad(params, rng, batch, step):
        return jax.value_and_grad(
            lambda p: scene_loss_fn(model, p, rng, batch, step), has_aux=True
        )(params)

    def ddf_grad(params, rng, batch, step):
        return jax.value_and_grad(
            lambda p: ddf_fit_loss_fn(model, pipeline_config, p, rng, batch, step),
            has_aux=True,
        )(params)

    def apply_updates(params, opt_state, g1, g2):
        grads = jax.tree_util.tree_map(lambda a, b: a + b, g1, g2)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, opt_state

    def apply_updates_single(params, opt_state, g1):
        updates, opt_state = optimizer.update(g1, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, opt_state

    jit_kw = {}
    if mesh is not None:
        repl = NamedSharding(mesh, P())
        jit_kw = {"in_shardings": (repl, None, None, repl), "out_shardings": None}
    scene_grad = jax.jit(scene_grad, **jit_kw)
    ddf_grad = jax.jit(ddf_grad, **jit_kw)
    apply_updates = jax.jit(apply_updates)
    apply_updates_single = jax.jit(apply_updates_single)
    fit_ddf = model.config.fit_visibility_field and model.ddf is not None

    def step_fn(params, opt_state, batch, rng, step):
        k1, k2 = jax.random.split(rng)
        (total1, aux1), g1 = scene_grad(params, k1, batch, step)
        if fit_ddf:
            (total2, aux2), g2 = ddf_grad(params, k2, batch, step)
            params, opt_state = apply_updates(params, opt_state, g1, g2)
            aux = {
                "loss_dict": {**aux1["loss_dict"], **aux2["loss_dict"]},
                "metrics": {**aux1["metrics"], **aux2["metrics"]},
                "total_loss": total1 + total2,
            }
        else:
            params, opt_state = apply_updates_single(params, opt_state, g1)
            aux = dict(aux1)
            aux["total_loss"] = total1
        return params, opt_state, aux

    return step_fn


def make_eval_latent_step(
    model: NeuSkyModel,
    optimizer,
    mesh: Optional[Mesh] = None,
) -> Callable:
    """Jitted inner step for test-time latent optimisation
    (``fit_latent_codes_for_eval``, ``neusky_model.py:1503-1588``) — Adam on
    ``eval_latents`` only (optimizer masks the rest)."""

    def step_fn(params, opt_state, batch, rng, step, rotation=None):
        def loss(p):
            return eval_latent_loss_fn(model, p, rng, batch, step, rotation)

        total, grads = jax.value_and_grad(loss)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, opt_state, total

    if mesh is None:
        return jax.jit(step_fn)
    repl = NamedSharding(mesh, P())
    return jax.jit(
        step_fn,
        in_shardings=(repl, repl, None, repl, repl, None),
        out_shardings=(repl, repl, repl),
    )
