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
        if ("image_indices" in key) or ("cameras" in key) or leaf.ndim == 0:
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
    pin_layouts: bool = False,
    example_params=None,
    example_opt_state=None,
) -> Callable:
    """Train step compiled as THREE smaller executables (scene grad, DDF-fit
    grad, optimizer apply) with gradients summed before the update —
    numerically identical to the fused step, but each compile unit is far
    smaller (the fused graph OOMs a 16 GB chip at full model scale).

    ``pin_layouts``: AOT choreography pinning boundary layouts to the scene
    executable's auto choices.  Measured SLOWER on the axon v5e runtime
    (90 vs 226 rays/s) — pinning degrades the executables more than the
    inter-executable relayout copies cost — so off by default; kept for
    future runtimes.  Requires example params/opt_state."""

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

    fit_ddf = model.config.fit_visibility_field and model.ddf is not None

    if mesh is not None:
        repl = NamedSharding(mesh, P())
        scene_grad = jax.jit(
            scene_grad, in_shardings=(repl, None, None, repl), out_shardings=None
        )
        ddf_grad = jax.jit(
            ddf_grad, in_shardings=(repl, None, None, repl), out_shardings=None
        )
        apply_updates = jax.jit(apply_updates)
        apply_updates_single = jax.jit(apply_updates_single)
    elif (
        pin_layouts
        and example_params is not None
        and example_opt_state is not None
    ):
        # AOT layout choreography: let the (dominant) scene executable pick
        # its preferred auto layouts, then pin every other executable's
        # boundary layouts to match, so params/grads/opt_state never get
        # relayout-copied between the three executables.
        scene_grad = jax.jit(scene_grad)
        ddf_grad_j = jax.jit(ddf_grad)

        def finalize(example_batch, example_rng, example_step):
            scene_c = scene_grad.lower(
                example_params, example_rng, example_batch, example_step
            ).compile()
            fmt_params = scene_c.input_formats[0][0]
            fmt_grads = scene_c.output_formats[1]

            ddf_pinned = jax.jit(
                ddf_grad,
                in_shardings=(fmt_params, None, None, None),
                out_shardings=((None, None), fmt_grads),
            )
            # apply: inputs conform to scene's choices; params OUT must equal
            # params IN (next step feeds scene again); opt_state self-cycles
            # with AUTO in → pin out to whatever AUTO picked for in.
            apply_auto = jax.jit(
                apply_updates,
                in_shardings=(fmt_params, None, fmt_grads, fmt_grads),
            )
            apply_c = apply_auto.lower(
                example_params, example_opt_state,
                jax.tree_util.tree_map(jnp.zeros_like, example_params),
                jax.tree_util.tree_map(jnp.zeros_like, example_params),
            ).compile()
            fmt_opt = apply_c.input_formats[0][1]
            apply_pinned = jax.jit(
                apply_updates,
                in_shardings=(fmt_params, fmt_opt, fmt_grads, fmt_grads),
                out_shardings=(fmt_params, fmt_opt),
            )
            apply_single_pinned = jax.jit(
                apply_updates_single,
                in_shardings=(fmt_params, fmt_opt, fmt_grads),
                out_shardings=(fmt_params, fmt_opt),
            )
            return scene_c, ddf_pinned, apply_pinned, apply_single_pinned

        _cache = {}

        def step_fn(params, opt_state, batch, rng, step):
            if "fns" not in _cache:
                _cache["fns"] = finalize(batch, rng, step)
            scene_c, ddf_p, apply_p, apply_s = _cache["fns"]
            k1, k2 = jax.random.split(rng)
            (total1, aux1), g1 = scene_grad(params, k1, batch, step)
            if fit_ddf:
                (total2, aux2), g2 = ddf_p(params, k2, batch, step)
                params, opt_state = apply_p(params, opt_state, g1, g2)
                aux = {
                    "loss_dict": {**aux1["loss_dict"], **aux2["loss_dict"]},
                    "metrics": {**aux1["metrics"], **aux2["metrics"]},
                    "total_loss": total1 + total2,
                }
            else:
                params, opt_state = apply_s(params, opt_state, g1)
                aux = dict(aux1)
                aux["total_loss"] = total1
            return params, opt_state, aux

        return step_fn
    else:
        scene_grad = jax.jit(scene_grad)
        ddf_grad = jax.jit(ddf_grad)
        # Layout fixed point: with AUTO layouts, ``apply`` outputs params /
        # opt_state in compiler-chosen layouts that can differ from what the
        # grad executables were compiled for — the next step then MISSES the
        # jit cache and recompiles the whole pipeline once more (measured:
        # a one-time ~16 min, 4-executable recompile cascade at full scale
        # on v5e).  Pinning ``apply``'s outputs to the layouts of its own
        # inputs (= what the grad executables consumed) makes step 1's
        # executables final.  Donation is safe: params/opt_state are not
        # reused after ``apply``.
        _apply_cache: Dict[str, Any] = {}

        def _pinned_apply(fn, params, opt_state):
            key = fn.__name__
            if key not in _apply_cache:
                try:
                    fmt_p = jax.tree_util.tree_map(lambda x: x.format, params)
                    fmt_o = jax.tree_util.tree_map(lambda x: x.format, opt_state)
                    _apply_cache[key] = jax.jit(
                        fn, out_shardings=(fmt_p, fmt_o), donate_argnums=(0, 1)
                    )
                except Exception:  # non-committed inputs (e.g. numpy): AUTO
                    _apply_cache[key] = jax.jit(fn, donate_argnums=(0, 1))
            return _apply_cache[key]

        apply_updates_raw, apply_updates_single_raw = (
            apply_updates, apply_updates_single,
        )
        apply_updates = lambda p, o, g1, g2: _pinned_apply(
            apply_updates_raw, p, o
        )(p, o, g1, g2)
        apply_updates_single = lambda p, o, g1: _pinned_apply(
            apply_updates_single_raw, p, o
        )(p, o, g1)

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
