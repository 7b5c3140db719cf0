"""Checkpointing with surgical sub-tree restore.

The reference does three kinds of surgical checkpoint loads (SURVEY §5):
RENI++ decoder-only (``neusky_model.py:286-300``), NeuSky minus visibility
field (``neusky_pipeline.py:174-194``), and DDF standalone with config
re-hydration (``ddf_pipeline.py:146-190``).  Here checkpoints are orbax
PyTree saves of ``{params, opt_state, step}``; sub-tree restore is plain
dict surgery on the explicit top-level param groups.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp


def _ckpt_dir(base: Path, step: int) -> Path:
    return base / "checkpoints" / f"step-{step:09d}"


def save_checkpoint(base: Path, step: int, params, opt_state) -> Path:
    base = Path(base)
    path = _ckpt_dir(base, step)
    path.parent.mkdir(parents=True, exist_ok=True)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(
        path.absolute(),
        {"params": params, "opt_state": opt_state, "step": step},
        force=True,
    )
    (base / "latest.json").write_text(json.dumps({"step": step}))
    return path


def latest_step(base: Path) -> Optional[int]:
    f = Path(base) / "latest.json"
    if not f.exists():
        return None
    return json.loads(f.read_text())["step"]


def load_checkpoint(
    base: Path, step: Optional[int], params_template, opt_state_template
) -> Tuple[Any, Any, int]:
    """Full restore (resume)."""
    if step is None:
        step = latest_step(base)
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {base}")
    ckptr = ocp.PyTreeCheckpointer()
    target = {
        "params": params_template,
        "opt_state": opt_state_template,
        "step": 0,
    }
    # restore_args pinned to the TEMPLATE's shardings: makes restore work
    # across topologies (e.g. a TPU-saved checkpoint restored on CPU for
    # diagnostics) — the checkpoint's recorded sharding names the saving
    # platform and fails to resolve elsewhere.
    def _ra(x):
        if hasattr(x, "sharding"):
            return ocp.ArrayRestoreArgs(sharding=x.sharding, dtype=x.dtype)
        return ocp.RestoreArgs()

    restore_args = jax.tree_util.tree_map(_ra, target)
    restored = ckptr.restore(
        _ckpt_dir(Path(base), step).absolute(),
        item=target,
        restore_args=restore_args,
    )
    return restored["params"], restored["opt_state"], restored["step"]


def prior_init_latent(model_config) -> Optional[np.ndarray]:
    """The shipped prior's fitted mean-sky latent ``z*`` ([latent_dim, 3]),
    or None when the configured prior ships no ``init_latent.npz``.

    This is the latent every latent-fit should START from: the reference
    zero-inits its latents (``neusky_model.py:261-263, 1537-1540``) and
    relies on its *variational* prior decoding z=0 to a mean sky; the
    in-framework autodecoder prior is unregularised, so z=0 decodes
    out-of-domain (exp(log_domain_max) ≈ 3000 linear) and any fit through
    the clipped sRGB render path starts on a saturated flat plateau
    (r3 diagnosis, ``tools/probe_sky_fit.py``).  Seeding at z* restores
    the reference's effective init semantics for BOTH training and
    test-time eval fits."""
    prior_dir = getattr(model_config, "illumination_prior_dir", None)
    if not prior_dir:
        return None
    path = Path(prior_dir)
    if not path.is_absolute():
        repo_root = Path(__file__).resolve().parent.parent.parent
        path = repo_root / path
    init_file = path / "init_latent.npz"
    if not init_file.exists():
        return None
    return np.load(init_file)["latent"]  # [latent_dim, 3]


def load_illumination_prior(
    params: Dict[str, Any], model_config, init_latent: bool = True
) -> Dict[str, Any]:
    """Restore the frozen RENI++ decoder from the configured trained prior
    (reference ``neusky_model.py:272-300``: pretrained decoder load,
    mu/logvar excluded).  EVERY training entry point must call this after
    ``model.init`` — round-2 bug: ``tools/train_sanity.py`` skipped it and a
    20k-step validation silently trained against a RANDOM frozen decoder
    (sky unfittable, PSNR plateau ~10).  No-op when unconfigured; loud
    warning when configured but missing.

    ``init_latent``: when the prior ships an ``init_latent.npz``
    (``tools/fit_prior_init_latent.py``), broadcast it into
    ``train_latents`` / ``eval_latents``.  The reference zero-inits the
    latents (``neusky_model.py:261-263``) and relies on its *variational*
    prior decoding z=0 to a mean sky (ckpt carries train_mu/train_logvar,
    ``neusky_model.py:288-293``); the in-framework autodecoder prior is
    unregularised, so z=0 decodes out-of-domain (exp(log_domain_max) ≈
    3000 linear) and the sky loss starts on a saturated flat plateau —
    r3 diagnosis, ``tools/probe_sky_fit.py``.  Initialising at the fitted
    mean-sky latent restores the reference's effective init semantics."""
    prior_dir = getattr(model_config, "illumination_prior_dir", None)
    if not prior_dir:
        return params
    path = Path(prior_dir)
    if not path.is_absolute():
        repo_root = Path(__file__).resolve().parent.parent.parent
        path = repo_root / path
    import sys

    if latest_step(path) is None:
        print(
            f"WARNING: illumination_prior_dir={path} has no checkpoint — "
            "training against an UNTRAINED decoder "
            "(run tools/train_reni_prior.py to produce one)",
            file=sys.stderr,
        )
        return params
    params = load_param_subtrees(
        path, None, params, include=("illumination_decoder",)
    )
    # stderr: callers like bench.py promise a single-JSON-line stdout
    print(f"loaded RENI++ prior decoder from {path}", file=sys.stderr)
    z0 = prior_init_latent(model_config) if init_latent else None
    if z0 is not None:
        import jax.numpy as jnp

        def seed_latents(group, key):
            cur = group[key]
            if cur.shape[1:] != z0.shape:
                print(
                    f"WARNING: init_latent shape {z0.shape} != {key} slot "
                    f"shape {cur.shape[1:]} — keeping zero init",
                    file=sys.stderr,
                )
                return group
            group = dict(group)
            group[key] = jnp.broadcast_to(
                jnp.asarray(z0, cur.dtype)[None], cur.shape
            )
            return group

        params = dict(params)
        params["illumination_field"] = seed_latents(
            params["illumination_field"], "train_latents"
        )
        params["eval_latents"] = seed_latents(params["eval_latents"], "eval_latents")
        print(f"seeded sky latents from {path / 'init_latent.npz'}", file=sys.stderr)
    return params


def load_param_subtrees(
    base: Path,
    step: Optional[int],
    params: Dict[str, Any],
    include: Tuple[str, ...] = (),
    exclude: Tuple[str, ...] = (),
    reinit_on_mismatch: Tuple[str, ...] = ("eval_latents",),
) -> Dict[str, Any]:
    """Surgical restore: merge selected top-level groups from a checkpoint
    into ``params``.

    - decoder-only: ``include=("illumination_decoder",)``
      (reference ``_model.field.`` prefix filter, ``neusky_model.py:286-300``);
    - model-minus-visibility: ``exclude=("ddf_field",)``
      (``neusky_pipeline.py:185-190``);
    - DDF standalone: ``include=("ddf_field",)``.

    Shape safety: a subtree whose restored leaf shapes/structure disagree
    with ``params`` raises a clear error — EXCEPT subtrees listed in
    ``reinit_on_mismatch``, which keep the (fresh) template instead.  The
    default covers ``eval_latents``: per-image fitted variables sized by the
    eval split (baked into ``init``), which the eval loop zeroes and refits
    anyway — a checkpoint trained against one eval set must stay evaluable
    against another (reference re-creates eval latents per eval set,
    ``neusky_model.py:262-270``)."""
    if step is None:
        step = latest_step(base)
    ckptr = ocp.PyTreeCheckpointer()
    path = _ckpt_dir(Path(base), step).absolute()
    # restore as HOST numpy: a template-free restore would try to re-create
    # the SAVING platform's sharding, which fails cross-topology (e.g. a
    # TPU-saved prior restored on CPU); callers re-device as needed.
    meta = ckptr.metadata(path)
    tree = getattr(meta, "item_metadata", meta)
    tree = getattr(tree, "tree", tree)
    restore_args = jax.tree_util.tree_map(
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray), tree
    )
    restored = ckptr.restore(path, restore_args=restore_args)
    src = restored["params"]
    out = dict(params)
    keys = include if include else tuple(k for k in src.keys() if k not in exclude)
    for k in keys:
        if k not in src:
            continue
        sub = jax.tree_util.tree_map(np.asarray, src[k])
        mismatch = _subtree_mismatch(params.get(k), sub) if k in params else None
        if mismatch is not None:
            if k in reinit_on_mismatch:
                import sys

                print(
                    f"checkpoint subtree '{k}' shape-mismatches the model "
                    f"({mismatch}) — keeping the fresh template (it is refit "
                    "by the eval loop)",
                    file=sys.stderr,
                )
                continue
            raise ValueError(
                f"checkpoint subtree '{k}' does not match the model: {mismatch}"
            )
        out[k] = sub
    return out


def _subtree_mismatch(target, restored) -> Optional[str]:
    """None if ``restored`` matches ``target`` in structure and leaf shapes,
    else a human-readable description of the first difference."""
    t_leaves, t_def = jax.tree_util.tree_flatten(target)
    r_leaves, r_def = jax.tree_util.tree_flatten(restored)
    if t_def != r_def:
        return f"tree structure {r_def} != expected {t_def}"
    for tl, rl in zip(t_leaves, r_leaves):
        ts = getattr(tl, "shape", None)
        rs = getattr(rl, "shape", None)
        if ts != rs:
            return f"leaf shape {rs} != expected {ts}"
    return None
