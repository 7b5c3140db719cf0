"""Environment-variable A/B knobs shared by every TPU entry point.

Perf/quality experiments must be runnable WITHOUT code edits between runs
(bench.py, tools/train_sanity.py, tools/run_segmented.sh all honour the
same knobs), so that an A/B pair differs only in its environment:

- ``NEUSKY_BENCH_BF16=1``        — bf16 matmuls in the SDF geometry/colour
  MLPs (fp32 params/accumulation; DDF FiLM is already bf16).
- ``NEUSKY_VIS_CHUNK=<n>``       — visibility query chunk size.
- ``NEUSKY_EXACT_PROPOSAL_FWD=1``— exact 8-corner proposal forward instead
  of the stochastic single-corner estimator.
- ``NEUSKY_EXACT_TABLE_GRADS=1`` — exact 8-corner SDF hash-table gradients
  instead of stochastic-corner.
- ``NEUSKY_STOCH_DXT={0,1}``     — stochastic 1-corner position cotangent
  in the sdf-level-set encode backward (vs the exact 8-corner re-gather).
- ``NEUSKY_BF16_MAPPING={0,1}``  — bf16 FiLM mapping network (matmuls AND
  materialised freqs/phases; sin arguments stay f32).
- ``NEUSKY_VECTORIZED={0,1}``    — all-levels-in-one vs per-level hash
  encode ops (measured slower on v5e — transposed layouts; see PERF.md).
- ``NEUSKY_PROP_LEVELS=<n>`` / ``NEUSKY_PROP_LOG2=<n>`` — shrink the
  proposal density fields' hash grids (levels / table size).  The r3
  trace puts hash-encode machinery at ~51% of the step and the proposal
  fields take full-size encodes on 352k samples/step; these A/B the
  perf/quality trade (quality via tools/eval_from_ckpt.py).
- ``NEUSKY_DDF_ENCODING={nerf,hash}`` — DDF position encoding; the
  reference uses hash (``neusky/configs/neusky_config.py:162-177``), the
  framework default is nerf frequency (the hash DDF adds ~33M scatter
  rows/step — measured ≫10× joint-step cost; PERF.md r3).
- ``NEUSKY_BF16_TABLES={0,1}`` — gather hash-table corners through a bf16
  cast of each level table (halves random-access gather bytes; fp32
  master table, scatter backward, and encode output dtype unchanged).
- ``NEUSKY_VIS_REMAT={full,dots}`` — visibility chunk remat policy:
  ``dots`` saves FiLM matmul outputs so the backward skips recomputing
  them (r3 trace: bwd while 66 ms, ~27 ms matmul), at ~[chunk, hidden]
  saved activations per chunk.
- ``NEUSKY_FUSED_GT={0,1}`` — fuse the scene forward and the DDF
  ground-truth render into one concatenated proposal+field pass
  (halves the hash encode/scatter call sites; reference-equivalent in
  train mode — ``models/neusky.py::forward_with_ddf_gt``).
- ``NEUSKY_DDF_HASH_LEVELS=<n>`` / ``NEUSKY_DDF_HASH_LOG2=<n>`` — shrink
  the DDF hash grid (only used with ``NEUSKY_DDF_ENCODING=hash``): the
  reference's full-size 16-level/2^19 DDF grid costs ≫10× joint-step
  time, so the quality A/B runs a cheaper grid.

Reference step semantics being benchmarked:
``/root/reference/neusky/pipelines/neusky_pipeline.py:240-291``.
"""

from __future__ import annotations

import dataclasses
import os


def apply_env_knobs(cfg):
    """Return ``cfg`` with any NEUSKY_* experiment env knobs applied."""
    if os.environ.get("NEUSKY_BENCH_BF16", ""):
        cfg = dataclasses.replace(
            cfg, sdf_field=dataclasses.replace(cfg.sdf_field, use_bf16_compute=True)
        )
    if os.environ.get("NEUSKY_VIS_CHUNK", ""):
        cfg = dataclasses.replace(
            cfg, visibility_query_chunk=int(os.environ["NEUSKY_VIS_CHUNK"])
        )
    if os.environ.get("NEUSKY_EXACT_PROPOSAL_FWD", ""):
        cfg = dataclasses.replace(
            cfg,
            proposal_fields=tuple(
                dataclasses.replace(p, stochastic_forward=False)
                for p in cfg.proposal_fields
            ),
        )
    if os.environ.get("NEUSKY_PROP_LEVELS", ""):
        n = int(os.environ["NEUSKY_PROP_LEVELS"])
        cfg = dataclasses.replace(
            cfg,
            proposal_fields=tuple(
                dataclasses.replace(
                    p, hash=dataclasses.replace(p.hash, num_levels=n)
                )
                for p in cfg.proposal_fields
            ),
        )
    if os.environ.get("NEUSKY_PROP_LOG2", ""):
        n = int(os.environ["NEUSKY_PROP_LOG2"])
        cfg = dataclasses.replace(
            cfg,
            proposal_fields=tuple(
                dataclasses.replace(
                    p, hash=dataclasses.replace(p.hash, log2_hashmap_size=n)
                )
                for p in cfg.proposal_fields
            ),
        )
    if os.environ.get("NEUSKY_EXACT_TABLE_GRADS", ""):
        cfg = dataclasses.replace(
            cfg,
            sdf_field=dataclasses.replace(cfg.sdf_field, stochastic_table_grads=False),
        )
    if os.environ.get("NEUSKY_BF16_MAPPING", "") != "":
        on = os.environ["NEUSKY_BF16_MAPPING"].strip().lower() not in (
            "0", "false", "off", "no",
        )
        cfg = dataclasses.replace(
            cfg,
            ddf=dataclasses.replace(
                cfg.ddf,
                field=dataclasses.replace(cfg.ddf.field, use_bf16_mapping=on),
            ),
        )
    if os.environ.get("NEUSKY_FILM_HEADS", "") != "":
        on = os.environ["NEUSKY_FILM_HEADS"].strip().lower() not in (
            "0", "false", "off", "no",
        )
        cfg = dataclasses.replace(
            cfg,
            ddf=dataclasses.replace(
                cfg.ddf,
                field=dataclasses.replace(cfg.ddf.field, film_per_layer_heads=on),
            ),
        )
    if os.environ.get("NEUSKY_STOCH_DXT", "") != "":
        on = os.environ["NEUSKY_STOCH_DXT"].strip().lower() not in (
            "0", "false", "off", "no",
        )
        cfg = dataclasses.replace(
            cfg, sdf_field=dataclasses.replace(cfg.sdf_field, stochastic_dxt=on)
        )
    if os.environ.get("NEUSKY_VIS_REMAT", ""):
        cfg = dataclasses.replace(
            cfg, visibility_remat_policy=os.environ["NEUSKY_VIS_REMAT"]
        )
    if os.environ.get("NEUSKY_FUSED_GT", "") != "":
        on = os.environ["NEUSKY_FUSED_GT"].strip().lower() not in (
            "0", "false", "off", "no",
        )
        cfg = dataclasses.replace(cfg, fused_ddf_gt_pass=on)
    if os.environ.get("NEUSKY_DDF_HASH_LEVELS", "") or os.environ.get(
        "NEUSKY_DDF_HASH_LOG2", ""
    ):
        h = cfg.ddf.field.hash
        if os.environ.get("NEUSKY_DDF_HASH_LEVELS", ""):
            h = dataclasses.replace(
                h, num_levels=int(os.environ["NEUSKY_DDF_HASH_LEVELS"])
            )
        if os.environ.get("NEUSKY_DDF_HASH_LOG2", ""):
            h = dataclasses.replace(
                h, log2_hashmap_size=int(os.environ["NEUSKY_DDF_HASH_LOG2"])
            )
        cfg = dataclasses.replace(
            cfg,
            ddf=dataclasses.replace(
                cfg.ddf, field=dataclasses.replace(cfg.ddf.field, hash=h)
            ),
        )
    if os.environ.get("NEUSKY_DDF_ENCODING", ""):
        cfg = dataclasses.replace(
            cfg,
            ddf=dataclasses.replace(
                cfg.ddf,
                field=dataclasses.replace(
                    cfg.ddf.field,
                    position_encoding_type=os.environ["NEUSKY_DDF_ENCODING"],
                ),
            ),
        )
    if os.environ.get("NEUSKY_VECTORIZED", "") != "":
        vec = os.environ["NEUSKY_VECTORIZED"].strip().lower() not in (
            "0", "false", "off", "no",
        )
        cfg = _set_all_hashgrids(cfg, vectorized=vec)
    if os.environ.get("NEUSKY_BF16_TABLES", "") != "":
        on = os.environ["NEUSKY_BF16_TABLES"].strip().lower() not in (
            "0", "false", "off", "no",
        )
        cfg = _set_all_hashgrids(cfg, bf16_gather=on)
    return cfg


def _set_all_hashgrids(cfg, **updates):
    """Replace field(s) on every HashGridConfig anywhere in the config tree."""
    from neusky_tpu.ops.hashgrid import HashGridConfig

    def _walk(node):
        if isinstance(node, HashGridConfig):
            return dataclasses.replace(node, **updates)
        if dataclasses.is_dataclass(node) and not isinstance(node, type):
            return dataclasses.replace(
                node,
                **{
                    f.name: _walk(getattr(node, f.name))
                    for f in dataclasses.fields(node)
                    if dataclasses.is_dataclass(getattr(node, f.name))
                    or isinstance(getattr(node, f.name), tuple)
                },
            )
        if isinstance(node, tuple):
            return tuple(_walk(v) for v in node)
        return node

    return _walk(cfg)


def knob_summary() -> dict:
    """The active knob values, for embedding in result JSON lines."""
    keys = (
        "NEUSKY_BENCH_BF16",
        "NEUSKY_VIS_CHUNK",
        "NEUSKY_EXACT_PROPOSAL_FWD",
        "NEUSKY_EXACT_TABLE_GRADS",
        "NEUSKY_STOCH_DXT",
        "NEUSKY_BF16_MAPPING",
        "NEUSKY_FILM_HEADS",
        "NEUSKY_PROP_LEVELS",
        "NEUSKY_PROP_LOG2",
        "NEUSKY_VECTORIZED",
        "NEUSKY_DDF_ENCODING",
        "NEUSKY_BF16_TABLES",
        "NEUSKY_DDF_HASH_LEVELS",
        "NEUSKY_DDF_HASH_LOG2",
        "NEUSKY_FUSED_GT",
        "NEUSKY_VIS_REMAT",
    )
    return {k: os.environ[k] for k in keys if os.environ.get(k, "") != ""}


def effective_summary(cfg) -> dict:
    """RESOLVED config values for the knob-controlled settings, for result
    JSON provenance.  Env knobs record only what was *set*; after a config
    default changes, the absence of a knob in an old result file means the
    OLD default — recording the effective values removes that ambiguity
    (r3 advisor finding)."""
    return {
        "sdf_bf16_compute": bool(cfg.sdf_field.use_bf16_compute),
        "ddf_bf16_compute": bool(cfg.ddf.field.use_bf16_compute),
        "ddf_bf16_mapping": bool(cfg.ddf.field.use_bf16_mapping),
        "ddf_film_per_layer_heads": bool(cfg.ddf.field.film_per_layer_heads),
        "visibility_query_chunk": int(cfg.visibility_query_chunk),
        "proposal_stochastic_forward": [
            bool(p.stochastic_forward) for p in cfg.proposal_fields
        ],
        "sdf_stochastic_table_grads": bool(cfg.sdf_field.stochastic_table_grads),
        "sdf_stochastic_dxt": bool(cfg.sdf_field.stochastic_dxt),
        "ddf_position_encoding": cfg.ddf.field.position_encoding_type,
        "ddf_hash_levels": cfg.ddf.field.hash.num_levels,
        "ddf_hash_log2": cfg.ddf.field.hash.log2_hashmap_size,
        "sdf_hash_vectorized": bool(cfg.sdf_field.hash.vectorized),
        "hash_bf16_gather": bool(cfg.sdf_field.hash.bf16_gather),
        "fused_ddf_gt_pass": bool(cfg.fused_ddf_gt_pass),
        "visibility_remat_policy": cfg.visibility_remat_policy,
        "proposal_hash_levels": [p.hash.num_levels for p in cfg.proposal_fields],
        "proposal_hash_log2": [
            p.hash.log2_hashmap_size for p in cfg.proposal_fields
        ],
    }
