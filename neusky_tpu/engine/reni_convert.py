"""torch→jax RENI++ checkpoint conversion.

The reference consumes a *published* pretrained RENI++ decoder: nerfstudio
``step-000050000.ckpt`` files whose ``pipeline`` state dict holds the field
under the ``_model.field.`` prefix, with the train/eval latent banks
(``train_mu/train_logvar/eval_mu/eval_logvar``) excluded from the load
(``/root/reference/neusky/models/neusky_model.py:272-300``).

This module converts such a checkpoint into this framework's
``RENIField`` parameter pytree.  Two layers:

1. ``filter_reni_state_dict`` — the exact prefix/exclusion filtering the
   reference performs, producing ``{torch_name: np.ndarray}``.
2. ``torch_state_to_params`` — a declarative name+transform mapping onto the
   flax tree: torch ``nn.Linear`` weights ``[out, in]`` transpose to flax
   kernels ``[in, out]``; torch ``nn.MultiheadAttention`` packed
   ``in_proj_weight [3H, H]`` splits into flax
   query/key/value kernels ``[H, heads, head_dim]``; ``out_proj`` maps to
   the flax ``out`` kernel ``[heads, head_dim, H]``; LayerNorm
   ``weight/bias`` map to ``scale/bias``.

The upstream ``ns_reni`` source is an EMPTY submodule in the reference
snapshot, so its exact parameter names cannot be read; ``TORCH_NAME_ALIASES``
lists the naming variants the mapper accepts (nn.MultiheadAttention,
separate q/k/v Linears, hand-rolled blocks).  Unknown keys fail LOUDLY with
the full both-sides inventory plus shape-compatible suggestions — never a
silent partial load.  The machinery itself is round-trip tested
(``tests/test_reni_convert.py``): params → synthetic torch ckpt → convert →
bit-identical params and identical decodes.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Tuple

import numpy as np

from neusky_tpu.fields.reni import RENIFieldConfig

Array = np.ndarray
StateDict = Dict[str, Array]

RENI_PREFIX = "_model.field."
RENI_EXCLUDE = ("train_logvar", "eval_logvar", "train_mu", "eval_mu")


def filter_reni_state_dict(pipeline_state: Dict[str, "object"]) -> StateDict:
    """Reference-exact key filtering (``neusky_model.py:286-300``): keep
    ``_model.field.*`` minus the latent banks; strip the prefix."""
    out: StateDict = {}
    for k, v in pipeline_state.items():
        if not k.startswith(RENI_PREFIX):
            continue
        if any(s in k for s in RENI_EXCLUDE):
            continue
        out[k[len(RENI_PREFIX):]] = np.asarray(
            v.detach().cpu().numpy() if hasattr(v, "detach") else v
        )
    return out


# ---------------------------------------------------------------------------
# transforms: torch tensor(s) → flax leaf


def _linear_w(t: Array) -> Array:
    return np.ascontiguousarray(t.T)  # [out, in] → [in, out]


def _identity(t: Array) -> Array:
    return np.asarray(t)


def _mha_qkv(heads: int):
    """torch packed/unpacked projection weight [H_out, H_in] →
    flax kernel [H_in, heads, head_dim]."""

    def f(t: Array) -> Array:
        h_out, h_in = t.shape
        return np.ascontiguousarray(t.T.reshape(h_in, heads, h_out // heads))

    return f


def _mha_qkv_bias(heads: int):
    def f(t: Array) -> Array:
        return np.asarray(t).reshape(heads, t.shape[0] // heads)

    return f


def _mha_out(heads: int):
    """torch out_proj.weight [H, H] → flax out kernel [heads, head_dim, H]."""

    def f(t: Array) -> Array:
        h_out, h_in = t.shape
        return np.ascontiguousarray(t.T.reshape(heads, h_in // heads, h_out))

    return f


# flax path is a tuple of dict keys under params["params"].
FlaxPath = Tuple[str, ...]
# one rule: (flax_path, [(torch_name_or_packedspec, transform)])
# a packedspec "name[a:b]" slices the first axis of tensor ``name``.
Rule = Tuple[FlaxPath, List[Tuple[str, Callable[[Array], Array]]]]


def _attention_rules(cfg: RENIFieldConfig) -> List[Rule]:
    h = cfg.hidden_features
    heads = cfg.num_attention_heads
    rules: List[Rule] = [
        (("decoder", "query_embed", "kernel"), [("decoder.query_embed.weight", _linear_w)]),
        (("decoder", "query_embed", "bias"), [("decoder.query_embed.bias", _identity)]),
        (("decoder", "kv_embed", "kernel"), [("decoder.kv_embed.weight", _linear_w)]),
        (("decoder", "kv_embed", "bias"), [("decoder.kv_embed.bias", _identity)]),
        (("decoder", "LayerNorm_0", "scale"), [("decoder.norm_out.weight", _identity)]),
        (("decoder", "LayerNorm_0", "bias"), [("decoder.norm_out.bias", _identity)]),
        (("decoder", "out", "kernel"), [("decoder.out.weight", _linear_w)]),
        (("decoder", "out", "bias"), [("decoder.out.bias", _identity)]),
    ]
    for i in range(cfg.num_attention_layers):
        b = ("decoder", f"block_{i}")
        t = f"decoder.blocks.{i}"
        attn = b + ("MultiHeadDotProductAttention_0",)
        rules += [
            (b + ("LayerNorm_0", "scale"), [(f"{t}.norm_q.weight", _identity)]),
            (b + ("LayerNorm_0", "bias"), [(f"{t}.norm_q.bias", _identity)]),
            (b + ("LayerNorm_1", "scale"), [(f"{t}.norm_kv.weight", _identity)]),
            (b + ("LayerNorm_1", "bias"), [(f"{t}.norm_kv.bias", _identity)]),
            (attn + ("query", "kernel"),
             [(f"{t}.attn.in_proj_weight[0:{h}]", _mha_qkv(heads))]),
            (attn + ("key", "kernel"),
             [(f"{t}.attn.in_proj_weight[{h}:{2 * h}]", _mha_qkv(heads))]),
            (attn + ("value", "kernel"),
             [(f"{t}.attn.in_proj_weight[{2 * h}:{3 * h}]", _mha_qkv(heads))]),
            (attn + ("query", "bias"),
             [(f"{t}.attn.in_proj_bias[0:{h}]", _mha_qkv_bias(heads))]),
            (attn + ("key", "bias"),
             [(f"{t}.attn.in_proj_bias[{h}:{2 * h}]", _mha_qkv_bias(heads))]),
            (attn + ("value", "bias"),
             [(f"{t}.attn.in_proj_bias[{2 * h}:{3 * h}]", _mha_qkv_bias(heads))]),
            (attn + ("out", "kernel"),
             [(f"{t}.attn.out_proj.weight", _mha_out(heads))]),
            (attn + ("out", "bias"), [(f"{t}.attn.out_proj.bias", _identity)]),
            (b + ("LayerNorm_2", "scale"), [(f"{t}.norm_ff.weight", _identity)]),
            (b + ("LayerNorm_2", "bias"), [(f"{t}.norm_ff.bias", _identity)]),
            (b + ("Dense_0", "kernel"), [(f"{t}.ff1.weight", _linear_w)]),
            (b + ("Dense_0", "bias"), [(f"{t}.ff1.bias", _identity)]),
            (b + ("Dense_1", "kernel"), [(f"{t}.ff2.weight", _linear_w)]),
            (b + ("Dense_1", "bias"), [(f"{t}.ff2.bias", _identity)]),
        ]
    return rules


# naming variants accepted for each canonical torch name (applied as prefix
# rewrites before rule matching).  Covers nn.MultiheadAttention layouts and
# the separate-q/k/v-Linear layout some RENI++ revisions use.
TORCH_NAME_ALIASES: List[Tuple[str, str]] = [
    ("decoder.layers.", "decoder.blocks."),          # nn.ModuleList naming
    ("decoder.decoder.blocks.", "decoder.blocks."),  # nested Decoder module
    ("decoder.norm.", "decoder.norm_out."),
    (".self_attn.", ".attn."),
    (".cross_attn.", ".attn."),
    (".multihead_attn.", ".attn."),
    (".norm1.", ".norm_q."),
    (".norm2.", ".norm_ff."),
    (".linear1.", ".ff1."),
    (".linear2.", ".ff2."),
]


def _canonicalise_names(sd: StateDict) -> StateDict:
    out: StateDict = {}
    for k, v in sd.items():
        for old, new in TORCH_NAME_ALIASES:
            if old in k:
                k = k.replace(old, new)
        out[k] = v
    return out


def _fetch(sd: StateDict, spec: str, used: set) -> Array:
    """Resolve ``name`` or ``name[a:b]`` (first-axis slice) from sd."""
    if spec.endswith("]"):
        name, _, sl = spec[:-1].rpartition("[")
        a, b = (int(s) for s in sl.split(":"))
        used.add(name)
        return np.asarray(sd[name])[a:b]
    used.add(spec)
    return np.asarray(sd[spec])


def torch_state_to_params(state: StateDict, config: RENIFieldConfig) -> dict:
    """Filtered torch state dict → flax ``{"params": {...}}`` tree for
    ``RENIField``.  Raises ``KeyError`` with the full unmatched inventory
    (both sides, plus shape-compatible candidates) on any mismatch."""
    if config.conditioning != "Attention":
        raise NotImplementedError(
            "converter covers the canonical Attention decoder "
            f"(got conditioning={config.conditioning!r}); the reference "
            "checkpoint latent_dim_100 is Attention"
            " (configs/neusky_config.py:78-96)"
        )
    sd = _canonicalise_names(state)
    rules = _attention_rules(config)
    tree: dict = {}
    used: set = set()
    missing: List[str] = []
    for flax_path, sources in rules:
        try:
            parts = [_fetch(sd, spec, used) for spec, _ in sources]
        except KeyError:
            missing.append(
                ".".join(flax_path) + " ← " + ", ".join(s for s, _ in sources)
            )
            continue
        leaf = sources[0][1](parts[0]) if len(parts) == 1 else np.concatenate(
            [tf(p) for (_, tf), p in zip(sources, parts)], axis=0
        )
        node = tree
        for p in flax_path[:-1]:
            node = node.setdefault(p, {})
        node[flax_path[-1]] = leaf
    unused = sorted(set(sd) - used)
    if missing or unused:
        lines = ["torch→jax RENI++ mapping incomplete:"]
        if missing:
            lines.append("  unmatched flax leaves (expected torch names):")
            lines += [f"    {m}" for m in missing]
        if unused:
            lines.append("  unconsumed torch tensors:")
            for k in unused:
                lines.append(f"    {k}  shape={tuple(np.asarray(sd[k]).shape)}")
            lines.append(
                "  extend TORCH_NAME_ALIASES/_attention_rules for this "
                "checkpoint's naming (ns_reni source is empty in the "
                "reference snapshot — see module docstring)"
            )
        raise KeyError("\n".join(lines))
    return {"params": tree}


def convert_torch_reni_checkpoint(ckpt_path: str, config: RENIFieldConfig) -> dict:
    """Load a published RENI++ nerfstudio checkpoint
    (``latent_dim_100/nerfstudio_models/step-000050000.ckpt``) and return
    the converted flax param tree (``neusky_model.py:272-300`` semantics)."""
    import torch

    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    state = ckpt["pipeline"] if "pipeline" in ckpt else ckpt
    return torch_state_to_params(filter_reni_state_dict(state), config)


# ---------------------------------------------------------------------------
# inverse direction (used by the round-trip test and to EXPORT our trained
# prior for torch consumers)


def params_to_torch_state(params: dict, config: RENIFieldConfig) -> StateDict:
    """Flax ``RENIField`` params → torch-convention state dict (canonical
    names, ``nn.Linear``/``nn.MultiheadAttention`` layouts).  Exact inverse
    of ``torch_state_to_params``."""
    if config.conditioning != "Attention":
        raise NotImplementedError("Attention decoder only (see converter)")
    tree = params["params"] if "params" in params else params
    heads = config.num_attention_heads

    def leaf(path: FlaxPath) -> np.ndarray:
        node = tree
        for p in path:
            node = node[p]
        return np.asarray(node)

    out: StateDict = {}

    def put_linear(torch_name: str, path: FlaxPath):
        out[f"{torch_name}.weight"] = np.ascontiguousarray(leaf(path + ("kernel",)).T)
        out[f"{torch_name}.bias"] = leaf(path + ("bias",))

    def put_ln(torch_name: str, path: FlaxPath):
        out[f"{torch_name}.weight"] = leaf(path + ("scale",))
        out[f"{torch_name}.bias"] = leaf(path + ("bias",))

    put_linear("decoder.query_embed", ("decoder", "query_embed"))
    put_linear("decoder.kv_embed", ("decoder", "kv_embed"))
    put_ln("decoder.norm_out", ("decoder", "LayerNorm_0"))
    put_linear("decoder.out", ("decoder", "out"))
    for i in range(config.num_attention_layers):
        b = ("decoder", f"block_{i}")
        t = f"decoder.blocks.{i}"
        put_ln(f"{t}.norm_q", b + ("LayerNorm_0",))
        put_ln(f"{t}.norm_kv", b + ("LayerNorm_1",))
        put_ln(f"{t}.norm_ff", b + ("LayerNorm_2",))
        put_linear(f"{t}.ff1", b + ("Dense_0",))
        put_linear(f"{t}.ff2", b + ("Dense_1",))
        attn = b + ("MultiHeadDotProductAttention_0",)
        ws, bs = [], []
        for proj in ("query", "key", "value"):
            k = leaf(attn + (proj, "kernel"))  # [H_in, heads, head_dim]
            h_in = k.shape[0]
            ws.append(np.ascontiguousarray(k.reshape(h_in, -1).T))  # [H, H_in]
            bs.append(leaf(attn + (proj, "bias")).reshape(-1))
        out[f"{t}.attn.in_proj_weight"] = np.concatenate(ws, axis=0)
        out[f"{t}.attn.in_proj_bias"] = np.concatenate(bs, axis=0)
        ok = leaf(attn + ("out", "kernel"))  # [heads, head_dim, H]
        out[f"{t}.attn.out_proj.weight"] = np.ascontiguousarray(
            ok.reshape(-1, ok.shape[-1]).T
        )
        out[f"{t}.attn.out_proj.bias"] = leaf(attn + ("out", "bias"))
    return out
