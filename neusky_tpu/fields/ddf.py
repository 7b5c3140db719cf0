"""Directional Distance Field (DDF): termination distance from a bounding
sphere, per inward direction.

TPU-native rebuild of
``neusky/fields/directional_distance_field.py:47-315``:
  - position/direction encodings: hash / nerf / sh / none;
  - conditioning: Concat→SIREN, FiLM→FiLM-SIREN, Attention→transformer
    decoder (same contracts as the reni components);
  - heads: ``ddf`` (single sigmoid distance) or ``pddf`` (mixture of K
    Diracs, softmax-weighted by visibility-adjusted logits);
  - output scaled to 2·ddf_radius (``directional_distance_field.py:299``).

Inputs are expected already *localised*: the caller rotates directions into
the local frame of each sphere point (see ``models/ddf_model.py
get_localised_transforms`` equivalent) so the net conditions on position
only through the mapping/conditioning branch.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from neusky_tpu.nets.siren import FiLMSiren, Siren
from neusky_tpu.nets.transformer import TransformerDecoder
from neusky_tpu.ops.encodings import nerf_encoding, nerf_encoding_dim, sh_encoding
from neusky_tpu.ops.hashgrid import HashGridConfig, HashGridEncoding

_DDF_HASH = HashGridConfig(
    num_levels=16, features_per_level=2, log2_hashmap_size=19,
    base_res=16, max_res=2048,
)


@dataclasses.dataclass(frozen=True)
class DDFFieldConfig:
    position_encoding_type: str = "hash"  # hash | nerf | sh | none
    direction_encoding_type: str = "nerf"
    hash: HashGridConfig = _DDF_HASH
    """Grid for hash position/direction encodings.  Default matches the
    reference DDF grid (``neusky/configs/neusky_config.py:162-177``: 16
    levels, 2^19 table); shrink via ``NEUSKY_DDF_HASH_LEVELS`` /
    ``NEUSKY_DDF_HASH_LOG2`` for the hash-vs-nerf quality A/B (full-size
    hash measured ≫10× joint-step cost — PERF.md r3)."""
    conditioning: str = "FiLM"  # FiLM | Concat | Attention
    termination_output_activation: str = "sigmoid"  # sigmoid | tanh | relu
    probability_of_hit_output_activation: str = "sigmoid"
    hidden_layers: int = 5
    hidden_features: int = 256
    mapping_layers: int = 5
    mapping_features: int = 256
    num_attention_heads: int = 8
    num_attention_layers: int = 6
    predict_probability_of_hit: bool = False
    ddf_type: str = "ddf"  # ddf | pddf
    num_dirac_components: int = 2
    eta_T: float = 1.0
    epsilon_s: float = 1e-5
    first_omega_0: float = 30.0
    hidden_omega_0: float = 30.0
    use_bf16_compute: bool = True  # MXU bf16 matmuls, fp32 params/accum
    use_bf16_mapping: bool = False
    """bf16 matmuls AND bf16 materialised (freqs, phases) in the FiLM
    mapping network.  The mapping head output is the fattest tensor in the
    visibility chunk loop ([chunk, 2·film·hidden] — f32 was 335 MB per 32k
    chunk, r3 trace); sin arguments stay f32 (upcast fused per layer).
    Throughput-validated (+5.5%: 6,012 vs 5,700 rays/s, quiet box, r3) but
    convergence-quality A/B still pending (r3 advisor finding) — default
    OFF for training entry points; bench.py enables it via
    ``NEUSKY_BF16_MAPPING=1`` (perf-only path).  Flip the default once a
    segmented training A/B shows matched loss/PSNR."""
    film_per_layer_heads: bool = False
    """Compute each FiLM layer's (freq, phase) block as its own
    column-sliced mapping-head matmul instead of one fat [N, 2·film·H]
    output that every layer slices (``nets/siren.py MappingNetwork
    .head_block``).  Numerically identical, unchanged parameter tree;
    removes the dominant materialised tensor of the visibility chunk
    loop.  A/B: ``NEUSKY_FILM_HEADS={0,1}``."""


def _activation(name: str):
    return {"sigmoid": jax.nn.sigmoid, "tanh": jnp.tanh, "relu": jax.nn.relu}[name]


class DirectionalDistanceField(nn.Module):
    """Callable: (origins [M,3] on sphere, localised directions [M,3]) →
    dict with ``expected_termination_dist`` [M] (+ ``probability_of_hit``)."""

    config: DDFFieldConfig
    ddf_radius: float = 1.0

    def setup(self):
        c = self.config
        self._pos_hash = None
        self._dir_hash = None
        if c.position_encoding_type == "hash":
            self._pos_hash = HashGridEncoding(c.hash)
            self.pos_table = self.param("pos_hash_table", self._pos_hash.init)
        if c.direction_encoding_type == "hash":
            self._dir_hash = HashGridEncoding(c.hash)
            self.dir_table = self.param("dir_hash_table", self._dir_hash.init)

        self._n_depth = c.num_dirac_components
        self._n_weight = c.num_dirac_components - 1
        depth_out = 1 if c.ddf_type == "ddf" else self._n_depth + self._n_weight
        out_features = depth_out + (1 if c.predict_probability_of_hit else 0)
        self._out_features = out_features

        if c.conditioning == "Concat":
            self.net = Siren(
                hidden_layers=c.hidden_layers,
                hidden_features=c.hidden_features,
                out_dim=out_features,
                outermost_linear=True,
                first_omega_0=c.first_omega_0,
                hidden_omega_0=c.hidden_omega_0,
            )
        elif c.conditioning == "FiLM":
            self.net = FiLMSiren(
                hidden_layers=c.hidden_layers,
                hidden_features=c.hidden_features,
                mapping_network_layers=c.mapping_layers,
                mapping_network_features=c.mapping_features,
                out_dim=out_features,
                outermost_linear=True,
                compute_dtype=jnp.bfloat16 if c.use_bf16_compute else None,
                mapping_compute_dtype=jnp.bfloat16 if c.use_bf16_mapping else None,
                per_layer_mapping_heads=c.film_per_layer_heads,
            )
        elif c.conditioning == "Attention":
            self.net = TransformerDecoder(
                hidden_features=c.hidden_features,
                num_heads=c.num_attention_heads,
                num_layers=c.num_attention_layers,
                out_dim=out_features,
            )
        else:
            raise ValueError(c.conditioning)

    def _encode_pos(self, origins: jnp.ndarray) -> jnp.ndarray:
        c = self.config
        if c.position_encoding_type == "hash":
            x01 = jnp.clip((origins / self.ddf_radius + 1.0) / 2.0, 0.0, 1.0)
            return jnp.concatenate([origins, self._pos_hash(self.pos_table, x01)], -1)
        if c.position_encoding_type == "nerf":
            return jnp.concatenate([origins, nerf_encoding(origins, 2, 0.0, 2.0)], -1)
        if c.position_encoding_type == "sh":
            return jnp.concatenate([origins, sh_encoding(origins, 4)], -1)
        return origins

    def _encode_dir(self, directions: jnp.ndarray) -> jnp.ndarray:
        c = self.config
        if c.direction_encoding_type == "hash":
            x01 = jnp.clip((directions + 1.0) / 2.0, 0.0, 1.0)
            return jnp.concatenate([directions, self._dir_hash(self.dir_table, x01)], -1)
        if c.direction_encoding_type == "nerf":
            return jnp.concatenate([directions, nerf_encoding(directions, 2, 0.0, 2.0)], -1)
        if c.direction_encoding_type == "sh":
            return jnp.concatenate([directions, sh_encoding(directions, 4)], -1)
        return directions

    def __call__(self, origins: jnp.ndarray, directions: jnp.ndarray) -> dict:
        c = self.config
        pos = self._encode_pos(origins)
        dirs = self._encode_dir(directions)

        if c.conditioning == "Concat":
            raw = self.net(jnp.concatenate([dirs, pos], axis=-1))
        else:  # FiLM & Attention share the (x, conditioning) signature
            raw = self.net(dirs, pos)

        term_act = _activation(c.termination_output_activation)
        outputs = {}
        if c.ddf_type == "pddf":
            # mixture of Diracs (``directional_distance_field.py:278-295``):
            # the reference applies the activation twice — preserved.
            dists = term_act(term_act(raw[..., : self._n_depth]))
            w = raw[..., self._n_depth : self._n_depth + self._n_weight]
            w = jnp.concatenate([w, 1.0 - w], axis=-1)
            logits = c.eta_T * w / (c.epsilon_s + dists)
            exp_dist = jnp.sum(jax.nn.softmax(logits, axis=-1) * dists, axis=-1)
        else:
            exp_dist = term_act(raw[..., 0])

        outputs["expected_termination_dist"] = exp_dist * (2.0 * self.ddf_radius)
        if c.predict_probability_of_hit:
            prob_act = _activation(c.probability_of_hit_output_activation)
            outputs["probability_of_hit"] = prob_act(raw[..., -1])
        return outputs
