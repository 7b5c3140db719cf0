"""Proposal density field: hash grid + tiny MLP → density.

TPU-native equivalent of nerfstudio's ``HashMLPDensityField`` (two of these
drive the proposal sampler inherited by the reference via ``NeuSFactoModel``,
``neusky_model.py:561``: ``self.proposal_sampler(..., density_fns)``).

Density = trunc_exp(mlp(hash(contract(x))) - 1); trunc_exp clamps the
exponent for stable gradients.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from neusky_tpu.core.scene import contraction_to_unit_cube
from neusky_tpu.ops.hashgrid import HashGridConfig, HashGridEncoding


def trunc_exp(x: jnp.ndarray, cap: float = 15.0) -> jnp.ndarray:
    """exp with clamped input (straight-through style stability)."""
    return jnp.exp(jnp.clip(x, -cap, cap))


@dataclasses.dataclass(frozen=True)
class DensityFieldConfig:
    hidden_dim: int = 16
    num_layers: int = 2
    hash: HashGridConfig = HashGridConfig(
        num_levels=5, features_per_level=2, log2_hashmap_size=17,
        base_res=16, max_res=128,
    )
    contraction_order: str = "l2"  # "l2" | "linf" (neusky uses L2)
    stochastic_table_grad: bool = True
    """Stochastic-corner hash-table gradient (exact forward, one sampled
    scatter row per sample/level instead of 8 — unbiased, 8× less scatter
    work; proposal-field positions are stop-gradient bins so the zero
    w-cotangent is exact).  Active only when the caller passes an rng."""
    stochastic_forward: bool = True
    """Sample the SAME single corner in the forward too (unbiased dither of
    the trilinear interpolation, 8× fewer gather rows — the proposal
    forward gather was the largest single site of the traced step, ~58 ms).
    The density only guides PDF resampling, which is already stochastic.
    Requires ``stochastic_table_grad`` + an rng; exact trilinear otherwise."""


class HashMLPDensityField(nn.Module):
    """Callable: positions [N, S, 3] (world) → densities [N, S, 1]."""

    config: DensityFieldConfig

    def setup(self):
        self.encoding = HashGridEncoding(self.config.hash)
        self.table = self.param("hash_table", self.encoding.init)
        layers = []
        for i in range(self.config.num_layers - 1):
            layers.append(nn.Dense(self.config.hidden_dim, name=f"dense_{i}"))
        layers.append(nn.Dense(1, name="dense_out"))
        self.layers = layers

    def __call__(self, positions: jnp.ndarray, rng=None) -> jnp.ndarray:
        shape = positions.shape[:-1]
        x = positions.reshape(-1, 3)
        x = contraction_to_unit_cube(x, self.config.contraction_order)
        stoch_u = None
        if rng is not None and self.config.stochastic_table_grad:
            stoch_u = jax.random.uniform(rng, (x.shape[0],))
        # reverse-only context → Pallas-backed table gather (fast backward)
        h = self.encoding(
            self.table, x, custom_take=True, stoch_u=stoch_u,
            stoch_fwd=self.config.stochastic_forward,
        )
        for layer in self.layers[:-1]:
            h = nn.relu(layer(h))
        out = self.layers[-1](h)
        density = trunc_exp(out - 1.0)
        return density.reshape(*shape, 1)
