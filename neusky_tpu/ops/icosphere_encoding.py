"""Multi-level icosphere vertex-feature encoding for directions.

A *working* rebuild of the reference's experimental ``IcosphereEncoding``
(``neusky/field_components/encodings.py:6-67`` — dead code there: missing
imports, never exercised; referenced only by the unimplemented
``icosphere_hash`` option at ``directional_distance_field.py:177-181``).

Per level l: an icosphere of increasing order carries a learned feature per
vertex; a direction is encoded by interpolating the features of its K
nearest vertices (inverse-distance weights).  Fixed shapes: the K-NN is a
static top-k over the (small) vertex set per level.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from neusky_tpu.core.spherical import icosphere_vertices


@dataclasses.dataclass(frozen=True)
class IcosphereEncodingConfig:
    num_levels: int = 4
    features_per_level: int = 2
    base_order: int = 1
    k_neighbours: int = 3


class IcosphereEncoding:
    """Functional: ``init(rng) -> tables``, ``__call__(tables, dirs)``."""

    def __init__(self, config: IcosphereEncodingConfig):
        self.config = config
        self.vertices = [
            jnp.asarray(icosphere_vertices(config.base_order + lvl))
            for lvl in range(config.num_levels)
        ]

    @property
    def out_dim(self) -> int:
        return self.config.num_levels * self.config.features_per_level

    def init(self, rng: jax.Array):
        c = self.config
        keys = jax.random.split(rng, c.num_levels)
        return [
            1e-2 * jax.random.normal(k, (v.shape[0], c.features_per_level))
            for k, v in zip(keys, self.vertices)
        ]

    def __call__(self, tables, directions: jnp.ndarray) -> jnp.ndarray:
        c = self.config
        outs = []
        for verts, table in zip(self.vertices, tables):
            cos = directions @ verts.T  # [M, V]
            vals, idx = jax.lax.top_k(cos, c.k_neighbours)  # [M, K]
            # inverse angular-distance weights
            w = 1.0 / (1.0 - jnp.clip(vals, -1.0, 1.0 - 1e-6) + 1e-4)
            w = w / jnp.sum(w, axis=-1, keepdims=True)
            feats = table[idx]  # [M, K, F]
            outs.append(jnp.sum(feats * w[..., None], axis=1))
        return jnp.concatenate(outs, axis=-1)
