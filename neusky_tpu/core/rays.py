"""Ray containers as fixed-shape pytrees.

TPU-first equivalents of nerfstudio's ``RayBundle`` / ``RaySamples`` /
``Frustums`` (consumed by the reference at
``/root/reference/neusky/models/neusky_model.py:37``).  Everything is a
``flax.struct.dataclass`` so it threads through ``jit`` / ``vmap`` /
``shard_map`` as a pytree with static shapes.

Shape conventions:
    N = number of rays, S = samples per ray.
    RayBundle leaves are ``[N, ...]``; RaySamples leaves are ``[N, S, ...]``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class RayBundle:
    """A bundle of rays (fixed-shape pytree).

    ``directions`` are unit-norm; ``directions_norm`` carries the norm of the
    *pre-normalisation* direction (used to convert point-to-point distance to
    z-depth, reference ``neusky_model.py:593``).
    """

    origins: jnp.ndarray  # [N, 3]
    directions: jnp.ndarray  # [N, 3] unit norm
    pixel_area: jnp.ndarray  # [N, 1]
    camera_indices: jnp.ndarray  # [N, 1] int32
    nears: jnp.ndarray  # [N, 1]
    fars: jnp.ndarray  # [N, 1]
    directions_norm: jnp.ndarray  # [N, 1]

    @property
    def num_rays(self) -> int:
        return self.origins.shape[0]

    @classmethod
    def create(
        cls,
        origins: jnp.ndarray,
        directions: jnp.ndarray,
        pixel_area: Optional[jnp.ndarray] = None,
        camera_indices: Optional[jnp.ndarray] = None,
        nears: Optional[jnp.ndarray] = None,
        fars: Optional[jnp.ndarray] = None,
        directions_norm: Optional[jnp.ndarray] = None,
    ) -> "RayBundle":
        n = origins.shape[0]
        f32 = origins.dtype
        if pixel_area is None:
            pixel_area = jnp.ones((n, 1), f32)
        if camera_indices is None:
            camera_indices = jnp.zeros((n, 1), jnp.int32)
        if nears is None:
            nears = jnp.zeros((n, 1), f32)
        if fars is None:
            fars = jnp.full((n, 1), 1e4, f32)
        if directions_norm is None:
            directions_norm = jnp.ones((n, 1), f32)
        return cls(
            origins=origins,
            directions=directions,
            pixel_area=pixel_area,
            camera_indices=camera_indices.astype(jnp.int32),
            nears=nears,
            fars=fars,
            directions_norm=directions_norm,
        )

    def slice(self, start: int, size: int) -> "RayBundle":
        """Static slice of the ray axis (for chunked full-image renders)."""
        return jax.tree_util.tree_map(
            lambda x: jax.lax.dynamic_slice_in_dim(x, start, size, axis=0), self
        )


@struct.dataclass
class RaySamples:
    """Samples along rays (frustum start/end parameterisation).

    ``spacing_starts``/``spacing_ends`` live in the normalised s-domain
    in [0, 1] used by the proposal sampler and the interlevel loss.
    """

    origins: jnp.ndarray  # [N, S, 3]
    directions: jnp.ndarray  # [N, S, 3]
    starts: jnp.ndarray  # [N, S, 1] euclidean distance along ray
    ends: jnp.ndarray  # [N, S, 1]
    pixel_area: jnp.ndarray  # [N, S, 1]
    camera_indices: jnp.ndarray  # [N, S, 1] int32
    deltas: jnp.ndarray  # [N, S, 1]  (= ends - starts)
    spacing_starts: jnp.ndarray  # [N, S, 1]  s-domain
    spacing_ends: jnp.ndarray  # [N, S, 1]

    @property
    def num_rays(self) -> int:
        return self.origins.shape[0]

    @property
    def num_samples(self) -> int:
        return self.origins.shape[1]

    def start_positions(self) -> jnp.ndarray:
        """Positions at frustum starts — the field-evaluation points.

        Matches nerfstudio ``frustums.get_start_positions()`` used by the
        reference SDF field (``sdf_albedo_field.py:178``).
        """
        return self.origins + self.directions * self.starts

    def mid_positions(self) -> jnp.ndarray:
        return self.origins + self.directions * 0.5 * (self.starts + self.ends)


def weights_and_transmittance_from_alphas(alphas: jnp.ndarray):
    """NeuS compositing: per-sample weights from alpha values.

    ``alphas``: [N, S, 1].  Returns ``(weights [N,S,1], transmittance
    [N,S+1,1])`` where ``transmittance[:, i] = prod_{j<i}(1 - a_j + 1e-7)``;
    the background transmittance is ``transmittance[:, -1]`` (consumed by the
    reference at ``neusky_model.py:565-568``).
    """
    t = jnp.cumprod(
        jnp.concatenate(
            [jnp.ones_like(alphas[:, :1]), 1.0 - alphas + 1e-7], axis=-2
        ),
        axis=-2,
    )
    weights = alphas * t[:, :-1]
    return weights, t


def weights_from_densities(densities: jnp.ndarray, deltas: jnp.ndarray) -> jnp.ndarray:
    """Classic NeRF compositing weights from densities (proposal fields).

    ``densities``/``deltas``: [N, S, 1].
    """
    delta_density = deltas * densities
    alphas = 1.0 - jnp.exp(-delta_density)
    # transmittance: prod of exp(-sum of previous delta_density)
    acc = jnp.cumsum(delta_density[:, :-1], axis=-2)
    acc = jnp.concatenate([jnp.zeros_like(acc[:, :1]), acc], axis=-2)
    transmittance = jnp.exp(-acc)
    weights = alphas * transmittance
    return jnp.nan_to_num(weights)


def render_weighted_sum(weights: jnp.ndarray, values: jnp.ndarray) -> jnp.ndarray:
    """Composite per-sample values along the sample axis: [N,S,1]x[N,S,C]→[N,C]."""
    return jnp.sum(weights * values, axis=-2)


def render_accumulation(weights: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(weights, axis=-2)


def render_depth(weights: jnp.ndarray, ray_samples: RaySamples) -> jnp.ndarray:
    """Expected p2p depth (nerfstudio ``DepthRenderer(method='expected')``
    semantics without the median branch): sum(w * midpoints)/sum(w)."""
    steps = (ray_samples.starts + ray_samples.ends) / 2.0
    eps = 1e-10
    depth = jnp.sum(weights * steps, axis=-2) / (jnp.sum(weights, axis=-2) + eps)
    depth = jnp.clip(depth, steps.min(axis=-2), steps.max(axis=-2))
    return depth


def render_normal(weights: jnp.ndarray, normals: jnp.ndarray) -> jnp.ndarray:
    """Semantic-style renderer used by the reference for normals
    (``neusky_model.py:812``): plain weighted sum, no normalisation."""
    return jnp.sum(weights * normals, axis=-2)


def render_rgb_with_background(
    weights: jnp.ndarray, rgb: jnp.ndarray, background_color: jnp.ndarray
) -> jnp.ndarray:
    """RGBRenderer semantics with a constant background colour blend."""
    comp = jnp.sum(weights * rgb, axis=-2)
    acc = jnp.sum(weights, axis=-2)
    return comp + background_color * (1.0 - acc)
