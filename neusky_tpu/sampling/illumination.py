"""Illumination direction samplers: icosphere vertices + equirectangular grid.

Reference contracts:
  - ``IcosahedronSampler`` (``model_components/illumination_samplers.py:85``):
    icosphere vertices, optional random SO(3) rotation per call, optional
    lower-hemisphere removal.  The reni-side config takes ``num_directions``
    (``configs/neusky_config.py:97-101``, 512 directions).
  - ``EquirectangularSampler`` (reni, used at ``neusky_model.py:351,1257``):
    H×W equirect grid of directions (width=128 → height=64).

TPU notes: direction sets are static; hemisphere *removal* would be a
dynamic shape, so we also expose the static upper-hemisphere mask —
the visibility path multiplies by the mask instead of boolean-indexing
(replacing ``neusky_model.py:1650-1659``).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from neusky_tpu.core.spherical import icosphere_vertices, random_rotation_matrix


def icosphere_order_for(num_directions: int) -> int:
    """Smallest icosphere order with ≥ num_directions vertices
    (vertex count = 10·order² + 2); 512 → order 8 (642 vertices is the
    smallest ≥512... order 7 gives 492).  We choose the order whose count is
    closest to the request, matching the spirit of the reni sampler."""
    best, best_err = 1, 1e18
    for order in range(1, 16):
        n = 10 * order * order + 2
        err = abs(n - num_directions)
        if err < best_err:
            best, best_err = order, err
    return best


@dataclasses.dataclass(frozen=True)
class IcosahedronSampler:
    """Static icosphere direction sampler."""

    num_directions: int = 512
    apply_random_rotation: bool = True
    remove_lower_hemisphere: bool = False

    @property
    def directions_np(self) -> np.ndarray:
        return icosphere_vertices(icosphere_order_for(self.num_directions))

    @property
    def actual_num_directions(self) -> int:
        return self.directions_np.shape[0]

    def __call__(self, rng=None, apply_random_rotation=None) -> jnp.ndarray:
        """Direction set [D, 3].  If rotation is applied the set is rotated
        by one random SO(3) matrix (reference ``illumination_samplers.py:
        109-119``).  ``remove_lower_hemisphere`` zeroes nothing here — use
        :meth:`upper_hemisphere_mask` for fixed-shape masking."""
        dirs = jnp.asarray(self.directions_np)
        do_rot = (
            self.apply_random_rotation if apply_random_rotation is None else apply_random_rotation
        )
        if do_rot and rng is not None:
            R = random_rotation_matrix(rng)
            dirs = dirs @ R
        return dirs

    def upper_hemisphere_mask(self, directions: jnp.ndarray) -> jnp.ndarray:
        """[D] float mask of directions with z > 0."""
        return (directions[:, 2] > 0).astype(directions.dtype)


@dataclasses.dataclass(frozen=True)
class EquirectangularSampler:
    """Equirect grid of directions, z-up, [H*W, 3] row-major from the top.

    width → height = width // 2.  Matches the convention of
    ``neusky_tpu.core.spherical.sph2cart`` so decoded envmaps render with
    the zenith at the top row.
    """

    width: int = 128

    @property
    def height(self) -> int:
        return self.width // 2

    def __call__(self) -> jnp.ndarray:
        H, W = self.height, self.width
        phi = (jnp.arange(H) + 0.5) / H * jnp.pi  # polar from +z
        theta = (jnp.arange(W) + 0.5) / W * 2.0 * jnp.pi - jnp.pi
        phi_g, theta_g = jnp.meshgrid(phi, theta, indexing="ij")
        x = jnp.sin(phi_g) * jnp.cos(theta_g)
        y = jnp.sin(phi_g) * jnp.sin(theta_g)
        z = jnp.cos(phi_g)
        return jnp.stack([x, y, z], axis=-1).reshape(-1, 3)

    def solid_angles(self) -> jnp.ndarray:
        """Per-pixel solid angle [H*W] (for integration against envmaps)."""
        H, W = self.height, self.width
        phi = (jnp.arange(H) + 0.5) / H * jnp.pi
        d_phi = jnp.pi / H
        d_theta = 2.0 * jnp.pi / W
        sa = jnp.sin(phi) * d_phi * d_theta  # [H]
        return jnp.tile(sa[:, None], (1, W)).reshape(-1)
