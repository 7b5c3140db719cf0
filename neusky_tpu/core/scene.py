"""Scene geometry: SceneBox, colliders, scene contraction.

TPU-native equivalents of the nerfstudio pieces consumed by the reference
(``neusky_model.py:45-46,205-213``): ``SceneBox``, ``AABBBoxCollider``,
``SphereCollider``, ``SceneContraction`` (L2 / Linf order).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from neusky_tpu.core.rays import RayBundle


@struct.dataclass
class SceneBox:
    """Axis-aligned scene bound. ``aabb``: [2, 3] (min row, max row)."""

    aabb: jnp.ndarray

    @classmethod
    def unit_cube(cls, scale: float = 1.0) -> "SceneBox":
        return cls(aabb=jnp.array([[-scale] * 3, [scale] * 3], dtype=jnp.float32))

    def normalize_positions(self, positions: jnp.ndarray) -> jnp.ndarray:
        """Map aabb → [0, 1]³ (for grid encodings)."""
        lo, hi = self.aabb[0], self.aabb[1]
        return (positions - lo) / (hi - lo)


def aabb_collider(ray_bundle: RayBundle, aabb: jnp.ndarray, near_plane: float = 0.05) -> RayBundle:
    """Set nears/fars from ray/AABB intersection (nerfstudio
    ``AABBBoxCollider`` semantics, used at ``neusky_model.py:211``)."""
    o, d = ray_bundle.origins, ray_bundle.directions
    inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-10, jnp.where(d >= 0, 1e-10, -1e-10), d)
    t0 = (aabb[0] - o) * inv_d
    t1 = (aabb[1] - o) * inv_d
    t_near = jnp.max(jnp.minimum(t0, t1), axis=-1, keepdims=True)
    t_far = jnp.min(jnp.maximum(t0, t1), axis=-1, keepdims=True)
    t_near = jnp.clip(t_near, near_plane, None)
    t_far = jnp.maximum(t_far, t_near + 1e-6)
    return ray_bundle.replace(nears=t_near, fars=t_far)


def sphere_collider(
    ray_bundle: RayBundle,
    radius: float = 1.0,
    near_plane: float = 0.05,
    soft_intersect_scale: float = 1.0,
) -> RayBundle:
    """Set nears/fars from ray/sphere intersection (nerfstudio
    ``SphereCollider``, used at ``neusky_model.py:213``).  Rays that miss the
    sphere get a degenerate (near≈far) interval."""
    o, d = ray_bundle.origins, ray_bundle.directions
    b = 2.0 * jnp.sum(o * d, axis=-1, keepdims=True)
    c = jnp.sum(o * o, axis=-1, keepdims=True) - radius**2
    disc = b**2 - 4.0 * c
    hit = disc > 0
    sq = jnp.sqrt(jnp.clip(disc, 0.0, None)) * soft_intersect_scale
    nears = (-b - sq) / 2.0
    fars = (-b + sq) / 2.0
    nears = jnp.where(hit, jnp.clip(nears, near_plane, None), near_plane)
    fars = jnp.where(hit, jnp.maximum(fars, nears + 1e-6), near_plane + 1e-6)
    return ray_bundle.replace(nears=nears, fars=fars)


def contract_l2(positions: jnp.ndarray) -> jnp.ndarray:
    """mip-NeRF-360 scene contraction with the L2 norm
    (``SceneContraction()``; reference config ``neusky_config.py:158``
    selects L2)."""
    mag = jnp.linalg.norm(positions, axis=-1, keepdims=True)
    contracted = (2.0 - 1.0 / jnp.maximum(mag, 1e-12)) * (positions / jnp.maximum(mag, 1e-12))
    return jnp.where(mag <= 1.0, positions, contracted)


def contract_linf(positions: jnp.ndarray) -> jnp.ndarray:
    """Scene contraction with the L-infinity norm
    (``SceneContraction(order=inf)``, ``neusky_model.py:205-206``)."""
    mag = jnp.max(jnp.abs(positions), axis=-1, keepdims=True)
    contracted = (2.0 - 1.0 / jnp.maximum(mag, 1e-12)) * (positions / jnp.maximum(mag, 1e-12))
    return jnp.where(mag <= 1.0, positions, contracted)


def contraction_to_unit_cube(positions: jnp.ndarray, order: str = "l2") -> jnp.ndarray:
    """Contract (range [-2, 2]) then rescale to [0, 1]³ for grid encodings —
    the normalisation nerfstudio applies before hash lookup."""
    c = contract_l2(positions) if order == "l2" else contract_linf(positions)
    return (c + 2.0) / 4.0
