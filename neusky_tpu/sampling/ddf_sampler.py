"""DDF training-ray samplers on the bounding sphere.

Reference contracts (``model_components/ddf_sampler.py``):
  - ``UniformDDFSampler``: positions uniform on the sphere (optionally
    upper hemisphere), directions uniform in the inward hemisphere;
  - ``VMFDDFSampler``: directions ~ von Mises-Fisher concentrated toward
    the sphere centre (κ=20 in the canonical config,
    ``configs/neusky_config.py:207-212``).

TPU-native: the reference's Wood rejection sampler for the vMF marginal
(``ddf_sampler.py:205-223``) is replaced by the *exact closed-form inverse
CDF* available in 3D:  W = 1 + (1/κ)·log(u + (1-u)·e^(-2κ)) — fixed shape,
no rejection loop.  Upper-hemisphere enforcement is a sign flip
(``jnp.where``), not boolean indexing.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from neusky_tpu.core.rays import RayBundle
from neusky_tpu.core.spherical import (
    random_inward_facing_directions,
    random_points_on_unit_sphere,
)


@dataclasses.dataclass(frozen=True)
class DDFSamplerConfig:
    num_samples_on_sphere: int = 8
    num_rays_per_sample: int = 128
    only_sample_upper_hemisphere: bool = True
    concentration: float = 20.0  # vMF kappa


def _positions_on_sphere(
    rng: jax.Array, num_positions: int, upper_only: bool
) -> jnp.ndarray:
    p = random_points_on_unit_sphere(rng, num_positions)
    if upper_only:
        p = p.at[:, 2].set(jnp.abs(p[:, 2]))
    return p


def sample_vmf(
    rng: jax.Array, mean_directions: jnp.ndarray, kappa: float, num_samples: int
) -> jnp.ndarray:
    """Sample from vMF(μ, κ) on S² for each mean direction.

    mean_directions: [P, 3] (unit).  Returns [P, num_samples, 3].
    Uses the exact 3D inverse-CDF for the cosine marginal:
        W = 1 + log(u + (1-u)·e^(-2κ)) / κ,  u ~ U(0,1),
    then a uniform tangent direction scaled by sqrt(1-W²).
    """
    P = mean_directions.shape[0]
    k_u, k_t = jax.random.split(rng)
    mu = mean_directions / jnp.linalg.norm(mean_directions, axis=-1, keepdims=True)

    u = jax.random.uniform(k_u, (P, num_samples), minval=1e-7, maxval=1.0)
    w = 1.0 + jnp.log(u + (1.0 - u) * jnp.exp(-2.0 * kappa)) / kappa  # [P, M]
    w = jnp.clip(w, -1.0, 1.0)

    # random unit tangent vectors perpendicular to mu
    z = jax.random.normal(k_t, (P, num_samples, 3))
    z = z - jnp.sum(z * mu[:, None, :], axis=-1, keepdims=True) * mu[:, None, :]
    z = z / jnp.maximum(jnp.linalg.norm(z, axis=-1, keepdims=True), 1e-12)

    sin_theta = jnp.sqrt(jnp.clip(1.0 - w**2, 0.0, None))
    x = z * sin_theta[..., None] + w[..., None] * mu[:, None, :]
    return x / jnp.linalg.norm(x, axis=-1, keepdims=True)


def _build_bundle(
    positions: jnp.ndarray, directions: jnp.ndarray, radius: float
) -> RayBundle:
    """positions [P,3] on unit sphere, directions [P,M,3] → flat RayBundle
    of P·M rays with origins scaled to the DDF radius."""
    P, M = directions.shape[:2]
    origins = jnp.repeat(positions * radius, M, axis=0)
    dirs = directions.reshape(-1, 3)
    return RayBundle.create(origins=origins, directions=dirs)


def uniform_ddf_samples(
    rng: jax.Array,
    config: DDFSamplerConfig,
    ddf_sphere_radius: float = 1.0,
    num_positions: Optional[int] = None,
    num_directions: Optional[int] = None,
    positions: Optional[jnp.ndarray] = None,
) -> RayBundle:
    """Uniform inward-hemisphere sampler (``ddf_sampler.py:119-180``)."""
    num_p = num_positions or config.num_samples_on_sphere
    num_d = num_directions or config.num_rays_per_sample
    k_p, k_d = jax.random.split(rng)
    if positions is None:
        positions = _positions_on_sphere(k_p, num_p, config.only_sample_upper_hemisphere)
    dirs = random_inward_facing_directions(k_d, num_d, normals=-positions)
    return _build_bundle(positions, dirs, ddf_sphere_radius)


def vmf_ddf_samples(
    rng: jax.Array,
    config: DDFSamplerConfig,
    ddf_sphere_radius: float = 1.0,
    num_positions: Optional[int] = None,
    num_directions: Optional[int] = None,
    positions: Optional[jnp.ndarray] = None,
) -> RayBundle:
    """vMF sampler concentrated toward the sphere centre
    (``ddf_sampler.py:193-286``).  Directions not in the inward hemisphere
    are sign-flipped, as in the reference (``ddf_sampler.py:262-266``)."""
    num_p = num_positions or config.num_samples_on_sphere
    num_d = num_directions or config.num_rays_per_sample
    k_p, k_d = jax.random.split(rng)
    if positions is None:
        positions = _positions_on_sphere(k_p, num_p, config.only_sample_upper_hemisphere)
    dirs = sample_vmf(k_d, -positions, config.concentration, num_d)  # [P, M, 3]
    dots = jnp.sum(dirs * (-positions)[:, None, :], axis=-1, keepdims=True)
    dirs = jnp.where(dots < 0, -dirs, dirs)
    return _build_bundle(positions, dirs, ddf_sphere_radius)
