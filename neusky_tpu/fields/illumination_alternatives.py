"""Alternative illumination fields: spherical harmonics, spherical
Gaussians, raw environment maps.

The reference supports swapping the RENI++ prior for these
(``neusky_model.py:301-348``): each is a per-image latent → radiance
decoder with the same ``(directions, latents, scale, rotation) → rgb`` +
``unnormalise`` contract, trained in a min-max log domain
(``normalisations={"min_max": None, "log_domain": True}``).

All are trivially vmappable closed forms — no learned decoder weights, so
``fixed_decoder`` semantics are automatic.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from neusky_tpu.ops.encodings import sh_encoding


def _apply_rotation(directions: jnp.ndarray, rotation) -> jnp.ndarray:
    if rotation is None:
        return directions
    if rotation.ndim == 2:
        return directions @ rotation
    return jnp.einsum("mij,mj->mi", rotation, directions)


@dataclasses.dataclass(frozen=True)
class SphericalHarmonicIlluminationField:
    """Latents are SH coefficients [num_sh_coeffs, 3]
    (``neusky_model.py:301-316``); radiance = Σ_k c_k Y_k(d) in log domain."""

    levels: int = 4  # → num_coeffs = levels²
    log_domain: bool = True

    @property
    def num_sh_coeffs(self) -> int:
        return self.levels**2

    @property
    def latent_dim(self) -> int:
        return self.num_sh_coeffs

    def __call__(
        self,
        directions: jnp.ndarray,  # [M, 3]
        latents: jnp.ndarray,  # [M, K, 3] or [K, 3]
        scale: Optional[jnp.ndarray] = None,
        rotation=None,
    ) -> dict:
        directions = _apply_rotation(directions, rotation)
        basis = sh_encoding(directions, self.levels)  # [M, K]
        if latents.ndim == 2:
            latents = jnp.broadcast_to(
                latents[None], (directions.shape[0], *latents.shape)
            )
        rgb = jnp.einsum("mk,mkc->mc", basis, latents)
        if scale is not None:
            rgb = rgb * scale[..., None]
        return {"rgb": rgb}

    def unnormalise(self, rgb: jnp.ndarray) -> jnp.ndarray:
        return jnp.exp(rgb) if self.log_domain else rgb


@dataclasses.dataclass(frozen=True)
class SphericalGaussianField:
    """Latents parameterise ``sg_num`` spherical Gaussian lobes
    (``neusky_model.py:317-332``).  Per lobe the latent row [3] is
    interpreted as (weight_r, weight_g, weight_b) with fixed lobe axes on
    an icosphere and a shared sharpness — a linear-in-latents formulation
    so test-time fitting stays convex-ish."""

    sg_num: int = 24
    sharpness: float = 8.0
    log_domain: bool = True

    @property
    def latent_dim(self) -> int:
        return self.sg_num

    def _axes(self) -> jnp.ndarray:
        from neusky_tpu.core.spherical import icosphere_vertices
        from neusky_tpu.sampling.illumination import icosphere_order_for

        v = icosphere_vertices(icosphere_order_for(self.sg_num))
        return jnp.asarray(v[: self.sg_num])

    def __call__(self, directions, latents, scale=None, rotation=None) -> dict:
        directions = _apply_rotation(directions, rotation)
        axes = self._axes()  # [K, 3]
        # G_k(d) = exp(λ(d·μ_k − 1))
        basis = jnp.exp(self.sharpness * (directions @ axes.T - 1.0))  # [M, K]
        if latents.ndim == 2:
            latents = jnp.broadcast_to(
                latents[None], (directions.shape[0], *latents.shape)
            )
        rgb = jnp.einsum("mk,mkc->mc", basis, latents)
        if scale is not None:
            rgb = rgb * scale[..., None]
        return {"rgb": rgb}

    def unnormalise(self, rgb: jnp.ndarray) -> jnp.ndarray:
        return jnp.exp(rgb) if self.log_domain else rgb


@dataclasses.dataclass(frozen=True)
class EnvironmentMapField:
    """Latents are a raw equirect map [3, H, W]
    (``neusky_model.py:333-348``, latents shaped like ``train_mu``);
    radiance = bilinear lookup in the log domain."""

    height: int = 64
    width: int = 128
    log_domain: bool = True

    @property
    def latent_shape(self):
        return (3, self.height, self.width)

    def __call__(self, directions, latents, scale=None, rotation=None) -> dict:
        directions = _apply_rotation(directions, rotation)
        # direction → equirect pixel coords (matches EquirectangularSampler)
        x, y, z = directions[..., 0], directions[..., 1], directions[..., 2]
        phi = jnp.arccos(jnp.clip(z, -1.0, 1.0))  # [0, π] from +z
        theta = jnp.arctan2(y, x)  # [-π, π]
        v = phi / jnp.pi * self.height - 0.5
        u = (theta + jnp.pi) / (2.0 * jnp.pi) * self.width - 0.5

        v0 = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, self.height - 1)
        v1 = jnp.clip(v0 + 1, 0, self.height - 1)
        u0f = jnp.floor(u)
        u0 = jnp.mod(u0f.astype(jnp.int32), self.width)
        u1 = jnp.mod(u0 + 1, self.width)
        fv = jnp.clip(v - v0, 0.0, 1.0)
        fu = u - u0f

        if latents.ndim == 3:
            latents = jnp.broadcast_to(
                latents[None], (directions.shape[0], *latents.shape)
            )
        m = jnp.arange(directions.shape[0])
        def gather(vi, ui):
            return latents[m, :, vi, ui]  # [M, 3]

        rgb = (
            gather(v0, u0) * ((1 - fv) * (1 - fu))[..., None]
            + gather(v0, u1) * ((1 - fv) * fu)[..., None]
            + gather(v1, u0) * (fv * (1 - fu))[..., None]
            + gather(v1, u1) * (fv * fu)[..., None]
        )
        if scale is not None:
            rgb = rgb * scale[..., None]
        return {"rgb": rgb}

    def unnormalise(self, rgb: jnp.ndarray) -> jnp.ndarray:
        return jnp.exp(rgb) if self.log_domain else rgb
