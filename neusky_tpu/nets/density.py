"""NeuS / VolSDF density heads: LearnedVariance, LaplaceDensity, alpha calc.

References: nerfstudio ``LearnedVariance`` (inherited at
``sdf_albedo_field.py:145``), ``LaplaceDensity``
(``sdf_albedo_field.py:46-68``), and nerfstudio ``SDFField.get_alpha``
(called at ``sdf_albedo_field.py:266``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class LearnedVariance(nn.Module):
    """Single-parameter NeuS variance network: inv_s = exp(10 * s)."""

    init_val: float = 0.1

    @nn.compact
    def __call__(self) -> jnp.ndarray:
        variance = self.param(
            "variance", lambda rng, shape: jnp.full(shape, self.init_val), (1,)
        )
        return jnp.clip(jnp.exp(variance * 10.0), 1e-6, 1e6)


def learned_variance_inv_s(params) -> jnp.ndarray:
    """inv_s from raw params pytree (for metrics: s_val, ``neusky_model.py:1071``)."""
    return jnp.clip(jnp.exp(params["params"]["variance"] * 10.0), 1e-6, 1e6)


class LaplaceDensity(nn.Module):
    """VolSDF Laplace density (``sdf_albedo_field.py:46-68``):
    density = α · Laplace(0, β).cdf(-sdf), α = 1/β, β learnable."""

    init_val: float = 0.1
    beta_min: float = 1e-4

    @nn.compact
    def __call__(self, sdf: jnp.ndarray, beta=None) -> jnp.ndarray:
        beta_param = self.param(
            "beta", lambda rng, shape: jnp.full(shape, self.init_val), (1,)
        )
        if beta is None:
            beta = jnp.abs(beta_param) + self.beta_min
        alpha = 1.0 / beta
        return alpha * (0.5 + 0.5 * jnp.sign(sdf) * jnp.expm1(-jnp.abs(sdf) / beta))


def neus_alpha(
    sdf: jnp.ndarray,
    gradients: jnp.ndarray,
    directions: jnp.ndarray,
    deltas: jnp.ndarray,
    inv_s: jnp.ndarray,
    cos_anneal_ratio: float = 1.0,
) -> jnp.ndarray:
    """NeuS alpha from SDF + spatial gradient (nerfstudio ``get_alpha``).

    sdf/deltas: [N, S, 1]; gradients/directions: [N, S, 3].
    """
    true_cos = jnp.sum(directions * gradients, axis=-1, keepdims=True)
    # always non-positive, annealed from "half vector" to true cos
    iter_cos = -(
        jax.nn.relu(-true_cos * 0.5 + 0.5) * (1.0 - cos_anneal_ratio)
        + jax.nn.relu(-true_cos) * cos_anneal_ratio
    )
    est_next_sdf = sdf + iter_cos * deltas * 0.5
    est_prev_sdf = sdf - iter_cos * deltas * 0.5
    prev_cdf = jax.nn.sigmoid(est_prev_sdf * inv_s)
    next_cdf = jax.nn.sigmoid(est_next_sdf * inv_s)
    p = prev_cdf - next_cdf
    c = prev_cdf
    return jnp.clip((p + 1e-5) / (c + 1e-5), 0.0, 1.0)
