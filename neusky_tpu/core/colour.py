"""Colour-space conversions (reference: ``neusky/utils/utils.py:11-31``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def linear_to_sRGB(color: jnp.ndarray, use_quantile: bool = False) -> jnp.ndarray:
    """Linear RGB → sRGB with final clamp to [0, 1].

    Forward matches the reference exactly (``utils.py:11-31``), including
    the optional 98th-quantile normalisation used for HDR viz.  The final
    clamp is STRAIGHT-THROUGH for gradients: the reference's
    ``torch.clamp`` zeroes gradients at saturated pixels, which (combined
    with the HDR illumination prior's dynamic range) left sky/RGB losses
    with literally zero pull on overexposed regions — a pathology, not a
    semantic to preserve (r2 diagnosis: flat sky loss).
    """
    if use_quantile:
        q = jnp.quantile(color.reshape(-1), 0.98)
        color = color / q
    # safe-where: the pow branch has infinite slope at 0, which would leak
    # NaN through jnp.where autodiff (0·inf) — clamp its (untaken) input
    small = color <= 0.0031308
    safe = jnp.where(small, 0.0031308, jnp.abs(color))
    color = jnp.where(small, 12.92 * color, 1.055 * jnp.power(safe, 1.0 / 2.4) - 0.055)
    clamped = jnp.clip(color, 0.0, 1.0)
    return color + jax.lax.stop_gradient(clamped - color)


def sRGB_to_linear(color: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`linear_to_sRGB` (without the clamp)."""
    return jnp.where(
        color <= 0.04045,
        color / 12.92,
        jnp.power((color + 0.055) / 1.055, 2.4),
    )
