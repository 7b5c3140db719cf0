"""Parameter-free encodings: NeRF frequency encoding and spherical harmonics.

TPU-native equivalents of nerfstudio's ``NeRFEncoding`` / ``SHEncoding``
(consumed at ``sdf_albedo_field.py:133-139`` and
``directional_distance_field.py:183-197``).  Pure functions — XLA fuses these
into the consuming MLP's first matmul.
"""

from __future__ import annotations

import jax.numpy as jnp


def nerf_encoding_dim(in_dim: int, num_frequencies: int, include_input: bool = False) -> int:
    return in_dim * num_frequencies * 2 + (in_dim if include_input else 0)


def nerf_encoding(
    x: jnp.ndarray,
    num_frequencies: int,
    min_freq_exp: float,
    max_freq_exp: float,
    include_input: bool = False,
) -> jnp.ndarray:
    """Sin/cos frequency encoding, nerfstudio semantics.

    nerfstudio scales the input by 2π, then by frequencies
    2^linspace(min_exp, max_exp, F), and emits sin of the scaled value and of
    the value + π/2 (= cos).  Output layout: [..., D*F*2 (+ D)].
    """
    freqs = 2.0 ** jnp.linspace(min_freq_exp, max_freq_exp, num_frequencies)
    scaled = 2.0 * jnp.pi * x[..., None] * freqs  # [..., D, F]
    sin = jnp.sin(scaled)
    cos = jnp.sin(scaled + jnp.pi / 2.0)
    enc = jnp.concatenate([sin, cos], axis=-1).reshape(*x.shape[:-1], -1)
    if include_input:
        enc = jnp.concatenate([enc, x], axis=-1)
    return enc


def sh_encoding(directions: jnp.ndarray, levels: int = 4) -> jnp.ndarray:
    """Real spherical harmonics of unit ``directions`` up to ``levels``
    (degree levels-1), matching nerfstudio ``SHEncoding`` / tcnn ordering.

    Returns [..., levels**2].
    """
    if levels < 1 or levels > 4:
        raise ValueError("sh_encoding supports 1..4 levels")
    x, y, z = directions[..., 0], directions[..., 1], directions[..., 2]
    xx, yy, zz = x * x, y * y, z * z
    xy, yz, xz = x * y, y * z, x * z
    out = [jnp.full_like(x, 0.28209479177387814)]
    if levels > 1:
        out += [
            -0.48860251190291987 * y,
            0.48860251190291987 * z,
            -0.48860251190291987 * x,
        ]
    if levels > 2:
        out += [
            1.0925484305920792 * xy,
            -1.0925484305920792 * yz,
            0.94617469575755997 * zz - 0.31539156525251999,
            -1.0925484305920792 * xz,
            0.54627421529603959 * (xx - yy),
        ]
    if levels > 3:
        out += [
            0.59004358992664352 * y * (-3.0 * xx + yy),
            2.8906114426405538 * xy * z,
            0.45704579946446572 * y * (1.0 - 5.0 * zz),
            0.3731763325901154 * z * (5.0 * zz - 3.0),
            0.45704579946446572 * x * (1.0 - 5.0 * zz),
            1.4453057213202769 * z * (xx - yy),
            0.59004358992664352 * x * (-xx + 3.0 * yy),
        ]
    return jnp.stack(out, axis=-1)
