"""MLP building blocks (flax.linen): weight-normalised dense layers and the
geometric SDF initialisation.

Equivalent behaviour to the reference's torch ``nn.Linear`` stacks with
``nn.utils.weight_norm`` (``sdf_albedo_field.py:155-163``) and nerfstudio's
``SDFField.initialize_geo_layers`` geometric init (inherited at
``sdf_albedo_field.py:142``).

TPU notes: matmuls run on the MXU.  ``compute_dtype`` lets callers drop to
bfloat16 for bandwidth-bound nets while keeping fp32 params.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def softplus_beta(x: jnp.ndarray, beta: float = 100.0) -> jnp.ndarray:
    """torch ``nn.Softplus(beta)`` with its overflow guard: linear above
    threshold 20/beta (reference uses beta=100, ``sdf_albedo_field.py:163``).

    The untaken exp branch is clamped so its (discarded) gradient cannot
    produce inf·0 = NaN under ``jnp.where`` autodiff.
    """
    big = x * beta > 20.0
    safe_x = jnp.where(big, 0.0, x)
    return jnp.where(big, x, jnp.log1p(jnp.exp(beta * safe_x)) / beta)


class WNDense(nn.Module):
    """Dense layer with optional weight normalisation.

    With ``weight_norm=True`` the effective kernel is
    ``g * v / ||v||_row`` (norm over the input axis, matching torch's
    ``weight_norm`` default dim=0 on a [out, in] weight).
    """

    features: int
    weight_norm: bool = False
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros_init()
    compute_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_dim = x.shape[-1]
        v = self.param("kernel", self.kernel_init, (in_dim, self.features))
        b = self.param("bias", self.bias_init, (self.features,))
        if self.weight_norm:
            # g initialised to ||v|| so the initial function equals plain init
            g = self.param(
                "scale",
                lambda rng, shape: jnp.linalg.norm(v, axis=0),
                (self.features,),
            )
            kernel = g * v / (jnp.linalg.norm(v, axis=0, keepdims=True) + 1e-12)
        else:
            kernel = v
        dtype = self.compute_dtype or x.dtype
        y = jnp.dot(x.astype(dtype), kernel.astype(dtype), preferred_element_type=jnp.float32)
        return y + b


class MLP(nn.Module):
    """Plain MLP: hidden layers with ``activation``, optional out activation."""

    hidden_features: Sequence[int]
    out_features: int
    activation: Callable = nn.relu
    out_activation: Optional[Callable] = None
    weight_norm: bool = False
    compute_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, h in enumerate(self.hidden_features):
            x = WNDense(h, weight_norm=self.weight_norm, compute_dtype=self.compute_dtype, name=f"dense_{i}")(x)
            x = self.activation(x)
        x = WNDense(
            self.out_features,
            weight_norm=self.weight_norm,
            compute_dtype=self.compute_dtype,
            name=f"dense_{len(self.hidden_features)}",
        )(x)
        if self.out_activation is not None:
            x = self.out_activation(x)
        return x


def geometric_geo_mlp_init(
    layer_index: int,
    num_linear_layers: int,
    in_dim_layer: int,
    out_dim_layer: int,
    raw_in_dim: int,
    bias: float,
    inside_outside: bool,
) -> Tuple[Callable, Callable]:
    """(kernel_init, bias_init) for layer ``layer_index`` of the SDF geo MLP.

    Reproduces nerfstudio's geometric initialisation (SAL/IGR style) used by
    the reference's inherited ``initialize_geo_layers``:
      - last layer: weights ~ N(±sqrt(π)/sqrt(in_dim), 1e-4), bias ∓bias so
        the initial SDF approximates a sphere of radius ``bias``;
      - first layer: N(0, sqrt(2)/sqrt(out)) on the 3 position dims, zeros on
        the encoding dims, zero bias;
      - middle layers: N(0, sqrt(2)/sqrt(out)), zero bias.
    ``inside_outside=False`` (outdoor scenes, config ``neusky_config.py:75``)
    gives SDF > 0 outside the sphere.
    """
    sign = -1.0 if inside_outside else 1.0

    if layer_index == num_linear_layers - 1:
        mean = sign * np.sqrt(np.pi) / np.sqrt(in_dim_layer)

        def kernel_init(rng, shape, dtype=jnp.float32):
            return mean + 1e-4 * jax.random.normal(rng, shape, dtype)

        def bias_init(rng, shape, dtype=jnp.float32):
            return jnp.full(shape, -sign * bias, dtype)

    elif layer_index == 0:

        def kernel_init(rng, shape, dtype=jnp.float32):
            std = np.sqrt(2.0) / np.sqrt(out_dim_layer)
            w = std * jax.random.normal(rng, shape, dtype)
            # zero the encoded-input part; keep the raw xyz part
            mask = jnp.zeros(shape, dtype).at[:raw_in_dim, :].set(1.0)
            return w * mask

        bias_init = nn.initializers.zeros_init()

    else:

        def kernel_init(rng, shape, dtype=jnp.float32):
            std = np.sqrt(2.0) / np.sqrt(out_dim_layer)
            return std * jax.random.normal(rng, shape, dtype)

        bias_init = nn.initializers.zeros_init()

    return kernel_init, bias_init
