"""SIREN / FiLM-SIREN / mapping network (flax.linen).

TPU-native rebuild of the SIREN machinery the DDF and RENI++ fields use
(reference local copy ``neusky/utils/siren.py``; consumed via
``reni.field_components.{siren,film_siren}`` at
``directional_distance_field.py:36-38,220-243``).

Initialisation schemes match the reference:
  - SIREN first layer: U(-1/in, 1/in); hidden: U(±sqrt(6/in)/ω);
    forward is sin(ω · (Wx+b))  (``siren.py:27-42``).
  - FiLM mapping network: LeakyReLU(0.2) MLP with kaiming init, last layer
    weights scaled by 0.25 (``siren.py:108-125``); produced frequencies are
    affine-adjusted as f*15 + 30 (``siren.py:200``).
  - FiLM layers: sin(freq · (Wx+b) + phase); frequency_init(25) for hidden,
    U(-1/in, 1/in) for the first layer (``siren.py:185-187``).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def _siren_first_init(rng, shape, dtype=jnp.float32):
    in_dim = shape[0]
    return jax.random.uniform(rng, shape, dtype, -1.0 / in_dim, 1.0 / in_dim)


def _siren_hidden_init(omega: float):
    def init(rng, shape, dtype=jnp.float32):
        in_dim = shape[0]
        bound = np.sqrt(6.0 / in_dim) / omega
        return jax.random.uniform(rng, shape, dtype, -bound, bound)

    return init


def _frequency_init(freq: float):
    def init(rng, shape, dtype=jnp.float32):
        in_dim = shape[0]
        bound = np.sqrt(6.0 / in_dim) / freq
        return jax.random.uniform(rng, shape, dtype, -bound, bound)

    return init


def _kaiming_leaky_init(rng, shape, dtype=jnp.float32):
    # torch kaiming_normal_(a=0.2, fan_in, leaky_relu)
    in_dim = shape[0]
    gain = np.sqrt(2.0 / (1.0 + 0.2**2))
    std = gain / np.sqrt(in_dim)
    return std * jax.random.normal(rng, shape, dtype)


# torch nn.Linear default bias init: U(±1/sqrt(fan_in))
def _torch_bias_init(rng, shape, dtype=jnp.float32, fan_in: int = 1):
    bound = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(rng, shape, dtype, -bound, bound)


class SineLayer(nn.Module):
    features: int
    omega_0: float = 30.0
    is_first: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_dim = x.shape[-1]
        init = _siren_first_init if self.is_first else _siren_hidden_init(self.omega_0)
        w = self.param("kernel", init, (in_dim, self.features))
        b = self.param(
            "bias", lambda r, s: _torch_bias_init(r, s, fan_in=in_dim), (self.features,)
        )
        return jnp.sin(self.omega_0 * (jnp.dot(x, w, preferred_element_type=jnp.float32) + b))


class Siren(nn.Module):
    """SIREN MLP (``siren.py:45-81`` / reni ``Siren``).

    ``in_dim`` is implicit; call signature matches the reni contract at
    ``directional_distance_field.py:222-231``.
    """

    hidden_layers: int
    hidden_features: int
    out_dim: int
    outermost_linear: bool = True
    first_omega_0: float = 30.0
    hidden_omega_0: float = 30.0
    out_activation: Optional[Callable] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = SineLayer(self.hidden_features, self.first_omega_0, is_first=True)(x)
        for _ in range(self.hidden_layers):
            x = SineLayer(self.hidden_features, self.hidden_omega_0)(x)
        if self.outermost_linear:
            in_dim = x.shape[-1]
            w = self.param(
                "out_kernel", _siren_hidden_init(self.hidden_omega_0), (in_dim, self.out_dim)
            )
            b = self.param(
                "out_bias", lambda r, s: _torch_bias_init(r, s, fan_in=in_dim), (self.out_dim,)
            )
            x = jnp.dot(x, w, preferred_element_type=jnp.float32) + b
        else:
            x = SineLayer(self.out_dim, self.hidden_omega_0)(x)
        if self.out_activation is not None:
            x = self.out_activation(x)
        return x


class MappingNetwork(nn.Module):
    """FiLM conditioning mapping network (``siren.py:108-132``): LeakyReLU(0.2)
    MLP emitting concatenated (frequencies, phase_shifts).

    ``compute_dtype=bfloat16``: matmul INPUTS in bf16 with fp32 params and
    fp32 accumulation, and the (freqs, phases) OUTPUTS are returned in bf16
    too — in the DDF visibility loop the mapping head output is the fattest
    materialised tensor ([chunk, 2·film·hidden] — f32 was 335 MB per 32k
    chunk, r3 trace) and halving it halves the loop's dominant HBM traffic.
    Consumers upcast to f32 inside their fusion before the sin modulation."""

    hidden_layers: int
    hidden_features: int
    out_dim: int  # = 2 * n_film_layers * siren_hidden_features
    compute_dtype: Optional[jnp.dtype] = None
    head_block: int = 0
    """When >0 (= the consuming SIREN's hidden width H), ``__call__``
    returns a LIST of per-film-layer (freq_i, phase_i) pairs, each computed
    as its own column-sliced head matmul on the shared trunk — instead of
    ONE [N, out_dim] output that every layer slices.  Numerically identical
    (each output column is the same dot product over the trunk; the
    parameter tree is unchanged — column blocks of the same ``kernel_out``),
    but each small head feeds exactly one sin fusion, so XLA never
    materialises the fat [chunk, out_dim] freqs/phases tensor that
    dominates the visibility loop's HBM traffic (r3 trace: 335 MB f32 per
    32k chunk)."""

    @nn.compact
    def __call__(self, z: jnp.ndarray):
        cdt = self.compute_dtype

        def dot(a, w, b):
            if cdt is not None:
                return jnp.dot(
                    a.astype(cdt), w.astype(cdt), preferred_element_type=jnp.float32
                ) + b
            return jnp.dot(a, w, preferred_element_type=jnp.float32) + b

        x = z
        for i in range(self.hidden_layers):
            in_dim = x.shape[-1]
            w = self.param(f"kernel_{i}", _kaiming_leaky_init, (in_dim, self.hidden_features))
            b = self.param(
                f"bias_{i}",
                lambda r, s, fi=in_dim: _torch_bias_init(r, s, fan_in=fi),
                (self.hidden_features,),
            )
            x = jax.nn.leaky_relu(dot(x, w, b), 0.2)
        in_dim = x.shape[-1]
        w = self.param(
            "kernel_out",
            lambda r, s: _kaiming_leaky_init(r, s) * 0.25,
            (in_dim, self.out_dim),
        )
        b = self.param(
            "bias_out", lambda r, s: _torch_bias_init(r, s, fan_in=in_dim), (self.out_dim,)
        )
        if self.head_block:
            h = self.head_block
            half = self.out_dim // 2
            pairs = []
            for i in range(half // h):
                f = dot(x, w[:, i * h : (i + 1) * h], b[i * h : (i + 1) * h])
                p = dot(
                    x,
                    w[:, half + i * h : half + (i + 1) * h],
                    b[half + i * h : half + (i + 1) * h],
                )
                if cdt is not None:
                    f, p = f.astype(cdt), p.astype(cdt)
                pairs.append((f, p))
            return pairs
        out = dot(x, w, b)
        if cdt is not None:
            out = out.astype(cdt)
        freqs, phases = jnp.split(out, 2, axis=-1)
        return freqs, phases


class FiLMSiren(nn.Module):
    """FiLM-conditioned SIREN (``siren.py:147-208``; reni ``FiLMSiren``
    contract at ``directional_distance_field.py:233-243``).

    ``__call__(x, conditioning_input)``: x is the per-ray input (directions),
    conditioning_input drives the mapping network (positions / latents).

    ``compute_dtype=bfloat16`` runs the matmuls on the MXU at 2× throughput
    with fp32 params and fp32 accumulation (``preferred_element_type``); the
    sin() nonlinearity and FiLM modulation stay fp32.
    """

    hidden_layers: int
    hidden_features: int
    mapping_network_layers: int
    mapping_network_features: int
    out_dim: int
    outermost_linear: bool = True
    out_activation: Optional[Callable] = None
    compute_dtype: Optional[jnp.dtype] = None
    mapping_compute_dtype: Optional[jnp.dtype] = None  # A/B'd separately —
    # bf16 here also shrinks the materialised (freqs, phases) tensors, the
    # dominant HBM traffic of the visibility loop (r3 trace)
    per_layer_mapping_heads: bool = False  # see MappingNetwork.head_block

    @nn.compact
    def __call__(self, x: jnp.ndarray, conditioning_input: jnp.ndarray) -> jnp.ndarray:
        n_film = self.hidden_layers  # film layers: first + (hidden-1) as in ref
        mapped = MappingNetwork(
            hidden_layers=self.mapping_network_layers,
            hidden_features=self.mapping_network_features,
            out_dim=2 * n_film * self.hidden_features,
            compute_dtype=self.mapping_compute_dtype,
            head_block=self.hidden_features if self.per_layer_mapping_heads else 0,
        )(conditioning_input)
        if self.per_layer_mapping_heads:
            pairs = mapped
        else:
            freqs, phases = mapped

        cdt = self.compute_dtype
        h = x
        for i in range(n_film):
            in_dim = h.shape[-1]
            init = _siren_first_init if i == 0 else _frequency_init(25.0)
            w = self.param(f"film_kernel_{i}", init, (in_dim, self.hidden_features))
            b = self.param(
                f"film_bias_{i}",
                lambda r, s, fi=in_dim: _torch_bias_init(r, s, fan_in=fi),
                (self.hidden_features,),
            )
            if cdt is not None:
                lin = jnp.dot(
                    h.astype(cdt), w.astype(cdt), preferred_element_type=jnp.float32
                ) + b
            else:
                lin = jnp.dot(h, w, preferred_element_type=jnp.float32) + b
            # slice THEN upcast: the affine+upcast fuses into the sin
            # consumer per layer, so the materialised mapping output stays
            # bf16 while the sin ARGUMENT is computed in f32 (``siren.py:200``)
            if self.per_layer_mapping_heads:
                f, p = pairs[i]
            else:
                f = freqs[..., i * self.hidden_features : (i + 1) * self.hidden_features]
                p = phases[..., i * self.hidden_features : (i + 1) * self.hidden_features]
            f = f.astype(jnp.float32) * 15.0 + 30.0
            p = p.astype(jnp.float32)
            h = jnp.sin(f * lin + p)

        in_dim = h.shape[-1]
        w = self.param("out_kernel", _frequency_init(25.0), (in_dim, self.out_dim))
        b = self.param(
            "out_bias", lambda r, s: _torch_bias_init(r, s, fan_in=in_dim), (self.out_dim,)
        )
        out = jnp.dot(h, w, preferred_element_type=jnp.float32) + b
        if self.out_activation is not None:
            out = self.out_activation(out)
        return out
