"""Transformer decoder for attention conditioning (flax.linen).

Rebuild of ``reni.field_components.transformer_decoder.Decoder`` from its
call-site contract (``directional_distance_field.py:244-253``): queries come
from the per-ray input ``x``, keys/values from ``conditioning_input`` (a
single conditioning token for the DDF, or a sequence of latent tokens for the
RENI++ field).  Pre-LN cross-attention blocks with GELU FFNs.

TPU notes: attention here is tiny (T ≤ ~100 latent tokens, single query) —
the cost is the projections, which are MXU matmuls; batch over rays with
plain batching (no flash attention needed).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp
from flax import linen as nn


class CrossAttentionBlock(nn.Module):
    hidden_features: int
    num_heads: int

    @nn.compact
    def __call__(self, q_tokens: jnp.ndarray, kv_tokens: jnp.ndarray) -> jnp.ndarray:
        # q_tokens: [..., Q, H], kv_tokens: [..., T, H]
        h = nn.LayerNorm()(q_tokens)
        kv = nn.LayerNorm()(kv_tokens)
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            qkv_features=self.hidden_features,
            out_features=self.hidden_features,
        )(h, kv)
        x = q_tokens + attn
        h = nn.LayerNorm()(x)
        h = nn.Dense(4 * self.hidden_features)(h)
        h = nn.gelu(h)
        h = nn.Dense(self.hidden_features)(h)
        return x + h


class TransformerDecoder(nn.Module):
    """``Decoder(in_dim, conditioning_input_dim, hidden_features, num_heads,
    num_layers, out_activation)`` equivalent."""

    hidden_features: int
    num_heads: int
    num_layers: int
    out_dim: int
    out_activation: Optional[Callable] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, conditioning_input: jnp.ndarray) -> jnp.ndarray:
        """x: [N, in_dim] (one query per element);
        conditioning_input: [N, cond_dim] or [N, T, cond_dim]."""
        if conditioning_input.ndim == x.ndim:
            kv = conditioning_input[..., None, :]
        else:
            kv = conditioning_input
        q = nn.Dense(self.hidden_features, name="query_embed")(x)[..., None, :]
        kv = nn.Dense(self.hidden_features, name="kv_embed")(kv)
        for i in range(self.num_layers):
            q = CrossAttentionBlock(
                self.hidden_features, self.num_heads, name=f"block_{i}"
            )(q, kv)
        q = nn.LayerNorm()(q)
        out = nn.Dense(self.out_dim, name="out")(q[..., 0, :])
        if self.out_activation is not None:
            out = self.out_activation(out)
        return out
