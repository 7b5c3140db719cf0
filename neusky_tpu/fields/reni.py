"""RENI++ illumination prior: SO(2)-equivariant HDR sky field.

The reference consumes RENI++ through the (empty-in-snapshot) ``ns_reni``
submodule; the API surface here is reconstructed from every call site
(SURVEY.md §2.3; ``neusky_model.py:68-75,253-300,445-551,1255-1283`` and
``configs/neusky_config.py:78-96``):

  - latent codes ``Z ∈ R^{latent_dim × 3}`` per image — a *set of
    3-vectors*, so a rotation of the sky about z acts on Z by rotating each
    vector: the representation is SO(2)-equivariant by construction;
  - ``forward(directions, latents, scale, rotation) → RGB`` in a normalised
    log-HDR domain; ``unnormalise`` maps to linear HDR radiance;
  - conditioning="Attention": transformer decoder — query from the encoded
    direction, keys/values from per-latent-vector tokens;
  - invariant_function="VN", equivariance="SO2", axis="z": the decoder sees
    only SO(2)-invariant features of (d, Z).

Invariant featurisation (z-axis SO(2)):
  decompose v = (v_xy, v_z).  For each latent vector z_i and direction d the
  jointly-invariant scalars are ⟨z_i,xy, d_xy⟩, det[z_i,xy, d_xy],
  z_i,z, |z_i,xy|; for the direction alone: d_z, |d_xy|.  These are complete
  invariants of the SO(2) action and reduce to the vector-neuron construction
  for this abelian group.

Because the published checkpoint is not available in this environment, the
decoder is trained in-framework (see ``engine/reni_trainer.py``); weights are
then frozen (``fixed_decoder=True`` applies ``stop_gradient`` to decoder
params, reproducing ``hold_decoder_fixed`` at ``neusky_model.py:1535``).

Scale handling: NeuSky optimises a per-image ``scale`` (init 1.0,
``neusky_model.py:264``); we apply it multiplicatively to the latent code,
which is the scale-equivariant conditioning knob of this decoder.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from neusky_tpu.nets.siren import FiLMSiren, Siren
from neusky_tpu.nets.transformer import CrossAttentionBlock
from neusky_tpu.ops.encodings import nerf_encoding


@dataclasses.dataclass(frozen=True)
class RENIFieldConfig:
    conditioning: str = "Attention"  # Attention | FiLM | Concat
    invariant_function: str = "VN"
    equivariance: str = "SO2"
    axis_of_invariance: str = "z"
    positional_encoding: str = "NeRF"
    encoded_input: str = "Directions"
    latent_dim: int = 100
    hidden_features: int = 128
    hidden_layers: int = 9
    mapping_layers: int = 5
    mapping_features: int = 128
    num_attention_heads: int = 8
    num_attention_layers: int = 6
    output_activation: str = "None"
    last_layer_linear: bool = True
    fixed_decoder: bool = True
    trainable_scale: bool = True
    # normalisation of the log-HDR domain (stats of the training corpus)
    log_domain_min: float = -18.0
    log_domain_max: float = 8.0


def so2_invariant_features(
    directions: jnp.ndarray, latents: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Invariant featurisation of (d, Z) under joint rotation about z.

    directions: [M, 3]; latents: [M, D, 3].
    Returns (dir_feats [M, 2], latent_tokens [M, D, 4]).
    """
    # eps inside sqrt: latents initialise to exactly zero
    # (``neusky_model.py:261-263``) and the norm's gradient at 0 is NaN
    def safe_norm(x):
        return jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True) + 1e-12)

    d_xy = directions[..., :2]  # [M, 2]
    d_z = directions[..., 2:3]
    d_xy_norm = safe_norm(d_xy)

    z_xy = latents[..., :2]  # [M, D, 2]
    z_z = latents[..., 2:3]  # [M, D, 1]
    z_xy_norm = safe_norm(z_xy)

    dot = jnp.sum(z_xy * d_xy[:, None, :], axis=-1, keepdims=True)  # [M, D, 1]
    cross = (
        z_xy[..., 0] * d_xy[:, None, 1] - z_xy[..., 1] * d_xy[:, None, 0]
    )[..., None]  # [M, D, 1]

    dir_feats = jnp.concatenate([d_z, d_xy_norm], axis=-1)  # [M, 2]
    latent_tokens = jnp.concatenate([dot, cross, z_z, z_xy_norm], axis=-1)  # [M, D, 4]
    return dir_feats, latent_tokens


class RENIField(nn.Module):
    """RENI++ decoder.  ``__call__(directions, latents, scale, rotation)``
    → dict with ``rgb`` in the normalised log-HDR domain.

    directions: [M, 3] unit; latents: [M, D, 3] or [D, 3];
    scale: [M] or None; rotation: [3,3] or [M,3,3] or None.
    """

    config: RENIFieldConfig

    @nn.compact
    def __call__(
        self,
        directions: jnp.ndarray,
        latents: jnp.ndarray,
        scale: Optional[jnp.ndarray] = None,
        rotation: Optional[jnp.ndarray] = None,
    ) -> dict:
        c = self.config
        m = directions.shape[0]
        if latents.ndim == 2:
            latents = jnp.broadcast_to(latents[None], (m, *latents.shape))
        if rotation is not None:
            if rotation.ndim == 2:  # single [3,3] for all directions
                directions = directions @ rotation
            else:  # per-sample [M, 3, 3] (nerf_osr_envmap eval path)
                directions = jnp.einsum("mij,mj->mi", rotation, directions)
        if scale is not None:
            latents = latents * scale.reshape(-1, 1, 1)

        dir_feats, latent_tokens = so2_invariant_features(directions, latents)
        if c.positional_encoding == "NeRF":
            dir_feats = jnp.concatenate(
                [dir_feats, nerf_encoding(dir_feats, 2, 0.0, 2.0)], axis=-1
            )

        out = _Decoder(config=c, name="decoder")(dir_feats, latent_tokens)
        if c.output_activation == "tanh":
            out = jnp.tanh(out)
        return {"rgb": out}

    def unnormalise(self, rgb: jnp.ndarray) -> jnp.ndarray:
        """Normalised [-1, 1] log-HDR → linear HDR radiance
        (inverse of the min-max log normalisation RENI++ trains under;
        consumed at ``neusky_model.py:504-506``)."""
        c = self.config
        # clamp to the trained domain (decoder outputs can exceed [-1, 1]
        # and would overflow exp) — STRAIGHT-THROUGH gradient: a hard clip
        # zeroes the latent gradient exactly where fits start (measured:
        # the trained prior emits 1.4-2.1 at z=0, so a zero-initialised
        # latent fit received literally zero gradient and the sky loss was
        # a flat line — r2 diagnosis).  Forward values are unchanged.
        clipped = jnp.clip(rgb, -1.0, 1.0)
        rgb = rgb + jax.lax.stop_gradient(clipped - rgb)
        log_val = (rgb + 1.0) / 2.0 * (c.log_domain_max - c.log_domain_min) + c.log_domain_min
        return jnp.exp(log_val)

    def normalise(self, hdr: jnp.ndarray) -> jnp.ndarray:
        c = self.config
        log_val = jnp.log(jnp.maximum(hdr, 1e-8))
        return 2.0 * (log_val - c.log_domain_min) / (c.log_domain_max - c.log_domain_min) - 1.0


def freeze_decoder_params(params):
    """Apply ``stop_gradient`` to a RENI params pytree so only latent codes /
    scales receive gradients — the JAX-native equivalent of
    ``fixed_decoder=True`` / ``hold_decoder_fixed()``
    (``neusky_model.py:1535``).  Call on the params passed to ``apply``."""
    return jax.tree_util.tree_map(jax.lax.stop_gradient, params)


class _Decoder(nn.Module):
    config: RENIFieldConfig

    @nn.compact
    def __call__(self, dir_feats: jnp.ndarray, latent_tokens: jnp.ndarray) -> jnp.ndarray:
        c = self.config
        if c.conditioning == "Attention":
            q = nn.Dense(c.hidden_features, name="query_embed")(dir_feats)[:, None, :]
            kv = nn.Dense(c.hidden_features, name="kv_embed")(latent_tokens)
            for i in range(c.num_attention_layers):
                q = CrossAttentionBlock(
                    c.hidden_features, c.num_attention_heads, name=f"block_{i}"
                )(q, kv)
            h = nn.LayerNorm()(q[:, 0, :])
            return nn.Dense(3, name="out")(h)
        elif c.conditioning == "FiLM":
            flat_latents = latent_tokens.reshape(latent_tokens.shape[0], -1)
            return FiLMSiren(
                hidden_layers=c.hidden_layers,
                hidden_features=c.hidden_features,
                mapping_network_layers=c.mapping_layers,
                mapping_network_features=c.mapping_features,
                out_dim=3,
            )(dir_feats, flat_latents)
        else:  # Concat
            flat_latents = latent_tokens.reshape(latent_tokens.shape[0], -1)
            return Siren(
                hidden_layers=c.hidden_layers,
                hidden_features=c.hidden_features,
                out_dim=3,
                outermost_linear=c.last_layer_linear,
            )(jnp.concatenate([dir_feats, flat_latents], axis=-1))
