"""SDF + albedo field: hash-grid geometry network with analytic spatial
gradients and a position-conditioned albedo head.

TPU-native rebuild of the reference ``SDFAlbedoField``
(``neusky/fields/sdf_albedo_field.py:80-282``, which inherits geometry
machinery from nerfstudio ``SDFField``):

  - geometry net: [xyz, NeRF-PE(6 freqs), hash features] → softplus(β=100)
    MLP (weight-normalised, geometric init) → [sdf, geo_feat(256)];
  - spatial gradient via ``jax.grad`` of the summed SDF (one reverse pass;
    the reference uses torch autograd, ``sdf_albedo_field.py:231-238``) —
    the gradient remains differentiable for the eikonal loss;
  - colour net: [xyz, PE, geo_feat] → ReLU MLP → sigmoid albedo
    (+ optional shininess channel, ``predict_shininess``);
  - NeuS alpha from SDF + gradient + LearnedVariance
    (``sdf_albedo_field.py:266``).

TPU notes: all matmuls are batched [N·S, ·] MXU ops; the hash encode is the
bandwidth hot spot (see ``ops/hashgrid.py``).  ``jax.checkpoint`` is applied
to the geometry network inside the gradient computation so the double
backward does not blow up VMEM/HBM.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from neusky_tpu.core.rays import RaySamples
from neusky_tpu.core.scene import contraction_to_unit_cube
from neusky_tpu.nets.density import neus_alpha
from neusky_tpu.nets.mlp import WNDense, geometric_geo_mlp_init, softplus_beta
from neusky_tpu.ops.encodings import nerf_encoding, nerf_encoding_dim
from neusky_tpu.ops.hashgrid import HashGridConfig, HashGridEncoding


@dataclasses.dataclass(frozen=True)
class SDFAlbedoFieldConfig:
    num_layers: int = 2
    hidden_dim: int = 256
    geo_feat_dim: int = 256
    num_layers_color: int = 2
    hidden_dim_color: int = 256
    bias: float = 0.1  # initial sphere radius of the geometric init
    beta_init: float = 0.1  # LearnedVariance init
    use_grid_feature: bool = True
    inside_outside: bool = False
    weight_norm: bool = True
    predict_shininess: bool = False
    hash: HashGridConfig = HashGridConfig()
    contraction_order: str = "l2"
    position_encoding_freqs: int = 6  # NeRF PE, no input passthrough
    use_position_encoding: bool = True
    gradient_mode: str = "forward"  # forward (3×JVP) | reverse (jax.grad)
    # forward is the default: numerically identical (tested), and the
    # reverse-mode grad-of-grad structure crashes the TPU compiler at full
    # model scale (SIGILL in tpu_compile_helper) while forward-over-reverse
    # compiles in ~85s.
    stochastic_table_grads: bool = False
    """Sample ONE corner per (sample, level) for the hash-table gradient
    (unbiased, 8x fewer scatter rows — scatter-add is the dominant step
    cost on TPU, PERF.md).  Forward values, analytic spatial gradients, and
    position cotangents stay EXACT.  Enabled in the canonical config;
    requires the caller to thread a per-step ``stoch_salt``."""
    use_bf16_compute: bool = False
    """bf16 matmuls (fp32 params/accumulation) in the geometry and colour
    MLPs — 2× MXU rate, half the activation bandwidth.  SDF values and
    gradients stay fp32 at the layer boundaries (preferred_element_type)."""
    stochastic_dxt: bool = False
    """With ``stochastic_table_grads``: also sample ONE uniform corner for
    the hash-encode POSITION cotangent in ``sdf_only`` (×8 weight, unbiased)
    instead of the exact 8-corner feature re-gather in backward.  Affects
    only the sdf-level-set path (∂sdf/∂x·∂x/∂DDF through termination
    points, reference ``ddf_model.py:241-251``) — a path that is already a
    strided stochastic subset of directions.  A/B: ``NEUSKY_STOCH_DXT``."""


class SDFAlbedoField(nn.Module):
    """Flax module. Entry points:

      - ``geo(positions)`` → (sdf [M,1], geo_feat [M,G])
      - ``sdf_only(positions)`` → [M,1]  (reference ``get_sdf_at_pos``)
      - ``colour(positions, geo_feat)`` → [M, 3(+1)]
      - ``field_outputs(ray_samples, inv_s, ...)`` → dict (the per-sample
        forward used by the model)
    """

    config: SDFAlbedoFieldConfig

    def setup(self):
        c = self.config
        self.encoding = HashGridEncoding(c.hash)
        if c.use_grid_feature:
            self.hash_table = self.param("hash_table", self.encoding.init)
        pe_dim = (
            nerf_encoding_dim(3, c.position_encoding_freqs)
            if c.use_position_encoding
            else 0
        )
        grid_dim = self.encoding.out_dim if c.use_grid_feature else 0
        in_dim = 3 + pe_dim + grid_dim

        cdt = jnp.bfloat16 if c.use_bf16_compute else None
        # geometry layers with geometric init
        dims = [in_dim] + [c.hidden_dim] * c.num_layers + [1 + c.geo_feat_dim]
        n_lin = len(dims) - 1
        geo_layers = []
        for l in range(n_lin):
            k_init, b_init = geometric_geo_mlp_init(
                layer_index=l,
                num_linear_layers=n_lin,
                in_dim_layer=dims[l],
                out_dim_layer=dims[l + 1],
                raw_in_dim=3,
                bias=c.bias,
                inside_outside=c.inside_outside,
            )
            geo_layers.append(
                WNDense(
                    dims[l + 1],
                    weight_norm=c.weight_norm,
                    kernel_init=k_init,
                    bias_init=b_init,
                    compute_dtype=cdt,
                    name=f"geo_{l}",
                )
            )
        self.geo_layers = geo_layers

        # colour layers
        col_in = 3 + pe_dim + c.geo_feat_dim
        col_out = 4 if c.predict_shininess else 3
        col_dims = [col_in] + [c.hidden_dim_color] * c.num_layers_color + [col_out]
        self.colour_layers = [
            WNDense(
                col_dims[l + 1], weight_norm=c.weight_norm,
                compute_dtype=cdt, name=f"col_{l}",
            )
            for l in range(len(col_dims) - 1)
        ]

        # NeuS deviation (inv_s = exp(10 * s))
        self.variance = self.param(
            "variance", lambda rng, shape: jnp.full(shape, c.beta_init), (1,)
        )

    def __call__(self, positions: jnp.ndarray):
        """Init-friendly entry point touching every parameter:
        (sdf, albedo, inv_s) at ``positions`` [M, 3]."""
        sdf, geo_feat = self.geo(positions)
        colours = self.colour(positions, geo_feat)
        return sdf, colours, self.inv_s()

    # ---- geometry ----

    def _geo_input(
        self,
        positions: jnp.ndarray,
        custom_take: bool = False,
        stoch_salt=None,
    ) -> jnp.ndarray:
        c = self.config
        feats = [positions]
        if c.use_position_encoding:
            feats.append(
                nerf_encoding(
                    positions, c.position_encoding_freqs, 0.0,
                    float(c.position_encoding_freqs - 1),
                )
            )
        if c.use_grid_feature:
            x01 = contraction_to_unit_cube(positions, c.contraction_order)
            feats.append(
                self.encoding(
                    self.hash_table, x01, custom_take=custom_take,
                    stoch_salt=stoch_salt,
                    stoch_dxt=(c.stochastic_dxt and stoch_salt is not None),
                )
            )
        return jnp.concatenate(feats, axis=-1)

    def _geo_mlp(self, h: jnp.ndarray) -> jnp.ndarray:
        """The geometry MLP proper (post-encoding): [M, in] → [M, 1+G]."""
        for i, layer in enumerate(self.geo_layers):
            h = layer(h)
            if i < len(self.geo_layers) - 1:
                h = softplus_beta(h, 100.0)
        return h

    def geo(
        self, positions: jnp.ndarray, custom_take: bool = False, stoch_salt=None
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """positions [M, 3] → (sdf [M, 1], geo_feat [M, G])."""
        h = self._geo_mlp(self._geo_input(positions, custom_take, stoch_salt))
        return h[..., :1], h[..., 1:]

    def sdf_only(self, positions: jnp.ndarray, stoch_salt=None) -> jnp.ndarray:
        """Reference ``get_sdf_at_pos`` (``sdf_albedo_field.py:169-174``).

        First-order reverse-mode context → Pallas-backed table gather.
        ``stoch_salt``: 1-corner stochastic table gradient (exact value and
        position cotangent — the level-set loss path stays exact)."""
        return self.geo(positions.reshape(-1, 3), custom_take=True,
                        stoch_salt=stoch_salt)[0]

    def inv_s(self) -> jnp.ndarray:
        return jnp.clip(jnp.exp(self.variance * 10.0), 1e-6, 1e6)

    # ---- colour ----

    def colour(self, positions: jnp.ndarray, geo_feat: jnp.ndarray) -> jnp.ndarray:
        c = self.config
        feats = [positions]
        if c.use_position_encoding:
            feats.append(
                nerf_encoding(
                    positions, c.position_encoding_freqs, 0.0,
                    float(c.position_encoding_freqs - 1),
                )
            )
        feats.append(geo_feat)
        h = jnp.concatenate(feats, axis=-1)
        for i, layer in enumerate(self.colour_layers):
            h = layer(h)
            if i < len(self.colour_layers) - 1:
                h = nn.relu(h)
        return nn.sigmoid(h)

    # ---- full forward over ray samples ----

    def field_outputs(
        self,
        ray_samples: RaySamples,
        return_alphas: bool = False,
        cos_anneal_ratio: float = 1.0,
        stoch_salt=None,
    ) -> dict:
        """Per-sample outputs (reference ``get_outputs``,
        ``sdf_albedo_field.py:211-269``): sdf, gradient, normal, albedo
        (+shininess), optionally NeuS alphas."""
        n, s = ray_samples.num_rays, ray_samples.num_samples
        positions = ray_samples.start_positions().reshape(-1, 3)

        sdf, geo_feat, gradients = self.geo_with_grad(positions, stoch_salt)

        colours = self.colour(positions, geo_feat)
        if self.config.predict_shininess:
            albedo, shininess = colours[..., :3], colours[..., 3:]
        else:
            albedo, shininess = colours, None

        # eps inside sqrt: finite gradient even at ∥∇∥ = 0
        normals = gradients / jnp.sqrt(
            jnp.sum(gradients**2, axis=-1, keepdims=True) + 1e-12
        )

        out = {
            "sdf": sdf.reshape(n, s, 1),
            "gradient": gradients.reshape(n, s, 3),
            "normal": normals.reshape(n, s, 3),
            "albedo": albedo.reshape(n, s, 3),
        }
        if shininess is not None:
            out["shininess"] = shininess.reshape(n, s, 1)

        if return_alphas:
            out["alpha"] = neus_alpha(
                out["sdf"],
                out["gradient"],
                ray_samples.directions,
                ray_samples.deltas,
                self.inv_s(),
                cos_anneal_ratio,
            )
        return out

    def geo_with_grad(self, positions: jnp.ndarray, stoch_salt=None):
        """(sdf, geo_feat, d sdf/d position) in one combined pass.

        ``gradient_mode="reverse"``: one extra ``jax.grad`` reverse pass of
        the summed SDF (each value depends only on its own position), with
        the geometry net rematerialised so the eikonal double-backward does
        not blow activation memory.

        ``gradient_mode="forward"``: three JVPs along the coordinate basis.
        Costs ~3 extra forward passes but the *backward* of the eikonal loss
        is then reverse-over-forward — a much smaller transpose graph for
        XLA, which matters for whole-model compile size on TPU.
        """
        if self.config.gradient_mode == "forward":
            if self.config.use_grid_feature:
                return self._geo_with_grad_analytic(positions, stoch_salt)
            def geo_fn(p):
                return self.geo(p)

            (sdf, geo_feat), geo_jvp = jax.linearize(geo_fn, positions)
            cols = []
            for axis in range(3):
                tangent = jnp.zeros_like(positions).at[:, axis].set(1.0)
                dsdf = geo_jvp(tangent)[0]
                cols.append(dsdf[..., 0])
            gradients = jnp.stack(cols, axis=-1)
            return sdf, geo_feat, gradients

        def sdf_sum(p):
            return jnp.sum(self.geo(p)[0])

        sdf, geo_feat = self.geo(positions)
        gradients = jax.grad(jax.checkpoint(sdf_sum))(positions)
        return sdf, geo_feat, gradients

    def _geo_with_grad_analytic(self, positions: jnp.ndarray, stoch_salt=None):
        """Forward-mode gradient with *analytic* encode derivatives.

        The hash gather runs through a custom-VJP encode (Pallas
        scatter backward, 7.3× faster than XLA scatter); since custom_vjp
        cannot sit under JVP, the encode's position derivative is computed
        in closed form (``encode_with_dx``) and only the MLP is JVP'd.
        Everything stays reverse-differentiable for the eikonal loss."""
        c = self.config

        # analytic encode + d(encode)/d(x01); contraction jacobian via JVP
        # of the (cheap, gather-free) contraction map
        def contract_fn(p):
            return contraction_to_unit_cube(p, c.contraction_order)

        x01 = contract_fn(positions)
        feats, dfeats_dx01 = self.encoding.encode_with_dx(
            self.hash_table, x01, stoch_salt=stoch_salt
        )

        # d(encode)/d(position) = dfeats_dx01 · J_contraction
        dfeats_dpos = []
        pe_tangents = []
        for axis in range(3):
            tangent = jnp.zeros_like(positions).at[:, axis].set(1.0)
            _, dx01 = jax.jvp(contract_fn, (positions,), (tangent,))  # [M,3]
            dfeats_dpos.append(
                jnp.einsum("mbf,mb->mf", dfeats_dx01, dx01)
            )  # [M, L*F]
            if c.use_position_encoding:
                pe_fn = lambda p: nerf_encoding(
                    p, c.position_encoding_freqs, 0.0,
                    float(c.position_encoding_freqs - 1),
                )
                _, dpe = jax.jvp(pe_fn, (positions,), (tangent,))
                pe_tangents.append(dpe)

        parts = [positions]
        if c.use_position_encoding:
            parts.append(
                nerf_encoding(
                    positions, c.position_encoding_freqs, 0.0,
                    float(c.position_encoding_freqs - 1),
                )
            )
        parts.append(feats)
        h = jnp.concatenate(parts, axis=-1)

        # one primal pass + one linearisation, applied to all 3 basis
        # tangents (jax.jvp per axis would recompute the primal 3×)
        hidden, mlp_jvp = jax.linearize(self._geo_mlp, h)
        sdf_cols = []
        for axis in range(3):
            t_parts = [jnp.zeros_like(positions).at[:, axis].set(1.0)]
            if c.use_position_encoding:
                t_parts.append(pe_tangents[axis])
            t_parts.append(dfeats_dpos[axis])
            th = jnp.concatenate(t_parts, axis=-1)
            sdf_cols.append(mlp_jvp(th)[..., 0])
        gradients = jnp.stack(sdf_cols, axis=-1)  # [M, 3]
        return hidden[..., :1], hidden[..., 1:], gradients
