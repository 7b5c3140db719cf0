"""Tests for fields: density, SDF-albedo (geometric init, gradients), DDF,
RENI++ (equivariance)."""

import jax
import jax.numpy as jnp
import numpy as np

from neusky_tpu.core.rays import RayBundle
from neusky_tpu.core.spherical import rot_z
from neusky_tpu.fields.ddf import DDFFieldConfig, DirectionalDistanceField
from neusky_tpu.fields.density_field import DensityFieldConfig, HashMLPDensityField
from neusky_tpu.fields.reni import RENIField, RENIFieldConfig, so2_invariant_features
from neusky_tpu.fields.sdf_albedo import SDFAlbedoField, SDFAlbedoFieldConfig
from neusky_tpu.ops.hashgrid import HashGridConfig
from neusky_tpu.sampling.proposal import bins_to_ray_samples, uniform_lindisp_samples

SMALL_HASH = HashGridConfig(num_levels=4, features_per_level=2,
                            log2_hashmap_size=12, base_res=4, max_res=32)


def test_density_field():
    cfg = DensityFieldConfig(hash=SMALL_HASH)
    field = HashMLPDensityField(cfg)
    pos = jax.random.normal(jax.random.PRNGKey(0), (4, 8, 3))
    params = field.init(jax.random.PRNGKey(1), pos)
    d = field.apply(params, pos)
    assert d.shape == (4, 8, 1)
    assert np.all(np.array(d) >= 0)


class TestSDFAlbedoField:
    def _field(self, **kw):
        cfg = SDFAlbedoFieldConfig(
            num_layers=2, hidden_dim=32, geo_feat_dim=32,
            num_layers_color=2, hidden_dim_color=32,
            hash=SMALL_HASH, **kw,
        )
        field = SDFAlbedoField(cfg)
        pos = jnp.zeros((4, 3))
        params = field.init(jax.random.PRNGKey(0), pos)
        return field, params

    def test_geometric_init_is_spherical(self):
        """After geometric init the SDF should approximate |x| - bias."""
        field, params = self._field(use_grid_feature=False, use_position_encoding=False)
        pts = jnp.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 2.0, 0.0]])
        sdf = field.apply(params, pts, method=field.sdf_only)
        s = np.array(sdf[:, 0])
        # centre negative, far points positive, monotone in radius
        assert s[0] < 0
        assert s[2] > s[1] > s[0]

    def test_gradient_matches_finite_diff(self):
        field, params = self._field()
        pts = jnp.array([[0.31, 0.12, -0.24], [0.5, 0.5, 0.5]])
        _, _, grad = field.apply(params, pts, method=field.geo_with_grad)
        eps = 1e-3
        for i in range(2):
            for d in range(3):
                dx = jnp.zeros((1, 3)).at[0, d].set(eps)
                p = pts[i : i + 1]
                f = lambda q: field.apply(params, q, method=field.sdf_only)[0, 0]
                fd = (f(p + dx) - f(p - dx)) / (2 * eps)
                assert abs(float(grad[i, d]) - float(fd)) < 2e-2, (i, d)

    def test_field_outputs_shapes(self):
        field, params = self._field(predict_shininess=True)
        rb = RayBundle.create(
            origins=jnp.zeros((3, 3)),
            directions=jnp.tile(jnp.array([[0.0, 0, 1.0]]), (3, 1)),
            nears=jnp.full((3, 1), 0.1),
            fars=jnp.full((3, 1), 2.0),
        )
        bins = uniform_lindisp_samples(None, rb, 8, train=False)
        rs = bins_to_ray_samples(rb, bins)
        out = field.apply(params, rs, return_alphas=True, method=field.field_outputs)
        assert out["sdf"].shape == (3, 8, 1)
        assert out["normal"].shape == (3, 8, 3)
        assert out["albedo"].shape == (3, 8, 3)
        assert out["shininess"].shape == (3, 8, 1)
        assert out["alpha"].shape == (3, 8, 1)
        assert np.all(np.array(out["alpha"]) >= 0) and np.all(np.array(out["alpha"]) <= 1)
        n = np.linalg.norm(np.array(out["normal"]), axis=-1)
        assert np.allclose(n, 1.0, atol=1e-4)

    def test_forward_mode_gradient_matches_reverse(self):
        import dataclasses

        field, params = self._field()
        pts = jax.random.uniform(jax.random.PRNGKey(3), (8, 3), minval=-0.5, maxval=0.5)
        _, _, g_rev = field.apply(params, pts, method=field.geo_with_grad)
        fwd_field = SDFAlbedoField(dataclasses.replace(field.config, gradient_mode="forward"))
        _, _, g_fwd = fwd_field.apply(params, pts, method=fwd_field.geo_with_grad)
        assert np.allclose(np.asarray(g_rev), np.asarray(g_fwd), atol=1e-4)

    def test_eikonal_trainable(self):
        """The eikonal loss must be differentiable wrt all params
        (2nd-order AD through hash + MLP)."""
        field, params = self._field()
        pts = jax.random.uniform(jax.random.PRNGKey(2), (16, 3), minval=-0.5, maxval=0.5)

        def eikonal_loss(p):
            _, _, grad = field.apply(p, pts, method=field.geo_with_grad)
            return jnp.mean((jnp.linalg.norm(grad, axis=-1) - 1.0) ** 2)

        g = jax.grad(eikonal_loss)(params)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.array(l)).all() for l in leaves)
        assert any(float(jnp.abs(l).sum()) > 0 for l in leaves)


class TestDDF:
    def _make(self, conditioning):
        cfg = DDFFieldConfig(
            conditioning=conditioning,
            position_encoding_type="nerf",
            direction_encoding_type="nerf",
            hidden_layers=2, hidden_features=32,
            mapping_layers=2, mapping_features=32,
            num_attention_heads=4, num_attention_layers=2,
        )
        field = DirectionalDistanceField(cfg, ddf_radius=1.5)
        o = jax.random.normal(jax.random.PRNGKey(0), (8, 3))
        o = 1.5 * o / jnp.linalg.norm(o, axis=-1, keepdims=True)
        d = -o / 1.5
        params = field.init(jax.random.PRNGKey(1), o, d)
        return field, params, o, d

    def test_all_conditionings(self):
        for cond in ("Concat", "FiLM", "Attention"):
            field, params, o, d = self._make(cond)
            out = field.apply(params, o, d)
            dist = np.array(out["expected_termination_dist"])
            assert dist.shape == (8,)
            assert np.all(dist >= 0) and np.all(dist <= 3.0 + 1e-5)  # ≤ 2r

    def test_pddf_head(self):
        cfg = DDFFieldConfig(
            conditioning="Concat", position_encoding_type="none",
            direction_encoding_type="none", hidden_layers=2, hidden_features=32,
            ddf_type="pddf", num_dirac_components=2,
            predict_probability_of_hit=True,
        )
        field = DirectionalDistanceField(cfg, ddf_radius=1.0)
        o = jnp.ones((4, 3)) / np.sqrt(3)
        d = -o
        params = field.init(jax.random.PRNGKey(0), o, d)
        out = field.apply(params, o, d)
        assert out["expected_termination_dist"].shape == (4,)
        assert out["probability_of_hit"].shape == (4,)
        p = np.array(out["probability_of_hit"])
        assert np.all(p >= 0) and np.all(p <= 1)


class TestRENI:
    def _make(self):
        cfg = RENIFieldConfig(
            latent_dim=16, hidden_features=32,
            num_attention_heads=4, num_attention_layers=2,
            fixed_decoder=False,
        )
        field = RENIField(cfg)
        d = jax.random.normal(jax.random.PRNGKey(0), (32, 3))
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        z = jax.random.normal(jax.random.PRNGKey(1), (32, 16, 3))
        params = field.init(jax.random.PRNGKey(2), d, z)
        return field, params, d, z

    def test_forward_shapes(self):
        field, params, d, z = self._make()
        out = field.apply(params, d, z)
        assert out["rgb"].shape == (32, 3)
        hdr = field.unnormalise(out["rgb"])
        assert np.all(np.array(hdr) > 0)

    def test_so2_equivariance(self):
        """Rotating latents about z == rotating query directions about z
        (the core RENI++ property)."""
        field, params, d, z = self._make()
        gamma = 0.7
        R = rot_z(jnp.asarray(gamma))
        # joint invariance: f(R d, R Z) == f(d, Z)
        d_rot = d @ R.T  # R d (column convention)
        z_rot = jnp.einsum("mdk,jk->mdj", z, R)  # R z_i per latent vector
        out_joint = field.apply(params, d_rot, z_rot)["rgb"]
        out_base = field.apply(params, d, z)["rgb"]
        assert np.allclose(out_joint, out_base, atol=1e-4)
        # equivariance corollary: f(R d, Z) == f(d, R^{-1} Z)
        out_rot_dirs = field.apply(params, d_rot, z)["rgb"]
        z_inv = jnp.einsum("mdk,kj->mdj", z, R)  # R^T z_i
        out_rot_lat = field.apply(params, d, z_inv)["rgb"]
        assert np.allclose(out_rot_dirs, out_rot_lat, atol=1e-4)

    def test_rotation_argument(self):
        field, params, d, z = self._make()
        R = rot_z(jnp.asarray(0.5))
        out1 = field.apply(params, d, z, None, R)["rgb"]
        out2 = field.apply(params, d @ R, z)["rgb"]
        assert np.allclose(out1, out2, atol=1e-5)

    def test_scale_changes_output(self):
        field, params, d, z = self._make()
        s1 = jnp.ones((32,))
        s2 = 2.0 * jnp.ones((32,))
        o1 = field.apply(params, d, z, s1)["rgb"]
        o2 = field.apply(params, d, z, s2)["rgb"]
        assert not np.allclose(o1, o2)

    def test_invariant_features(self):
        d = jnp.array([[1.0, 0.0, 0.5]])
        d = d / jnp.linalg.norm(d)
        z = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 3))
        R = rot_z(jnp.asarray(1.3))
        df1, lt1 = so2_invariant_features(d, z)
        # rotate BOTH by R: features must be unchanged
        df2, lt2 = so2_invariant_features(d @ R.T, jnp.einsum("mdk,jk->mdj", z, R))
        assert np.allclose(df1, df2, atol=1e-5)
        assert np.allclose(lt1, lt2, atol=1e-5)
