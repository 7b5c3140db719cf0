"""Tests for net building blocks: MLP/weight-norm, SIREN, FiLM, transformer,
variance heads."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from neusky_tpu.nets.density import LaplaceDensity, LearnedVariance, neus_alpha
from neusky_tpu.nets.mlp import MLP, WNDense, softplus_beta
from neusky_tpu.nets.siren import FiLMSiren, MappingNetwork, Siren
from neusky_tpu.nets.transformer import TransformerDecoder


def test_wndense_matches_plain_at_init():
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 16))
    wn = WNDense(32, weight_norm=True)
    params = wn.init(jax.random.PRNGKey(1), x)
    plain = WNDense(32, weight_norm=False)
    p2 = {"params": {k: v for k, v in params["params"].items() if k != "scale"}}
    out_wn = wn.apply(params, x)
    out_plain = plain.apply(p2, x)
    assert np.allclose(out_wn, out_plain, atol=1e-5)


def test_mlp_shapes():
    m = MLP(hidden_features=(64, 64), out_features=3, out_activation=nn.sigmoid)
    x = jnp.ones((4, 10))
    params = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(params, x)
    assert y.shape == (4, 3)
    assert (np.array(y) >= 0).all() and (np.array(y) <= 1).all()


def test_softplus_beta():
    x = jnp.array([-1.0, 0.0, 0.001, 1.0])
    y = softplus_beta(x, 100.0)
    # above threshold it's identity
    assert np.allclose(y[3], 1.0)
    assert np.allclose(y[1], np.log(2.0) / 100.0, atol=1e-6)


def test_softplus_beta_grad_no_nan():
    """Regression: the overflow branch must not poison gradients
    (inf · 0 = NaN under jnp.where autodiff)."""
    g = jax.grad(lambda x: jnp.sum(softplus_beta(x, 100.0)))(jnp.array([3.0, -3.0, 0.0]))
    assert np.isfinite(np.array(g)).all()
    assert np.allclose(g[0], 1.0, atol=1e-5)


def test_siren_output_range():
    s = Siren(hidden_layers=2, hidden_features=32, out_dim=4, outermost_linear=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (16, 6))
    params = s.init(jax.random.PRNGKey(1), x)
    y = s.apply(params, x)
    assert y.shape == (16, 4)
    assert np.isfinite(np.array(y)).all()


def test_mapping_network():
    m = MappingNetwork(hidden_layers=3, hidden_features=32, out_dim=2 * 3 * 16)
    z = jax.random.normal(jax.random.PRNGKey(0), (8, 5))
    params = m.init(jax.random.PRNGKey(1), z)
    f, p = m.apply(params, z)
    assert f.shape == (8, 3 * 16) and p.shape == (8, 3 * 16)


def test_film_siren():
    fs = FiLMSiren(
        hidden_layers=3, hidden_features=32,
        mapping_network_layers=2, mapping_network_features=32,
        out_dim=1,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (16, 7))
    c = jax.random.normal(jax.random.PRNGKey(1), (16, 5))
    params = fs.init(jax.random.PRNGKey(2), x, c)
    y = fs.apply(params, x, c)
    assert y.shape == (16, 1)
    # conditioning actually matters
    y2 = fs.apply(params, x, c + 1.0)
    assert not np.allclose(y, y2)


def test_film_siren_bf16_mapping_close_to_fp32():
    """bf16 mapping (matmuls + materialised freqs/phases) must stay a small
    perturbation of the fp32 reference: params fp32, accumulation fp32, sin
    arguments computed in f32 after a fused upcast."""
    import jax.numpy as jnp

    kw = dict(
        hidden_layers=3, hidden_features=32,
        mapping_network_layers=2, mapping_network_features=32,
        out_dim=1,
    )
    fs32 = FiLMSiren(**kw)
    fs16 = FiLMSiren(mapping_compute_dtype=jnp.bfloat16, **kw)
    x = jax.random.normal(jax.random.PRNGKey(0), (64, 7))
    c = jax.random.normal(jax.random.PRNGKey(1), (64, 5))
    params = fs32.init(jax.random.PRNGKey(2), x, c)
    y32 = np.asarray(fs32.apply(params, x, c))
    y16 = np.asarray(fs16.apply(params, x, c))
    assert y16.dtype == np.float32  # head output stays fp32
    scale = np.abs(y32).max()
    assert np.abs(y16 - y32).max() / scale < 0.15, np.abs(y16 - y32).max() / scale
    assert not np.array_equal(y16, y32)  # the knob actually changed compute


def test_film_siren_per_layer_heads_equivalent():
    """per_layer_mapping_heads is a pure compute-layout change: each
    per-layer head is a column slice of the SAME kernel_out, so the
    parameter tree is unchanged and outputs/grads must match the fat-head
    path to fp reassociation noise (fwd AND bwd)."""
    kw = dict(
        hidden_layers=3, hidden_features=32,
        mapping_network_layers=2, mapping_network_features=32,
        out_dim=1,
    )
    fat = FiLMSiren(**kw)
    heads = FiLMSiren(per_layer_mapping_heads=True, **kw)
    x = jax.random.normal(jax.random.PRNGKey(0), (64, 7))
    c = jax.random.normal(jax.random.PRNGKey(1), (64, 5))
    params = fat.init(jax.random.PRNGKey(2), x, c)
    # identical parameter tree: heads path initialises the same shapes
    p2 = heads.init(jax.random.PRNGKey(2), x, c)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(p2)
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(p2)):
        assert a.shape == b.shape
    y_fat = np.asarray(fat.apply(params, x, c))
    y_heads = np.asarray(heads.apply(params, x, c))
    scale = np.abs(y_fat).max()
    assert np.abs(y_heads - y_fat).max() / scale < 1e-5

    def loss(fn):
        return lambda p: jnp.sum(fn.apply(p, x, c) ** 2)

    g_fat = jax.grad(loss(fat))(params)
    g_heads = jax.grad(loss(heads))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_fat), jax.tree_util.tree_leaves(g_heads)):
        denom = max(float(np.abs(a).max()), 1e-8)
        assert float(np.abs(np.asarray(a) - np.asarray(b)).max()) / denom < 1e-4


def test_film_siren_per_layer_heads_bf16_mapping():
    """heads + bf16 mapping compose: output stays fp32 and within the bf16
    perturbation envelope of the fp32 fat-head reference."""
    kw = dict(
        hidden_layers=3, hidden_features=32,
        mapping_network_layers=2, mapping_network_features=32,
        out_dim=1,
    )
    fat32 = FiLMSiren(**kw)
    h16 = FiLMSiren(per_layer_mapping_heads=True,
                    mapping_compute_dtype=jnp.bfloat16, **kw)
    x = jax.random.normal(jax.random.PRNGKey(0), (64, 7))
    c = jax.random.normal(jax.random.PRNGKey(1), (64, 5))
    params = fat32.init(jax.random.PRNGKey(2), x, c)
    y32 = np.asarray(fat32.apply(params, x, c))
    y16 = np.asarray(h16.apply(params, x, c))
    assert y16.dtype == np.float32
    scale = np.abs(y32).max()
    assert np.abs(y16 - y32).max() / scale < 0.15


def test_transformer_decoder():
    dec = TransformerDecoder(hidden_features=32, num_heads=4, num_layers=2, out_dim=3)
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 6))
    cond_single = jax.random.normal(jax.random.PRNGKey(1), (8, 5))
    params = dec.init(jax.random.PRNGKey(2), x, cond_single)
    y = dec.apply(params, x, cond_single)
    assert y.shape == (8, 3)
    # sequence conditioning (RENI-style latent tokens)
    cond_seq = jax.random.normal(jax.random.PRNGKey(3), (8, 10, 5))
    dec2 = TransformerDecoder(hidden_features=32, num_heads=4, num_layers=2, out_dim=3)
    params2 = dec2.init(jax.random.PRNGKey(4), x, cond_seq)
    y2 = dec2.apply(params2, x, cond_seq)
    assert y2.shape == (8, 3)


def test_learned_variance():
    lv = LearnedVariance(init_val=0.1)
    params = lv.init(jax.random.PRNGKey(0))
    inv_s = lv.apply(params)
    assert np.allclose(inv_s, np.exp(0.1 * 10.0), atol=1e-5)


def test_laplace_density():
    ld = LaplaceDensity(init_val=0.1)
    params = ld.init(jax.random.PRNGKey(0), jnp.zeros((1,)))
    d0 = ld.apply(params, jnp.array([0.0]))
    # at sdf=0: alpha * 0.5
    beta = 0.1 + 1e-4
    assert np.allclose(d0, 0.5 / beta, atol=1e-3)
    d_in = ld.apply(params, jnp.array([-1.0]))
    d_out = ld.apply(params, jnp.array([1.0]))
    assert d_in > d0 > d_out


def test_neus_alpha_surface_crossing():
    """A ray crossing the zero level set front-on should get alpha ≈ 1 for
    sharp inv_s, 0 away from the surface."""
    s = 16
    z = jnp.linspace(-2.0, 2.0, s)
    sdf = (1.0 - z)[None, :, None]  # surface at z=1, positive before
    gradients = jnp.tile(jnp.array([0.0, 0.0, -1.0])[None, None, :], (1, s, 1))
    directions = jnp.tile(jnp.array([0.0, 0.0, 1.0])[None, None, :], (1, s, 1))
    deltas = jnp.full((1, s, 1), 4.0 / s)
    alpha = neus_alpha(sdf, gradients, directions, deltas, inv_s=jnp.array(64.0))
    a = np.array(alpha[0, :, 0])
    assert a[:4].max() < 0.2  # far before surface
    assert a.max() > 0.8  # near surface
    i = np.argmax(a)
    assert abs(z[i] - 1.0) < 0.5
