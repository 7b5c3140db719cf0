"""Golden-value tests for the loss library."""

import jax
import jax.numpy as jnp
import numpy as np

from neusky_tpu.core.rays import RayBundle
from neusky_tpu.models import losses as L
from neusky_tpu.sampling.proposal import bins_to_ray_samples, uniform_lindisp_samples


def test_l1_mse():
    a = jnp.array([[1.0, 2.0]])
    b = jnp.array([[0.0, 0.0]])
    assert np.allclose(L.l1_loss(a, b), 1.5)
    assert np.allclose(L.mse_loss(a, b), 2.5)


def test_eikonal():
    g = jnp.array([[[1.0, 0, 0], [0, 2.0, 0]]])
    # norms 1 and 2 → ((0)^2 + (1)^2)/2 = 0.5
    assert np.allclose(L.eikonal_loss(g), 0.5, atol=1e-5)


def test_fg_mask_loss_perfect_prediction():
    ws = jnp.array([[0.999], [0.001]])
    fg = jnp.array([[1.0], [0.0]])
    assert float(L.fg_mask_loss(ws, fg)) < 0.01
    ws_bad = jnp.array([[0.001], [0.999]])
    assert float(L.fg_mask_loss(ws_bad, fg)) > 1.0


def test_monosdf_normal_loss_zero_for_equal():
    n = jnp.array([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
    assert float(L.monosdf_normal_loss(n, n)) < 1e-5
    flipped = -n
    # L1 of unit-normal difference = 2 per axis-component + cos term 2
    assert float(L.monosdf_normal_loss(n, flipped)) > 2.0


def test_sky_pixel_loss():
    pred = jnp.array([[0.5, 0.5, 0.5], [0.9, 0.1, 0.2]])
    mask = jnp.array([[1.0], [0.0]])  # second pixel not sky
    # equal inputs: MSE = 0; the cosine term counts masked (zero) rows as
    # cos=0, matching torch CosineSimilarity-with-eps semantics
    # (``model_components/losses.py:49-57``) → α·mean(1-cos) = 0.1·0.5
    v = L.sky_pixel_loss(pred, pred, mask)
    assert np.allclose(float(v), 0.05, atol=1e-3)
    gt = jnp.array([[0.1, 0.9, 0.1], [0.0, 0.0, 0.0]])
    assert float(L.sky_pixel_loss(pred, gt, mask)) > 0.05


def test_sky_pixel_loss_grad_finite_at_zero_latents():
    """Masked rows are exactly zero vectors — gradient must stay finite."""
    pred = jnp.zeros((4, 3))
    gt = jnp.ones((4, 3))
    mask = jnp.array([[1.0], [0.0], [0.0], [0.0]])

    g = jax.grad(lambda p: L.sky_pixel_loss(p, gt, mask))(pred)
    assert np.isfinite(np.array(g)).all()


def test_interlevel_loss_zero_when_proposal_covers():
    """If the proposal histogram upper-bounds the final weights, loss ≈ 0."""
    rb = RayBundle.create(
        origins=jnp.zeros((2, 3)),
        directions=jnp.tile(jnp.array([[0.0, 0, 1.0]]), (2, 1)),
        nears=jnp.full((2, 1), 0.1),
        fars=jnp.full((2, 1), 2.0),
    )
    prop_bins = uniform_lindisp_samples(None, rb, 16, train=False)
    final_bins = uniform_lindisp_samples(None, rb, 8, train=False)
    rs_prop = bins_to_ray_samples(rb, prop_bins)
    rs_final = bins_to_ray_samples(rb, final_bins)
    w_prop = jnp.full((2, 16, 1), 1.0 / 16)
    w_final = jnp.full((2, 8, 1), 1.0 / 8)
    loss = L.interlevel_loss([w_prop, w_final], [rs_prop, rs_final])
    assert float(loss) < 1e-3

    # proposal that misses the mass entirely → positive loss
    w_prop_bad = jnp.concatenate(
        [jnp.zeros((2, 8, 1)), jnp.full((2, 8, 1), 1.0 / 8)], axis=1
    )
    w_final_bad = jnp.concatenate(
        [jnp.full((2, 4, 1), 0.25), jnp.zeros((2, 4, 1))], axis=1
    )
    loss_bad = L.interlevel_loss([w_prop_bad, w_final_bad], [rs_prop, rs_final])
    assert float(loss_bad) > float(loss)


def test_ddf_depth_loss_masking():
    pred = jnp.array([[1.0], [2.0]])
    gt = jnp.array([[1.5], [0.5]])
    mask = jnp.array([[1.0], [0.0]])
    # masked: only first row contributes |1-1.5|/2
    v = L.ddf_depth_loss(pred, gt, mask, ddf_radius=1.0)
    assert np.allclose(float(v), 0.25, atol=1e-5)
    # mask_to_circumference: second row's gt becomes 2r=2.0 → |2-2|=0
    v2 = L.ddf_depth_loss(pred, gt, mask, 1.0, mask_to_circumference=True)
    assert np.allclose(float(v2), 0.25, atol=1e-5)


def test_ddf_multi_view_loss_one_sided():
    expected = jnp.array([1.0, 3.0])
    max_allowed = jnp.array([2.0, 2.0])
    # only the 3.0 > 2.0 violation counts: relu(1)^2 / 2
    assert np.allclose(float(L.ddf_multi_view_loss(expected, max_allowed)), 0.5)


def test_visibility_sigmoid_loss():
    v = L.visibility_sigmoid_loss(
        jnp.asarray(2.0), jnp.asarray(25.0), 0.1, 25.0, True, False
    )
    assert np.allclose(float(v), (2.0 - 0.1) ** 2, atol=1e-5)


def test_scale_loss_dict():
    d = {"a": jnp.asarray(2.0), "b": jnp.asarray(3.0)}
    out = L.scale_loss_dict(d, {"a": 0.5})
    assert np.allclose(float(out["a"]), 1.0)
    assert np.allclose(float(out["b"]), 3.0)


def test_chunked_apply_remat_policy_identical():
    """``remat_policy='dots'`` changes what the backward recomputes, never
    the math: outputs and gradients must be bit-identical to ``full``."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from neusky_tpu.models.neusky import _chunked_apply

    w = jax.random.normal(jax.random.PRNGKey(0), (8, 8))
    x = jax.random.normal(jax.random.PRNGKey(1), (37, 8))

    def run(policy):
        def loss(w_):
            def body(xx):
                return jnp.sin(xx @ w_) @ w_.T
            out = _chunked_apply(body, (x,), 16, remat_policy=policy)
            return jnp.sum(out ** 2)
        return jax.value_and_grad(loss)(w)

    vf, gf = run("full")
    vd, gd = run("dots")
    np.testing.assert_array_equal(np.asarray(vf), np.asarray(vd))
    np.testing.assert_array_equal(np.asarray(gf), np.asarray(gd))
