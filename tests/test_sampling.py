"""Tests for samplers: spaced/PDF/proposal, illumination, DDF sphere."""

import jax
import jax.numpy as jnp
import numpy as np

from neusky_tpu.core.rays import RayBundle
from neusky_tpu.sampling.ddf_sampler import (
    DDFSamplerConfig,
    sample_vmf,
    uniform_ddf_samples,
    vmf_ddf_samples,
)
from neusky_tpu.sampling.illumination import (
    EquirectangularSampler,
    IcosahedronSampler,
    icosphere_order_for,
)
from neusky_tpu.sampling.proposal import (
    ProposalSamplerConfig,
    bins_to_ray_samples,
    pdf_sample_bins,
    proposal_sample,
    s_to_euclidean,
    uniform_lindisp_samples,
)


def _bundle(n=8):
    rng = jax.random.PRNGKey(0)
    d = jax.random.normal(rng, (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return RayBundle.create(
        origins=jnp.zeros((n, 3)),
        directions=d,
        nears=jnp.full((n, 1), 0.1),
        fars=jnp.full((n, 1), 4.0),
    )


def test_s_to_euclidean_monotone_and_bounds():
    nears = jnp.full((4, 1, 1), 0.1)
    fars = jnp.full((4, 1, 1), 10.0)
    s = jnp.linspace(0, 1, 33)[None, :, None]
    t = s_to_euclidean(jnp.tile(s, (4, 1, 1)), nears, fars)
    t = np.array(t[0, :, 0])
    assert np.all(np.diff(t) > 0)
    assert abs(t[0] - 0.1) < 1e-4 and abs(t[-1] - 10.0) < 1e-3


def test_uniform_bins_and_ray_samples():
    rb = _bundle()
    bins = uniform_lindisp_samples(jax.random.PRNGKey(1), rb, 32, train=True)
    assert bins.shape == (8, 33)
    assert np.all(np.diff(np.array(bins), axis=-1) >= -1e-6)
    rs = bins_to_ray_samples(rb, bins)
    assert rs.starts.shape == (8, 32, 1)
    assert np.all(np.array(rs.deltas) >= 0)
    assert np.all(np.array(rs.starts[:, 0, 0]) >= 0.1 - 1e-5)


def test_pdf_sampling_concentrates():
    """PDF resampling should place most new samples where weights are high."""
    rb = _bundle(4)
    bins = uniform_lindisp_samples(None, rb, 64, train=False)
    # weight bump at s in [0.4, 0.6]
    centers = (bins[:, :-1] + bins[:, 1:]) / 2
    w = jnp.exp(-(((centers - 0.5) / 0.05) ** 2))[..., None]
    new_bins = pdf_sample_bins(jax.random.PRNGKey(2), bins, w, 32, train=True)
    nb = np.array(new_bins)
    frac_inside = ((nb > 0.35) & (nb < 0.65)).mean()
    assert frac_inside > 0.8


def test_proposal_sample_end_to_end():
    rb = _bundle()
    cfg = ProposalSamplerConfig(num_proposal_samples=(32, 16), num_final_samples=8)

    def density_fn(positions):
        # density bump near radius 1 sphere surface
        r = jnp.linalg.norm(positions, axis=-1, keepdims=True)
        return 10.0 * jnp.exp(-(((r - 1.0) / 0.1) ** 2))

    rs, weights_list, samples_list = proposal_sample(
        jax.random.PRNGKey(0), rb, [density_fn, density_fn], cfg,
        train=True, step=jnp.asarray(2000),
    )
    assert rs.starts.shape == (8, 8, 1)
    assert len(weights_list) == 2 and len(samples_list) == 2
    # final samples should concentrate near the sphere surface
    pos = rs.start_positions()
    r = np.linalg.norm(np.array(pos), axis=-1)
    assert (np.abs(r - 1.0) < 0.5).mean() > 0.6


def test_icosphere_order_for():
    assert icosphere_order_for(512) == 7  # 492 vertices is closest
    assert icosphere_order_for(42) == 2


def test_icosahedron_sampler():
    s = IcosahedronSampler(num_directions=512, apply_random_rotation=True)
    d1 = s(jax.random.PRNGKey(0))
    d2 = s(jax.random.PRNGKey(1))
    assert d1.shape == d2.shape == (492, 3)
    assert not np.allclose(d1, d2)  # different rotations
    assert np.allclose(np.linalg.norm(d1, axis=-1), 1.0, atol=1e-5)
    d3 = s(jax.random.PRNGKey(0), apply_random_rotation=False)
    assert np.allclose(d3, s.directions_np)
    mask = s.upper_hemisphere_mask(d3)
    assert 0.4 < float(mask.mean()) < 0.6


def test_equirect_sampler():
    s = EquirectangularSampler(width=64)
    d = s()
    assert d.shape == (32 * 64, 3)
    assert np.allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
    # first row near +z
    assert np.array(d[:64, 2]).mean() > 0.99
    sa = s.solid_angles()
    assert np.allclose(sa.sum(), 4 * np.pi, rtol=1e-2)


def test_vmf_concentration():
    mu = jnp.array([[0.0, 0.0, 1.0]])
    tight = sample_vmf(jax.random.PRNGKey(0), mu, kappa=100.0, num_samples=1000)
    loose = sample_vmf(jax.random.PRNGKey(0), mu, kappa=1.0, num_samples=1000)
    cos_tight = np.array(tight[0, :, 2]).mean()
    cos_loose = np.array(loose[0, :, 2]).mean()
    assert cos_tight > 0.95
    assert 0.2 < cos_loose < 0.8
    # theoretical mean cos for kappa: coth(k) - 1/k
    k = 1.0
    expected = 1.0 / np.tanh(k) - 1.0 / k
    assert abs(cos_loose - expected) < 0.05


def test_ddf_samplers():
    cfg = DDFSamplerConfig(
        num_samples_on_sphere=8, num_rays_per_sample=16,
        only_sample_upper_hemisphere=True, concentration=20.0,
    )
    for fn in (uniform_ddf_samples, vmf_ddf_samples):
        rb = fn(jax.random.PRNGKey(0), cfg, ddf_sphere_radius=1.5)
        assert rb.origins.shape == (128, 3)
        assert np.allclose(np.linalg.norm(np.array(rb.origins), axis=-1), 1.5, atol=1e-4)
        assert np.all(np.array(rb.origins[:, 2]) >= 0)  # upper hemisphere
        # all directions point inward
        dots = np.sum(np.array(rb.directions) * (-np.array(rb.origins) / 1.5), axis=-1)
        assert np.all(dots >= -1e-5)
