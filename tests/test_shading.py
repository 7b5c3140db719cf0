"""Tests for the Lambertian / Blinn-Phong compositors — semantics checks
against the reference behaviour (count normalisation, visibility gating,
background blending, sRGB)."""

import jax.numpy as jnp
import numpy as np

from neusky_tpu.core.colour import linear_to_sRGB, sRGB_to_linear
from neusky_tpu.shading.lambertian import blinn_phong_composite, lambertian_composite


def _setup(n=2, s=3, d=4):
    albedos = jnp.full((n, s, 3), 0.5)
    normals = jnp.tile(jnp.array([0.0, 0.0, 1.0]), (n, s, 1))
    light_dirs = jnp.array(
        [[0.0, 0.0, 1.0], [0.0, 0.0, 1.0], [1.0, 0.0, 0.0], [0.0, 0.0, -1.0]]
    )  # two lit (up), one grazing (dot=0), one below
    light_cols = jnp.ones((n, d, 3))
    bg = jnp.zeros((n, 3))
    weights = jnp.zeros((n, s, 1)).at[:, 0, 0].set(1.0)  # opaque first sample
    return albedos, normals, light_dirs, light_cols, bg, weights


def test_lambertian_count_normalisation():
    """Only directions with n·l>0 count; the sum is divided by their number
    (reference quirk at ``renderers.py:100-106``)."""
    albedos, normals, dirs, cols, bg, weights = _setup()
    rgb = lambertian_composite(albedos, normals, dirs, cols, None, bg, weights)
    # two lit directions with dot=1, count=2 → shade=albedo·(1+1)/2·L=0.5
    expected = linear_to_sRGB(jnp.full((1, 3), 0.5))[0]
    assert np.allclose(np.asarray(rgb[0]), np.asarray(expected), atol=1e-4)


def test_lambertian_visibility_gates_light():
    albedos, normals, dirs, cols, bg, weights = _setup()
    vis_all = jnp.ones((2, 1, 4))
    vis_none = jnp.zeros((2, 1, 4))
    rgb_lit = lambertian_composite(albedos, normals, dirs, cols, vis_all, bg, weights)
    rgb_dark = lambertian_composite(albedos, normals, dirs, cols, vis_none, bg, weights)
    assert np.all(np.asarray(rgb_dark) <= np.asarray(rgb_lit) + 1e-6)
    assert np.allclose(np.asarray(rgb_dark), 0.0, atol=1e-4)


def test_background_blend_on_miss():
    albedos, normals, dirs, cols, _, _ = _setup()
    weights = jnp.zeros((2, 3, 1))  # nothing hit
    bg = jnp.full((2, 3), 0.25)
    rgb = lambertian_composite(albedos, normals, dirs, cols, None, bg, weights)
    expected = linear_to_sRGB(jnp.full((1, 3), 0.25))[0]
    assert np.allclose(np.asarray(rgb[0]), np.asarray(expected), atol=1e-4)


def test_blinn_phong_adds_specular():
    albedos, normals, dirs, cols, bg, weights = _setup()
    shininess = jnp.full((2, 3, 1), 10.0)
    view = jnp.tile(jnp.array([0.0, 0.0, 1.0]), (2, 1))  # looking along +z
    rgb_bp = blinn_phong_composite(
        albedos, normals, dirs, cols, None, bg, weights, shininess, view
    )
    # Blinn-Phong sums raw (diffuse+specular) over lit dirs — strictly
    # brighter than the count-normalised Lambertian here
    rgb_l = lambertian_composite(albedos, normals, dirs, cols, None, bg, weights)
    assert np.all(np.asarray(rgb_bp) >= np.asarray(rgb_l) - 1e-5)


def test_output_clipped_in_eval():
    albedos, normals, dirs, cols, bg, weights = _setup()
    cols = cols * 100.0  # HDR blowout
    rgb = lambertian_composite(
        albedos, normals, dirs, cols, None, bg, weights, clip_output=True
    )
    assert np.all(np.asarray(rgb) <= 1.0)
