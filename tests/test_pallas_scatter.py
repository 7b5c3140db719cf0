"""Correctness tests for the Pallas hash-gradient scatter kernel
(interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neusky_tpu.ops.hashgrid_pallas import (
    _HAS_PLTPU,
    scatter_add_reference,
    scatter_add_tablegrad,
)

pytestmark = pytest.mark.skipif(not _HAS_PLTPU, reason="pallas tpu module unavailable")


def test_scatter_matches_reference():
    T = 1024
    M = 5000
    idx = jax.random.randint(jax.random.PRNGKey(0), (M,), 0, T)
    vals = jax.random.normal(jax.random.PRNGKey(1), (M, 2))
    out = scatter_add_tablegrad(idx, vals, T, interpret=True)
    ref = scatter_add_reference(idx, vals, T)
    assert out.shape == (T, 2)
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_scatter_duplicates_and_padding():
    T = 256
    # heavy duplicates + non-multiple-of-block M
    idx = jnp.array([0, 0, 0, 255, 255, 7] * 100, jnp.int32)
    vals = jnp.tile(jnp.array([[1.0, -2.0]]), (600, 1))
    out = scatter_add_tablegrad(idx, vals, T, interpret=True)
    ref = scatter_add_reference(idx, vals, T)
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
    assert np.allclose(out[0], [300.0, -600.0])


def test_scatter_transposed_matches_reference():
    from neusky_tpu.ops.hashgrid_pallas import scatter_add_tablegrad_t

    T = 512
    M = 3000
    idx = jax.random.randint(jax.random.PRNGKey(2), (M,), 0, T)
    vals = jax.random.normal(jax.random.PRNGKey(3), (2, M))
    out = scatter_add_tablegrad_t(idx, vals, T, interpret=True)  # [2, T]
    ref = scatter_add_reference(idx, vals.T, T)  # [T, 2]
    assert out.shape == (2, T)
    assert np.allclose(np.asarray(out), np.asarray(ref).T, atol=1e-4)


def test_take_level_roundtrip():
    """take_level forward == XLA take; VJP == XLA scatter (CPU fallback)."""
    from neusky_tpu.ops.hashgrid_pallas import take_level

    T, N = 256, 64
    t2 = jax.random.normal(jax.random.PRNGKey(4), (2, T))
    idx = jax.random.randint(jax.random.PRNGKey(5), (8, N), 0, T)
    out = take_level(t2, idx)
    assert out.shape == (2, 8, N)
    assert np.allclose(np.asarray(out), np.asarray(t2[:, idx]))

    def loss(t):
        return jnp.sum(take_level(t, idx) ** 2)

    g = jax.grad(loss)(t2)
    ref = jax.grad(lambda t: jnp.sum(t[:, idx] ** 2))(t2)
    assert np.allclose(np.asarray(g), np.asarray(ref), atol=1e-5)
