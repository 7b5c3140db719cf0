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
