"""Pallas TPU kernel: hash-table gradient scatter-add.

Motivation (measured on v5e): XLA lowers the hash-grid backward to a
serialized scatter running at ~12M rows/s; with ~20-90M scatter rows per
NeuSky step it dominates the whole training step (SURVEY §7.3 anticipated
this as the one real kernel).

Design — lane-ownership accumulation, VMEM-resident table:
  - one level's gradient table (≤4 MB logical) lives in VMEM as two
    [T/128, 128] planes (one per feature) — the natural (8,128) tiling,
    no padding;
  - table row i decomposes as (q, r) = (i >> 7, i & 127): update j becomes
    a single vectorised row RMW ``acc[q_j, :] += onehot(r_j) * v_j`` — the
    VPU applies all 128 lanes at once, so throughput is ~1 update per few
    cycles instead of XLA's per-row serialization;
  - updates stream through the grid in blocks; the VMEM accumulator
    persists across sequential grid steps and is emitted at the end.

Exposed as ``scatter_add_tablegrad(idx, updates, table_size)`` and wired
into the hash encode through ``hash_encode_pallas_bwd`` (a custom_vjp
variant of the encode's table gradient).  Falls back to the XLA scatter on
non-TPU backends (interpret mode covers CPU tests).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl

try:  # pallas TPU backend is absent on CPU-only installs
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

_BLOCK = 1024  # updates per grid step (SMEM-resident: 3 × 4 KB per block)


def _scatter_kernel(
    idx_ref, val0_ref, val1_ref, out0_ref, out1_ref, acc0a, acc1a, acc0b, acc1b
):
    """Grid step: accumulate one block of updates into the VMEM planes.

    Two independent accumulator chains (a/b take alternate updates): the
    serial row read-modify-write is VMEM-latency-bound (~10 cycles/row);
    splitting the dependency chain overlaps the RMWs.  Chains merge on the
    final grid step."""
    step = pl.program_id(0)
    num_steps = pl.num_programs(0)

    @pl.when(step == 0)
    def _init():
        acc0a[:] = jnp.zeros_like(acc0a)
        acc1a[:] = jnp.zeros_like(acc1a)
        acc0b[:] = jnp.zeros_like(acc0b)
        acc1b[:] = jnp.zeros_like(acc1b)

    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    def body(j, _):
        ia = idx_ref[0, 2 * j]
        ib = idx_ref[0, 2 * j + 1]
        qa, ra = ia >> 7, ia & 127
        qb, rb = ib >> 7, ib & 127
        oha = (lane_iota == ra).astype(acc0a.dtype)  # [1, 128]
        ohb = (lane_iota == rb).astype(acc0a.dtype)
        acc0a[pl.ds(qa, 1), :] += oha * val0_ref[0, 2 * j]
        acc0b[pl.ds(qb, 1), :] += ohb * val0_ref[0, 2 * j + 1]
        acc1a[pl.ds(qa, 1), :] += oha * val1_ref[0, 2 * j]
        acc1b[pl.ds(qb, 1), :] += ohb * val1_ref[0, 2 * j + 1]
        return 0

    jax.lax.fori_loop(0, idx_ref.shape[1] // 2, body, 0)

    @pl.when(step == num_steps - 1)
    def _emit():
        out0_ref[:] = acc0a[:] + acc0b[:]
        out1_ref[:] = acc1a[:] + acc1b[:]


def scatter_add_tablegrad(
    idx: jnp.ndarray, updates: jnp.ndarray, table_size: int, interpret: bool = False
) -> jnp.ndarray:
    """Σ-scatter of ``updates`` [M, 2] at rows ``idx`` [M] into a
    [table_size, 2] gradient table.  table_size must be a multiple of 128.
    """
    assert table_size % 128 == 0
    m = idx.shape[0]
    blocks = -(-m // _BLOCK)
    pad = blocks * _BLOCK - m
    if pad:
        # padded rows target row 0 with zero value — harmless
        idx = jnp.concatenate([idx, jnp.zeros((pad,), idx.dtype)])
        updates = jnp.concatenate([updates, jnp.zeros((pad, 2), updates.dtype)])

    idx2 = idx.reshape(1, -1)
    v0 = updates[:, 0].reshape(1, -1)
    v1 = updates[:, 1].reshape(1, -1)
    rows = table_size // 128

    kwargs = {}
    if _HAS_PLTPU:
        scratch = [pltpu.VMEM((rows, 128), jnp.float32) for _ in range(4)]
        # per-element scalar reads need SMEM (VMEM loads must be lane-aligned)
        in_spec_mem = pltpu.SMEM
    else:  # pragma: no cover
        raise RuntimeError("pallas tpu backend unavailable")

    out0, out1 = pl.pallas_call(
        _scatter_kernel,
        grid=(blocks,),
        in_specs=[
            pl.BlockSpec((1, _BLOCK), lambda i: (0, i), memory_space=in_spec_mem),
            pl.BlockSpec((1, _BLOCK), lambda i: (0, i), memory_space=in_spec_mem),
            pl.BlockSpec((1, _BLOCK), lambda i: (0, i), memory_space=in_spec_mem),
        ],
        out_specs=[
            pl.BlockSpec((rows, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, 128), jnp.float32),
            jax.ShapeDtypeStruct((rows, 128), jnp.float32),
        ],
        scratch_shapes=scratch,
        interpret=interpret,
        **kwargs,
    )(idx2, v0, v1)
    return jnp.stack([out0.reshape(-1), out1.reshape(-1)], axis=-1)


def scatter_add_reference(idx, updates, table_size):
    """XLA reference for testing."""
    return jnp.zeros((table_size, 2), updates.dtype).at[idx].add(updates)


# ---------------------------------------------------------------------------
# custom-VJP row gather whose backward is the Pallas scatter


def _use_pallas() -> bool:
    try:
        return _HAS_PLTPU and jax.devices()[0].platform not in ("cpu",)
    except Exception:  # pragma: no cover
        return False


@jax.custom_vjp
def take_rows(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """``table[idx]`` whose transpose is the lane-ownership Pallas scatter.

    table: [T, F=2]; idx: [...], int32 → [..., F].

    NOTE: custom_vjp functions cannot be forward-mode differentiated — the
    SDF field computes its spatial gradients with analytic encode
    derivatives (``HashGridEncoding.encode_with_dx``) precisely so no JVP
    ever passes through here."""
    return jnp.take(table, idx, axis=0)


def _take_rows_fwd(table, idx):
    return jnp.take(table, idx, axis=0), (idx, table.shape[0])


def _take_rows_bwd(res, g):
    idx, t = res
    flat_idx = idx.reshape(-1)
    flat_g = g.reshape(-1, g.shape[-1])
    if _use_pallas() and t % 128 == 0 and flat_g.shape[-1] == 2 and flat_g.dtype == jnp.float32:
        dtable = scatter_add_tablegrad(flat_idx, flat_g, t)
    else:
        dtable = jnp.zeros((t, flat_g.shape[-1]), flat_g.dtype).at[flat_idx].add(flat_g)
    return dtable, None


take_rows.defvjp(_take_rows_fwd, _take_rows_bwd)


# ---------------------------------------------------------------------------
# stochastic-corner interpolated gather: exact forward, sampled backward


@jax.custom_vjp
def take_interp_stoch(
    t2: jnp.ndarray, idx: jnp.ndarray, w: jnp.ndarray, u: jnp.ndarray
) -> jnp.ndarray:
    """Interpolated level lookup with a stochastic-corner table gradient.

    t2: [F, T]; idx, w: [8, N]; u: [N] uniforms → out [F, N] = Σ_c w_c·t2[:, idx_c].

    Forward is EXACT.  The backward table gradient samples ONE corner per
    sample from Categorical(w/Σw) (independent of the cotangent, so the
    estimator is unbiased) and scatters ``g·Σw`` there — 8× fewer scatter
    rows.  For trilinear weights Σw = 1, so the scattered value is just
    ``g``: importance sampling exactly cancels the weight.

    The ``w`` cotangent is ZERO — only use this where positions (and hence
    w) carry no gradient, e.g. the proposal density fields whose inputs are
    stop-gradient resampled bins (``sampling/proposal.py``).  ``u`` is
    non-differentiable."""
    feats = jnp.take(t2, idx, axis=1)  # [F, 8, N]
    return jnp.sum(w[None] * feats, axis=1)


def _take_interp_stoch_fwd(t2, idx, w, u):
    return take_interp_stoch(t2, idx, w, u), (idx, w, u, t2.shape)


def _take_interp_stoch_bwd(res, g):
    idx, w, u, (f, t) = res
    # corner ~ Categorical(w / Σw): inverse-CDF with one uniform per sample
    rows, wsum = _sample_corner(idx, w, u)
    vals = g * wsum[None, :]  # [F, N]
    if _use_pallas() and t % 128 == 0 and f == 2 and vals.dtype == jnp.float32:
        dtable = scatter_add_tablegrad_t(rows, vals, t)  # [2, T]
    else:
        dtable = jnp.zeros((t, f), vals.dtype).at[rows].add(vals.T).T
    return dtable, None, jnp.zeros_like(w), None


take_interp_stoch.defvjp(_take_interp_stoch_fwd, _take_interp_stoch_bwd)


def _sample_corner(idx, w, u):
    """corner ~ Categorical(w/Σw) per sample → (rows [N], Σw [N])."""
    wsum = jnp.sum(w, axis=0)  # [N] (≈1 for trilinear)
    cdf = jnp.cumsum(w, axis=0)  # [8, N]
    c_star = jnp.sum((cdf < (u * wsum)[None, :]).astype(jnp.int32), axis=0)
    c_star = jnp.clip(c_star, 0, w.shape[0] - 1)  # [N]
    rows = jnp.take_along_axis(idx, c_star[None, :], axis=0)[0]  # [N]
    return rows, wsum


@jax.custom_vjp
def take_interp_stoch_fp(
    t2: jnp.ndarray, idx: jnp.ndarray, w: jnp.ndarray, u: jnp.ndarray
) -> jnp.ndarray:
    """FULLY stochastic interpolated lookup: ONE importance-sampled corner
    per sample in the forward AND the backward.

    t2: [F, T]; idx, w: [8, N]; u: [N] uniforms →
    out [F, N] = Σw · t2[:, idx_{c*}],  c* ~ Categorical(w/Σw).

    E[out] = Σ_c w_c·t2[:, idx_c] — the exact trilinear interpolation — and
    the backward scatters ``g·Σw`` to the same sampled corner, which is the
    exact gradient OF THE SAMPLED ESTIMATOR (so forward noise and gradient
    stay consistent) and an unbiased estimate of the true table gradient.

    8× fewer gather rows than the exact forward — this is the hot-path
    variant for the PROPOSAL density fields, whose output only guides PDF
    resampling (positions are stop-gradient bins; forward noise dithers the
    proposal CDF, which is already stochastic).  Do NOT use for fields
    whose values must be exact (the SDF).  The ``w`` cotangent is ZERO."""
    rows, wsum = _sample_corner(idx, w, u)
    return jnp.take(t2, rows, axis=1) * wsum[None].astype(t2.dtype)


def _take_interp_stoch_fp_fwd(t2, idx, w, u):
    rows, wsum = _sample_corner(idx, w, u)
    out = jnp.take(t2, rows, axis=1) * wsum[None].astype(t2.dtype)
    return out, (rows, wsum, w.shape, t2.shape)


def _take_interp_stoch_fp_bwd(res, g):
    rows, wsum, w_shape, (f, t) = res
    vals = g * wsum[None, :].astype(g.dtype)  # [F, N]
    if _use_pallas() and t % 128 == 0 and f == 2 and vals.dtype == jnp.float32:
        dtable = scatter_add_tablegrad_t(rows, vals, t)  # [2, T]
    else:
        dtable = jnp.zeros((t, f), vals.dtype).at[rows].add(vals.T).T
    return dtable, None, jnp.zeros(w_shape, vals.dtype), None


take_interp_stoch_fp.defvjp(_take_interp_stoch_fp_fwd, _take_interp_stoch_fp_bwd)


# ---------------------------------------------------------------------------
# flat-level gather: t_flat [F*T], idx [8, N] → [F, 8, N]
#
# 1-D gathers cannot trigger XLA's transposed-operand staging (observed for
# the axis-1 gather from [F, T]); the VJP is the lane-ownership scatter.


from functools import partial


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def take_level_flat(t_flat: jnp.ndarray, idx: jnp.ndarray, table_size: int):
    """One hash level's gather from the flat [F·T] view.

    t_flat: [F*T] (bitcast of a [F, T] level); idx: [8, N] int32 →
    [F, 8, N].  Same forward-mode caveat as ``take_rows``."""
    f = t_flat.shape[0] // table_size
    return jnp.stack(
        [jnp.take(t_flat, idx + fi * table_size) for fi in range(f)], axis=0
    )


def _take_level_flat_fwd(t_flat, idx, table_size):
    return take_level_flat(t_flat, idx, table_size), (idx, t_flat.shape[0])


def _take_level_flat_bwd(table_size, res, g):
    idx, ft = res
    f = ft // table_size
    flat_idx = idx.reshape(-1)  # [M]
    gf = g.reshape(f, -1)  # [F, M]
    if _use_pallas() and table_size % 128 == 0 and f == 2 and gf.dtype == jnp.float32:
        d = scatter_add_tablegrad_t(flat_idx, gf, table_size)  # [2, T]
        dtable = d.reshape(-1)  # [2T] — plane-major, matches the flat view
    else:
        dtable = jnp.zeros((ft,), gf.dtype)
        for fi in range(f):
            dtable = dtable.at[flat_idx + fi * table_size].add(gf[fi])
    return dtable, None


take_level_flat.defvjp(_take_level_flat_fwd, _take_level_flat_bwd)


# ---------------------------------------------------------------------------
# transposed-layout gather: table [F, T], idx [..., N] → [F, ..., N]


@jax.custom_vjp
def take_level(t2: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """One hash level's gather in the pad-free transposed layout.

    t2: [F=2, T] (one level of the [L, F, T] table); idx: [8, N] int32 →
    [F, 8, N].  Every operand/result has minor dim N or T — nothing
    tile-pads.  The VJP's table gradient is the lane-ownership Pallas
    scatter (``scatter_add_tablegrad``), emitted as the matching [F, T]
    planes.  Same forward-mode caveat as ``take_rows``."""
    return jnp.take(t2, idx, axis=1)


def _take_level_fwd(t2, idx):
    return jnp.take(t2, idx, axis=1), (idx, t2.shape)


def _take_level_bwd(res, g):
    idx, shape = res
    f, t = shape
    flat_idx = idx.reshape(-1)  # [M]
    gf = g.reshape(f, -1)  # [F, M]
    if _use_pallas() and t % 128 == 0 and f == 2 and gf.dtype == jnp.float32:
        dtable = scatter_add_tablegrad_t(flat_idx, gf, t)  # [2, T]
    else:
        dtable = (
            jnp.zeros((t, f), gf.dtype).at[flat_idx].add(gf.T).T
        )  # [F, T]
    return dtable, None


take_level.defvjp(_take_level_fwd, _take_level_bwd)


def scatter_add_tablegrad_t(
    idx: jnp.ndarray, updates_ft: jnp.ndarray, table_size: int, interpret: bool = False
) -> jnp.ndarray:
    """Σ-scatter in transposed layout: updates [F=2, M] at rows ``idx`` [M]
    into a [2, T] gradient table (planes emitted directly — no transposes).
    """
    assert table_size % 128 == 0
    m = idx.shape[0]
    blocks = -(-m // _BLOCK)
    pad = blocks * _BLOCK - m
    if pad:
        idx = jnp.concatenate([idx, jnp.zeros((pad,), idx.dtype)])
        updates_ft = jnp.concatenate(
            [updates_ft, jnp.zeros((2, pad), updates_ft.dtype)], axis=1
        )

    idx2 = idx.reshape(1, -1)
    v0 = updates_ft[0].reshape(1, -1)
    v1 = updates_ft[1].reshape(1, -1)
    rows = table_size // 128

    if not _HAS_PLTPU:  # pragma: no cover
        raise RuntimeError("pallas tpu backend unavailable")
    scratch = [pltpu.VMEM((rows, 128), jnp.float32) for _ in range(4)]

    out0, out1 = pl.pallas_call(
        _scatter_kernel,
        grid=(blocks,),
        in_specs=[
            pl.BlockSpec((1, _BLOCK), lambda i: (0, i), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, _BLOCK), lambda i: (0, i), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, _BLOCK), lambda i: (0, i), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((rows, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, 128), jnp.float32),
            jax.ShapeDtypeStruct((rows, 128), jnp.float32),
        ],
        scratch_shapes=scratch,
        interpret=interpret,
    )(idx2, v0, v1)
    return jnp.stack([out0.reshape(-1), out1.reshape(-1)], axis=0)  # [2, T]
