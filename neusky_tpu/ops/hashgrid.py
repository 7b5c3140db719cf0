"""Multi-resolution hash-grid encoding (Instant-NGP style), TPU-native.

Replaces the reference's dependency on tiny-cuda-nn (``tcnn.Encoding`` with
``otype=HashGrid``, ``sdf_albedo_field.py:119-130`` and
``directional_distance_field.py:146-175``).

Design notes (TPU, all trace-driven — see PERF.md):
  - **Per-level, pad-free, fusion-friendly data flow.**  Corner indices and
    interpolation weights are computed per level as ``[8, N]`` (minor dim =
    N, exactly one (8, 128) tile row per lane block; level resolution and
    dense/hashed choice are Python-static) so they fuse straight into their
    consumers — stacking all levels into ``[L, 8, N]`` and slicing made XLA
    materialize the stack and issue ~1k async DMA slices per step.
  - **Axis-1 gathers from the [F, T] level.**  ``take(table[lvl], idx,
    axis=1) → [F, 8, N]``.  XLA stages a transposed ``[T, F]`` copy of the
    level for this, but the alternative — 1-D gathers from the flat
    ``[F·T]`` view — measured 1.8× slower end-to-end (XLA's 1-D gather
    path), so the staging copy is the better trade.
  - Smoothstep interpolation (``tcnn "Smoothstep"``) is supported; unlike
    trilinear it has non-vanishing second derivatives.
  - The table-gradient scatter runs through a Pallas lane-ownership kernel
    (``ops/hashgrid_pallas.py``, 7.3× over XLA's serialized scatter) wired
    in via the per-level custom-VJP ops ``_level_encode(_dx)`` whose only
    saved residual is the positions (indices/weights are recomputed in
    backward); since custom_vjp cannot be forward-mode differentiated,
    ``encode_with_dx`` provides closed-form position derivatives so SDF
    spatial gradients never JVP through the gather.

The hash function matches Instant-NGP: xor of coordinates times the primes
(1, 2654435761, 805459861), masked to the table size.  Levels whose dense
grid fits in the table are indexed densely (tcnn behaviour).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_PRIMES = (1, 2654435761, 805459861)


def _take_ft(t2: jnp.ndarray, idx: jnp.ndarray, bf16: bool) -> jnp.ndarray:
    """Axis-1 corner gather from a level table ``t2 [F, T]``.

    ``bf16=True`` gathers from a bf16 cast of the level (one cast per level
    per step — XLA CSEs the repeats), halving the random-access gather
    bytes while the master table stays fp32.  Callers upcast after
    interpolation so encode outputs / custom-VJP cotangent dtypes are
    unchanged (the Pallas scatter requires f32 cotangents)."""
    if bf16:
        t2 = t2.astype(jnp.bfloat16)
    return jnp.take(t2, idx, axis=1)


@dataclasses.dataclass(frozen=True)
class HashGridConfig:
    num_levels: int = 16
    features_per_level: int = 2
    log2_hashmap_size: int = 19
    base_res: int = 16
    max_res: int = 2048
    use_hash: bool = True  # False → dense grid at every level (small tables)
    smoothstep: bool = False
    vectorized: bool = False
    """Batch all levels into ONE gather + ONE interpolation contraction
    (single custom-VJP op) instead of 16 per-level ops.  Hypothesis was
    that the per-level tail of ~30 small (≤50 µs) ops × 16 levels × 4
    call sites dominated the step; measured on v5e the OPPOSITE holds:
    vectorized = 3,736 rays/s vs per-level = 5,011 rays/s (bench r2,
    `NEUSKY_VECTORIZED` A/B) — the [L,...] batched gathers force worse
    table layouts than natural per-level [F,T] takes (same pathology as
    round-1's flat-table experiment, commit bc52214).  Kept off by
    default; the implementation is bit-matched to the per-level ops
    (tests/test_encodings.py::TestVectorizedLevels) and may win on other
    backends.  Backward always scatters per level through the Pallas
    lane-ownership kernel (a joint [L·T] accumulator exceeds VMEM)."""
    layout_barrier: bool = True
    """Wrap the encode output in an optimization_barrier so XLA cannot
    propagate the consuming matmul's layout back onto the gather/scatter —
    observed to slow the table scatter-adds by >100× on TPU."""
    bf16_gather: bool = False
    """Route corner gathers through a bf16 cast of the level table (halves
    the gathered bytes; the fp32 master table, the Pallas scatter backward,
    and the encode OUTPUT dtype are unchanged — interpolation runs in bf16
    and upcasts).  Feature precision drops to bf16 rounding (~2^-8
    relative), far below the gradient noise the stochastic estimators
    already inject (PERF.md r3 exact-vs-stoch A/B).  Per-level path only;
    A/B via ``NEUSKY_BF16_TABLES``."""

    @property
    def table_size(self) -> int:
        return 1 << self.log2_hashmap_size

    @property
    def out_dim(self) -> int:
        return self.num_levels * self.features_per_level

    @property
    def growth_factor(self) -> float:
        if self.num_levels == 1:
            return 1.0
        return float(
            np.exp((np.log(self.max_res) - np.log(self.base_res)) / (self.num_levels - 1))
        )

    def resolutions(self) -> Tuple[int, ...]:
        g = self.growth_factor
        return tuple(
            int(np.floor(self.base_res * (g**lvl))) for lvl in range(self.num_levels)
        )


class HashGridEncoding:
    """Functional hash-grid: ``init(rng) -> table``, ``__call__(table, x)``.

    ``x`` must live in [0, 1]^3 (callers contract/normalise first).
    Table shape: [num_levels, features_per_level, table_size].
    """

    def __init__(self, config: HashGridConfig):
        self.config = config
        res = config.resolutions()
        self._resolutions = np.asarray(res, dtype=np.int32)
        # Per-level dense indexing when the grid fits in the table (tcnn rule).
        self._dense = np.array(
            [
                (not config.use_hash) or ((r + 1) ** 3 <= config.table_size)
                for r in res
            ]
        )
        # The 8 corner offsets.
        self._corners = np.array(
            [[i, j, k] for i in (0, 1) for j in (0, 1) for k in (0, 1)],
            dtype=np.int32,
        )  # [8, 3]

    @property
    def out_dim(self) -> int:
        return self.config.out_dim

    def init(self, rng: jax.Array, dtype=jnp.float32) -> jnp.ndarray:
        """tcnn-style init: uniform in [-1e-4, 1e-4].  Shape [L, F, T]."""
        c = self.config
        return jax.random.uniform(
            rng,
            (c.num_levels, c.features_per_level, c.table_size),
            dtype=dtype,
            minval=-1e-4,
            maxval=1e-4,
        )

    def _level_iw(self, xt: jnp.ndarray, lvl: int, need_dw: bool):
        """One level's corner indices / weights (transposed, pad-free).

        xt: [3, N] (= x.T, shared across levels) →
        (idx [8, N] int32, W [8, N], dW [3, 8, N] | None).

        Everything level-specific (resolution, dense-vs-hash) is Python-
        static, so the per-level arithmetic fuses into the gather/consumers
        without any [L, ...] stack ever materializing.
        """
        c = self.config
        res = int(self._resolutions[lvl])
        resf = jnp.asarray(float(res), xt.dtype)
        scaled = xt * resf  # [3, N]
        floor = jnp.floor(scaled)
        frac = scaled - floor  # [3, N]
        base = floor.astype(jnp.int32)

        corners = jnp.asarray(self._corners)  # [8, 3]
        coords = base[None, :, :] + corners[:, :, None]  # [8, 3, N]

        if self._dense[lvl]:
            rp1 = res + 1
            cc = jnp.minimum(coords, res)
            idx = cc[:, 0] + cc[:, 1] * rp1 + cc[:, 2] * (rp1 * rp1)
            idx = jnp.minimum(idx, c.table_size - 1)  # [8, N]
        else:
            p = jnp.asarray(_PRIMES, dtype=jnp.uint32)
            cu = coords.astype(jnp.uint32)
            hashed = (cu[:, 0] * p[0]) ^ (cu[:, 1] * p[1]) ^ (cu[:, 2] * p[2])
            idx = (hashed & jnp.uint32(c.table_size - 1)).astype(jnp.int32)

        if c.smoothstep:
            u = frac * frac * (3.0 - 2.0 * frac)
            du = 6.0 * frac * (1.0 - frac) * resf  # chain rule: frac = x·res
        else:
            u = frac
            du = None  # identity interp: du == res (constant)

        cb = corners[:, :, None]  # [8, 3, 1]
        omega = jnp.where(cb == 1, u[None], 1.0 - u[None])  # [8, 3, N]
        W = omega[:, 0] * omega[:, 1] * omega[:, 2]  # [8, N]
        if not need_dw:
            return idx, W, None
        sign = jnp.where(cb == 1, 1.0, -1.0).astype(xt.dtype)  # [8, 3, 1]
        dWs = []
        for a in range(3):
            others = [b for b in range(3) if b != a]
            prod_others = omega[:, others[0]] * omega[:, others[1]]  # [8, N]
            if du is None:
                d = sign[:, a] * resf * prod_others
            else:
                d = sign[:, a] * du[None, a] * prod_others
            dWs.append(d)
        return idx, W, jnp.stack(dWs, axis=0)  # [3, 8, N]

    def _assemble(self, per_level, n):
        """per_level: list of L arrays [F, N] → [N, L*F] (feature-within-
        level ordering, matching tcnn's concat of per-level features)."""
        stacked = jnp.stack(per_level, axis=0)  # [L, F, N]
        return stacked.transpose(2, 0, 1).reshape(n, -1)  # [N, L*F]

    def _all_iw(self, xt: jnp.ndarray, need_dw: bool):
        """ALL levels' corner indices / weights in one vectorized graph.

        xt: [3, N] → (idx [L, 8, N] int32, W [L, 8, N],
        dW [L, 3, 8, N] | None).

        Semantically identical to L calls of ``_level_iw`` stacked on axis
        0, but emitted as single [L, ...] ops so each hash call site is a
        handful of large fusions instead of ~30 small ops × L levels (the
        dispatch-tail hypothesis — measured SLOWER overall on v5e, see
        ``HashGridConfig.vectorized``; kept for other backends).  Both the
        dense and hashed index formulas are computed for every level and
        selected by the static per-level mask; the dense arithmetic is
        clamped to the largest in-table resolution so it cannot overflow
        int32 at hashed-level resolutions (its value there is discarded).
        """
        c = self.config
        l = c.num_levels
        resf = jnp.asarray(self._resolutions, xt.dtype)[:, None, None]  # [L,1,1]
        scaled = xt[None] * resf  # [L, 3, N]
        floor = jnp.floor(scaled)
        frac = scaled - floor  # [L, 3, N]
        base = floor.astype(jnp.int32)

        corners = jnp.asarray(self._corners)  # [8, 3]
        coords = base[:, None, :, :] + corners[None, :, :, None]  # [L, 8, 3, N]

        # per-level dense resolution, zeroed on hashed levels so the dense
        # arithmetic can never overflow int32 there (its value is discarded
        # by the select below); exact integer rule, no float cube roots
        res_dense = np.where(self._dense, self._resolutions, 0).astype(np.int32)
        res_safe = jnp.asarray(res_dense)[:, None, None, None]  # [L,1,1,1]
        cc = jnp.minimum(coords, res_safe)  # [L, 8, 3, N]
        rp1 = (res_safe + 1)[:, :, 0, :]  # [L, 1, 1]
        idx_dense = cc[:, :, 0, :] + cc[:, :, 1, :] * rp1 + cc[:, :, 2, :] * (rp1 * rp1)
        idx_dense = jnp.minimum(idx_dense, c.table_size - 1)  # [L, 8, N]

        p = jnp.asarray(_PRIMES, dtype=jnp.uint32)
        cu = coords.astype(jnp.uint32)
        hashed = (cu[:, :, 0, :] * p[0]) ^ (cu[:, :, 1, :] * p[1]) ^ (
            cu[:, :, 2, :] * p[2]
        )
        idx_hash = (hashed & jnp.uint32(c.table_size - 1)).astype(jnp.int32)

        dense_mask = jnp.asarray(self._dense)[:, None, None]  # [L,1,1] bool
        idx = jnp.where(dense_mask, idx_dense, idx_hash)  # [L, 8, N]

        if c.smoothstep:
            u = frac * frac * (3.0 - 2.0 * frac)
            du = 6.0 * frac * (1.0 - frac) * resf  # [L, 3, N]
        else:
            u = frac
            du = None  # identity interp: du == resf (constant per level)

        cb = corners[None, :, :, None]  # [1, 8, 3, 1]
        omega = jnp.where(cb == 1, u[:, None], 1.0 - u[:, None])  # [L, 8, 3, N]
        W = omega[:, :, 0, :] * omega[:, :, 1, :] * omega[:, :, 2, :]  # [L, 8, N]
        if not need_dw:
            return idx, W, None
        sign = jnp.where(cb == 1, 1.0, -1.0).astype(xt.dtype)  # [1, 8, 3, 1]
        dWs = []
        for a in range(3):
            others = [b for b in range(3) if b != a]
            prod_others = omega[:, :, others[0], :] * omega[:, :, others[1], :]
            if du is None:
                d = sign[:, :, a, :] * resf[:, None, 0, :] * prod_others
            else:
                d = sign[:, :, a, :] * du[:, None, a, :] * prod_others
            dWs.append(d)  # [L, 8, N]
        return idx, W, jnp.stack(dWs, axis=1)  # [L, 3, 8, N]

    def __call__(
        self,
        table: jnp.ndarray,
        x: jnp.ndarray,
        custom_take: bool = False,
        stoch_u: Optional[jnp.ndarray] = None,
        stoch_salt: Optional[jnp.ndarray] = None,
        stoch_fwd: bool = False,
        stoch_dxt: bool = False,
    ) -> jnp.ndarray:
        """Encode positions. x: [N, 3] in [0,1] → [N, L*F].

        ``stoch_u`` ([N] uniforms): use the stochastic-corner table
        gradient (exact forward, one sampled scatter row per sample/level
        in backward — see ``take_interp_stoch``; only valid where positions
        carry no gradient).  With ``stoch_fwd=True`` the FORWARD samples
        the same single corner too (``take_interp_stoch_fp`` — unbiased
        dither, 8× fewer gather rows; proposal-density-only).  The uniform
        is golden-ratio-shifted per level so corner draws decorrelate
        across levels.

        ``stoch_salt`` (uint32 scalar, requires ``custom_take``): the
        residual-free custom-take path with a stochastic-corner TABLE
        gradient — exact forward AND exact position cotangent, one scatter
        row per sample/level (``_level_encode_stoch``).  Pass a fresh salt
        per training step; ``None`` → exact 8-corner table gradient.

        ``custom_take=True`` additionally makes each level's encode a
        single custom-VJP op whose only residual is the positions —
        indices/weights are RECOMPUTED in the backward pass (cheap VPU
        math) instead of being saved, which removes ~1 GB/step of
        residual-array DMA at canonical scale.  Positions receive the TRUE
        (recomputed) cotangent — ``_level_encode_bwd`` derives it from the
        weight derivatives; the DDF level-set loss depends on it
        (∂sdf/∂x·∂x/∂DDF, reference ``ddf_model.py:241-251``) and tests
        assert it.  Only ``_level_encode_dx`` zeroes the position
        cotangent (its callers differentiate positions analytically)."""
        c = self.config
        n = x.shape[0]
        xt = x.T  # [3, N]
        if c.vectorized:
            if stoch_dxt and stoch_salt is not None:
                raise NotImplementedError(
                    "stoch_dxt is implemented for the per-level encode only "
                    "(HashGridConfig.vectorized=False, the measured default)"
                )
            if stoch_u is not None and stoch_fwd:
                out = _encode_all_stoch_fp(self, table, xt, stoch_u)
            elif stoch_u is not None:
                out = _encode_all_stoch_u(self, table, xt, stoch_u)
            elif custom_take and stoch_salt is not None:
                out = _encode_all_stoch(self, table, xt, stoch_salt)
            elif custom_take:
                out = _encode_all(self, table, xt)
            else:
                # JVP-safe (no custom VJP) — eval/tests
                out = _encode_all_plain(self, table, xt)
            if c.layout_barrier:
                out = jax.lax.optimization_barrier(out)
            return out
        if stoch_u is not None:
            from neusky_tpu.ops.hashgrid_pallas import (
                take_interp_stoch,
                take_interp_stoch_fp,
            )
        outs = []
        for lvl in range(c.num_levels):
            if custom_take and stoch_u is None and stoch_salt is not None:
                # stochastic-corner TABLE grad, exact forward + position
                # cotangent (8× fewer scatter rows); stoch_dxt additionally
                # samples the position cotangent (8× fewer BWD gather rows)
                op = _level_encode_stoch_sdxt if stoch_dxt else _level_encode_stoch
                outs.append(op(self, lvl, table[lvl], xt, stoch_salt))
                continue
            if custom_take and stoch_u is None:
                outs.append(_level_encode(self, lvl, table[lvl], xt))
                continue
            idx, W, _ = self._level_iw(xt, lvl, need_dw=False)
            w = W.astype(table.dtype)
            if stoch_u is not None:
                # decorrelate corner draws across levels (golden-ratio
                # shift — cheap, keeps one [N] uniform input)
                u_l = jnp.mod(stoch_u + (0.6180339887 * lvl) % 1.0, 1.0)
                take = take_interp_stoch_fp if stoch_fwd else take_interp_stoch
                outs.append(take(table[lvl], idx, w, u_l))
            else:
                feats = _take_ft(table[lvl], idx, c.bf16_gather)  # [F, 8, N]
                outs.append(
                    jnp.sum(W.astype(feats.dtype)[None] * feats, axis=1)
                    .astype(table.dtype)
                )  # [F, N]
        out = self._assemble(outs, n)
        if c.layout_barrier:
            out = jax.lax.optimization_barrier(out)
        return out


    def encode_with_dx(
        self,
        table: jnp.ndarray,
        x: jnp.ndarray,
        custom_take: bool = True,
        stoch_salt: Optional[jnp.ndarray] = None,
    ):
        """Encode + analytic position derivative.

        ``stoch_salt`` (uint32 scalar): stochastic-corner TABLE gradient —
        forward and the analytic dx stay exact; only the backward scatter
        samples one uniform corner per sample/level at 8× weight
        (``_level_encode_dx_stoch``).

        x: [N, 3] in [0,1] → (out [N, L*F], dout_dx [N, 3, L*F]).

        The derivative is closed-form from the interpolation weights
        (∂W_c/∂x_a = ±u'_a · Π_{b≠a} ω_b), so the SDF's spatial gradient
        never needs AD *through* the gather — which lets the gather be the
        custom-VJP ``take_level_flat`` with the Pallas scatter backward
        (custom_vjp cannot be forward-mode differentiated)."""
        c = self.config
        n = x.shape[0]
        xt = x.T
        if c.vectorized and custom_take:
            if stoch_salt is not None:
                out, dout = _encode_all_dx_stoch(self, table, xt, stoch_salt)
            else:
                out, dout = _encode_all_dx(self, table, xt)
            if c.layout_barrier:
                out, dout = jax.lax.optimization_barrier((out, dout))
            return out, dout
        outs = []
        douts = [[], [], []]
        for lvl in range(c.num_levels):
            if custom_take and stoch_salt is not None:
                o, d0, d1, d2 = _level_encode_dx_stoch(
                    self, lvl, table[lvl], xt, stoch_salt
                )
                outs.append(o)
                for a, d in enumerate((d0, d1, d2)):
                    douts[a].append(d)
                continue
            if custom_take:
                o, d0, d1, d2 = _level_encode_dx(self, lvl, table[lvl], xt)
                outs.append(o)
                for a, d in enumerate((d0, d1, d2)):
                    douts[a].append(d)
                continue
            idx, W, dW = self._level_iw(xt, lvl, need_dw=True)
            feats = _take_ft(table[lvl], idx, c.bf16_gather)  # [F, 8, N]
            w = W.astype(feats.dtype)
            dw = dW.astype(feats.dtype)
            outs.append(jnp.sum(w[None] * feats, axis=1).astype(table.dtype))
            for a in range(3):
                douts[a].append(
                    jnp.sum(dw[a][None] * feats, axis=1).astype(table.dtype)
                )
        out = self._assemble(outs, n)  # [N, L*F]
        dout = jnp.stack(
            [self._assemble(d, n) for d in douts], axis=1
        )  # [N, 3, L*F]
        if c.layout_barrier:
            out, dout = jax.lax.optimization_barrier((out, dout))
        return out, dout


# ---------------------------------------------------------------------------
# per-level encode as a single custom-VJP op: residual = positions only
#
# Backward RECOMPUTES indices/weights from the positions (a handful of VPU
# ops) instead of saving [8, N] / [3, 8, N] residual arrays — at canonical
# scale the saved-residual traffic was ~1 GB/step of async DMA (trace).
# The gather itself is NOT needed in backward (feats only matter for w/x
# cotangents, and positions are non-differentiated leaves by design — the
# SDF's spatial gradient is the analytic ``encode_with_dx`` output).
# NOTE: custom_vjp ⇒ no forward-mode AD through these (same restriction as
# the take_* ops; all JVP paths use the analytic derivatives).
#
# The axis-1 gather from the [F, T] level is kept: a flat [F·T] 1-D-gather
# variant measured 1.8× slower end-to-end on v5e despite avoiding the
# [T, F] transposed staging copy.


def _scatter_ft(rows: jnp.ndarray, vals: jnp.ndarray, t: int) -> jnp.ndarray:
    """rows [M], vals [F, M] → [F, T] gradient table (Pallas on TPU)."""
    from neusky_tpu.ops.hashgrid_pallas import (
        _use_pallas,
        scatter_add_tablegrad_t,
    )

    f = vals.shape[0]
    # dtype gate: the Pallas kernel emits float32; a non-f32 table would get
    # a dtype-mismatched custom_vjp cotangent (ADVICE r1)
    if _use_pallas() and t % 128 == 0 and f == 2 and vals.dtype == jnp.float32:
        return scatter_add_tablegrad_t(rows, vals, t)
    return jnp.zeros((t, f), vals.dtype).at[rows].add(vals.T).T


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _level_encode(enc: "HashGridEncoding", lvl: int, t2, xt):
    """One level's interpolated encode: t2 [F, T], xt [3, N] → [F, N]."""
    idx, W, _ = enc._level_iw(xt, lvl, need_dw=False)
    feats = _take_ft(t2, idx, enc.config.bf16_gather)  # [F, 8, N]
    return jnp.sum(W.astype(feats.dtype)[None] * feats, axis=1).astype(t2.dtype)


def _level_encode_fwd(enc, lvl, t2, xt):
    return _level_encode(enc, lvl, t2, xt), (t2, xt)


def _level_encode_bwd(enc, lvl, res, g):
    """True cotangents for BOTH table and positions.

    The position cotangent matters: ``sdf_only`` runs at DDF termination
    points, and the level-set loss trains the DDF *through* those points
    (∂sdf/∂x · ∂x/∂DDF — reference ``ddf_model.py:241-251``).  Everything
    is recomputed from xt (indices, weights, weight derivatives, plus a
    re-gather of the level features) rather than saved as residuals."""
    t2, xt = res
    idx, W, dW = enc._level_iw(xt, lvl, need_dw=True)
    w_upd = W.astype(g.dtype)[None] * g[:, None, :]  # [F, 8, N]
    d = _scatter_ft(idx.reshape(-1), w_upd.reshape(g.shape[0], -1), t2.shape[1])
    # dL/dxt[a, n] = Σ_c dW[a,c,n] · Σ_f g[f,n] · feats[f,c,n]
    feats = _take_ft(t2, idx, enc.config.bf16_gather)  # [F, 8, N]
    gf = jnp.sum(g[:, None, :] * feats.astype(g.dtype), axis=0)  # [8, N]
    dxt = jnp.sum(dW.astype(g.dtype) * gf[None], axis=1)  # [3, N]
    return d, dxt


_level_encode.defvjp(_level_encode_fwd, _level_encode_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _level_encode_dx(enc: "HashGridEncoding", lvl: int, t2, xt):
    """Encode + analytic d/dx: → (out [F,N], d0 [F,N], d1 [F,N], d2 [F,N])."""
    idx, W, dW = enc._level_iw(xt, lvl, need_dw=True)
    feats = _take_ft(t2, idx, enc.config.bf16_gather)  # [F, 8, N]
    w = W.astype(feats.dtype)
    dw = dW.astype(feats.dtype)
    out = jnp.sum(w[None] * feats, axis=1).astype(t2.dtype)
    ds = tuple(
        jnp.sum(dw[a][None] * feats, axis=1).astype(t2.dtype) for a in range(3)
    )
    return (out,) + ds


def _level_encode_dx_fwd(enc, lvl, t2, xt):
    return _level_encode_dx(enc, lvl, t2, xt), (xt, t2.shape[1])


def _level_encode_dx_bwd(enc, lvl, res, gs):
    xt, t = res
    g_out, g0, g1, g2 = gs
    idx, W, dW = enc._level_iw(xt, lvl, need_dw=True)  # recompute
    w = W.astype(g_out.dtype)
    dw = dW.astype(g_out.dtype)
    upd = w[None] * g_out[:, None, :]
    for a, ga in enumerate((g0, g1, g2)):
        upd = upd + dw[a][None] * ga[:, None, :]
    d = _scatter_ft(idx.reshape(-1), upd.reshape(g_out.shape[0], -1), t)
    return d, jnp.zeros_like(xt)


_level_encode_dx.defvjp(_level_encode_dx_fwd, _level_encode_dx_bwd)


# ---------------------------------------------------------------------------
# stochastic-corner table gradients: EXACT forward, one sampled scatter row
# per (sample, level) in backward — 8× fewer scatter rows.  Unbiased: the
# corner is drawn from a distribution independent of the cotangent; the
# per-step ``salt`` decorrelates draws across steps so even a position
# queried every step receives the correct expected gradient.  Scatter-add
# runs at ~100M rows/s on this chip (trace, PERF.md) and dominates the
# training step, so row count IS the cost model.


def _cheap_hash_u(n: int, lvl: int, salt: jnp.ndarray) -> jnp.ndarray:
    """[N] uniforms in [0, 1) from (lane index, level, salt) — Wang-style
    integer mix; quality is ample for corner sampling."""
    x = jnp.arange(n, dtype=jnp.uint32)
    x = x * jnp.uint32(0x9E3779B9) + jnp.uint32((lvl * 0x85EBCA6B) & 0xFFFFFFFF)
    x = x ^ salt.astype(jnp.uint32)
    x = (x ^ (x >> 16)) * jnp.uint32(0x7FEB352D)
    x = (x ^ (x >> 15)) * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    return x.astype(jnp.float32) * (1.0 / 4294967296.0)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _level_encode_stoch(enc: "HashGridEncoding", lvl: int, t2, xt, salt):
    """= ``_level_encode`` forward; backward scatters ONE corner per sample
    (importance-sampled ~ Categorical(W), value g·ΣW — the trilinear ΣW=1
    case cancels exactly).  Position cotangent stays EXACT (it is analytic
    VPU math + a re-gather, no scatter)."""
    idx, W, _ = enc._level_iw(xt, lvl, need_dw=False)
    feats = _take_ft(t2, idx, enc.config.bf16_gather)  # [F, 8, N]
    return jnp.sum(W.astype(feats.dtype)[None] * feats, axis=1).astype(t2.dtype)


def _level_encode_stoch_fwd(enc, lvl, t2, xt, salt):
    return _level_encode_stoch(enc, lvl, t2, xt, salt), (t2, xt, salt)


def _level_encode_stoch_bwd(enc, lvl, res, g):
    from neusky_tpu.ops.hashgrid_pallas import _sample_corner

    t2, xt, salt = res
    idx, W, dW = enc._level_iw(xt, lvl, need_dw=True)
    n = xt.shape[1]
    u = _cheap_hash_u(n, lvl, salt)
    # single categorical-corner draw — SHARED helper (the vectorized path's
    # bit-match parity tests depend on all copies staying identical)
    rows, wsum = _sample_corner(idx, W.astype(g.dtype), u)
    d = _scatter_ft(rows, g * wsum[None, :], t2.shape[1])
    # exact position cotangent (identical to _level_encode_bwd)
    feats = _take_ft(t2, idx, enc.config.bf16_gather)
    gf = jnp.sum(g[:, None, :] * feats.astype(g.dtype), axis=0)  # [8, N]
    dxt = jnp.sum(dW.astype(g.dtype) * gf[None], axis=1)  # [3, N]
    return d, dxt, jnp.zeros_like(salt)


_level_encode_stoch.defvjp(_level_encode_stoch_fwd, _level_encode_stoch_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _level_encode_stoch_sdxt(enc: "HashGridEncoding", lvl: int, t2, xt, salt):
    """= ``_level_encode_stoch`` forward, but the POSITION cotangent is
    stochastic too: one uniform corner (p = 1/8, value ×8) replaces the
    exact 8-corner feature re-gather in backward.  Cuts the backward gather
    from 8 to 1 row per (sample, level) — the re-gather was ~11% of the
    training step at canonical scale (PERF.md r3 trace).  Unbiased:
    E[8·dW[:,c,:]·Σ_f g·feats_c] = Σ_c dW[:,c,:]·gf_c (uniform c), and the
    draw is decorrelated from the table-grad corner draw (different level
    stream into the salt hash) so table and position noise don't couple."""
    idx, W, _ = enc._level_iw(xt, lvl, need_dw=False)
    feats = _take_ft(t2, idx, enc.config.bf16_gather)  # [F, 8, N]
    return jnp.sum(W.astype(feats.dtype)[None] * feats, axis=1).astype(t2.dtype)


def _level_encode_stoch_sdxt_fwd(enc, lvl, t2, xt, salt):
    return _level_encode_stoch_sdxt(enc, lvl, t2, xt, salt), (t2, xt, salt)


def _level_encode_stoch_sdxt_bwd(enc, lvl, res, g):
    from neusky_tpu.ops.hashgrid_pallas import _sample_corner

    t2, xt, salt = res
    idx, W, dW = enc._level_iw(xt, lvl, need_dw=True)
    n = xt.shape[1]
    # table gradient: identical to _level_encode_stoch_bwd
    u = _cheap_hash_u(n, lvl, salt)
    rows, wsum = _sample_corner(idx, W.astype(g.dtype), u)
    d = _scatter_ft(rows, g * wsum[None, :], t2.shape[1])
    # position cotangent: ONE uniform corner (importance weights don't
    # apply — dW mixes signs), independent stream (lvl offset ≥ num_levels
    # so it never collides with any table-grad draw)
    u2 = _cheap_hash_u(n, lvl + 131, salt)
    c = jnp.minimum((u2 * 8.0).astype(jnp.int32), 7)  # [N]
    rows2 = jnp.take_along_axis(idx, c[None, :], axis=0)[0]  # [N]
    feats_c = _take_ft(t2, rows2, enc.config.bf16_gather).astype(g.dtype)  # [F, N]
    gf = jnp.sum(g * feats_c, axis=0)  # [N]
    dw_c = jnp.take_along_axis(
        dW.astype(g.dtype), jnp.broadcast_to(c[None, None, :], (3, 1, n)), axis=1
    )[:, 0, :]  # [3, N]
    dxt = 8.0 * dw_c * gf[None]
    return d, dxt, jnp.zeros_like(salt)


_level_encode_stoch_sdxt.defvjp(
    _level_encode_stoch_sdxt_fwd, _level_encode_stoch_sdxt_bwd
)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _level_encode_dx_stoch(enc: "HashGridEncoding", lvl: int, t2, xt, salt):
    """= ``_level_encode_dx`` forward; backward samples ONE corner
    UNIFORMLY (p=1/8, value ×8) because the combined cotangent
    w_c·g_out + Σ_a dw_ac·g_a mixes signs, so importance weights don't
    exist — uniform stays unbiased regardless."""
    idx, W, dW = enc._level_iw(xt, lvl, need_dw=True)
    feats = jnp.take(t2, idx, axis=1)
    w = W.astype(t2.dtype)
    dw = dW.astype(t2.dtype)
    out = jnp.sum(w[None] * feats, axis=1)
    ds = tuple(jnp.sum(dw[a][None] * feats, axis=1) for a in range(3))
    return (out,) + ds


def _level_encode_dx_stoch_fwd(enc, lvl, t2, xt, salt):
    return _level_encode_dx_stoch(enc, lvl, t2, xt, salt), (xt, t2.shape[1], salt)


def _level_encode_dx_stoch_bwd(enc, lvl, res, gs):
    xt, t, salt = res
    g_out, g0, g1, g2 = gs
    idx, W, dW = enc._level_iw(xt, lvl, need_dw=True)
    n = xt.shape[1]
    u = _cheap_hash_u(n, lvl, salt)
    c = jnp.minimum((u * 8.0).astype(jnp.int32), 7)  # [N] uniform corner
    rows = jnp.take_along_axis(idx, c[None, :], axis=0)[0]
    w_c = jnp.take_along_axis(W.astype(g_out.dtype), c[None, :], axis=0)  # [1, N]
    upd = w_c * g_out  # [F, N] (broadcast over F)
    for a, ga in enumerate((g0, g1, g2)):
        dw_c = jnp.take_along_axis(dW[a].astype(g_out.dtype), c[None, :], axis=0)
        upd = upd + dw_c * ga
    d = _scatter_ft(rows, 8.0 * upd, t)
    return d, jnp.zeros_like(xt), jnp.zeros_like(salt)


_level_encode_dx_stoch.defvjp(_level_encode_dx_stoch_fwd, _level_encode_dx_stoch_bwd)


# ---------------------------------------------------------------------------
# vectorized (all-levels-in-one) encode ops — see HashGridConfig.vectorized.
#
# One gather + one interpolation contraction for the whole pyramid; each op
# is a single custom-VJP whose only residuals are the positions (+ salt/u).
# Backward recomputes indices/weights vectorized and scatters per level
# through the Pallas kernel (a joint [L·T] accumulator exceeds VMEM).
# Semantics (values, cotangents, AND stochastic corner draws) are bit-
# matched to the per-level ops — tests assert exact parity.


def _gather_all(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """table [L, F, T], idx [L, ..., N] → feats [L, F, ..., N] (one batched
    gather HLO instead of L axis-1 takes)."""
    l = table.shape[0]
    flat = idx.reshape(l, -1)  # [L, M]
    out = jax.vmap(lambda t2, ix: jnp.take(t2, ix, axis=1))(table, flat)
    return out.reshape(table.shape[0], table.shape[1], *idx.shape[1:])


def _assemble_all(out_lfn: jnp.ndarray) -> jnp.ndarray:
    """[L, F, N] → [N, L*F] (same ordering as ``_assemble``)."""
    l, f, n = out_lfn.shape
    return out_lfn.transpose(2, 0, 1).reshape(n, l * f)


def _unassemble_all(g: jnp.ndarray, l: int, f: int) -> jnp.ndarray:
    """[N, L*F] cotangent → [L, F, N]."""
    n = g.shape[0]
    return g.reshape(n, l, f).transpose(1, 2, 0)


def _scatter_levels(rows: jnp.ndarray, vals: jnp.ndarray, t: int) -> jnp.ndarray:
    """Per-level Pallas scatters: rows [L, M], vals [L, F, M] → [L, F, T]."""
    return jnp.stack(
        [
            _scatter_ft(rows[lvl], vals[lvl], t)
            for lvl in range(rows.shape[0])
        ],
        axis=0,
    )


def _cheap_hash_u_all(n: int, l: int, salt: jnp.ndarray) -> jnp.ndarray:
    """[L, N] uniforms — row lvl bit-identical to ``_cheap_hash_u(n, lvl,
    salt)``."""
    x = jnp.arange(n, dtype=jnp.uint32)[None, :] * jnp.uint32(0x9E3779B9)
    lvl_off = (
        jnp.arange(l, dtype=jnp.uint32)[:, None] * jnp.uint32(0x85EBCA6B)
    )
    x = x + lvl_off
    x = x ^ salt.astype(jnp.uint32)
    x = (x ^ (x >> 16)) * jnp.uint32(0x7FEB352D)
    x = (x ^ (x >> 15)) * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    return x.astype(jnp.float32) * (1.0 / 4294967296.0)


def _golden_u_all(stoch_u: jnp.ndarray, l: int) -> jnp.ndarray:
    """[N] base uniforms → [L, N], row lvl == mod(u + (φ·lvl % 1), 1)."""
    shifts = jnp.asarray(
        [(0.6180339887 * lvl) % 1.0 for lvl in range(l)], stoch_u.dtype
    )
    return jnp.mod(stoch_u[None, :] + shifts[:, None], 1.0)


def _sample_corner_all(idx, w, u):
    """corner ~ Categorical(w/Σw) per (level, sample).

    idx, w: [L, 8, N]; u: [L, N] → (rows [L, N], Σw [L, N])."""
    wsum = jnp.sum(w, axis=1)  # [L, N]
    cdf = jnp.cumsum(w, axis=1)  # [L, 8, N]
    c_star = jnp.sum((cdf < (u * wsum)[:, None, :]).astype(jnp.int32), axis=1)
    c_star = jnp.clip(c_star, 0, w.shape[1] - 1)  # [L, N]
    rows = jnp.take_along_axis(idx, c_star[:, None, :], axis=1)[:, 0, :]
    return rows, wsum


def _encode_all_plain(enc: "HashGridEncoding", table, xt):
    """JVP-safe vectorized encode (no custom VJP — XLA differentiates).
    Used for ``custom_take=False`` call sites (eval/tests)."""
    idx, W, _ = enc._all_iw(xt, need_dw=False)
    feats = _gather_all(table, idx)  # [L, F, 8, N]
    out = jnp.sum(W[:, None].astype(table.dtype) * feats, axis=2)  # [L, F, N]
    return _assemble_all(out)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _encode_all(enc: "HashGridEncoding", table, xt):
    """All-level encode: table [L, F, T], xt [3, N] → [N, L*F].

    Exact forward, exact 8-corner table gradient, TRUE position cotangent
    (vectorized twin of ``_level_encode`` — see its docstring for why the
    position cotangent must be real)."""
    idx, W, _ = enc._all_iw(xt, need_dw=False)
    feats = _gather_all(table, idx)
    out = jnp.sum(W[:, None].astype(table.dtype) * feats, axis=2)
    return _assemble_all(out)


def _encode_all_fwd(enc, table, xt):
    return _encode_all(enc, table, xt), (table, xt)


def _encode_all_bwd(enc, res, g):
    table, xt = res
    l, f, t = table.shape
    idx, W, dW = enc._all_iw(xt, need_dw=True)
    gl = _unassemble_all(g, l, f)  # [L, F, N]
    upd = W[:, None].astype(g.dtype) * gl[:, :, None, :]  # [L, F, 8, N]
    dtable = _scatter_levels(
        idx.reshape(l, -1), upd.reshape(l, f, -1), t
    )
    feats = _gather_all(table, idx)  # [L, F, 8, N]
    gf = jnp.sum(gl[:, :, None, :] * feats, axis=1)  # [L, 8, N]
    dxt = jnp.einsum("lacn,lcn->an", dW.astype(g.dtype), gf)  # [3, N]
    return dtable, dxt


_encode_all.defvjp(_encode_all_fwd, _encode_all_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _encode_all_stoch(enc: "HashGridEncoding", table, xt, salt):
    """= ``_encode_all`` forward; backward scatters ONE importance-sampled
    corner per (level, sample) (vectorized ``_level_encode_stoch``: exact
    forward AND exact position cotangent, 8× fewer scatter rows)."""
    idx, W, _ = enc._all_iw(xt, need_dw=False)
    feats = _gather_all(table, idx)
    out = jnp.sum(W[:, None].astype(table.dtype) * feats, axis=2)
    return _assemble_all(out)


def _encode_all_stoch_fwd(enc, table, xt, salt):
    return _encode_all_stoch(enc, table, xt, salt), (table, xt, salt)


def _encode_all_stoch_bwd(enc, res, g):
    table, xt, salt = res
    l, f, t = table.shape
    n = xt.shape[1]
    idx, W, dW = enc._all_iw(xt, need_dw=True)
    gl = _unassemble_all(g, l, f)  # [L, F, N]
    u = _cheap_hash_u_all(n, l, salt)
    w = W.astype(g.dtype)
    rows, wsum = _sample_corner_all(idx, w, u)  # [L, N]
    dtable = _scatter_levels(rows, gl * wsum[:, None, :], t)
    # exact position cotangent (identical to _encode_all_bwd)
    feats = _gather_all(table, idx)
    gf = jnp.sum(gl[:, :, None, :] * feats, axis=1)  # [L, 8, N]
    dxt = jnp.einsum("lacn,lcn->an", dW.astype(g.dtype), gf)
    return dtable, dxt, jnp.zeros_like(salt)


_encode_all_stoch.defvjp(_encode_all_stoch_fwd, _encode_all_stoch_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _encode_all_stoch_u(enc: "HashGridEncoding", table, xt, u):
    """Exact forward, stochastic-corner table gradient driven by caller
    uniforms ``u`` [N] (golden-ratio-shifted per level), ZERO position
    cotangent (vectorized ``take_interp_stoch`` — proposal fields whose
    positions are stop-gradient bins)."""
    idx, W, _ = enc._all_iw(xt, need_dw=False)
    feats = _gather_all(table, idx)
    out = jnp.sum(W[:, None].astype(table.dtype) * feats, axis=2)
    return _assemble_all(out)


def _encode_all_stoch_u_fwd(enc, table, xt, u):
    return _encode_all_stoch_u(enc, table, xt, u), (table.shape, xt, u)


def _encode_all_stoch_u_bwd(enc, res, g):
    (l, f, t), xt, u = res
    idx, W, _ = enc._all_iw(xt, need_dw=False)
    gl = _unassemble_all(g, l, f)
    w = W.astype(g.dtype)
    rows, wsum = _sample_corner_all(idx, w, _golden_u_all(u, l))
    dtable = _scatter_levels(rows, gl * wsum[:, None, :], t)
    return dtable, jnp.zeros_like(xt), jnp.zeros_like(u)


_encode_all_stoch_u.defvjp(_encode_all_stoch_u_fwd, _encode_all_stoch_u_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _encode_all_stoch_fp(enc: "HashGridEncoding", table, xt, u):
    """FULLY stochastic: ONE importance-sampled corner per (level, sample)
    in the forward AND the backward (vectorized ``take_interp_stoch_fp`` —
    unbiased dither for the proposal density fields; 8× fewer gather rows).
    ZERO position cotangent."""
    idx, W, _ = enc._all_iw(xt, need_dw=False)
    rows, wsum = _sample_corner_all(idx, W, _golden_u_all(u, table.shape[0]))
    feats = _gather_all(table, rows)  # [L, F, N]
    return _assemble_all(feats * wsum[:, None, :].astype(table.dtype))


def _encode_all_stoch_fp_fwd(enc, table, xt, u):
    return _encode_all_stoch_fp(enc, table, xt, u), (table.shape, xt, u)


def _encode_all_stoch_fp_bwd(enc, res, g):
    (l, f, t), xt, u = res
    idx, W, _ = enc._all_iw(xt, need_dw=False)
    gl = _unassemble_all(g, l, f)
    rows, wsum = _sample_corner_all(idx, W.astype(g.dtype), _golden_u_all(u, l))
    dtable = _scatter_levels(rows, gl * wsum[:, None, :], t)
    return dtable, jnp.zeros_like(xt), jnp.zeros_like(u)


_encode_all_stoch_fp.defvjp(_encode_all_stoch_fp_fwd, _encode_all_stoch_fp_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _encode_all_dx(enc: "HashGridEncoding", table, xt):
    """All-level encode + analytic d/dx: → (out [N, L*F], dout [N, 3, L*F]).

    Vectorized ``_level_encode_dx``: exact 8-corner table gradient, ZERO
    position cotangent (callers differentiate positions analytically)."""
    idx, W, dW = enc._all_iw(xt, need_dw=True)
    feats = _gather_all(table, idx)  # [L, F, 8, N]
    w = W.astype(table.dtype)
    dw = dW.astype(table.dtype)
    out = jnp.sum(w[:, None] * feats, axis=2)  # [L, F, N]
    dout = jnp.einsum("lacn,lfcn->lafn", dw, feats)  # [L, 3, F, N]
    n = xt.shape[1]
    l, f, t = table.shape
    dout_n = dout.transpose(3, 1, 0, 2).reshape(n, 3, l * f)
    return _assemble_all(out), dout_n


def _encode_all_dx_fwd(enc, table, xt):
    return _encode_all_dx(enc, table, xt), (table.shape, xt)


def _unassemble_dx(g_d: jnp.ndarray, l: int, f: int) -> jnp.ndarray:
    """[N, 3, L*F] cotangent → [L, 3, F, N]."""
    n = g_d.shape[0]
    return g_d.reshape(n, 3, l, f).transpose(2, 1, 3, 0)


def _encode_all_dx_bwd(enc, res, gs):
    (l, f, t), xt = res
    g_out, g_d = gs
    idx, W, dW = enc._all_iw(xt, need_dw=True)
    go = _unassemble_all(g_out, l, f)  # [L, F, N]
    gd = _unassemble_dx(g_d, l, f)  # [L, 3, F, N]
    upd = W[:, None].astype(go.dtype) * go[:, :, None, :]  # [L, F, 8, N]
    upd = upd + jnp.einsum("lacn,lafn->lfcn", dW.astype(go.dtype), gd)
    dtable = _scatter_levels(idx.reshape(l, -1), upd.reshape(l, f, -1), t)
    return dtable, jnp.zeros_like(xt)


_encode_all_dx.defvjp(_encode_all_dx_fwd, _encode_all_dx_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _encode_all_dx_stoch(enc: "HashGridEncoding", table, xt, salt):
    """= ``_encode_all_dx`` forward; backward samples ONE corner UNIFORMLY
    (p=1/8, value ×8) per (level, sample) — vectorized
    ``_level_encode_dx_stoch`` (mixed-sign cotangent ⇒ uniform, not
    importance, stays unbiased)."""
    idx, W, dW = enc._all_iw(xt, need_dw=True)
    feats = _gather_all(table, idx)
    w = W.astype(table.dtype)
    dw = dW.astype(table.dtype)
    out = jnp.sum(w[:, None] * feats, axis=2)
    dout = jnp.einsum("lacn,lfcn->lafn", dw, feats)
    n = xt.shape[1]
    l, f, t = table.shape
    dout_n = dout.transpose(3, 1, 0, 2).reshape(n, 3, l * f)
    return _assemble_all(out), dout_n


def _encode_all_dx_stoch_fwd(enc, table, xt, salt):
    return _encode_all_dx_stoch(enc, table, xt, salt), (table.shape, xt, salt)


def _encode_all_dx_stoch_bwd(enc, res, gs):
    (l, f, t), xt, salt = res
    g_out, g_d = gs
    n = xt.shape[1]
    idx, W, dW = enc._all_iw(xt, need_dw=True)
    go = _unassemble_all(g_out, l, f)  # [L, F, N]
    gd = _unassemble_dx(g_d, l, f)  # [L, 3, F, N]
    u = _cheap_hash_u_all(n, l, salt)
    c = jnp.minimum((u * 8.0).astype(jnp.int32), 7)  # [L, N] uniform corner
    rows = jnp.take_along_axis(idx, c[:, None, :], axis=1)[:, 0, :]  # [L, N]
    w_c = jnp.take_along_axis(W.astype(go.dtype), c[:, None, :], axis=1)  # [L,1,N]
    upd = w_c * go  # [L, F, N]
    dw_c = jnp.take_along_axis(
        dW.astype(go.dtype), c[:, None, None, :], axis=2
    )[:, :, 0, :]  # [L, 3, N]
    upd = upd + jnp.einsum("lan,lafn->lfn", dw_c, gd)
    dtable = _scatter_levels(rows, 8.0 * upd, t)
    return dtable, jnp.zeros_like(xt), jnp.zeros_like(salt)


_encode_all_dx_stoch.defvjp(_encode_all_dx_stoch_fwd, _encode_all_dx_stoch_bwd)
