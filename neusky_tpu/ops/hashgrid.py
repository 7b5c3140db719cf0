"""Multi-resolution hash-grid encoding (Instant-NGP style), TPU-native.

Replaces the reference's dependency on tiny-cuda-nn (``tcnn.Encoding`` with
``otype=HashGrid``, ``sdf_albedo_field.py:119-130`` and
``directional_distance_field.py:146-175``).

Design notes (TPU, all trace-driven — see PERF.md):
  - **Transposed, pad-free data flow.**  Corner indices and interpolation
    weights are computed as ``[L, 8, N]`` (minor dim = N) and the gather is
    ``take(table[l] [F, T], idx_l [8, N], axis=1) → [F, 8, N]``.  Every
    intermediate has a lane dimension of N — nothing tile-pads.  The first
    design sliced ``[N, L*8]`` arrays into per-level ``[N, 8]`` operands;
    minor-8 buffers tile-pad 16× on TPU and the async slice/copy traffic of
    those residuals dominated the training step.
  - Table storage is ``[L, F, T]`` — XLA lays this out with a (2, 128)
    tile over (F, T), no padding, and per-level slices stage cleanly into
    VMEM for the gathers.
  - Smoothstep interpolation (``tcnn "Smoothstep"``) is supported; unlike
    trilinear it has non-vanishing second derivatives.
  - The table-gradient scatter runs through a Pallas lane-ownership kernel
    (``ops/hashgrid_pallas.py``, 7.3× over XLA's serialized scatter) wired
    in via the custom-VJP ``take_level``; since custom_vjp cannot be
    forward-mode differentiated, ``encode_with_dx`` provides closed-form
    position derivatives so SDF spatial gradients never JVP through the
    gather.

The hash function matches Instant-NGP: xor of coordinates times the primes
(1, 2654435761, 805459861), masked to the table size.  Levels whose dense
grid fits in the table are indexed densely (tcnn behaviour).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

_PRIMES = (1, 2654435761, 805459861)


@dataclasses.dataclass(frozen=True)
class HashGridConfig:
    num_levels: int = 16
    features_per_level: int = 2
    log2_hashmap_size: int = 19
    base_res: int = 16
    max_res: int = 2048
    use_hash: bool = True  # False → dense grid at every level (small tables)
    smoothstep: bool = False
    layout_barrier: bool = True
    """Wrap the encode output in an optimization_barrier so XLA cannot
    propagate the consuming matmul's layout back onto the gather/scatter —
    observed to slow the table scatter-adds by >100× on TPU."""

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
        """tcnn-style init: uniform in [-1e-4, 1e-4].  Shape [L, F, T]
        (minor T tiles (F=2,128)-clean; see module docstring)."""
        c = self.config
        return jax.random.uniform(
            rng,
            (c.num_levels, c.features_per_level, c.table_size),
            dtype=dtype,
            minval=-1e-4,
            maxval=1e-4,
        )

    def _indices_weights_t(self, x: jnp.ndarray):
        """Transposed corner indices / interp weights / weight-derivatives.

        x: [N, 3] in [0,1] → (idx [L, 8, N] int32, W [L, 8, N],
        dW [3, L, 8, N]).  Minor dim is N everywhere — no tile padding.
        """
        c = self.config
        xt = x.T  # [3, N]
        res = jnp.asarray(self._resolutions)  # [L]
        resf = res.astype(x.dtype)
        scaled = xt[None, :, :] * resf[:, None, None]  # [L, 3, N]
        floor = jnp.floor(scaled)
        frac = scaled - floor  # [L, 3, N]
        base = floor.astype(jnp.int32)

        corners = jnp.asarray(self._corners)  # [8, 3]
        coords = base[:, None, :, :] + corners[None, :, :, None]  # [L, 8, 3, N]

        p = jnp.asarray(_PRIMES, dtype=jnp.uint32)
        cu = coords.astype(jnp.uint32)
        hashed = (cu[:, :, 0] * p[0]) ^ (cu[:, :, 1] * p[1]) ^ (cu[:, :, 2] * p[2])
        hashed = (hashed & jnp.uint32(c.table_size - 1)).astype(jnp.int32)  # [L, 8, N]

        rp1 = (res + 1)[:, None, None]  # [L, 1, 1]
        # clip each coordinate to its level's grid extent: [L,1,1,1]→[L,8,3,N]
        cc = jnp.minimum(coords, (rp1 - 1)[:, :, None, :])
        dense_idx = cc[:, :, 0] + cc[:, :, 1] * rp1 + cc[:, :, 2] * rp1 * rp1
        dense_idx = jnp.minimum(dense_idx, c.table_size - 1)  # [L, 8, N]

        dense_mask = jnp.asarray(self._dense)[:, None, None]  # [L, 1, 1]
        idx = jnp.where(dense_mask, dense_idx, hashed)  # [L, 8, N]

        if c.smoothstep:
            u = frac * frac * (3.0 - 2.0 * frac)
            du = 6.0 * frac * (1.0 - frac)
        else:
            u = frac
            du = jnp.ones_like(frac)
        du = du * resf[:, None, None]  # chain rule: frac = x·res

        # omega[l, c, a, n] = u if corner bit a of c else 1-u
        cb = corners[None, :, :, None]  # [1, 8, 3, 1]
        omega = jnp.where(cb == 1, u[:, None, :, :], 1.0 - u[:, None, :, :])  # [L,8,3,N]
        sign = jnp.where(cb == 1, 1.0, -1.0).astype(x.dtype)  # [1, 8, 3, 1]
        W = jnp.prod(omega, axis=2)  # [L, 8, N]
        dWs = []
        for a in range(3):
            others = [b for b in range(3) if b != a]
            prod_others = omega[:, :, others[0], :] * omega[:, :, others[1], :]
            dWs.append(
                sign[:, :, a, :] * du[:, None, a, :] * prod_others
            )  # [L, 8, N]
        dW = jnp.stack(dWs, axis=0)  # [3, L, 8, N]
        return idx, W, dW

    def _assemble(self, per_level, n):
        """per_level: list of L arrays [F, N] → [N, L*F] (feature-within-
        level ordering, matching tcnn's concat of per-level features)."""
        stacked = jnp.stack(per_level, axis=0)  # [L, F, N]
        return stacked.transpose(2, 0, 1).reshape(n, -1)  # [N, L*F]

    def __call__(
        self, table: jnp.ndarray, x: jnp.ndarray, custom_take: bool = False
    ) -> jnp.ndarray:
        """Encode positions. x: [N, 3] in [0,1] → [N, L*F]."""
        c = self.config
        n = x.shape[0]
        idx, W, _ = self._indices_weights_t(x)
        w = W.astype(table.dtype)
        take = self._take(custom_take)
        outs = []
        for lvl in range(c.num_levels):
            feats = take(table[lvl], idx[lvl])  # [F, 8, N]
            # mul + sublane reduction, NOT einsum: XLA lowers the einsum to a
            # dot_general whose operands transpose to [N, 8]-minor layouts —
            # 16× tile-padded buffers, trace-observed ~3 s/step of DMA
            outs.append(jnp.sum(w[lvl][None] * feats, axis=1))  # [F, N]
        out = self._assemble(outs, n)
        if c.layout_barrier:
            out = jax.lax.optimization_barrier(out)
        return out

    @staticmethod
    def _take(custom: bool):
        if custom:
            from neusky_tpu.ops.hashgrid_pallas import take_level

            return take_level
        return lambda t2, i: jnp.take(t2, i, axis=1)

    def encode_with_dx(
        self, table: jnp.ndarray, x: jnp.ndarray, custom_take: bool = True
    ):
        """Encode + analytic position derivative.

        x: [N, 3] in [0,1] → (out [N, L*F], dout_dx [N, 3, L*F]).

        The derivative is closed-form from the interpolation weights
        (∂W_c/∂x_a = ±u'_a · Π_{b≠a} ω_b), so the SDF's spatial gradient
        never needs AD *through* the gather — which lets the gather be the
        custom-VJP ``take_level`` with the Pallas scatter backward
        (custom_vjp cannot be forward-mode differentiated)."""
        c = self.config
        n = x.shape[0]
        idx, W, dW = self._indices_weights_t(x)
        w = W.astype(table.dtype)
        dw = dW.astype(table.dtype)
        take = self._take(custom_take)
        outs = []
        douts = [[], [], []]
        for lvl in range(c.num_levels):
            feats = take(table[lvl], idx[lvl])  # [F, 8, N]
            # mul + sublane reduce (see __call__) — keeps [8, N] orientation
            outs.append(jnp.sum(w[lvl][None] * feats, axis=1))
            for a in range(3):
                douts[a].append(jnp.sum(dw[a, lvl][None] * feats, axis=1))
        out = self._assemble(outs, n)  # [N, L*F]
        dout = jnp.stack(
            [self._assemble(d, n) for d in douts], axis=1
        )  # [N, 3, L*F]
        if c.layout_barrier:
            out, dout = jax.lax.optimization_barrier((out, dout))
        return out, dout
