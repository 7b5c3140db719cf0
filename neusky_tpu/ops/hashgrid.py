"""Multi-resolution hash-grid encoding (Instant-NGP style), TPU-native.

Replaces the reference's dependency on tiny-cuda-nn (``tcnn.Encoding`` with
``otype=HashGrid``, ``sdf_albedo_field.py:119-130`` and
``directional_distance_field.py:146-175``).

Design notes (TPU):
  - The encode is expressed as 8 XLA gathers per level from a ``[L, T, F]``
    table plus d-linear interpolation; XLA lowers the backward pass to
    scatter-adds into the table.  Both the forward and the VJP are themselves
    differentiable, which the eikonal loss needs (grad-of-grad through the
    encoding, reference ``sdf_albedo_field.py:231-238``).
  - Corner gathers for all levels are batched into a single gather of shape
    ``[N, L*8]`` from a flattened ``[L*T, F]`` table so XLA emits one fused
    gather kernel instead of 16.
  - Smoothstep interpolation (``tcnn "Smoothstep"``) is supported; unlike
    trilinear it has non-vanishing second derivatives, which benefits
    curvature-style losses.
  - A Pallas fused kernel (hash lookup + interp) lives in
    ``neusky_tpu.ops.hashgrid_pallas`` and is used when enabled.

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
    Table shape: [num_levels, table_size, features_per_level].
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
        # Precompute the 8 corner offsets.
        self._corners = np.array(
            [[i, j, k] for i in (0, 1) for j in (0, 1) for k in (0, 1)],
            dtype=np.int32,
        )  # [8, 3]

    @property
    def out_dim(self) -> int:
        return self.config.out_dim

    def init(self, rng: jax.Array, dtype=jnp.float32) -> jnp.ndarray:
        """tcnn-style init: uniform in [-1e-4, 1e-4].

        Shape [L, T, F].  (A flat [L, T·F] storage variant was tried to
        avoid [T, 2] tile padding at rest; the in-kernel reshape then costs
        per-call relayouts and measured 2.5× slower end-to-end on the axon
        runtime — the padded-at-rest layout is the lesser evil for the
        split-step path.)"""
        c = self.config
        return jax.random.uniform(
            rng,
            (c.num_levels, c.table_size, c.features_per_level),
            dtype=dtype,
            minval=-1e-4,
            maxval=1e-4,
        )

    def _level_indices(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Compute corner table indices and interp weights for all levels.

        x: [N, 3] in [0,1].  Returns (per-level indices [N, L, 8] int32 in
        [0, table_size), weights [N, L, 8]).
        """
        c = self.config
        res = jnp.asarray(self._resolutions)  # [L]
        scaled = x[:, None, :] * res[None, :, None].astype(x.dtype)  # [N, L, 3]
        floor = jnp.floor(scaled)
        frac = scaled - floor  # [N, L, 3]
        base = floor.astype(jnp.int32)  # [N, L, 3]

        corners = jnp.asarray(self._corners)  # [8, 3]
        coords = base[:, :, None, :] + corners[None, None, :, :]  # [N, L, 8, 3]

        # hashed index
        p = jnp.asarray(_PRIMES, dtype=jnp.uint32)
        cu = coords.astype(jnp.uint32)
        hashed = (cu[..., 0] * p[0]) ^ (cu[..., 1] * p[1]) ^ (cu[..., 2] * p[2])
        hashed = (hashed & jnp.uint32(c.table_size - 1)).astype(jnp.int32)

        # dense index for small levels: x + y*(R+1) + z*(R+1)^2, clipped
        rp1 = (res + 1)[None, :, None]  # [1, L, 1]
        cc = jnp.minimum(coords, rp1[..., None] - 1)
        dense_idx = cc[..., 0] + cc[..., 1] * rp1 + cc[..., 2] * rp1 * rp1
        dense_idx = jnp.minimum(dense_idx, c.table_size - 1)

        dense_mask = jnp.asarray(self._dense)[None, :, None]  # [1, L, 1]
        idx = jnp.where(dense_mask, dense_idx, hashed)  # [N, L, 8]

        # interpolation weights
        if c.smoothstep:
            frac = frac * frac * (3.0 - 2.0 * frac)
        w = jnp.where(corners[None, None, :, :] == 1, frac[:, :, None, :], 1.0 - frac[:, :, None, :])
        weights = jnp.prod(w, axis=-1)  # [N, L, 8]
        # flatten to [N, L*8]: a trailing dim of 8 tile-pads 16× on TPU and
        # these arrays are saved as backward residuals (observed 1.05 GB
        # padded buffers in compiler OOM reports); L*8 lanes tile cleanly
        n = x.shape[0]
        return idx.reshape(n, -1), weights.reshape(n, -1)

    def __call__(
        self, table: jnp.ndarray, x: jnp.ndarray, custom_take: bool = False
    ) -> jnp.ndarray:
        """Encode positions. x: [N, 3] in [0,1] → [N, L*F].

        Per-level gathers (not one flat batched gather): on TPU the flat
        variant makes XLA assign a transposed {0,1}-layout to the table and
        the backward scatter-add then runs ~4000× slower (observed 636 ms
        vs sub-ms for a naturally-laid-out scatter).  Per-level [T, F]
        gathers keep the natural layout on both the gather and its
        transpose scatter.

        ``custom_take=True`` routes gathers through the Pallas-backed
        ``take_rows`` (7.3× faster table backward) — only valid in contexts
        never forward-mode differentiated (custom_vjp restriction); JVP
        paths use :meth:`encode_with_dx` instead."""
        c = self.config
        n = x.shape[0]
        idx, weights = self._level_indices(x)  # [N, L*8] each
        w = weights.astype(table.dtype)
        take = self._take(custom_take)
        outs = []
        for lvl in range(c.num_levels):
            sl = slice(lvl * 8, (lvl + 1) * 8)
            feats = take(table[lvl], idx[:, sl])  # [N, 8, F]
            outs.append(jnp.sum(feats * w[:, sl, None], axis=1))  # [N, F]
        out = jnp.concatenate(outs, axis=-1)
        if c.layout_barrier:
            out = jax.lax.optimization_barrier(out)
        return out

    @staticmethod
    def _take(custom: bool):
        if custom:
            from neusky_tpu.ops.hashgrid_pallas import take_rows

            return take_rows
        return lambda t, i: jnp.take(t, i, axis=0)

    def encode_with_dx(
        self, table: jnp.ndarray, x: jnp.ndarray, custom_take: bool = True
    ):
        """Encode + analytic position derivative.

        x: [N, 3] in [0,1] → (out [N, L*F], dout_dx [N, 3, L*F]).

        The derivative is closed-form from the interpolation weights
        (∂W_c/∂x_a = ±u'_a · Π_{b≠a} ω_b), so the SDF's spatial gradient
        never needs AD *through* the gather — which lets the gather be the
        custom-VJP ``take_rows`` with the Pallas scatter backward
        (custom_vjp cannot be forward-mode differentiated)."""
        c = self.config
        n = x.shape[0]
        res = jnp.asarray(self._resolutions)
        scaled = x[:, None, :] * res[None, :, None].astype(x.dtype)  # [N, L, 3]
        floor = jnp.floor(scaled)
        frac = scaled - floor
        base = floor.astype(jnp.int32)

        corners = jnp.asarray(self._corners)
        coords = base[:, :, None, :] + corners[None, None, :, :]
        p = jnp.asarray(_PRIMES, dtype=jnp.uint32)
        cu = coords.astype(jnp.uint32)
        hashed = (cu[..., 0] * p[0]) ^ (cu[..., 1] * p[1]) ^ (cu[..., 2] * p[2])
        hashed = (hashed & jnp.uint32(c.table_size - 1)).astype(jnp.int32)
        rp1 = (res + 1)[None, :, None]
        cc = jnp.minimum(coords, rp1[..., None] - 1)
        dense_idx = cc[..., 0] + cc[..., 1] * rp1 + cc[..., 2] * rp1 * rp1
        dense_idx = jnp.minimum(dense_idx, c.table_size - 1)
        dense_mask = jnp.asarray(self._dense)[None, :, None]
        idx = jnp.where(dense_mask, dense_idx, hashed).reshape(n, -1)  # [N, L*8]

        if c.smoothstep:
            u = frac * frac * (3.0 - 2.0 * frac)
            du = 6.0 * frac * (1.0 - frac)
        else:
            u = frac
            du = jnp.ones_like(frac)
        du = du * res[None, :, None].astype(x.dtype)  # chain rule: frac = x·res

        cbits = corners[None, None, :, :]  # [1, 1, 8, 3]
        omega = jnp.where(cbits == 1, u[:, :, None, :], 1.0 - u[:, :, None, :])
        sign = jnp.where(cbits == 1, 1.0, -1.0).astype(x.dtype)
        # flatten everything to [N, L*8] lanes (L=16 → exactly 128) — the
        # trailing-8/-3 minor dims otherwise tile-pad 16-42× on TPU when any
        # of these become backward residuals (PERF.md item 4)
        W = jnp.prod(omega, axis=-1).reshape(n, -1)  # [N, L*8]
        dWs = []
        for a in range(3):
            others = [b for b in range(3) if b != a]
            prod_others = omega[..., others[0]] * omega[..., others[1]]
            dWs.append((sign[..., a] * du[:, :, None, a] * prod_others).reshape(n, -1))
        # dWs: 3 × [N, L*8]

        take = self._take(custom_take)
        outs = []
        douts = [[], [], []]
        for lvl in range(c.num_levels):
            sl = slice(lvl * 8, (lvl + 1) * 8)
            feats = take(table[lvl], idx[:, sl])  # [N, 8, F]
            outs.append(jnp.sum(feats * W[:, sl, None], axis=1))  # [N, F]
            for a in range(3):
                douts[a].append(jnp.sum(feats * dWs[a][:, sl, None], axis=1))
        out = jnp.concatenate(outs, axis=-1)  # [N, L*F]
        dout = jnp.stack(
            [jnp.concatenate(d, axis=-1) for d in douts], axis=1
        )  # [N, 3, L*F]
        if c.layout_barrier:
            out, dout = jax.lax.optimization_barrier((out, dout))
        return out, dout
