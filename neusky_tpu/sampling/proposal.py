"""Proposal-network sampling: spaced initial samples + iterative PDF refine.

TPU-native, fixed-shape equivalent of nerfstudio's ``ProposalNetworkSampler``
(the reference's hot path, ``neusky_model.py:561``):

  1. initial bins from a uniform-linear/disparity-piecewise spacing;
  2. ``num_proposal_iterations`` rounds of: evaluate a proposal density
     field, convert to weights, inverse-CDF resample (``searchsorted``);
  3. final NeuS sample set.

Everything is expressed on the normalised s-domain in [0, 1]; the
s↔euclidean mapping is the piecewise linear/disparity map, so the
interlevel loss can operate directly on (spacing bins, weights).

No dynamic shapes: sample counts are static config; stratified jitter uses
``jax.random`` keys threaded explicitly.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp

from neusky_tpu.core.rays import RayBundle, RaySamples, weights_from_densities


@dataclasses.dataclass(frozen=True)
class ProposalSamplerConfig:
    num_proposal_samples: Tuple[int, ...] = (256, 96)
    num_final_samples: int = 48
    single_jitter: bool = True
    histogram_padding: float = 0.01
    # weight annealing (nerfacto-style): bias(x, slope) over max_num_iters
    anneal_slope: float = 10.0
    anneal_max_num_iters: int = 1000


def s_to_euclidean(s: jnp.ndarray, nears: jnp.ndarray, fars: jnp.ndarray) -> jnp.ndarray:
    """Piecewise linear(×2)/disparity map from s∈[0,1] to euclidean t.

    nerfstudio ``UniformLinDispPiecewiseSampler``: x(s) = 2s for s<0.5 else
    1/(2-2s), then t = near·(1-x_n) + far·x_n in the transformed domain.
    Implemented as: t_s = s-domain interpolation between t(near) and t(far)
    under the forward map g(t) = t/2 if t<1 else 1 - 1/(2t).
    """
    g_near = jnp.where(nears < 1.0, nears / 2.0, 1.0 - 1.0 / (2.0 * jnp.maximum(nears, 1e-12)))
    g_far = jnp.where(fars < 1.0, fars / 2.0, 1.0 - 1.0 / (2.0 * jnp.maximum(fars, 1e-12)))
    gs = g_near + s * (g_far - g_near)
    return jnp.where(gs < 0.5, 2.0 * gs, 1.0 / jnp.maximum(2.0 - 2.0 * gs, 1e-12))


def _spaced_bins(
    rng: Optional[jax.Array], num_rays: int, num_samples: int, single_jitter: bool, train: bool
) -> jnp.ndarray:
    """Uniform bins in s∈[0,1], stratified-jittered during training.
    Returns s-domain bin edges [N, S+1]."""
    edges = jnp.linspace(0.0, 1.0, num_samples + 1)[None, :]  # [1, S+1]
    edges = jnp.tile(edges, (num_rays, 1))
    if train and rng is not None:
        if single_jitter:
            jitter = jax.random.uniform(rng, (num_rays, 1))
        else:
            jitter = jax.random.uniform(rng, (num_rays, num_samples + 1))
        # jitter bin interiors by up to one bin width, keeping monotonicity
        bin_width = 1.0 / num_samples
        jittered = edges + (jitter - 0.5) * bin_width
        # clamp ends
        jittered = jittered.at[:, 0].set(jnp.clip(jittered[:, 0], 0.0, None))
        jittered = jittered.at[:, -1].set(jnp.clip(jittered[:, -1], None, 1.0))
        edges = jnp.clip(jittered, 0.0, 1.0)
    return edges


def uniform_lindisp_samples(
    rng: Optional[jax.Array],
    ray_bundle: RayBundle,
    num_samples: int,
    single_jitter: bool = True,
    train: bool = True,
) -> jnp.ndarray:
    """Initial s-domain bin edges [N, S+1]."""
    return _spaced_bins(rng, ray_bundle.num_rays, num_samples, single_jitter, train)


def pdf_sample_bins(
    rng: Optional[jax.Array],
    bins_s: jnp.ndarray,
    weights: jnp.ndarray,
    num_samples: int,
    histogram_padding: float = 0.01,
    single_jitter: bool = True,
    train: bool = True,
) -> jnp.ndarray:
    """Inverse-CDF resampling of bin edges (nerfstudio ``PDFSampler``).

    bins_s: [N, S+1] s-domain edges; weights: [N, S, 1] from previous level.
    Returns new s-domain edges [N, num_samples+1].

    Resampling is NOT differentiated through (mip-NeRF-360 semantics: the
    proposal networks learn only via the interlevel loss) — stop-gradient
    here both matches the reference stack and keeps the backward graph from
    carrying the whole resampling chain.
    """
    bins_s = jax.lax.stop_gradient(bins_s)
    weights = jax.lax.stop_gradient(weights)
    n, s = weights.shape[0], weights.shape[1]
    w = weights[..., 0] + histogram_padding  # [N, S]
    w_sum = jnp.sum(w, axis=-1, keepdims=True)
    # pad uniformly if the sum is tiny (all-zero weights)
    padding = jax.nn.relu(1e-5 - w_sum)
    w = w + padding / s
    w_sum = w_sum + padding
    pdf = w / w_sum
    cdf = jnp.concatenate([jnp.zeros((n, 1)), jnp.cumsum(pdf, axis=-1)], axis=-1)
    cdf = jnp.minimum(cdf, 1.0)  # [N, S+1]

    m = num_samples + 1
    if train and rng is not None:
        if single_jitter:
            rand = jax.random.uniform(rng, (n, 1)) / m
        else:
            rand = jax.random.uniform(rng, (n, m)) / m
        u = jnp.linspace(0.0, 1.0 - 1.0 / m, m)[None, :] + rand
    else:
        u = jnp.linspace(0.0, 1.0 - 1.0 / m, m)[None, :] + 0.5 / m
        u = jnp.tile(u, (n, 1))

    # vectorised searchsorted(side="right"): count of cdf entries ≤ u.
    # A [N, M, S+1] comparison + sum compiles to flat VPU code — the vmapped
    # searchsorted lowers to per-element while loops and is a compile-time
    # hog on the TPU toolchain (~minutes for the full model).
    idx = jnp.sum(
        (cdf[:, None, :] <= u[:, :, None]).astype(jnp.int32), axis=-1
    )
    below = jnp.clip(idx - 1, 0, s)
    above = jnp.clip(idx, 0, s)
    cdf_below = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_above = jnp.take_along_axis(cdf, above, axis=-1)
    bins_below = jnp.take_along_axis(bins_s, below, axis=-1)
    bins_above = jnp.take_along_axis(bins_s, above, axis=-1)
    denom = jnp.where(cdf_above - cdf_below < 1e-10, 1.0, cdf_above - cdf_below)
    t = jnp.clip((u - cdf_below) / denom, 0.0, 1.0)
    new_bins = bins_below + t * (bins_above - bins_below)
    # monotone non-decreasing guard
    new_bins = jnp.sort(new_bins, axis=-1)
    return new_bins


def bins_to_ray_samples(ray_bundle: RayBundle, bins_s: jnp.ndarray) -> RaySamples:
    """Expand s-domain bin edges into a RaySamples pytree."""
    n, sp1 = bins_s.shape
    s = sp1 - 1
    starts_s = bins_s[:, :-1, None]
    ends_s = bins_s[:, 1:, None]
    nears = ray_bundle.nears[:, :, None]  # [N,1,1]
    fars = ray_bundle.fars[:, :, None]
    starts = s_to_euclidean(starts_s, nears, fars)
    ends = s_to_euclidean(ends_s, nears, fars)
    return RaySamples(
        origins=jnp.broadcast_to(ray_bundle.origins[:, None, :], (n, s, 3)),
        directions=jnp.broadcast_to(ray_bundle.directions[:, None, :], (n, s, 3)),
        starts=starts,
        ends=ends,
        pixel_area=jnp.broadcast_to(ray_bundle.pixel_area[:, None, :], (n, s, 1)),
        camera_indices=jnp.broadcast_to(
            ray_bundle.camera_indices[:, None, :], (n, s, 1)
        ).astype(jnp.int32),
        deltas=ends - starts,
        spacing_starts=starts_s,
        spacing_ends=ends_s,
    )


def anneal_bias(x: jnp.ndarray, slope: float) -> jnp.ndarray:
    """nerfacto proposal-weight anneal: b(x, s) = s·x / ((s-1)·x + 1)."""
    return slope * x / ((slope - 1.0) * x + 1.0)


def proposal_sample(
    rng: Optional[jax.Array],
    ray_bundle: RayBundle,
    density_fns: List[Callable[[jnp.ndarray], jnp.ndarray]],
    config: ProposalSamplerConfig,
    train: bool = True,
    step: Optional[jnp.ndarray] = None,
):
    """Full proposal sampling pass.

    ``density_fns[i](positions [N,S,3]) -> densities [N,S,1]``.
    Returns (final RaySamples, weights_list, ray_samples_list) where the
    lists hold each proposal level's weights/samples (for the interlevel
    loss), mirroring the reference contract (``neusky_model.py:561``).
    """
    num_iters = len(config.num_proposal_samples)
    if step is not None:
        anneal = anneal_bias(
            jnp.clip(step / config.anneal_max_num_iters, 0.0, 1.0), config.anneal_slope
        )
    else:
        anneal = jnp.asarray(1.0)

    weights_list = []
    samples_list = []
    bins = None
    weights = None
    keys = (
        jax.random.split(rng, num_iters + 1)
        if rng is not None
        else [None] * (num_iters + 1)
    )
    for i in range(num_iters):
        if i == 0:
            bins = uniform_lindisp_samples(
                keys[i], ray_bundle, config.num_proposal_samples[i],
                config.single_jitter, train,
            )
        else:
            annealed = jnp.power(weights, anneal)
            bins = pdf_sample_bins(
                keys[i], bins, annealed, config.num_proposal_samples[i],
                config.histogram_padding, config.single_jitter, train,
            )
        rs = bins_to_ray_samples(ray_bundle, bins)
        density = density_fns[i](rs.start_positions())
        weights = weights_from_densities(density, rs.deltas)
        weights_list.append(weights)
        samples_list.append(rs)

    annealed = jnp.power(weights, anneal)
    final_bins = pdf_sample_bins(
        keys[-1], bins, annealed, config.num_final_samples,
        config.histogram_padding, config.single_jitter, train,
    )
    final_samples = bins_to_ray_samples(ray_bundle, final_bins)
    return final_samples, weights_list, samples_list
