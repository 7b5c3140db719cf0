"""NeuSky model: joint SDF+albedo, RENI++ sky prior, DDF visibility.

TPU-native rebuild of ``neusky/models/neusky_model.py:82-1978``.  Design
departures from the torch reference, chosen for XLA:

  - **Plain-function orchestrator, explicit params dict.**  The model owns
    flax submodules (SDF field, 2 proposal fields, RENI decoder, DDF) and a
    params pytree with top-level groups matching the reference's optimizer
    groups (``configs/neusky_config.py:216-237``).  Cross-model gradient
    coupling (SDF↔DDF, ``sdf_to_visibility_stop_gradients``) is explicit
    ``lax.stop_gradient`` placement — no ``find_unused_parameters`` hacks.
  - **Fixed-shape illumination factoring.**  The reference deduplicates
    camera indices at runtime (``neusky_model.py:460-479``) — a dynamic
    shape.  Here batches are structured as U images × R rays, so the RENI
    decode is a static [U×D] batch, gathered per ray.
  - **Hemisphere masking, not culling.**  Upper-hemisphere visibility
    (``neusky_model.py:1650-1659``) multiplies by a static mask instead of
    boolean-indexing.
  - **Chunked, rematerialised visibility.**  The N·D DDF queries (the
    memory hot spot, SURVEY §2.5) run under ``jax.checkpoint`` in
    fixed-size chunks via ``lax.map``.
  - The reference's out-of-sphere position "hack" (``neusky_model.py:
    1679-1683``) multiplies coordinates elementwise by ``0.01·(-dir)`` —
    an apparent bug; we instead pull the point just inside the sphere
    along the ray, which matches the stated intent.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from neusky_tpu.core.colour import linear_to_sRGB, sRGB_to_linear
from neusky_tpu.core.rays import (
    RayBundle,
    RaySamples,
    render_accumulation,
    render_depth,
    render_normal,
    render_rgb_with_background,
    weights_and_transmittance_from_alphas,
)
from neusky_tpu.core.scene import aabb_collider, sphere_collider
from neusky_tpu.core.spherical import ray_sphere_intersection
from neusky_tpu.fields.ddf import DDFFieldConfig
from neusky_tpu.fields.reni import RENIField, RENIFieldConfig, freeze_decoder_params
from neusky_tpu.fields.density_field import DensityFieldConfig, HashMLPDensityField
from neusky_tpu.fields.sdf_albedo import SDFAlbedoField, SDFAlbedoFieldConfig
from neusky_tpu.models import losses as L
from neusky_tpu.models.ddf_model import DDFModel, DDFModelConfig
from neusky_tpu.nets.density import neus_alpha
from neusky_tpu.sampling.illumination import IcosahedronSampler
from neusky_tpu.sampling.proposal import ProposalSamplerConfig, proposal_sample
from neusky_tpu.shading.lambertian import blinn_phong_composite, lambertian_composite


@dataclasses.dataclass(frozen=True)
class LossInclusions:
    """Static loss toggles (``neusky_model.py:120-150``; canonical values
    ``configs/neusky_config.py:102-126``)."""

    rgb_l1: bool = True
    rgb_l2: bool = False
    cosine_colour: bool = False
    eikonal: bool = True
    fg_mask: bool = True
    normal: bool = False
    depth: bool = False
    sdf_level_set_visibility: bool = True
    interlevel: bool = True
    sky_pixel: bool = True
    sky_pixel_cosine_weight: float = 0.1
    hashgrid_density: bool = True
    hashgrid_density_grid_resolution: int = 10
    ground_plane: bool = True
    vis_sigmoid_method: str = "learnable"  # learnable | fixed | exponential_decay
    vis_optimise_sigmoid_bias: bool = True
    vis_optimise_sigmoid_scale: bool = False
    vis_target_min_bias: float = 0.1
    vis_target_max_scale: float = 25.0
    vis_steps_until_min_bias: int = 50000


_DEFAULT_COEFFS = (
    ("rgb_l1_loss", 1.0), ("rgb_l2_loss", 0.0), ("cosine_colour_loss", 1.0),
    ("eikonal_loss", 0.1), ("fg_mask_loss", 1.0), ("normal_loss", 1.0),
    ("depth_loss", 1.0), ("sdf_level_set_visibility_loss", 1.0),
    ("interlevel_loss", 1.0), ("sky_pixel_loss", 1.0),
    ("hashgrid_density_loss", 1e-4), ("ground_plane_loss", 0.1),
    ("visibility_sigmoid_loss", 0.01),
)


@dataclasses.dataclass(frozen=True)
class NeuSkyModelConfig:
    sdf_field: SDFAlbedoFieldConfig = SDFAlbedoFieldConfig()
    proposal: ProposalSamplerConfig = ProposalSamplerConfig()
    proposal_fields: Tuple[DensityFieldConfig, ...] = (
        DensityFieldConfig(), DensityFieldConfig(),
    )
    illumination: RENIFieldConfig = RENIFieldConfig()
    illumination_prior_dir: Optional[str] = None
    """Directory of a trained RENI++ prior checkpoint (written by
    ``tools/train_reni_prior.py``).  When set, the trainer surgically
    restores ``illumination_decoder`` from it at init — the reference's
    frozen pretrained-decoder load (``neusky_model.py:272-300``).  Relative
    paths resolve against the repo root."""
    ddf: Optional[DDFModelConfig] = DDFModelConfig()
    num_illumination_directions: int = 512
    illumination_sampler_random_rotation: bool = True
    fix_test_illumination_directions: bool = True
    use_visibility: bool = True
    fit_visibility_field: bool = True
    sdf_to_visibility_stop_gradients: str = "depth"  # none | sdf | depth | both
    only_upperhemisphere_visibility: bool = True
    lower_hemisphere_visibility: bool = True  # lower hemi forced visible
    visibility_sigmoid_scale: float = 25.0
    scene_contraction_order: str = "l2"
    collider_shape: str = "sphere"  # sphere | box
    collider_radius: float = 1.0
    collider_near: float = 0.05
    scene_aabb_scale: float = 1.0
    ddf_radius: float = 1.0
    num_train_data: int = 1
    num_eval_data: int = 1
    losses: LossInclusions = LossInclusions()
    loss_coefficients: tuple = _DEFAULT_COEFFS
    render_ambient_light: bool = False
    eval_latent_optimise_method: str = "per_image"
    optimise_compare_eval_scale: bool = False
    mask_to_building_in_metrics: bool = False
    visibility_query_chunk: int = 16384  # DDF queries per remat chunk
    """Swept on TPU (PERF.md): 65536 −1.6%, 32768 base, 16384 +0.6%
    (6049.7 vs 6012.7 rays/s, stddev 0.3, quiet box, r5) — perf-only
    knob, chunked remat is exact so the sweep needs no quality arm."""
    visibility_remat_policy: str = "full"  # full | dots (see _chunked_apply)
    sdf_query_chunk: int = 0
    """Chunk for the sdf-at-termination query; 0 → single call.  Unlike the
    N·D DDF queries, the strided-subset SDF query is small (N×subset) and
    chunking it re-stages every hash-table level into VMEM per chunk
    iteration (trace-observed) — unchunked it stages once."""
    cos_anneal_ratio: float = 1.0
    gt_illumination_probe: bool = False
    """Ceiling probe: replace the RENI illumination decode with (a) a FREE
    learnable per-direction HDR light table shared across all images — an
    oracle upper bound on ANY illumination estimator, RENI included — and
    (b) a fixed analytic sky background (``gt_probe_background``, sRGB).
    Isolates geometry/albedo/shading capacity from illumination estimation
    so the synthetic-scene PSNR ceiling is a measured number (the GT-layer
    eval intent of reference ``neusky_model.py:1177-1254``).  Random
    direction rotation is disabled so table slots keep fixed directions."""
    gt_probe_background: tuple = (0.35, 0.55, 0.95)
    """sRGB sky colour composited behind the scene in probe mode (must
    match the synthetic scene's ``sky_colour``)."""
    fused_ddf_gt_pass: bool = False
    """Run the scene forward and the DDF ground-truth render as ONE
    concatenated proposal+field pass (``forward_with_ddf_gt``) instead of
    two equal-size passes.  Reference-equivalent in train mode (both calls
    go through the same train-mode sampler/field there); halves the hash
    encode / scatter op count.  A/B: ``NEUSKY_FUSED_GT``; ignored when
    ``stop_sdf_gradients`` or no DDF fit."""
    sdf_level_set_subset: int = 64
    """Directions per ray for the sdf-at-termination query feeding
    ``sdf_level_set_visibility_loss``.  The reference evaluates the SDF at
    every (ray × light-direction) termination point
    (``ddf_model.py:241-251``) — ~33M hash-gradient scatter rows per step on
    TPU.  A strided subset is an unbiased estimator of the same mean-squared
    level-set loss (directions are freshly randomly rotated each step);
    0 → use all directions."""


def _chunked_apply(
    fn: Callable,
    args: Tuple[jnp.ndarray, ...],
    chunk: int,
    constrain_chunk: Optional[Callable] = None,
    remat_policy: str = "full",
):
    """Run ``fn`` over the leading axis in fixed chunks with remat.

    Bounds peak activation memory of the N·D visibility queries; exact
    because results are concatenated.  Pads to a multiple of ``chunk``.

    ``constrain_chunk`` (optional): sharding constraint applied to each
    per-iteration ``[chunk, ...]`` slice inside the scan body — used by the
    SP (dirs-sharded) path so every device processes ``chunk / mesh_size``
    elements per iteration instead of materialising its whole N·D shard at
    once (the reference OOMs exactly here at canonical scale,
    ``neusky_model.py:1685-1699``).

    ``remat_policy``: ``full`` recomputes the whole chunk body in the
    backward (minimum memory); ``dots`` saves matmul outputs
    (``dots_with_no_batch_dims_saveable``) so the backward skips
    recomputing the FiLM matmuls — the r3 trace puts the bwd while at
    66 ms/step of which ~27 ms is (re)matmul; trades ~[chunk, hidden]
    activations per chunk for that recompute.  A/B: ``NEUSKY_VIS_REMAT``.
    """
    m = args[0].shape[0]
    num_chunks = max(1, -(-m // chunk))
    pad = num_chunks * chunk - m
    padded = tuple(jnp.concatenate([a, jnp.zeros((pad, *a.shape[1:]), a.dtype)], 0) if pad else a for a in args)
    stacked = tuple(a.reshape(num_chunks, chunk, *a.shape[1:]) for a in padded)

    def body(xs):
        if constrain_chunk is not None:
            xs = tuple(constrain_chunk(x) for x in xs)
        out = fn(*xs)
        if constrain_chunk is not None:
            out = jax.tree_util.tree_map(constrain_chunk, out)
        return out

    if remat_policy == "dots":
        ck = jax.checkpoint(
            body,
            policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
        )
    else:
        ck = jax.checkpoint(body)
    out = jax.lax.map(ck, stacked)
    return jax.tree_util.tree_map(
        lambda o: o.reshape(num_chunks * chunk, *o.shape[2:])[:m], out
    )


class NeuSkyModel:
    """Orchestrator; see module docstring.  All state lives in the params
    pytree; methods are pure given (params, rng, batch)."""

    def __init__(self, config: NeuSkyModelConfig):
        self.config = config
        self.field = SDFAlbedoField(config.sdf_field)
        self.proposal_fields = [HashMLPDensityField(c) for c in config.proposal_fields]
        self.illumination = RENIField(config.illumination)
        self.ddf = (
            DDFModel(config.ddf, ddf_radius=config.ddf_radius)
            if (config.ddf is not None)
            else None
        )
        self.illumination_sampler = IcosahedronSampler(
            num_directions=config.num_illumination_directions,
            apply_random_rotation=config.illumination_sampler_random_rotation,
        )
        self.num_directions = self.illumination_sampler.actual_num_directions
        # optional mesh for sharding constraints (set via set_mesh); when the
        # mesh has a "dirs" axis the visibility N·D tensors shard across it
        # (SP-style split of the light-direction axis, SURVEY §2.5)
        self.mesh = None

    def set_mesh(self, mesh) -> "NeuSkyModel":
        self.mesh = mesh
        return self

    def _constrain(self, x, spec_axes):
        """Apply a NamedSharding constraint if a mesh with those axes is set.

        An entry may be a name, None, or a tuple of names (product axis)."""
        if self.mesh is None:
            return x
        from jax.sharding import NamedSharding, PartitionSpec

        def ok(a):
            if a is None:
                return None
            if isinstance(a, tuple):
                kept = tuple(n for n in a if n in self.mesh.axis_names)
                return kept if kept else None
            return a if a in self.mesh.axis_names else None

        axes = tuple(ok(a) for a in spec_axes)
        if all(a is None for a in axes):
            return x
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(self.mesh, PartitionSpec(*axes))
        )

    @property
    def _dirs_sharded(self) -> bool:
        return self.mesh is not None and "dirs" in self.mesh.axis_names

    # ------------------------------------------------------------------
    # init
    # ------------------------------------------------------------------

    def init(self, rng: jax.Array) -> Dict[str, Any]:
        c = self.config
        keys = jax.random.split(rng, 8)
        pos = jnp.zeros((2, 3))
        dirs = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
        params = {
            "fields": self.field.init(keys[0], pos),
            "illumination_field": {
                "train_latents": jnp.zeros((c.num_train_data, c.illumination.latent_dim, 3)),
                "train_scale": jnp.ones((c.num_train_data,)),
            },
            "eval_latents": {
                "eval_latents": jnp.zeros((c.num_eval_data, c.illumination.latent_dim, 3)),
                "eval_scale": jnp.ones((c.num_eval_data,)),
                "eval_rotation": jnp.ones((c.num_eval_data,)),
            },
            "illumination_decoder": self.illumination.init(
                keys[1], dirs, jnp.zeros((2, c.illumination.latent_dim, 3))
            ),
        }
        for i, pf in enumerate(self.proposal_fields):
            params[f"proposal_networks_{i}"] = pf.init(keys[2 + i], pos[None])
        if self.ddf is not None:
            origins = jnp.array([[0.0, 0.0, c.ddf_radius]] * 2)
            params["ddf_field"] = self.ddf.init(keys[6], origins, dirs)
        if c.gt_illumination_probe:
            # log-parameterised so the table spans HDR decades and stays
            # positive; init at the linear-domain sky level
            bg_lin = sRGB_to_linear(jnp.asarray(c.gt_probe_background))
            params["gt_probe_illumination"] = {
                "log_light": jnp.tile(
                    jnp.log(jnp.maximum(bg_lin, 1e-4))[None, :].astype(jnp.float32),
                    (self.num_directions, 1),
                ),
            }
        if c.losses.vis_sigmoid_method == "learnable":
            params["visibility_sigmoid"] = {
                "visibility_threshold": jnp.asarray(c.ddf_radius * 2.0),
                "sigmoid_scale": jnp.asarray(1.0)
                if c.losses.vis_optimise_sigmoid_scale
                else jnp.asarray(c.visibility_sigmoid_scale),
            }
        return params

    # ------------------------------------------------------------------
    # pieces
    # ------------------------------------------------------------------

    def apply_collider(self, ray_bundle: RayBundle) -> RayBundle:
        c = self.config
        if c.collider_shape == "sphere":
            return sphere_collider(ray_bundle, c.collider_radius, c.collider_near)
        aabb = jnp.array(
            [[-c.scene_aabb_scale] * 3, [c.scene_aabb_scale] * 3], jnp.float32
        )
        return aabb_collider(ray_bundle, aabb, c.collider_near)

    def _field_salt(self, rng: Optional[jax.Array]):
        """Per-step salt for the stochastic-corner SDF table gradients
        (``ops/hashgrid.py::_level_encode_stoch``); None → exact backward
        (eval paths, or ``stochastic_table_grads=False``)."""
        if rng is None or not self.field.config.stochastic_table_grads:
            return None
        return jax.random.bits(rng, dtype=jnp.uint32)

    def density_fns(self, params, rng: Optional[jax.Array] = None):
        """Proposal density callables.  With ``rng`` (training contexts),
        each field gets a subkey enabling the stochastic-corner table
        gradient (``DensityFieldConfig.stochastic_table_grad``)."""
        keys = (
            jax.random.split(rng, len(self.proposal_fields))
            if rng is not None
            else [None] * len(self.proposal_fields)
        )
        return [
            (
                lambda p, _pf=pf, _pp=params[f"proposal_networks_{i}"], _k=keys[i]:
                _pf.apply(_pp, p, _k)
            )
            for i, pf in enumerate(self.proposal_fields)
        ]

    def _select_latents(self, params, train: bool, fitting_eval_latents: bool):
        """``get_illumination_field`` (``neusky_model.py:400-412``)."""
        if train and not fitting_eval_latents:
            g = params["illumination_field"]
            return g["train_latents"], g["train_scale"]
        g = params["eval_latents"]
        return g["eval_latents"], g["eval_scale"]

    def sample_illumination(
        self,
        params,
        rng: Optional[jax.Array],
        ray_bundle: RayBundle,
        image_indices: jnp.ndarray,  # [U] dataset image ids
        ray_image_idx: jnp.ndarray,  # [N] → row into image_indices
        train: bool,
        fitting_eval_latents: bool = False,
        rotation: Optional[jnp.ndarray] = None,
    ):
        """Decode HDR illumination for the static direction set and the
        per-ray background (``sample_illumination``,
        ``neusky_model.py:445-551``; unique-camera factoring replaced by the
        static U-images batch layout).

        Returns (illum_dirs [D,3], hdr_light_colours [N,D,3],
        hdr_background [N,3]).
        """
        c = self.config
        apply_rot = None
        if c.gt_illumination_probe or (
            not train and c.fix_test_illumination_directions
        ):
            apply_rot = False
        dirs = self.illumination_sampler(rng, apply_random_rotation=apply_rot)  # [D,3]
        d = dirs.shape[0]
        u = image_indices.shape[0]
        n = ray_bundle.origins.shape[0]

        if c.gt_illumination_probe:
            # oracle illumination: free learnable per-direction HDR table
            # (shared across images — the synthetic sky is global) + fixed
            # analytic background.  See ``gt_illumination_probe`` docstring.
            light = jnp.exp(params["gt_probe_illumination"]["log_light"])  # [D,3]
            hdr_light_colours = jnp.broadcast_to(light[None], (n, d, 3))
            bg = sRGB_to_linear(jnp.asarray(c.gt_probe_background, jnp.float32))
            hdr_background = jnp.broadcast_to(bg[None], (n, 3))
            return dirs, hdr_light_colours, hdr_background

        latents_all, scales_all = self._select_latents(params, train, fitting_eval_latents)
        z_img = latents_all[image_indices]  # [U, L, 3]
        s_img = scales_all[image_indices]  # [U]

        decoder_params = params["illumination_decoder"]
        if c.illumination.fixed_decoder:
            decoder_params = freeze_decoder_params(decoder_params)

        # per-image × per-direction decode: [U*D]
        dirs_tiled = jnp.tile(dirs, (u, 1))  # [U*D, 3]
        z_rep = jnp.repeat(z_img, d, axis=0)  # [U*D, L, 3]
        s_rep = jnp.repeat(s_img, d, axis=0)  # [U*D]
        rot_rep = None
        if rotation is not None and rotation.ndim == 3:
            rot_rep = jnp.repeat(rotation, d, axis=0)
        elif rotation is not None:
            rot_rep = rotation
        out = self.illumination.apply(decoder_params, dirs_tiled, z_rep, s_rep, rot_rep)
        hdr = self.illumination.unnormalise(out["rgb"]).reshape(u, d, 3)
        hdr_light_colours = hdr[ray_image_idx]  # [N, D, 3]

        # per-ray background along the viewing direction
        cam_rows = ray_image_idx
        z_ray = z_img[cam_rows]
        s_ray = s_img[cam_rows]
        rot_ray = None
        if rotation is not None and rotation.ndim == 3:
            rot_ray = rotation[cam_rows]
        elif rotation is not None:
            rot_ray = rotation
        bg_out = self.illumination.apply(
            decoder_params, ray_bundle.directions, z_ray, s_ray, rot_ray
        )
        hdr_background = self.illumination.unnormalise(bg_out["rgb"])  # [N, 3]
        return dirs, hdr_light_colours, hdr_background

    def compute_visibility(
        self,
        params,
        ray_samples: RaySamples,
        p2p_depth: jnp.ndarray,  # [N, 1]
        illumination_directions: jnp.ndarray,  # [D, 3]
        threshold_distance: jnp.ndarray,
        sigmoid_scale: jnp.ndarray,
        stop_sdf_gradients: bool,
        compute_sdf_at_termination: bool,
        stoch_salt: Optional[jnp.ndarray] = None,
    ) -> dict:
        """DDF visibility per (ray, light direction)
        (``compute_visibility``, ``neusky_model.py:1624-1778``).

        Returns dict with ``visibility`` [N, 1, D] (+ ``sdf_at_termination``
        [N·D, 1], ``difference`` [N, D]).
        """
        c = self.config
        r = c.ddf_radius
        n = ray_samples.num_rays
        dmask = None
        dirs_full = illumination_directions
        d_full = dirs_full.shape[0]
        upper_prune = c.only_upperhemisphere_visibility and d_full > 8
        if upper_prune:
            # Exact fixed-shape culling (``neusky_model.py:1650-1659``): the
            # icosphere vertex set is antipodally symmetric, so exactly half
            # the (rotated) directions have z > 0.  Take the top ceil(D/2)+pad
            # by z — a static-shape gather — and compute visibility only
            # there; the lower hemisphere is filled with the configured
            # constant.  Halves the N·D DDF/SDF query cost.
            k = min(d_full, d_full // 2 + 8)
            _, top_idx = jax.lax.top_k(dirs_full[:, 2], k)
            dirs = dirs_full[top_idx]
            dmask = (dirs[:, 2] > 0).astype(jnp.float32)  # [k] (pad rows → 0)
        else:
            dirs = dirs_full
            if c.only_upperhemisphere_visibility:
                dmask = (dirs[:, 2] > 0).astype(jnp.float32)
        d = dirs.shape[0]

        origins = ray_samples.origins[:, 0, :]  # [N, 3]
        ray_dirs = ray_samples.directions[:, 0, :]
        positions = origins + ray_dirs * p2p_depth  # [N, 3] surface points

        inside = jnp.linalg.norm(positions, axis=-1, keepdims=True) < r
        # pull out-of-sphere points back just inside along the ray
        boundary = ray_sphere_intersection(origins, ray_dirs, r) - 0.01 * r * ray_dirs
        positions = jnp.where(inside, positions, boundary)

        flat_spec = ((("data", "dirs"),) , )  # product sharding of the N·D axis
        pos_nd = jnp.repeat(positions, d, axis=0)  # [N*D, 3]
        dir_nd = jnp.tile(dirs, (n, 1))  # [N*D, 3]
        pos_nd = self._constrain(pos_nd, (("data", "dirs"), None))
        dir_nd = self._constrain(dir_nd, (("data", "dirs"), None))
        sphere_pts = ray_sphere_intersection(pos_nd, dir_nd, r)  # [N*D, 3]
        dist_to_origins = jnp.linalg.norm(sphere_pts - pos_nd, axis=-1)
        dist_to_origins = jnp.clip(dist_to_origins, None, 2.0 * r)

        ddf_params = params["ddf_field"]

        def ddf_query(o, dd):
            return self.ddf.apply(ddf_params, o, dd)

        if self._dirs_sharded:
            # SP-style: each scan iteration's [chunk] slice is sharded across
            # the mesh product, so per-device activation memory is bounded by
            # chunk/mesh_size — chunking and sharding compose (Weak #3 fix:
            # previously this branch materialised the full per-device N·D
            # shard in one MLP application).
            mesh_size = self.mesh.devices.size
            sp_chunk = self.config.visibility_query_chunk * mesh_size
            out = _chunked_apply(
                ddf_query,
                (sphere_pts, -dir_nd),
                sp_chunk,
                constrain_chunk=lambda x: self._constrain(
                    x, (("data", "dirs"),) + (None,) * (x.ndim - 1)
                ),
                remat_policy=c.visibility_remat_policy,
            )
        else:
            out = _chunked_apply(
                ddf_query, (sphere_pts, -dir_nd),
                self.config.visibility_query_chunk,
                remat_policy=c.visibility_remat_policy,
            )
        expected = out["expected_termination_dist"]  # [N*D]

        difference = dist_to_origins - expected
        occlusion = jax.nn.sigmoid(sigmoid_scale * (difference - threshold_distance))
        visibility = (1.0 - occlusion).reshape(n, d)
        visibility = self._constrain(visibility, ("data", "dirs"))

        if dmask is not None:
            fill = 1.0 if c.lower_hemisphere_visibility else 0.0
            visibility = visibility * dmask[None, :] + fill * (1.0 - dmask[None, :])

        difference = difference.reshape(n, d)
        if upper_prune:
            fill = 1.0 if c.lower_hemisphere_visibility else 0.0
            vis_full = jnp.full((n, d_full), fill, visibility.dtype)
            visibility = vis_full.at[:, top_idx].set(visibility)
            diff_full = jnp.zeros((n, d_full), difference.dtype)
            difference = diff_full.at[:, top_idx].set(difference)

        result = {
            "visibility": visibility[:, None, :],  # [N, 1, D] broadcast over samples
            "difference": difference,
            "expected_termination_dist": expected,
        }

        if compute_sdf_at_termination:
            term_points = sphere_pts + (-dir_nd) * expected[..., None]
            field_params = params["fields"]
            if stop_sdf_gradients:
                field_params = jax.tree_util.tree_map(jax.lax.stop_gradient, field_params)

            sub = c.sdf_level_set_subset
            if sub and sub < d:
                # strided direction subset — unbiased for the level-set MSE
                # since the direction set is freshly rotated every step
                stride = d // sub
                tp = term_points.reshape(n, d, 3)[:, :: stride, :][:, :sub, :]
                term_points = tp.reshape(-1, 3)

            def sdf_query(p):
                return self.field.apply(
                    field_params, p, stoch_salt, method=self.field.sdf_only
                )

            if not c.sdf_query_chunk:
                sdf_at_term = sdf_query(term_points)
            elif self._dirs_sharded:
                mesh_size = self.mesh.devices.size
                sdf_at_term = _chunked_apply(
                    sdf_query,
                    (term_points,),
                    c.sdf_query_chunk * mesh_size,
                    constrain_chunk=lambda x: self._constrain(
                        x, (("data", "dirs"),) + (None,) * (x.ndim - 1)
                    ),
                )
            else:
                sdf_at_term = _chunked_apply(
                    sdf_query, (term_points,), c.sdf_query_chunk
                )
            result["sdf_at_termination"] = sdf_at_term
        return result

    def _visibility_threshold(self, params, step) -> Tuple[jnp.ndarray, jnp.ndarray]:
        c = self.config
        m = c.losses.vis_sigmoid_method
        if m == "learnable":
            vs = params["visibility_sigmoid"]
            return vs["visibility_threshold"], vs["sigmoid_scale"]
        if m == "exponential_decay":
            start = c.ddf_radius * 2.0
            end = c.losses.vis_target_min_bias
            steps = c.losses.vis_steps_until_min_bias
            rate = -jnp.log(end / start) / steps
            thr = jnp.where(
                step >= steps, end, start * jnp.exp(-rate * jnp.asarray(step, jnp.float32))
            )
            return thr, jnp.asarray(c.visibility_sigmoid_scale)
        return (
            jnp.asarray(c.losses.vis_target_min_bias),
            jnp.asarray(c.visibility_sigmoid_scale),
        )

    def _hashgrid_density_samples(self, params, rng: jax.Array) -> jnp.ndarray:
        """NeuS alphas on a perturbed regular grid (empty-space prior,
        ``neusky_model.py:672-736``)."""
        c = self.config
        res = c.losses.hashgrid_density_grid_resolution
        lin = jnp.linspace(-c.scene_aabb_scale, c.scene_aabb_scale, res)
        X, Y, Z = jnp.meshgrid(lin, lin, lin, indexing="ij")
        pos = jnp.stack([X, Y, Z], -1).reshape(-1, 3)
        gap = 2.0 * c.scene_aabb_scale / res
        k1, k2 = jax.random.split(rng)
        pos = pos + (jax.random.uniform(k1, pos.shape) - 0.5) * gap
        dirs = jax.random.normal(k2, pos.shape)
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        k_salt = jax.random.split(k2)[0]
        sdf, _, grad = self.field.apply(
            params["fields"], pos, self._field_salt(k_salt),
            method=self.field.geo_with_grad,
        )
        inv_s = jnp.clip(
            jnp.exp(params["fields"]["params"]["variance"] * 10.0), 1e-6, 1e6
        )
        alpha = neus_alpha(
            sdf[None], grad[None], dirs[None],
            jnp.full((1, pos.shape[0], 1), gap), inv_s, c.cos_anneal_ratio,
        )
        return alpha

    # ------------------------------------------------------------------
    # forward
    # ------------------------------------------------------------------

    def forward(
        self,
        params,
        rng: jax.Array,
        ray_bundle: RayBundle,
        image_indices: jnp.ndarray,
        ray_image_idx: jnp.ndarray,
        step: jnp.ndarray = 0,
        train: bool = True,
        fitting_eval_latents: bool = False,
        rotation: Optional[jnp.ndarray] = None,
    ) -> Dict[str, Any]:
        """The per-ray forward graph (``get_outputs`` /
        ``sample_and_forward_field``, ``neusky_model.py:553-931``)."""
        c = self.config
        k_prop, k_illum, k_grid, k_stoch = jax.random.split(rng, 4)

        rb = self.apply_collider(ray_bundle)
        rs, weights_list, samples_list = proposal_sample(
            k_prop, rb,
            self.density_fns(params, k_stoch if train else None),
            c.proposal, train=train, step=step,
        )
        field_out = self.field.apply(
            params["fields"], rs, True, c.cos_anneal_ratio,
            self._field_salt(k_stoch if train else None),
            method=self.field.field_outputs,
        )
        weights, trans = weights_and_transmittance_from_alphas(field_out["alpha"])
        return self._compose_outputs(
            params, (k_illum, k_grid, k_stoch), rb, rs, field_out, weights,
            trans, weights_list, samples_list, image_indices, ray_image_idx,
            step, train, fitting_eval_latents, rotation,
        )

    def forward_with_ddf_gt(
        self,
        params,
        rng: jax.Array,
        ray_bundle: RayBundle,
        image_indices: jnp.ndarray,
        ray_image_idx: jnp.ndarray,
        gt_ray_bundle: RayBundle,
        step: jnp.ndarray = 0,
        train: bool = True,
        fitting_eval_latents: bool = False,
        rotation: Optional[jnp.ndarray] = None,
        gt_mask_threshold: float = 0.0,
    ) -> Tuple[Dict[str, Any], Dict[str, jnp.ndarray]]:
        """Fused scene forward + DDF ground truth: ONE proposal+field pass
        over the scene rays and the DDF-GT sphere rays concatenated.

        Parity: the reference feeds BOTH its scene forward
        (``neusky_model.py:553-931``) and ``generate_ddf_ground_truth``
        (``neusky_model.py:1337-1367``) through the SAME proposal sampler
        and field modules — in train mode during training, since
        nerfstudio's stratified jitter follows the module-level
        ``self.training`` flag — just as two separate calls.  Concatenating
        the bundles is therefore the reference semantics with half the hash
        encode / Pallas scatter call sites (the dominant traced step cost —
        PERF.md r3: hash machinery 51%, a long tail of per-level ops).
        Interlevel-loss inputs are sliced back to the scene rays only, so
        loss semantics are unchanged.  Train path only; the eval and
        stop-gradient paths keep the separate methods."""
        c = self.config
        k_prop, k_illum, k_grid, k_stoch = jax.random.split(rng, 4)
        n_scene = ray_bundle.num_rays
        rb_s = self.apply_collider(ray_bundle)
        rb_g = self.apply_collider(gt_ray_bundle)
        rb = jax.tree_util.tree_map(
            lambda a, b: jnp.concatenate([a, b], axis=0), rb_s, rb_g
        )
        rs, weights_list, samples_list = proposal_sample(
            k_prop, rb,
            self.density_fns(params, k_stoch if train else None),
            c.proposal, train=train, step=step,
        )
        field_out = self.field.apply(
            params["fields"], rs, True, c.cos_anneal_ratio,
            self._field_salt(k_stoch if train else None),
            method=self.field.field_outputs,
        )
        weights, trans = weights_and_transmittance_from_alphas(field_out["alpha"])

        def head(t):
            return jax.tree_util.tree_map(lambda x: x[:n_scene], t)

        def tail(t):
            return jax.tree_util.tree_map(lambda x: x[n_scene:], t)

        outputs = self._compose_outputs(
            params, (k_illum, k_grid, k_stoch), head(rb), head(rs),
            head(field_out), weights[:n_scene], trans[:n_scene],
            [w[:n_scene] for w in weights_list],
            [head(s) for s in samples_list],
            image_indices, ray_image_idx, step, train,
            fitting_eval_latents, rotation,
        )

        # DDF supervision from the GT slice (``generate_ddf_ground_truth``
        # semantics, ``neusky_model.py:1337-1367``)
        w_g = weights[n_scene:]
        rs_g = tail(rs)
        accum = render_accumulation(w_g)
        gt = {
            "accumulations": accum,
            "mask": (accum > gt_mask_threshold).astype(jnp.float32),
            "termination_dist": jnp.clip(
                render_depth(w_g, rs_g), None, 2.0 * c.ddf_radius
            ),
            "normals": render_normal(w_g, field_out["normal"][n_scene:]),
        }
        return outputs, gt

    def _compose_outputs(
        self,
        params,
        keys,
        rb: RayBundle,
        rs,
        field_out: Dict[str, jnp.ndarray],
        weights: jnp.ndarray,
        trans: jnp.ndarray,
        weights_list,
        samples_list,
        image_indices: jnp.ndarray,
        ray_image_idx: jnp.ndarray,
        step: jnp.ndarray,
        train: bool,
        fitting_eval_latents: bool,
        rotation: Optional[jnp.ndarray],
    ) -> Dict[str, Any]:
        """Everything after the field pass: illumination, visibility,
        shading, renderers, outputs dict (shared by ``forward`` and
        ``forward_with_ddf_gt``)."""
        c = self.config
        k_illum, k_grid, k_stoch = keys
        bg_transmittance = trans[:, -1, :]
        weights_list = weights_list + [weights]
        samples_list = samples_list + [rs]

        illum_dirs, hdr_light, hdr_background = self.sample_illumination(
            params, k_illum, rb, image_indices, ray_image_idx,
            train=train, fitting_eval_latents=fitting_eval_latents, rotation=rotation,
        )

        p2p = render_depth(weights, rs)  # [N, 1]
        accumulation = render_accumulation(weights)
        depth = p2p / rb.directions_norm

        visibility = None
        vis_dict = None
        if c.use_visibility and self.ddf is not None:
            stop_depth = c.sdf_to_visibility_stop_gradients in ("depth", "both")
            stop_sdf = c.sdf_to_visibility_stop_gradients in ("sdf", "both")
            p2p_vis = jax.lax.stop_gradient(p2p) if stop_depth else p2p
            rs_vis = jax.tree_util.tree_map(jax.lax.stop_gradient, rs)
            thr, sig_scale = self._visibility_threshold(params, step)
            vis_dict = self.compute_visibility(
                params, rs_vis, p2p_vis, illum_dirs, thr, sig_scale,
                stop_sdf_gradients=stop_sdf,
                compute_sdf_at_termination=c.losses.sdf_level_set_visibility,
                stoch_salt=self._field_salt(k_stoch if train else None),
            )
            visibility = vis_dict["visibility"]

        if "shininess" in field_out:
            # view dir in world space from the per-sample ray directions
            rgb = blinn_phong_composite(
                field_out["albedo"], field_out["normal"], illum_dirs, hdr_light,
                visibility[..., :] if visibility is not None else None,
                hdr_background, weights, field_out["shininess"],
                -rb.directions, clip_output=not train,
            )
        else:
            rgb = lambertian_composite(
                field_out["albedo"], field_out["normal"], illum_dirs, hdr_light,
                visibility, hdr_background, weights, clip_output=not train,
            )

        normal = render_normal(weights, field_out["normal"])
        albedo = render_rgb_with_background(
            weights, field_out["albedo"], jnp.ones((3,))
        )

        outputs = {
            "rgb": rgb,
            "albedo": albedo,
            "accumulation": accumulation,
            "depth": depth,
            "p2p_dist": p2p,
            "normal": normal,
            "normal_vis": (normal + 1.0) / 2.0,
            "weights": weights,
            "hdr_background_colours": hdr_background,
            "directions_norm": rb.directions_norm,
            "bg_transmittance": bg_transmittance,
            "eik_grad": field_out["gradient"],
            "weights_list": weights_list,
            "samples_list": samples_list,
        }
        if vis_dict is not None:
            outputs["visibility"] = visibility
            if "sdf_at_termination" in vis_dict:
                outputs["sdf_at_termination"] = vis_dict["sdf_at_termination"]
        for i in range(len(weights_list) - 1):
            outputs[f"prop_depth_{i}"] = render_depth(weights_list[i], samples_list[i])

        if train and c.losses.hashgrid_density:
            outputs["grid_density"] = self._hashgrid_density_samples(params, k_grid)

        return outputs

    def generate_ddf_ground_truth(
        self,
        params,
        rng: jax.Array,
        ray_bundle: RayBundle,
        mask_threshold: float = 0.0,
        stop_gradients: bool = False,
        step: Optional[jnp.ndarray] = None,
    ) -> Dict[str, jnp.ndarray]:
        """Render DDF supervision from the scene SDF
        (``generate_ddf_ground_truth``, ``neusky_model.py:1337-1367``):
        accumulation mask, clamped termination distance, normals.  With
        ``stop_gradients=False`` (canonical config,
        ``configs/neusky_config.py:45``) gradients flow from the DDF losses
        back into the SDF.

        ``step`` anneals the proposal PDF exactly as the scene pass does —
        the reference routes this call through the SAME sampler instance
        whose anneal is set globally per train iteration
        (``neusky_model.py:1343``, nerfstudio ``set_anneal`` callback), so
        passing the current step is the faithful semantics;
        ``forward_with_ddf_gt`` does.  Default None keeps the historical
        un-annealed behaviour of the separate pipeline call."""
        c = self.config
        k_prop, k_stoch = jax.random.split(rng)
        rb = self.apply_collider(ray_bundle)
        # GT generation is no-grad w.r.t. sampling but (with
        # stop_gradients=False) backprops into the SDF and proposal tables,
        # so the stochastic estimator applies here too
        rs, _, _ = proposal_sample(
            k_prop, rb,
            self.density_fns(params, None if stop_gradients else k_stoch),
            c.proposal, train=False, step=step,
        )
        field_out = self.field.apply(
            params["fields"], rs, True, c.cos_anneal_ratio,
            self._field_salt(None if stop_gradients else k_stoch),
            method=self.field.field_outputs,
        )
        weights, _ = weights_and_transmittance_from_alphas(field_out["alpha"])
        accum = render_accumulation(weights)
        mask = (accum > mask_threshold).astype(jnp.float32)
        p2p = render_depth(weights, rs)
        p2p = jnp.clip(p2p, None, 2.0 * c.ddf_radius)
        normals = render_normal(weights, field_out["normal"])
        out = {
            "accumulations": accum,
            "mask": mask,
            "termination_dist": p2p,
            "normals": normals,
        }
        if stop_gradients:
            out = jax.tree_util.tree_map(jax.lax.stop_gradient, out)
        return out

    # ------------------------------------------------------------------
    # losses
    # ------------------------------------------------------------------

    def loss_dict(
        self,
        params,
        outputs: Dict[str, Any],
        batch: Dict[str, Any],
        train: bool = True,
        fitting_eval_latents: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        """``get_loss_dict`` (``neusky_model.py:933-1062``).  ``batch`` must
        carry ``image`` [N,3] and ``mask`` [N,4] (static, fg, ground, sky)."""
        c = self.config
        li = c.losses
        image = batch["image"]
        fg_mask = batch["mask"][..., 1]
        ground_mask = batch["mask"][..., 2]
        sky_mask = batch["mask"][..., 3]
        not_sky = (1.0 - sky_mask)[..., None]
        loss_dict: Dict[str, jnp.ndarray] = {}

        masked_img = image * not_sky
        masked_pred = outputs["rgb"] * not_sky
        if li.rgb_l1:
            loss_dict["rgb_l1_loss"] = L.l1_loss(masked_img, masked_pred)
        if li.rgb_l2:
            loss_dict["rgb_l2_loss"] = L.mse_loss(masked_img, masked_pred)
        if li.cosine_colour:
            loss_dict["cosine_colour_loss"] = L.cosine_colour_loss(masked_img, masked_pred)

        if train and not fitting_eval_latents:
            if li.eikonal:
                loss_dict["eikonal_loss"] = L.eikonal_loss(outputs["eik_grad"])
            if li.fg_mask:
                ws = jnp.sum(outputs["weights"], axis=1)
                loss_dict["fg_mask_loss"] = L.fg_mask_loss(ws, fg_mask[..., None])
            if li.normal and "normal" in batch:
                loss_dict["normal_loss"] = L.monosdf_normal_loss(
                    outputs["normal"], batch["normal"]
                )
            if li.depth and "depth" in batch:
                loss_dict["depth_loss"] = L.mse_loss(
                    outputs["depth"], batch["depth"].reshape(outputs["depth"].shape)
                )
            if li.interlevel:
                loss_dict["interlevel_loss"] = L.interlevel_loss(
                    outputs["weights_list"], outputs["samples_list"]
                )
            if li.hashgrid_density and "grid_density" in outputs:
                loss_dict["hashgrid_density_loss"] = L.hashgrid_density_loss(
                    outputs["grid_density"]
                )
            if li.ground_plane:
                loss_dict["ground_plane_loss"] = L.ground_plane_loss(
                    outputs["normal"], ground_mask
                )
            if li.vis_sigmoid_method == "learnable" and "visibility_sigmoid" in params:
                vs = params["visibility_sigmoid"]
                loss_dict["visibility_sigmoid_loss"] = L.visibility_sigmoid_loss(
                    vs["visibility_threshold"], vs["sigmoid_scale"],
                    li.vis_target_min_bias, li.vis_target_max_scale,
                    li.vis_optimise_sigmoid_bias, li.vis_optimise_sigmoid_scale,
                )
            if li.sdf_level_set_visibility and "sdf_at_termination" in outputs:
                loss_dict["sdf_level_set_visibility_loss"] = jnp.mean(
                    outputs["sdf_at_termination"] ** 2
                )

        sky_loss_allowed = (
            train
            or (c.eval_latent_optimise_method != "nerf_osr_envmap")
        )
        if li.sky_pixel and sky_loss_allowed:
            loss_dict["sky_pixel_loss"] = L.sky_pixel_loss(
                linear_to_sRGB(outputs["hdr_background_colours"]),
                image, sky_mask[..., None], li.sky_pixel_cosine_weight,
            )

        return L.scale_loss_dict(loss_dict, dict(c.loss_coefficients))

    def metrics_dict(self, params, outputs, batch) -> Dict[str, jnp.ndarray]:
        """Scalar train metrics (``get_metrics_dict``,
        ``neusky_model.py:1064-1077``)."""
        mse = jnp.mean((outputs["rgb"] - batch["image"]) ** 2)
        psnr = -10.0 * jnp.log10(jnp.maximum(mse, 1e-10))
        inv_s = jnp.clip(jnp.exp(params["fields"]["params"]["variance"] * 10.0), 1e-6, 1e6)
        m = {"psnr": psnr, "inv_s": inv_s[0], "s_val": 1.0 / inv_s[0]}
        if "mask" in batch:
            # foreground-masked PSNR: the whole-batch PSNR mixes sky-region
            # compositing error into the scene-fit signal (the r5 GT-probe
            # run showed batch PSNR FALLING while foreground rgb_l1
            # improved 5x — the coarse probe sky dominates the mean as
            # opacity sharpens); psnr_fg isolates the surface fit
            fg = batch["mask"][..., 1:2]  # channel 1 = fg (see loss_dict)
            mse_fg = jnp.sum(fg * (outputs["rgb"] - batch["image"]) ** 2) / (
                3.0 * jnp.maximum(jnp.sum(fg), 1.0)
            )
            m["psnr_fg"] = -10.0 * jnp.log10(jnp.maximum(mse_fg, 1e-10))
        if "visibility_sigmoid" in params:
            m["visibility_threshold"] = params["visibility_sigmoid"]["visibility_threshold"]
        return m
