"""Render-time features: shadow maps, ambient-occlusion shading view,
illumination-rotation animation.

Rebuilds the reference's viewer/publication render paths:
  - shadow maps from a single sun direction via the DDF
    (``neusky_model.py:637-670`` with ``compute_shadow_map=True``);
  - ambient-light / occlusion shading view (``render_ambient_light``,
    ``neusky_model.py:829-841``);
  - ``render_illumination_animation`` (``neusky_model.py:1896-1978``):
    rotate the sky about z, render per-frame, cache frames to .npy for
    resumability, assemble an .npz sequence (video encoding left to
    ffmpeg offline — cv2 is not a framework dependency here).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from neusky_tpu.core.rays import RayBundle, render_depth, weights_and_transmittance_from_alphas
from neusky_tpu.core.spherical import rot_z
from neusky_tpu.engine.eval_loop import make_render_chunk_fn, render_camera
from neusky_tpu.models.neusky import NeuSkyModel
from neusky_tpu.sampling.proposal import proposal_sample


def render_shadow_map(
    model: NeuSkyModel,
    params,
    ray_bundle: RayBundle,
    rng: jax.Array,
    azimuth_deg: float,
    elevation_deg: float,
    threshold: float = 0.5,
    sigmoid_scale: float = 50.0,
    accumulation_mask_threshold: float = 0.0,
) -> Dict[str, np.ndarray]:
    """Per-pixel visibility toward one sun direction (viewer shadow map,
    ``neusky_model.py:637-670``).  Returns shadow [N], accumulation [N]."""
    az = np.deg2rad(azimuth_deg)
    el = np.deg2rad(elevation_deg)
    sun = jnp.asarray(
        [np.cos(az) * np.cos(el), np.sin(az) * np.cos(el), np.sin(el)],
        jnp.float32,
    )[None, :]  # [1, 3] single "illumination direction"

    rb = model.apply_collider(ray_bundle)
    rs, _, _ = proposal_sample(
        rng, rb, model.density_fns(params), model.config.proposal, train=False
    )
    field_out = model.field.apply(
        params["fields"], rs, True, model.config.cos_anneal_ratio,
        method=model.field.field_outputs,
    )
    weights, _ = weights_and_transmittance_from_alphas(field_out["alpha"])
    p2p = render_depth(weights, rs)
    accum = jnp.sum(weights, axis=-2)

    vis = model.compute_visibility(
        params, rs, p2p, sun,
        jnp.asarray(threshold), jnp.asarray(sigmoid_scale),
        stop_sdf_gradients=True, compute_sdf_at_termination=False,
    )
    shadow = vis["visibility"][:, 0, 0]  # [N]
    mask = (accum[:, 0] > accumulation_mask_threshold).astype(shadow.dtype)
    return {
        "shadow_map": np.asarray(shadow * mask),
        "difference": np.asarray(vis["difference"][:, 0] * mask),
        "accumulation": np.asarray(accum[:, 0]),
    }


def render_shadow_probe(
    model: NeuSkyModel,
    params,
    position: np.ndarray,
    rng: jax.Array,
    side_length: int = 64,
    threshold: float = 0.5,
    sigmoid_scale: float = 50.0,
) -> np.ndarray:
    """Equirect visibility probe at a clicked scene point (the viewer's
    shadow-envmap overlay, ``neusky_model.py:1803-1810``): visibility of
    every sky direction from one surface point → [H, W] map."""
    from neusky_tpu.sampling.illumination import EquirectangularSampler

    sampler = EquirectangularSampler(width=side_length)
    dirs = sampler()  # [H*W, 3]
    origins = jnp.asarray(position, jnp.float32).reshape(1, 3)

    # direct DDF query per direction from this point
    from neusky_tpu.core.spherical import ray_sphere_intersection

    r = model.config.ddf_radius
    pos_nd = jnp.repeat(origins, dirs.shape[0], axis=0)
    sphere_pts = ray_sphere_intersection(pos_nd, dirs, r)
    dist = jnp.linalg.norm(sphere_pts - pos_nd, axis=-1)
    out = model.ddf.apply(params["ddf_field"], sphere_pts, -dirs)
    difference = jnp.clip(dist, None, 2 * r) - out["expected_termination_dist"]
    vis = 1.0 - jax.nn.sigmoid(sigmoid_scale * (difference - threshold))
    return np.asarray(vis).reshape(sampler.height, sampler.width)


@dataclasses.dataclass
class AnimationConfig:
    num_frames: int = 60
    output_dir: str = "outputs/animation"
    chunk_size: int = 4096
    start_frame: int = 0
    end_frame: Optional[int] = None


def render_illumination_animation(
    model: NeuSkyModel,
    params,
    camera_ray_bundle: RayBundle,
    image_idx: int,
    rng: jax.Array,
    config: AnimationConfig,
) -> np.ndarray:
    """Rotate the illumination field about z over ``num_frames`` and render
    each frame (``render_illumination_animation``,
    ``neusky_model.py:1896-1978``).  Frames cache to ``frame_{i}.npy`` for
    resumability; returns [F, N, 3]."""
    out_dir = Path(config.output_dir) / "render_frames"
    out_dir.mkdir(parents=True, exist_ok=True)
    end = config.end_frame or config.num_frames
    chunk_fn = None

    frames = []
    for i in range(config.start_frame, end):
        frame_path = out_dir / f"frame_{i}.npy"
        if frame_path.exists():
            frames.append(np.load(frame_path))
            continue
        angle = np.deg2rad(i * (360.0 / config.num_frames))
        rotation = rot_z(jnp.asarray(angle, jnp.float32))
        rng, k = jax.random.split(rng)
        # rotation is threaded through the model's illumination decode
        if chunk_fn is None:
            chunk_fn = _make_rotating_chunk_fn(model, config.chunk_size)
        rgb = _render_with_rotation(
            model, params, camera_ray_bundle, image_idx, k, rotation,
            chunk_fn, config.chunk_size,
        )
        np.save(frame_path, rgb)
        frames.append(rgb)
    seq = np.stack(frames)
    np.savez_compressed(Path(config.output_dir) / "render_sequence.npz", rgb=seq)
    return seq


def _make_rotating_chunk_fn(model: NeuSkyModel, chunk_size: int):
    def chunk_fn(params, rng, ray_bundle, image_idx, rotation):
        image_indices = jnp.asarray([image_idx], jnp.int32)
        ray_image_idx = jnp.zeros((ray_bundle.origins.shape[0],), jnp.int32)
        out = model.forward(
            params, rng, ray_bundle, image_indices, ray_image_idx,
            step=jnp.asarray(0.0), train=False, rotation=rotation,
        )
        return out["rgb"]

    return jax.jit(chunk_fn)


def _render_with_rotation(
    model, params, camera_ray_bundle, image_idx, rng, rotation, chunk_fn, chunk_size
):
    n = camera_ray_bundle.origins.shape[0]
    num_chunks = -(-n // chunk_size)
    pad = num_chunks * chunk_size - n
    padded = jax.tree_util.tree_map(
        lambda x: jnp.concatenate([x, jnp.repeat(x[-1:], pad, axis=0)], 0) if pad else x,
        camera_ray_bundle,
    )
    outs = []
    for i in range(num_chunks):
        cb = padded.slice(i * chunk_size, chunk_size)
        rng, k = jax.random.split(rng)
        outs.append(np.asarray(chunk_fn(params, k, cb, image_idx, rotation)))
    return np.concatenate(outs, axis=0)[:n]
