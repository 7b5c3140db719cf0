"""Synthetic analytic scene: GT harness for tests and benchmarks.

The reference has no unit-test fixtures; its de-facto GT harnesses are the
model-generated DDF dataset and the Blender-synthetic parser (SURVEY §4).
This module provides the equivalent for the TPU build: a closed-form scene
(sphere on an optional ground plane under a simple sun+ambient sky) rendered
analytically, giving images + 4-channel masks + cameras with known geometry
for end-to-end training tests (BASELINE config "NeuS SDF volume render on a
small synthetic scene").
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import numpy as np

from neusky_tpu.core.cameras import Cameras, CameraType
from neusky_tpu.core.spherical import look_at_target

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SyntheticSceneConfig:
    num_cameras: int = 8
    width: int = 48
    height: int = 48
    sphere_radius: float = 0.4
    sphere_center: tuple = (0.0, 0.0, 0.0)
    camera_distance: float = 1.2
    camera_height: float = 0.35
    albedo: tuple = (0.7, 0.4, 0.3)
    sun_direction: tuple = (0.3, -0.5, 0.8)
    sun_intensity: float = 2.5
    ambient: float = 0.35
    sky_colour: tuple = (0.35, 0.55, 0.95)
    focal: float = 0.0  # ≤0 → 0.85 × width (keeps sky visible at any size)
    angle_offset: float = 0.0
    """Azimuth offset (radians) of the camera ring — an eval split uses a
    non-zero offset so its viewpoints are NOVEL w.r.t. the train ring."""

    @property
    def focal_px(self) -> float:
        return self.focal if self.focal > 0 else 0.85 * self.width


def _sphere_hit(origins: np.ndarray, dirs: np.ndarray, center, radius):
    oc = origins - np.asarray(center)
    b = 2.0 * np.sum(dirs * oc, axis=-1)
    c = np.sum(oc * oc, axis=-1) - radius**2
    disc = b**2 - 4 * c
    hit = disc > 0
    t = (-b - np.sqrt(np.maximum(disc, 0.0))) / 2.0
    hit = hit & (t > 0)
    return hit, t


def generate_synthetic_scene(config: SyntheticSceneConfig) -> Dict[str, np.ndarray]:
    """Returns dict with ``images`` [C,H,W,3] (sRGB-ish LDR), ``masks``
    [C,H,W,4] (static, fg, ground, sky), ``depths`` [C,H,W], ``normals``
    [C,H,W,3], and a ``cameras`` object."""
    c = config
    angles = np.linspace(0, 2 * np.pi, c.num_cameras, endpoint=False) + c.angle_offset
    cam_pos = np.stack(
        [
            c.camera_distance * np.cos(angles),
            c.camera_distance * np.sin(angles),
            np.full_like(angles, c.camera_height),
        ],
        axis=-1,
    ).astype(np.float32)
    c2w = np.asarray(
        look_at_target(jnp.asarray(cam_pos), jnp.zeros_like(jnp.asarray(cam_pos)))
    )[..., :3, :]

    cameras = Cameras(
        camera_to_worlds=jnp.asarray(c2w),
        fx=jnp.full((c.num_cameras,), c.focal_px),
        fy=jnp.full((c.num_cameras,), c.focal_px),
        cx=jnp.full((c.num_cameras,), c.width / 2.0),
        cy=jnp.full((c.num_cameras,), c.height / 2.0),
        width=c.width,
        height=c.height,
        camera_type=int(CameraType.PERSPECTIVE),
    )

    sun = np.asarray(c.sun_direction, np.float64)
    sun = sun / np.linalg.norm(sun)
    albedo = np.asarray(c.albedo)

    images, masks, depths, normals_out = [], [], [], []
    for i in range(c.num_cameras):
        rb = cameras.generate_rays(i)
        o = np.asarray(rb.origins, np.float64)
        d = np.asarray(rb.directions, np.float64)
        hit, t = _sphere_hit(o, d, c.sphere_center, c.sphere_radius)
        pts = o + d * t[..., None]
        n = (pts - np.asarray(c.sphere_center)) / c.sphere_radius
        shade = c.ambient + c.sun_intensity * np.maximum(n @ sun, 0.0)
        rgb_lin = albedo[None, :] * shade[..., None]
        # simple tonemap to LDR
        rgb = np.where(
            rgb_lin <= 0.0031308, 12.92 * rgb_lin,
            1.055 * np.abs(rgb_lin) ** (1 / 2.4) - 0.055,
        )
        rgb = np.clip(rgb, 0, 1)
        img = np.where(hit[..., None], rgb, np.asarray(c.sky_colour)[None, :])
        img = img.reshape(c.height, c.width, 3).astype(np.float32)

        mask = np.zeros((c.height, c.width, 4), np.float32)
        hit_img = hit.reshape(c.height, c.width)
        mask[..., 0] = 1.0  # static (everything valid)
        mask[..., 1] = hit_img  # fg
        mask[..., 3] = ~hit_img  # sky

        depth = np.where(hit, t, 0.0).reshape(c.height, c.width).astype(np.float32)
        nrm = np.where(hit[..., None], n, 0.0).reshape(
            c.height, c.width, 3
        ).astype(np.float32)

        images.append(img)
        masks.append(mask)
        depths.append(depth)
        normals_out.append(nrm)

    return {
        "images": np.stack(images),
        "masks": np.stack(masks),
        "depths": np.stack(depths),
        "normals": np.stack(normals_out),
        "cameras": cameras,
    }
