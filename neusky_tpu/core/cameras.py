"""Cameras: perspective + equirectangular ray generation.

TPU-native equivalent of the nerfstudio ``Cameras`` consumed by the
reference (``nerfosr_cityscapes_dataparser.py:313-334`` uses PERSPECTIVE and
EQUIRECTANGULAR camera types; ``neusky_datamanager.py:243`` calls
``camera.generate_rays``).

Conventions (nerfstudio / OpenGL):
  - camera looks down -z, +x right, +y up in camera space;
  - image y indexes rows downward, so camera-space y = -(v - cy)/fy;
  - ``directions_norm`` is the norm of the unnormalised direction, used to
    convert point-to-point distance to z-depth.
"""

from __future__ import annotations

import enum
from typing import Optional

import jax.numpy as jnp
from flax import struct

from neusky_tpu.core.rays import RayBundle


class CameraType(enum.IntEnum):
    PERSPECTIVE = 1
    EQUIRECTANGULAR = 2


@struct.dataclass
class Cameras:
    """A batch of cameras. Leaves are [num_cameras, ...]."""

    camera_to_worlds: jnp.ndarray  # [C, 3, 4]
    fx: jnp.ndarray  # [C]
    fy: jnp.ndarray  # [C]
    cx: jnp.ndarray  # [C]
    cy: jnp.ndarray  # [C]
    width: int = struct.field(pytree_node=False, default=0)
    height: int = struct.field(pytree_node=False, default=0)
    camera_type: int = struct.field(pytree_node=False, default=int(CameraType.PERSPECTIVE))

    @property
    def num_cameras(self) -> int:
        return self.camera_to_worlds.shape[0]

    def generate_rays(self, camera_index: int) -> RayBundle:
        """Generate a full-image ray bundle, row-major flattened [H*W]."""
        H, W = self.height, self.width
        yy, xx = jnp.meshgrid(
            jnp.arange(H, dtype=jnp.float32) + 0.5,
            jnp.arange(W, dtype=jnp.float32) + 0.5,
            indexing="ij",
        )
        coords = jnp.stack([yy.reshape(-1), xx.reshape(-1)], axis=-1)  # [H*W, 2]
        return self.generate_rays_at(camera_index, coords)

    def generate_rays_at(self, camera_indices: jnp.ndarray, pixel_coords: jnp.ndarray) -> RayBundle:
        """Rays at given (row, col) pixel-centre coordinates [N, 2].

        ``camera_indices``: scalar int or [N] int array.
        """
        cam_idx = jnp.broadcast_to(
            jnp.asarray(camera_indices, dtype=jnp.int32), pixel_coords.shape[:1]
        )
        c2w = self.camera_to_worlds[cam_idx]  # [N, 3, 4]
        fx, fy = self.fx[cam_idx], self.fy[cam_idx]
        cx, cy = self.cx[cam_idx], self.cy[cam_idx]
        v, u = pixel_coords[..., 0], pixel_coords[..., 1]

        if self.camera_type == int(CameraType.PERSPECTIVE):
            dir_x = (u - cx) / fx
            dir_y = -(v - cy) / fy
            dir_z = -jnp.ones_like(dir_x)
            dirs_cam = jnp.stack([dir_x, dir_y, dir_z], axis=-1)
            # pixel area ≈ product of per-pixel angular extents
            dx = 1.0 / fx
            dy = 1.0 / fy
            pixel_area = (dx * dy)[..., None]
        elif self.camera_type == int(CameraType.EQUIRECTANGULAR):
            # normalised image coords in [0,1)
            un = u / (2.0 * cx)  # width = 2*cx for equirect panoramas
            vn = v / (2.0 * cy)
            theta = -2.0 * jnp.pi * un  # azimuth, matches nerfstudio sign
            phi = jnp.pi * vn  # polar from +y-up image top
            # nerfstudio equirect: y-up camera space
            dir_x = jnp.sin(phi) * jnp.sin(theta)
            dir_y = jnp.cos(phi)
            dir_z = jnp.sin(phi) * jnp.cos(theta) * -1.0
            dirs_cam = jnp.stack([dir_x, dir_y, dir_z], axis=-1)
            pixel_area = (jnp.pi / (2.0 * cy) * 2.0 * jnp.pi / (2.0 * cx) * jnp.sin(phi))[..., None]
        else:
            raise ValueError(f"unknown camera type {self.camera_type}")

        dirs_world = jnp.einsum("nij,nj->ni", c2w[..., :3, :3], dirs_cam)
        norm = jnp.linalg.norm(dirs_world, axis=-1, keepdims=True)
        dirs_world = dirs_world / norm
        origins = c2w[..., :3, 3]

        return RayBundle.create(
            origins=origins,
            directions=dirs_world,
            pixel_area=pixel_area,
            camera_indices=cam_idx[..., None],
            directions_norm=norm,
        )
