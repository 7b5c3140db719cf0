"""Host-side pixel sampling → fixed-shape device batches.

TPU-native rework of the reference's pixel-sampling stack
(``neusky/data/neusky_pixel_sampler.py:28-200``):

  - **Static-mask rejection sampling → index tables.**  The reference
    rejection-samples pixels against the static mask at every step
    (dynamic shapes).  Here each image's valid-pixel indices are
    precomputed once (host numpy) and batches are drawn by uniform index
    lookup — fixed shape, O(1) per step.
  - **U×R batch layout.**  Each batch samples ``rays_per_image`` pixels
    from ``images_per_batch`` randomly-chosen images, so the illumination
    decode is a static [U×D] problem (see ``models/neusky.py``).
  - **Sky-ray batches** (``collate_sky_ray_batch``,
    ``neusky_pixel_sampler.py:57-124``): same mechanism over inverted
    fg-masks — rays known to hit the sky, for RENI and DDF supervision.
  - **Image-region batches** for eval-latent fitting
    (``collate_image_half``, ``neusky_pixel_sampler.py:126-200``):
    left/right/full region index tables.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import numpy as np

import jax.numpy as jnp

from neusky_tpu.core.cameras import Cameras
from neusky_tpu.core.rays import RayBundle


@dataclasses.dataclass(frozen=True)
class PixelSamplerConfig:
    images_per_batch: int = 16
    rays_per_image: int = 64  # batch = images_per_batch * rays_per_image
    device_rays: bool = True
    """True → batches carry host numpy ``cam_idx``/``pixel_coords`` and the
    ray bundle is generated *inside* the jitted train step (zero per-step
    eager device dispatch — on the axon tunnel each eager jnp op is a
    blocking round trip).  False → legacy behaviour: materialise the
    RayBundle eagerly at batch-assembly time."""


class PixelSampler:
    """Precomputes per-image valid-index tables and draws fixed-shape
    batches with a numpy ``Generator`` (host-side, overlap-friendly)."""

    def __init__(
        self,
        config: PixelSamplerConfig,
        cameras: Cameras,
        images: np.ndarray,  # [C, H, W, 3]
        masks: np.ndarray,  # [C, H, W, 4]
        seed: int = 0,
    ):
        self.config = config
        self.cameras = cameras
        self.images = images
        self.masks = masks
        self.num_images, self.height, self.width = images.shape[:3]
        self.rng = np.random.default_rng(seed)

        # valid = static-mask channel 0 (``neusky_pixel_sampler.py:36-46``)
        static = masks[..., 0] > 0.5  # [C, H, W]
        flat = static.reshape(self.num_images, -1)
        # pad each image's index table to the max count (sampling is uniform
        # over valid indices; padding duplicates are harmless)
        counts = flat.sum(axis=1)
        max_count = int(counts.max())
        self.valid_idx = np.zeros((self.num_images, max_count), np.int64)
        for i in range(self.num_images):
            idx = np.nonzero(flat[i])[0]
            reps = int(np.ceil(max_count / max(len(idx), 1)))
            self.valid_idx[i] = np.tile(idx, reps)[:max_count]
        self.valid_counts = counts

        # sky indices: inverted fg mask (channel 1) — may be empty
        sky = masks[..., 3] > 0.5
        sky_flat = sky.reshape(self.num_images, -1)
        sky_counts = sky_flat.sum(axis=1)
        self.has_sky = sky_counts.min() > 0
        if self.has_sky:
            max_sky = int(sky_counts.max())
            self.sky_idx = np.zeros((self.num_images, max_sky), np.int64)
            for i in range(self.num_images):
                idx = np.nonzero(sky_flat[i])[0]
                reps = int(np.ceil(max_sky / len(idx)))
                self.sky_idx[i] = np.tile(idx, reps)[:max_sky]

    # ------------------------------------------------------------------

    def _pixels_to_batch(self, image_rows: np.ndarray, flat_pixels: np.ndarray) -> Dict:
        """image_rows [U], flat_pixels [U, R] → batch dict.

        ``device_rays=True`` (default): everything stays host numpy; the
        consumer (``scene_loss_fn``) generates rays in-graph from
        ``cam_idx``/``pixel_coords`` + the ``cameras`` pytree in the batch."""
        u, r = flat_pixels.shape
        ys = (flat_pixels // self.width).astype(np.float32) + 0.5
        xs = (flat_pixels % self.width).astype(np.float32) + 0.5
        coords = np.stack([ys, xs], axis=-1).reshape(-1, 2)  # [U*R, 2]
        cam_idx = np.repeat(image_rows, r).astype(np.int32)
        flat = flat_pixels.reshape(-1)
        img = self.images.reshape(self.num_images, -1, 3)[cam_idx, flat]
        msk = self.masks.reshape(self.num_images, -1, 4)[cam_idx, flat]
        batch = {
            "image_indices": image_rows.astype(np.int32),
            "ray_image_idx": np.repeat(np.arange(u, dtype=np.int32), r),
        }
        if self.config.device_rays:
            batch.update(
                cam_idx=cam_idx,
                pixel_coords=coords,
                image=np.ascontiguousarray(img),
                mask=np.ascontiguousarray(msk),
                cameras=self.cameras,
            )
        else:
            batch.update(
                ray_bundle=self.cameras.generate_rays_at(
                    jnp.asarray(cam_idx), jnp.asarray(coords)
                ),
                image=jnp.asarray(img),
                mask=jnp.asarray(msk),
                image_indices=jnp.asarray(batch["image_indices"]),
                ray_image_idx=jnp.asarray(batch["ray_image_idx"]),
            )
        return batch

    def sample_batch(self) -> Dict:
        """Scene training batch: [U images × R rays] over static-valid pixels."""
        c = self.config
        u = min(c.images_per_batch, self.num_images)
        image_rows = self.rng.choice(self.num_images, size=u, replace=(u > self.num_images))
        cols = self.rng.integers(0, self.valid_idx.shape[1], size=(u, c.rays_per_image))
        flat = self.valid_idx[image_rows[:, None], cols]
        return self._pixels_to_batch(image_rows, flat)

    def sample_sky_rays(self, num_rays: int):
        """Sky-ray bundle (``get_sky_ray_bundle``,
        ``neusky_datamanager.py:277-288``).

        ``device_rays=True`` → returns host ``(cam_idx [K], coords [K,2])``
        for in-graph ray generation; else a materialised RayBundle."""
        if not self.has_sky:
            return None
        rows = self.rng.integers(0, self.num_images, size=num_rays)
        cols = self.rng.integers(0, self.sky_idx.shape[1], size=num_rays)
        flat = self.sky_idx[rows, cols]
        ys = (flat // self.width).astype(np.float32) + 0.5
        xs = (flat % self.width).astype(np.float32) + 0.5
        coords = np.stack([ys, xs], axis=-1)
        if self.config.device_rays:
            return rows.astype(np.int32), coords
        return self.cameras.generate_rays_at(jnp.asarray(rows.astype(np.int32)), jnp.asarray(coords))

    def sample_region_batch(self, image_row: int, region: str = "full_image") -> Dict:
        """Eval-latent fitting batch from one image region
        (``collate_image_half``): 'left_image_half' | 'right_image_half' |
        'full_image'."""
        c = self.config
        r = c.images_per_batch * c.rays_per_image
        if region == "left_image_half":
            xs = self.rng.integers(0, self.width // 2, size=r)
        elif region == "right_image_half":
            xs = self.rng.integers(self.width // 2, self.width, size=r)
        else:
            xs = self.rng.integers(0, self.width, size=r)
        ys = self.rng.integers(0, self.height, size=r)
        flat = (ys * self.width + xs).reshape(1, r)
        return self._pixels_to_batch(np.asarray([image_row]), flat)
