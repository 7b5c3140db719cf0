"""DataManager: owns datasets + samplers, emits per-step device batches.

Rebuild of ``neusky/data/datamanagers/neusky_datamanager.py:63-333`` for the
TPU pipeline: train/eval splits, the per-step scene batch (U×R layout), the
per-step sky-ray bundle, eval-image ray bundles for full renders, and the
region bundles for eval-latent fitting.  Data lives in host numpy; batches
are assembled on host and shipped once per step (single H2D per batch).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from neusky_tpu.core.cameras import Cameras
from neusky_tpu.core.rays import RayBundle
from neusky_tpu.data.pixel_sampler import PixelSampler, PixelSamplerConfig


@dataclasses.dataclass(frozen=True)
class DataManagerConfig:
    pixel_sampler: PixelSamplerConfig = PixelSamplerConfig()
    num_sky_rays: int = 256
    seed: int = 0
    use_native_sampler: bool = False
    """Draw training batches from the C++ sampler/prefetcher
    (``native/batch_sampler.cpp``): index tables + gather + a background
    prefetch thread overlap batch assembly with the device step.  Falls
    back to the numpy sampler when the .so cannot be built."""
    native_queue_depth: int = 4


class DataManager:
    """In-memory datamanager over (cameras, images, masks) arrays.

    Constructed from a dataparser output dict (see ``data/dataparsers``) or
    the synthetic scene generator."""

    def __init__(
        self,
        config: DataManagerConfig,
        train_cameras: Cameras,
        train_images: np.ndarray,
        train_masks: np.ndarray,
        eval_cameras: Optional[Cameras] = None,
        eval_images: Optional[np.ndarray] = None,
        eval_masks: Optional[np.ndarray] = None,
    ):
        self.config = config
        self.train_sampler = PixelSampler(
            config.pixel_sampler, train_cameras, train_images, train_masks,
            seed=config.seed,
        )
        self.eval_sampler = None
        if eval_cameras is not None:
            self.eval_sampler = PixelSampler(
                config.pixel_sampler, eval_cameras, eval_images, eval_masks,
                seed=config.seed + 1,
            )
        self.train_cameras = train_cameras
        self.eval_cameras = eval_cameras
        self.train_images = train_images
        self.eval_images = eval_images
        self.train_masks = train_masks
        self.eval_masks = eval_masks

        self._native = None
        if config.use_native_sampler:
            from neusky_tpu.data.native_sampler import native_available

            if native_available():
                self._start_native(config.seed)

    @property
    def num_train(self) -> int:
        return self.train_sampler.num_images

    @property
    def num_eval(self) -> int:
        return self.eval_sampler.num_images if self.eval_sampler else 0

    def _start_native(self, seed: int) -> None:
        from neusky_tpu.data.native_sampler import NativeBatchSampler

        ps = self.config.pixel_sampler
        u = min(ps.images_per_batch, self.num_train)
        self._native = NativeBatchSampler(
            self.train_images, self.train_masks, seed=seed
        )
        self._native.start_prefetch(
            u, ps.rays_per_image, self.config.native_queue_depth
        )
        self._native_u = u

    def reseed(self, step: int) -> None:
        """Advance the host sampling stream to a resume step: a resumed run
        must NOT replay the batch sequence from position 0 (the stateful
        generators restart identically otherwise — found in the r2
        segmented-resume review).  Folding the step into the seed gives a
        distinct, deterministic stream per resume point.  Covers BOTH the
        numpy sampler and the C++ prefetcher (which is rebuilt)."""
        self.train_sampler.rng = np.random.default_rng(
            (self.config.seed, step)
        )
        if self._native is not None:
            # derive a 32-bit seed for the C++ generator
            folded = int(
                np.random.SeedSequence([self.config.seed, step]).generate_state(1)[0]
            )
            self._start_native(folded)

    def next_train(self, step: int = 0) -> Dict:
        """Scene batch + sky-ray bundle (``next_train`` + DDF sky rays)."""
        if self._native is not None:
            batch = self._native_batch()
        else:
            batch = self.train_sampler.sample_batch()
        sky = self._native_sky() if self._native is not None else (
            self.train_sampler.sample_sky_rays(self.config.num_sky_rays)
        )
        if sky is not None:
            if isinstance(sky, tuple):  # device_rays: host (cam_idx, coords)
                batch["sky_cam_idx"], batch["sky_pixel_coords"] = sky
            else:
                batch["sky_ray_bundle"] = sky
        return batch

    def _native_batch(self) -> Dict:
        """Prefetched native batch → the same host-numpy layout as
        ``PixelSampler._pixels_to_batch`` (device_rays mode)."""
        u = self._native_u
        r = self.config.pixel_sampler.rays_per_image
        rows, pixels, rgb, mask = self._native.next_batch()
        w = self._native.width
        ys = (pixels // w).astype(np.float32) + 0.5
        xs = (pixels % w).astype(np.float32) + 0.5
        return {
            "image_indices": rows.astype(np.int32),
            "ray_image_idx": np.repeat(np.arange(u, dtype=np.int32), r),
            "cam_idx": np.repeat(rows, r).astype(np.int32),
            "pixel_coords": np.stack([ys, xs], axis=-1),
            "image": rgb,
            "mask": mask,
            "cameras": self.train_cameras,
        }

    def _native_sky(self):
        if not self._native.has_sky:
            return None
        rows, pixels = self._native.sample_sky(self.config.num_sky_rays)
        w = self._native.width
        ys = (pixels // w).astype(np.float32) + 0.5
        xs = (pixels % w).astype(np.float32) + 0.5
        return rows.astype(np.int32), np.stack([ys, xs], axis=-1)

    def eval_image_bundle(self, image_idx: int) -> Tuple[RayBundle, Dict]:
        """Full-image ray bundle + GT batch for eval renders."""
        cams = self.eval_cameras if self.eval_cameras is not None else self.train_cameras
        imgs = self.eval_images if self.eval_images is not None else self.train_images
        msks = self.eval_masks if self.eval_masks is not None else self.train_masks
        rb = cams.generate_rays(image_idx)
        batch = {
            "image": jnp.asarray(imgs[image_idx].reshape(-1, 3)),
            "mask": jnp.asarray(msks[image_idx].reshape(-1, 4)),
            "image_idx": image_idx,
        }
        return rb, batch

    def eval_latent_batch(self, image_idx: int, region: str = "full_image") -> Dict:
        """Region batch for test-time latent fitting
        (``get_eval_image_half_bundle``, ``neusky_datamanager.py:290-307``)."""
        sampler = self.eval_sampler or self.train_sampler
        return sampler.sample_region_batch(image_idx, region)
