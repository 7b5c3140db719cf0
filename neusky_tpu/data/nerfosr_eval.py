"""NeRF-OSR relighting evaluation protocol.

Rebuild of the reference's session-based eval machinery
(``neusky_datamanager.py:114-122,184-260,309-329`` and
``neusky_model.py:1503-1588``):

  - **optimise set**: one holdout image per lighting session
    (``session_holdout_indices``) — eval latents are fitted on these;
  - **compare set**: the NeRF-OSR-masked test images — metrics are
    computed there, with the provided building masks
    (``mask_to_building_in_metrics``);
  - **session → latent slot**: all images of a session share one latent,
    so the holdout's fitted illumination relights its whole session (the
    reference rewrites camera indices, ``neusky_datamanager.py:237-260``;
    here the image→latent map is explicit);
  - **nerf_osr_envmap mode**: latents come from GT envmaps; only a
    per-session z-rotation (+scale) is optimised
    (``neusky_model.py:1553-1568``).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import numpy as np
import jax.numpy as jnp

from neusky_tpu.core.cameras import Cameras
from neusky_tpu.data.pixel_sampler import PixelSampler, PixelSamplerConfig


@dataclasses.dataclass
class NeRFOSREvalProtocol:
    """Wraps the test split arrays + session maps into eval batch sources."""

    cameras: Cameras
    images: np.ndarray  # [C, H, W, 3]
    masks: np.ndarray  # [C, H, W, 4] (channel 0 = test eval mask when present)
    session_to_indices: Dict[int, List[int]]
    indices_to_session: Dict[int, int]
    session_holdout_indices: List[int]
    test_eval_mask_indices: List[int]  # images with NeRF-OSR eval masks
    pixel_config: PixelSamplerConfig = PixelSamplerConfig(
        images_per_batch=4, rays_per_image=256
    )
    seed: int = 0

    def __post_init__(self):
        self.optimise_indices = [
            self.session_to_indices[s][h]
            for s, h in zip(
                sorted(self.session_to_indices.keys()), self.session_holdout_indices
            )
        ]
        self.compare_indices = list(self.test_eval_mask_indices)
        overlap = set(self.optimise_indices) & set(self.compare_indices)
        if overlap:
            raise ValueError(
                f"holdout images {sorted(overlap)} are also compare images"
            )
        self._sampler = PixelSampler(
            self.pixel_config, self.cameras, self.images, self.masks, self.seed
        )
        self.num_sessions = len(self.session_to_indices)

    # ------------------------------------------------------------------

    def latent_slot_of_image(self, image_idx: int) -> int:
        """Image → eval-latent slot: its session id (shared illumination)."""
        return self.indices_to_session[image_idx]

    def lighting_eval_batch(self, mode: str = "optimise") -> Dict:
        """Pixel batch over the optimise/compare image set
        (``get_nerfosr_lighting_eval_bundle``,
        ``neusky_datamanager.py:309-329``).  ``image_indices`` in the batch
        are *latent slots* (session ids), so fitted latents are shared per
        session."""
        pool = self.optimise_indices if mode == "optimise" else self.compare_indices
        rng = self._sampler.rng
        u = min(self.pixel_config.images_per_batch, len(pool))
        chosen = rng.choice(pool, size=u, replace=len(pool) < u)
        cols = rng.integers(
            0, self._sampler.valid_idx.shape[1],
            size=(u, self.pixel_config.rays_per_image),
        )
        flat = self._sampler.valid_idx[chosen[:, None], cols]
        batch = self._sampler._pixels_to_batch(chosen, flat)
        # rewrite image_indices → session latent slots
        slots = np.asarray(
            [self.latent_slot_of_image(int(i)) for i in chosen], np.int32
        )
        batch["image_indices"] = jnp.asarray(slots)
        return batch

    def compare_image(self, i: int):
        """(image_idx, latent_slot, full ray bundle, GT batch) for the i-th
        compare image — metrics use the channel-0 building mask."""
        image_idx = self.compare_indices[i]
        rb = self.cameras.generate_rays(image_idx)
        batch = {
            "image": jnp.asarray(self.images[image_idx].reshape(-1, 3)),
            "mask": jnp.asarray(self.masks[image_idx].reshape(-1, 4)),
            "image_idx": image_idx,
        }
        return image_idx, self.latent_slot_of_image(image_idx), rb, batch


def global_least_squares_scale(pred: np.ndarray, gt: np.ndarray) -> np.ndarray:
    """Optimal single scale α = <gt, pred>/<pred, pred>
    (``NeuSkyPipeline.global_scale``, ``neusky_pipeline.py:212-225``)."""
    p = pred.reshape(-1)
    g = gt.reshape(-1)
    alpha = float(g @ p) / max(float(p @ p), 1e-12)
    return alpha * pred
