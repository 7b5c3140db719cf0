"""Tests for the native C++ batch sampler (ctypes)."""

import numpy as np
import pytest

from neusky_tpu.data.native_sampler import NativeBatchSampler, native_available

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native sampler not built / no toolchain"
)


def _data(c=3, h=8, w=8):
    rng = np.random.default_rng(0)
    images = rng.uniform(size=(c, h, w, 3)).astype(np.float32)
    masks = np.zeros((c, h, w, 4), np.float32)
    masks[..., 0] = 1.0  # static everywhere
    masks[:, :2, :, 3] = 1.0  # top rows are sky
    masks[:, 2:, :, 1] = 1.0  # rest is fg
    # one image has a transient hole
    masks[0, 4, 4, 0] = 0.0
    return images, masks


def test_batch_gather_matches_numpy():
    images, masks = _data()
    s = NativeBatchSampler(images, masks, seed=7)
    rows, pixels, rgb, mask = s.sample_batch(2, 16)
    assert rows.shape == (2,) and pixels.shape == (32,)
    flat_imgs = images.reshape(3, -1, 3)
    flat_masks = masks.reshape(3, -1, 4)
    for i in range(2):
        for j in range(16):
            o = i * 16 + j
            assert np.allclose(rgb[o], flat_imgs[rows[i], pixels[o]])
            assert np.allclose(mask[o], flat_masks[rows[i], pixels[o]])
            # static-mask respected
            assert flat_masks[rows[i], pixels[o], 0] > 0.5


def test_sky_sampling():
    images, masks = _data()
    s = NativeBatchSampler(images, masks, seed=3)
    assert s.has_sky
    rows, pixels = s.sample_sky(64)
    flat_masks = masks.reshape(3, -1, 4)
    for r, p in zip(rows, pixels):
        assert flat_masks[r, p, 3] > 0.5


def test_prefetch_round_trip():
    images, masks = _data()
    s = NativeBatchSampler(images, masks, seed=5)
    s.start_prefetch(2, 8, queue_depth=2)
    for _ in range(5):
        rows, pixels, rgb, mask = s.next_batch()
        assert rgb.shape == (16, 3)
        assert np.isfinite(rgb).all()
    del s  # join worker cleanly


def test_deterministic_seed():
    images, masks = _data()
    a = NativeBatchSampler(images, masks, seed=11).sample_batch(2, 8)
    b = NativeBatchSampler(images, masks, seed=11).sample_batch(2, 8)
    assert np.array_equal(a[1], b[1])
    c = NativeBatchSampler(images, masks, seed=12).sample_batch(2, 8)
    assert not np.array_equal(a[1], c[1])
