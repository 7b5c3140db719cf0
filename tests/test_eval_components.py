"""Tests: metrics, alternative illumination fields, icosphere encoding,
NeRF-OSR eval protocol, render features."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neusky_tpu.engine import metrics as M
from neusky_tpu.fields.illumination_alternatives import (
    EnvironmentMapField,
    SphericalGaussianField,
    SphericalHarmonicIlluminationField,
)
from neusky_tpu.ops.icosphere_encoding import (
    IcosphereEncoding,
    IcosphereEncodingConfig,
)


def test_psnr_mse():
    a = np.zeros((8, 8, 3))
    b = np.full((8, 8, 3), 0.1)
    assert abs(M.psnr(a, b) - 20.0) < 1e-6
    assert abs(M.mse(a, b) - 0.01) < 1e-9
    assert M.psnr(a, a) == 100.0


def test_ssim():
    rng = np.random.default_rng(0)
    img = rng.uniform(size=(32, 32, 3))
    assert abs(M.ssim_image(img, img) - 1.0) < 1e-6
    noisy = np.clip(img + rng.normal(0, 0.2, img.shape), 0, 1)
    s = M.ssim_image(img, noisy)
    assert 0.0 < s < 0.95


def _dirs(n=16):
    d = jax.random.normal(jax.random.PRNGKey(0), (n, 3))
    return d / jnp.linalg.norm(d, axis=-1, keepdims=True)


def test_sh_illumination_field():
    f = SphericalHarmonicIlluminationField(levels=3)
    d = _dirs()
    z = jax.random.normal(jax.random.PRNGKey(1), (9, 3))
    out = f(d, z)
    assert out["rgb"].shape == (16, 3)
    hdr = f.unnormalise(out["rgb"])
    assert np.all(np.asarray(hdr) > 0)
    # constant-term-only latents → direction-independent radiance
    z0 = jnp.zeros((9, 3)).at[0, :].set(1.0)
    out0 = np.asarray(f(d, z0)["rgb"])
    assert np.allclose(out0, out0[0], atol=1e-5)


def test_sg_illumination_field():
    f = SphericalGaussianField(sg_num=12)
    d = _dirs()
    z = jax.random.normal(jax.random.PRNGKey(2), (12, 3))
    out = f(d, z)
    assert out["rgb"].shape == (16, 3)
    # scale scales output
    s = 2.0 * jnp.ones((16,))
    out2 = f(d, z, s)
    assert np.allclose(np.asarray(out2["rgb"]), 2 * np.asarray(out["rgb"]), atol=1e-5)


def test_envmap_field_lookup():
    f = EnvironmentMapField(height=8, width=16, log_domain=False)
    env = jnp.zeros((3, 8, 16))
    env = env.at[:, 0, :].set(5.0)  # top row (zenith) bright
    up = jnp.array([[0.0, 0.0, 1.0]])
    down = jnp.array([[0.0, 0.0, -1.0]])
    v_up = float(f(up, env)["rgb"][0, 0])
    v_dn = float(f(down, env)["rgb"][0, 0])
    assert v_up > 4.0 and v_dn < 0.5


def test_icosphere_encoding():
    enc = IcosphereEncoding(IcosphereEncodingConfig(num_levels=2))
    tables = enc.init(jax.random.PRNGKey(0))
    d = _dirs(32)
    out = enc(tables, d)
    assert out.shape == (32, enc.out_dim)
    # differentiable wrt tables
    g = jax.grad(lambda t: jnp.sum(enc(t, d) ** 2))(tables)
    assert all(np.isfinite(np.asarray(x)).all() for x in g)
    # continuity: nearby directions give nearby encodings
    d2 = d + 1e-4
    d2 = d2 / jnp.linalg.norm(d2, axis=-1, keepdims=True)
    assert np.allclose(out, enc(tables, d2), atol=1e-2)


def test_nerfosr_eval_protocol():
    from neusky_tpu.core.cameras import Cameras, CameraType
    from neusky_tpu.data.nerfosr_eval import (
        NeRFOSREvalProtocol,
        global_least_squares_scale,
    )
    from neusky_tpu.data.pixel_sampler import PixelSamplerConfig

    n, h, w = 6, 8, 8
    cams = Cameras(
        camera_to_worlds=jnp.tile(jnp.eye(4)[None, :3, :], (n, 1, 1)),
        fx=jnp.full((n,), 8.0), fy=jnp.full((n,), 8.0),
        cx=jnp.full((n,), 4.0), cy=jnp.full((n,), 4.0),
        width=w, height=h,
    )
    images = np.random.default_rng(0).uniform(size=(n, h, w, 3)).astype(np.float32)
    masks = np.ones((n, h, w, 4), np.float32)
    proto = NeRFOSREvalProtocol(
        cameras=cams, images=images, masks=masks,
        session_to_indices={0: [0, 1, 2], 1: [3, 4, 5]},
        indices_to_session={0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 1},
        session_holdout_indices=[0, 0],
        test_eval_mask_indices=[1, 4],
        pixel_config=PixelSamplerConfig(images_per_batch=2, rays_per_image=4),
    )
    assert proto.optimise_indices == [0, 3]
    assert proto.compare_indices == [1, 4]
    b = proto.lighting_eval_batch("optimise")
    assert b["image"].shape == (8, 3)
    # latent slots are session ids
    assert set(np.asarray(b["image_indices"]).tolist()) <= {0, 1}
    idx, slot, rb, batch = proto.compare_image(0)
    assert idx == 1 and slot == 0
    assert rb.origins.shape == (64, 3)

    # overlap detection
    with pytest.raises(ValueError):
        NeRFOSREvalProtocol(
            cameras=cams, images=images, masks=masks,
            session_to_indices={0: [0, 1, 2]},
            indices_to_session={0: 0, 1: 0, 2: 0},
            session_holdout_indices=[1],
            test_eval_mask_indices=[1],
        )

    pred = np.full((4, 4, 3), 0.5)
    gt = np.full((4, 4, 3), 1.0)
    scaled = global_least_squares_scale(pred, gt)
    assert np.allclose(scaled, 1.0, atol=1e-6)
