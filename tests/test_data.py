"""Tests for the data stack: synthetic scene, pixel sampler, datamanager,
mask building, pose utils, dataparsers on fabricated fixtures."""

import json
from pathlib import Path

import numpy as np
import pytest

from neusky_tpu.data.datamanager import DataManager, DataManagerConfig
from neusky_tpu.data.dataset import build_mask_from_semantics, downscale_cameras
from neusky_tpu.data.dataparsers.nerfosr import CITYSCAPE_CLASSES
from neusky_tpu.data.dataparsers.pose_utils import (
    auto_orient_and_center_poses,
    rotation_between,
)
from neusky_tpu.data.pixel_sampler import PixelSampler, PixelSamplerConfig
from neusky_tpu.data.synthetic import SyntheticSceneConfig, generate_synthetic_scene


@pytest.fixture(scope="module")
def scene():
    return generate_synthetic_scene(
        SyntheticSceneConfig(num_cameras=4, width=32, height=32)
    )


def test_synthetic_scene_shapes(scene):
    assert scene["images"].shape == (4, 32, 32, 3)
    assert scene["masks"].shape == (4, 32, 32, 4)
    # fg + sky partition every pixel
    assert np.allclose(scene["masks"][..., 1] + scene["masks"][..., 3], 1.0)
    # centre pixel of image 0 hits the sphere
    assert scene["masks"][0, 16, 16, 1] == 1.0
    assert scene["depths"][0, 16, 16] > 0


def test_pixel_sampler_batches(scene):
    ps = PixelSampler(
        PixelSamplerConfig(images_per_batch=2, rays_per_image=8),
        scene["cameras"], scene["images"], scene["masks"],
    )
    batch = ps.sample_batch()
    assert batch["image"].shape == (16, 3)
    assert batch["mask"].shape == (16, 4)
    assert batch["image_indices"].shape == (2,)
    assert batch["ray_image_idx"].shape == (16,)
    # device_rays default: host coords + cameras; bundle built in-graph
    from neusky_tpu.models.pipeline import batch_ray_bundle

    rb = batch_ray_bundle(batch)
    assert np.isfinite(np.asarray(rb.origins)).all()

    ci, co = ps.sample_sky_rays(8)
    assert ci.shape == (8,) and co.shape == (8, 2)

    # legacy eager-bundle mode
    ps_eager = PixelSampler(
        PixelSamplerConfig(images_per_batch=2, rays_per_image=8, device_rays=False),
        scene["cameras"], scene["images"], scene["masks"],
    )
    eb = ps_eager.sample_batch()
    assert np.isfinite(np.asarray(eb["ray_bundle"].origins)).all()
    sky = ps_eager.sample_sky_rays(8)
    assert sky.origins.shape == (8, 3)


def test_region_batch(scene):
    ps = PixelSampler(
        PixelSamplerConfig(images_per_batch=2, rays_per_image=8),
        scene["cameras"], scene["images"], scene["masks"],
    )
    b = ps.sample_region_batch(1, "left_image_half")
    assert b["image"].shape == (16, 3)
    assert int(b["image_indices"][0]) == 1


def test_datamanager(scene):
    dm = DataManager(
        DataManagerConfig(
            pixel_sampler=PixelSamplerConfig(images_per_batch=2, rays_per_image=8),
            num_sky_rays=8,
        ),
        scene["cameras"], scene["images"], scene["masks"],
    )
    batch = dm.next_train(0)
    assert "sky_cam_idx" in batch  # device_rays: host coords, in-graph bundle
    from neusky_tpu.models.pipeline import batch_sky_bundle

    assert batch_sky_bundle(batch).origins.shape == (8, 3)
    rb, gt = dm.eval_image_bundle(0)
    assert rb.origins.shape == (32 * 32, 3)
    assert gt["image"].shape == (32 * 32, 3)


def test_mask_from_semantics():
    classes = CITYSCAPE_CLASSES["classes"]
    colours = CITYSCAPE_CLASSES["colours"]
    sem = np.zeros((4, 4, 3), np.uint8)
    sem[0, :] = colours[classes.index("sky")]
    sem[1, :] = colours[classes.index("building")]
    sem[2, :] = colours[classes.index("road")]
    sem[3, :] = colours[classes.index("person")]
    mask = build_mask_from_semantics(sem)
    # row 0: sky → static 1, fg 0, ground 0, sky 1
    assert mask[0, 0].tolist() == [1.0, 0.0, 0.0, 1.0]
    # row 1: building → fg
    assert mask[1, 0].tolist() == [1.0, 1.0, 0.0, 0.0]
    # row 2: road → fg + ground
    assert mask[2, 0].tolist() == [1.0, 1.0, 1.0, 0.0]
    # row 3: person → transient: static 0
    assert mask[3, 0].tolist() == [0.0, 0.0, 0.0, 0.0]


def test_mask_vegetation_toggle():
    classes = CITYSCAPE_CLASSES["classes"]
    colours = CITYSCAPE_CLASSES["colours"]
    sem = np.zeros((1, 1, 3), np.uint8)
    sem[0, 0] = colours[classes.index("vegetation")]
    m_trans = build_mask_from_semantics(sem, mask_vegetation=True)
    m_fg = build_mask_from_semantics(sem, mask_vegetation=False)
    assert m_trans[0, 0, 0] == 0.0  # vegetation transient
    assert m_fg[0, 0, 0] == 1.0 and m_fg[0, 0, 1] == 1.0


def test_object_mask_anding():
    classes = CITYSCAPE_CLASSES["classes"]
    colours = CITYSCAPE_CLASSES["colours"]
    sem = np.zeros((2, 2, 3), np.uint8)
    sem[:] = colours[classes.index("building")]
    obj = np.zeros((2, 2), np.float32)
    obj[0, 0] = 1.0  # out-of-frustum object at one pixel
    mask = build_mask_from_semantics(sem, object_mask=obj)
    assert mask[0, 0, 0] == 0.0 and mask[0, 0, 1] == 0.0
    assert mask[1, 1, 0] == 1.0


def test_rotation_between():
    a = np.array([0.0, 1.0, 0.0])
    b = np.array([0.0, 0.0, 1.0])
    R = rotation_between(a, b)
    assert np.allclose(R @ a, b, atol=1e-6)
    assert np.allclose(R @ R.T, np.eye(3), atol=1e-6)


def test_auto_orient_and_center():
    rng = np.random.default_rng(0)
    n = 10
    poses = np.tile(np.eye(4, dtype=np.float32)[None], (n, 1, 1))
    # up vectors tilted toward +y, positions offset
    tilt = rotation_between(np.array([0, 0, 1.0]), np.array([0, 0.6, 0.8]))
    poses[:, :3, :3] = tilt.T  # camera up (col 1) tilted
    poses[:, :3, 3] = rng.normal(5.0, 1.0, (n, 3))
    out, transform = auto_orient_and_center_poses(poses)
    # mean position at origin
    assert np.allclose(out[:, :3, 3].mean(axis=0), 0.0, atol=1e-5)
    # mean up now points to +z
    up = out[:, :3, 1].mean(axis=0)
    up = up / np.linalg.norm(up)
    assert up[2] > 0.999


def test_downscale_cameras(scene):
    cams = downscale_cameras(scene["cameras"], 2)
    assert cams.width == 16 and cams.height == 16
    assert np.allclose(np.asarray(cams.fx), np.asarray(scene["cameras"].fx) / 2)


def test_custom_synthetic_parser(tmp_path):
    """Fabricated transforms.json fixture round-trips through the parser."""
    from PIL import Image

    from neusky_tpu.data.dataparsers.custom_synthetic import (
        CustomSyntheticDataparserConfig,
        parse_custom_synthetic_scene,
    )

    data = tmp_path / "scene"
    frames = []
    for s, n in (("train", 3), ("validation", 1)):
        (data / s / "rgb").mkdir(parents=True)
        for i in range(n):
            name = f"{s}/rgb/{i:04d}.png"
            Image.fromarray(
                np.zeros((8, 8, 3), np.uint8)
            ).save(data / name)
            c2w = np.eye(4)
            c2w[:3, 3] = [i, 0, 2]
            frames.append(
                {
                    "file_path": name,
                    "transform_matrix": c2w.tolist(),
                    "envmap_name": f"sky_{i}",
                    "envmap_rotation": [0, 0, 0.5],
                }
            )
    meta = {"fl_x": 10.0, "fl_y": 10.0, "cx": 4.0, "cy": 4.0, "frames": frames}
    (data / "transforms.json").write_text(json.dumps(meta))

    cfg = CustomSyntheticDataparserConfig(data=str(data))
    out = parse_custom_synthetic_scene(cfg, "train")
    assert len(out["image_filenames"]) == 3
    assert out["cameras"].num_cameras == 3
    assert out["cameras"].width == 8
    out_val = parse_custom_synthetic_scene(cfg, "val")
    assert len(out_val["image_filenames"]) == 1


def test_nerfosr_parser(tmp_path):
    """Fabricated NeRF-OSR directory fixture."""
    from PIL import Image

    from neusky_tpu.data.dataparsers.nerfosr import (
        NeRFOSRDataparserConfig,
        parse_nerfosr_scene,
    )

    scene_dir = tmp_path / "lk2" / "final"
    for split, n in (("train", 3), ("validation", 1), ("test", 1)):
        for sub in ("intrinsics", "pose", "rgb", "cityscapes_mask"):
            (scene_dir / split / sub).mkdir(parents=True)
        for i in range(n):
            K = np.eye(4)
            K[0, 0] = K[1, 1] = 20.0
            K[0, 2], K[1, 2] = 8.0, 6.0
            (scene_dir / split / "intrinsics" / f"{i:04d}.txt").write_text(
                " ".join(str(x) for x in K.reshape(-1))
            )
            pose = np.eye(4)
            pose[:3, 3] = [i * 0.1, 0, 1.0]
            (scene_dir / split / "pose" / f"{i:04d}.txt").write_text(
                " ".join(str(x) for x in pose.reshape(-1))
            )
            name = f"session_A_{i:04d}"
            Image.fromarray(np.zeros((12, 16, 3), np.uint8)).save(
                scene_dir / split / "rgb" / f"{name}.png"
            )
            Image.fromarray(np.zeros((12, 16, 3), np.uint8)).save(
                scene_dir / split / "cityscapes_mask" / f"{name}.png"
            )
    (scene_dir / "ENV_MAP_CC" / "session_A").mkdir(parents=True)

    cfg = NeRFOSRDataparserConfig(
        data=str(tmp_path), scene="site1",
        session_holdout_indices=(0,),
        mask_out_of_view_frustum_objects=False,
    )
    out = parse_nerfosr_scene(cfg, "train")
    assert out["cameras"].num_cameras == 3
    assert len(out["image_filenames"]) == 3
    assert out["session_to_indices"] == {0: [0, 1, 2]}
    # crop_to_equal_size honours min principal point: cx=8 → width 16
    assert out["width_height"] == [16, 12]


def test_datamanager_reseed(scene):
    """Resume must not replay the batch stream (r2 segmented-resume bug):
    same seed ⇒ identical streams; after ``reseed(step)`` the stream
    diverges but stays deterministic for that (seed, step)."""
    def make():
        return DataManager(
            DataManagerConfig(
                pixel_sampler=PixelSamplerConfig(images_per_batch=2, rays_per_image=8),
            ),
            scene["cameras"], scene["images"], scene["masks"],
        )

    a, b = make(), make()
    np.testing.assert_array_equal(
        a.next_train(0)["pixel_coords"], b.next_train(0)["pixel_coords"]
    )
    c, d = make(), make()
    c.reseed(5000)
    d.reseed(5000)
    ca = c.next_train(5000)["pixel_coords"]
    assert not np.array_equal(ca, make().next_train(0)["pixel_coords"])
    np.testing.assert_array_equal(ca, d.next_train(5000)["pixel_coords"])


def test_datamanager_reseed_native(scene):
    """reseed must also rebuild the C++ prefetcher (it was a silent no-op
    for the native path — r2 review)."""
    from neusky_tpu.data.native_sampler import native_available

    if not native_available():
        import pytest

        pytest.skip("native sampler not built / no toolchain")

    def make():
        return DataManager(
            DataManagerConfig(
                pixel_sampler=PixelSamplerConfig(images_per_batch=2, rays_per_image=8),
                use_native_sampler=True,
            ),
            scene["cameras"], scene["images"], scene["masks"],
        )

    a = make()
    assert a._native is not None
    first = a.next_train(0)["pixel_coords"].copy()
    a.reseed(5000)
    resumed = a.next_train(5000)["pixel_coords"]
    assert not np.array_equal(first, resumed)
    # deterministic per (seed, step)
    b = make()
    b.reseed(5000)
    np.testing.assert_array_equal(resumed, b.next_train(5000)["pixel_coords"])


def test_datamanager_native_sampler(scene):
    """use_native_sampler=True must produce batches with the same layout,
    dtypes, and mask semantics as the numpy path (and train end-to-end the
    same way — the trainer consumes the dict blindly)."""
    from neusky_tpu.data.native_sampler import native_available

    if not native_available():
        import pytest

        pytest.skip("native sampler not built / no toolchain")

    cfg = DataManagerConfig(
        pixel_sampler=PixelSamplerConfig(images_per_batch=2, rays_per_image=8),
        num_sky_rays=8,
        use_native_sampler=True,
    )
    dm = DataManager(cfg, scene["cameras"], scene["images"], scene["masks"])
    assert dm._native is not None, "native sampler did not engage"
    ref = DataManager(
        DataManagerConfig(
            pixel_sampler=PixelSamplerConfig(images_per_batch=2, rays_per_image=8),
            num_sky_rays=8,
        ),
        scene["cameras"], scene["images"], scene["masks"],
    ).next_train(0)
    batch = dm.next_train(0)
    assert set(batch) == set(ref)
    for k in ("cam_idx", "pixel_coords", "image", "mask",
              "image_indices", "ray_image_idx"):
        assert batch[k].shape == ref[k].shape, k
        assert batch[k].dtype == ref[k].dtype, k
    # drawn pixels respect the static mask; gathered rgb matches the source
    flat_imgs = scene["images"].reshape(scene["images"].shape[0], -1, 3)
    w = scene["images"].shape[2]
    ys = (batch["pixel_coords"][:, 0] - 0.5).astype(int)
    xs = (batch["pixel_coords"][:, 1] - 0.5).astype(int)
    flat = ys * w + xs
    assert np.allclose(batch["image"], flat_imgs[batch["cam_idx"], flat])
    assert (batch["mask"][:, 0] > 0.5).all()
    # sky rays present and batch feeds the in-graph bundle builder
    from neusky_tpu.models.pipeline import batch_ray_bundle, batch_sky_bundle

    assert batch_ray_bundle(batch).origins.shape == (16, 3)
    assert batch_sky_bundle(batch).origins.shape == (8, 3)
