"""Golden-image tests for the eval panels + viz layer (VERDICT r2 item 10).

Shape/NaN checks elsewhere would not catch a silently broken colormap,
flipped concat order, or a depth normalisation regression.  These tests
render panels from SEEDED SYNTHETIC outputs (pure numpy + CPU jnp sRGB —
bit-deterministic), quantise to uint8 and compare sha256 digests.

If an INTENTIONAL visual change lands, re-bless by running
``python -m tests.test_golden_panels`` and pasting the printed digests.

Reference behaviour under test: the combined GT|pred panel composition of
``/root/reference/neusky/models/neusky_model.py:1079-1335``.
"""

import hashlib

import numpy as np

from neusky_tpu.engine.eval_panels import image_metrics_and_panels
from neusky_tpu.utils.viz import (
    apply_colormap,
    apply_depth_colormap,
    image_grid,
    normalised_error_map,
    side_by_side,
)

H, W = 12, 16


def _digest(img: np.ndarray) -> str:
    """uint8-quantised sha256 — absorbs float noise below 1/255."""
    q = np.clip(np.asarray(img, np.float64) * 255.0 + 0.5, 0, 255).astype(np.uint8)
    return hashlib.sha256(q.tobytes()).hexdigest()[:16]


def _synthetic_case():
    rng = np.random.default_rng(1234)
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    depth = (0.5 + ys / H + 0.1 * np.sin(xs))[..., None]
    acc = np.clip(xs / W, 0, 1)[..., None].astype(np.float32)
    normal = np.stack(
        [np.sin(xs / 3), np.cos(ys / 3), np.ones_like(xs)], axis=-1
    ).astype(np.float32)
    normal /= np.linalg.norm(normal, axis=-1, keepdims=True)
    rgb = rng.uniform(0, 1, (H, W, 3)).astype(np.float32)
    gt = np.clip(rgb + rng.normal(0, 0.1, (H, W, 3)), 0, 1).astype(np.float32)
    albedo = rng.uniform(0, 1, (H, W, 3)).astype(np.float32)
    mask = np.ones((H, W, 4), np.float32)
    mask[..., 1] = (ys > 3).astype(np.float32)  # fg below a "horizon"
    outputs = {
        "rgb": rgb.reshape(-1, 3),
        "accumulation": acc.reshape(-1, 1),
        "depth": depth.reshape(-1, 1),
        "normal": normal.reshape(-1, 3),
        "albedo": albedo.reshape(-1, 3),
        "prop_depth_0": (depth * 0.8).reshape(-1, 1),
    }
    batch = {"image": gt, "mask": mask}
    gt_layers = {
        "albedo": np.clip(albedo + rng.normal(0, 0.05, (H, W, 3)), 0, 1).astype(
            np.float32
        ),
        "normal": normal + rng.normal(0, 0.05, (H, W, 3)).astype(np.float32),
        "depth": (depth[..., 0] * 1.1 + 0.05).astype(np.float32),
    }
    return outputs, batch, gt_layers


class _NoEnvModel:
    """Stub: render_reni_envmap raises → panel set omits reni_envmap."""

    illumination = None


def build_all():
    outputs, batch, gt_layers = _synthetic_case()
    metrics, images = image_metrics_and_panels(
        _NoEnvModel(), {}, outputs, batch, H, W, gt_layers=gt_layers
    )
    rng = np.random.default_rng(7)
    scalar = rng.uniform(0, 1, (H, W)).astype(np.float32)
    extra = {
        "viz_colormap": apply_colormap(scalar),
        "viz_depth_colormap": apply_depth_colormap(
            scalar[..., None], accumulation=np.ones((H, W, 1), np.float32)
        ),
        "viz_error_map": normalised_error_map(
            batch["image"], np.asarray(outputs["rgb"]).reshape(H, W, 3)
        ),
        "viz_side_by_side": side_by_side(
            np.zeros((4, 4, 3), np.float32), np.ones((4, 4, 3), np.float32)
        ),
        "viz_grid": image_grid(
            [np.full((4, 4, 3), v, np.float32) for v in (0.0, 0.25, 0.5, 1.0)],
            nrow=2,
        ),
    }
    return metrics, {**images, **extra}


GOLDEN = {
    # re-bless: python -m tests.test_golden_panels
    "accumulation": "0af5a894d0df258c",
    "albedo": "7a824c1df496e607",
    "depth": "e9e8e2a0bf0418f1",
    "gt_vs_pred_albedo": "78529db136e238ef",
    "gt_vs_pred_depth": "6fad63133ef8ee25",
    "gt_vs_pred_normal": "787d838256d30da5",
    "img": "66473a78a75e1ac8",
    "normal": "a1484a6a76370fd5",
    "normalised_error": "eb972a3a070d8a06",
    # prop_depth_0 == depth digest: apply_depth_colormap min-max
    # normalises, so a global 0.8 depth scale maps to the same image
    "prop_depth_0": "e9e8e2a0bf0418f1",
    "viz_colormap": "4ab86a055601083b",
    "viz_depth_colormap": "2f671216ea3f6e31",
    "viz_error_map": "eb972a3a070d8a06",
    "viz_grid": "cf2ffcdb5f6d0490",
    "viz_side_by_side": "69e410493786d915",
}


def test_panel_set_complete():
    _, images = build_all()
    expected = {
        "img", "accumulation", "depth", "normal", "normalised_error",
        "albedo", "prop_depth_0", "gt_vs_pred_albedo", "gt_vs_pred_normal",
        "gt_vs_pred_depth", "viz_colormap", "viz_depth_colormap",
        "viz_error_map", "viz_side_by_side", "viz_grid",
    }
    assert expected <= set(images.keys())


def test_panel_shapes_and_layout():
    _, images = build_all()
    # GT|pred concats double the width — a flipped axis breaks this
    assert images["img"].shape == (H, 2 * W, 3)
    assert images["normal"].shape == (H, 2 * W, 3)
    assert images["depth"].shape == (H, W, 3)
    assert images["viz_side_by_side"].shape == (4, 8, 3)
    # left half GT (zeros), right half pred (ones) — concat ORDER matters
    assert images["viz_side_by_side"][:, :4].max() == 0.0
    assert images["viz_side_by_side"][:, 4:].min() == 1.0


def test_golden_digests():
    _, images = build_all()
    mismatches = {}
    for k, want in GOLDEN.items():
        got = _digest(images[k])
        if got != want:
            mismatches[k] = (want, got)
    assert not mismatches, (
        f"panel digests changed: {mismatches} — if the visual change is "
        "intentional, re-bless via `python -m tests.test_golden_panels`"
    )


def test_metrics_golden():
    metrics, _ = build_all()
    # psnr of rgb vs gt with 0.1-sigma noise: a fixed-seed scalar golden
    assert abs(metrics["psnr"] - GOLDEN_PSNR) < 1e-3, metrics["psnr"]
    assert 0.0 < metrics["ssim"] <= 1.0
    assert metrics["normal_mae"] < 20.0
    assert metrics["depth_mse"] < 1e-6  # exact affine alignment recovers GT


GOLDEN_PSNR = 20.488458


if __name__ == "__main__":
    metrics, images = build_all()
    print("GOLDEN = {")
    for k in sorted(images):
        print(f'    "{k}": "{_digest(images[k])}",')
    print("}")
    print(f"GOLDEN_PSNR = {metrics['psnr']:.6f}")
