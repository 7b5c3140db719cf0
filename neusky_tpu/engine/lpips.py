"""LPIPS (VGG16) in JAX.

The reference reports LPIPS via torchmetrics' pretrained-VGG
``LearnedPerceptualImagePatchSimilarity`` (``ddf_model.py:146-149``).  This
environment has zero egress — the pretrained weights cannot be fetched —
so this module implements the FULL metric graph natively and resolves
weights in priority order:

  1. a torch VGG16 ``state_dict`` on disk (``NEUSKY_VGG_WEIGHTS`` env var
     or ``checkpoints/vgg16.pth``) — converted to JAX at load;
  2. a seeded **random-feature VGG** fallback, clearly labelled: Zhang et
     al. (the LPIPS paper, CVPR'18, Table 5) show randomly-initialised
     nets already produce perceptual distances far better than pixel
     metrics.  Deterministic seed → comparable across runs of THIS
     framework; NOT comparable to published pretrained-VGG LPIPS numbers.

Distance: channel-unit-normalised feature differences at the 5 classic
taps (relu1_2, relu2_2, relu3_3, relu4_3, relu5_3), squared, channel-mean
(uniform linear weights — the learned ``lin`` calibration layers are also
unavailable offline), spatially averaged, summed over taps.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 conv plan: (out_channels, tap_after_relu?) per conv; 'M' = maxpool
_VGG16 = [
    (64, False), (64, True), "M",
    (128, False), (128, True), "M",
    (256, False), (256, False), (256, True), "M",
    (512, False), (512, False), (512, True), "M",
    (512, False), (512, False), (512, True),
]

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

_cache = {}


def _find_torch_weights() -> Optional[Path]:
    cand = os.environ.get("NEUSKY_VGG_WEIGHTS")
    if cand and Path(cand).exists():
        return Path(cand)
    repo = Path(__file__).resolve().parent.parent.parent
    p = repo / "checkpoints" / "vgg16.pth"
    return p if p.exists() else None


def _convert_torch_vgg(path: Path) -> List[Tuple[np.ndarray, np.ndarray]]:
    """torchvision VGG16 state_dict → [(kernel [kh,kw,cin,cout], bias)]."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    convs = []
    i = 0
    while f"features.{i}.weight" in sd or any(
        k.endswith(f"features.{i}.weight") for k in sd
    ):
        key = (
            f"features.{i}.weight"
            if f"features.{i}.weight" in sd
            else next(k for k in sd if k.endswith(f"features.{i}.weight"))
        )
        w = sd[key].numpy()  # [cout, cin, kh, kw]
        b = sd[key.replace("weight", "bias")].numpy()
        convs.append((np.transpose(w, (2, 3, 1, 0)), b))
        i += 1
        # skip relu/pool slots in the torchvision indexing
        while (
            f"features.{i}.weight" not in sd
            and not any(k.endswith(f"features.{i}.weight") for k in sd)
            and i < 40
        ):
            i += 1
    if len(convs) != 13:
        raise ValueError(f"expected 13 VGG16 convs, found {len(convs)}")
    return convs


def _random_vgg(seed: int = 0) -> List[Tuple[np.ndarray, np.ndarray]]:
    rng = np.random.default_rng(seed)
    convs = []
    cin = 3
    for spec in _VGG16:
        if spec == "M":
            continue
        cout, _ = spec
        # He-normal: keeps activation scale stable through depth
        std = np.sqrt(2.0 / (3 * 3 * cin))
        k = rng.normal(0.0, std, (3, 3, cin, cout)).astype(np.float32)
        convs.append((k, np.zeros((cout,), np.float32)))
        cin = cout
    return convs


def _features(x: jnp.ndarray, convs) -> List[jnp.ndarray]:
    """x: [N, H, W, 3] in [0, 1] → list of tap activations."""
    x = (x - _IMAGENET_MEAN) / _IMAGENET_STD
    taps = []
    ci = 0
    for spec in _VGG16:
        if spec == "M":
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )
            continue
        _, tap = spec
        k, b = convs[ci]
        ci += 1
        x = jax.lax.conv_general_dilated(
            x, jnp.asarray(k), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + jnp.asarray(b)
        x = jax.nn.relu(x)
        if tap:
            taps.append(x)
    return taps


def _lpips_fn(convs):
    def fn(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        fa = _features(a, convs)
        fb = _features(b, convs)
        total = jnp.asarray(0.0)
        for xa, xb in zip(fa, fb):
            na = xa / jnp.sqrt(jnp.sum(xa**2, -1, keepdims=True) + 1e-10)
            nb = xb / jnp.sqrt(jnp.sum(xb**2, -1, keepdims=True) + 1e-10)
            # uniform linear weights: channel mean of squared diffs
            total = total + jnp.mean((na - nb) ** 2)
        return total

    return jax.jit(fn)


def lpips(pred: np.ndarray, target: np.ndarray) -> Tuple[float, str]:
    """LPIPS of two [H, W, 3] images in [0, 1].

    Returns (value, flavour) where flavour is ``"vgg16-pretrained"`` or
    ``"vgg16-random"`` — report the flavour next to the number."""
    if "fn" not in _cache:
        path = _find_torch_weights()
        if path is not None:
            convs = _convert_torch_vgg(path)
            _cache["flavour"] = "vgg16-pretrained"
        else:
            convs = _random_vgg()
            _cache["flavour"] = "vgg16-random"
        _cache["fn"] = _lpips_fn(convs)
    a = jnp.asarray(pred, jnp.float32)[None]
    b = jnp.asarray(target, jnp.float32)[None]
    return float(_cache["fn"](a, b)), _cache["flavour"]
