"""Publication render tool: camera-path / illumination-rotation animations
and per-latent envmap figures from a trained checkpoint.

TPU-native equivalent of the reference's ``publication/render_animation.py``
(which loads a nerfstudio camera-path JSON and renders frames / rotating-sky
sequences / envmap figures).  The nerfstudio camera-path format is consumed
directly (``camera_path`` entries with row-major 4x4 ``camera_to_world`` +
``fov`` — e.g. ``/root/reference/publication/site1_demo_path.json``).

Usage:
  python tools/render_animation.py camera-path path.json \
      --load-dir outputs/run --method neusky-tiny --out outputs/anim
  python tools/render_animation.py illumination-rotation \
      --load-dir outputs/run --frames 60 --out outputs/anim
  python tools/render_animation.py envmaps --load-dir outputs/run --out figs

Frames are written as PNGs (plus a compressed .npz sequence); encode with
ffmpeg offline (video codecs are not a framework dependency).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _load(args):
    from neusky_tpu.engine.eval_loop import _load_run

    return _load_run(args, [])


def cmd_camera_path(args):
    import jax
    import numpy as np
    import jax.numpy as jnp

    from neusky_tpu.core.cameras import Cameras, CameraType
    from neusky_tpu.engine.eval_loop import render_camera
    from neusky_tpu.utils.viz import save_png

    model, params, _ = _load(args)
    spec = json.load(open(args.path_json))
    res_h = args.height or max(32, int(spec.get("render_height", 128)) // args.downscale)
    res_w = args.width or max(32, int(spec.get("render_width", 128)) // args.downscale)
    frames = spec["camera_path"]
    os.makedirs(args.out, exist_ok=True)
    rng = jax.random.PRNGKey(0)
    seq = []
    for i, f in enumerate(frames[args.start :: args.stride]):
        c2w = np.asarray(f["camera_to_world"], np.float32).reshape(4, 4)[:3]
        fov = float(f.get("fov", 50.0))
        fy = 0.5 * res_h / np.tan(0.5 * np.deg2rad(fov))
        cam = Cameras(
            camera_to_worlds=jnp.asarray(c2w)[None],
            fx=jnp.asarray([fy]), fy=jnp.asarray([fy]),
            cx=jnp.asarray([res_w / 2.0]), cy=jnp.asarray([res_h / 2.0]),
            width=res_w, height=res_h,
            camera_type=int(CameraType.PERSPECTIVE),
        )
        rb = cam.generate_rays(0)
        rng, k = jax.random.split(rng)
        outs = render_camera(
            model, params, rb, args.illumination_idx, k,
            chunk_size=args.chunk_size,
        )
        rgb = np.clip(np.asarray(outs["rgb"]).reshape(res_h, res_w, 3), 0, 1)
        save_png(os.path.join(args.out, f"frame_{i:04d}.png"), rgb)
        seq.append(rgb)
        print(f"frame {i}: psnr-able rgb rendered", flush=True)
    np.savez_compressed(os.path.join(args.out, "sequence.npz"), rgb=np.stack(seq))
    print(json.dumps({"frames": len(seq), "out": args.out}))


def cmd_illumination_rotation(args):
    import jax
    import numpy as np

    from neusky_tpu.engine.render_features import (
        AnimationConfig,
        render_illumination_animation,
    )
    from neusky_tpu.utils.viz import save_png

    model, params, dm = _load(args)
    rb, _ = dm.eval_image_bundle(0)
    cams = dm.eval_cameras if dm.eval_cameras is not None else dm.train_cameras
    h, w = int(cams.height), int(cams.width)
    seq = render_illumination_animation(
        model, params, rb, args.illumination_idx, jax.random.PRNGKey(0),
        AnimationConfig(
            num_frames=args.frames, output_dir=args.out,
            chunk_size=args.chunk_size,
        ),
    )
    for i, frame in enumerate(seq):
        save_png(
            os.path.join(args.out, f"frame_{i:04d}.png"),
            np.clip(frame.reshape(h, w, 3), 0, 1),
        )
    print(json.dumps({"frames": len(seq), "out": args.out}))


def cmd_envmaps(args):
    """Per-image HDR envmap figures (LDR sRGB PNG + HDR .npy), the
    reference's ``get_envmap`` figure path."""
    import numpy as np
    import jax.numpy as jnp

    from neusky_tpu.core.colour import linear_to_sRGB
    from neusky_tpu.fields.reni import freeze_decoder_params
    from neusky_tpu.sampling.illumination import EquirectangularSampler
    from neusky_tpu.utils.viz import save_png

    model, params, _ = _load(args)
    sampler = EquirectangularSampler(width=args.envmap_width)
    dirs = sampler()
    os.makedirs(args.out, exist_ok=True)
    g = params["illumination_field"]
    latents, scales = g["train_latents"], g["train_scale"]
    decoder = freeze_decoder_params(params["illumination_decoder"])
    for i in range(latents.shape[0]):
        out = model.illumination.apply(
            decoder, dirs, latents[i], scales[i : i + 1]
        )
        hdr = np.asarray(model.illumination.unnormalise(out["rgb"])).reshape(
            sampler.height, sampler.width, 3
        )
        np.save(os.path.join(args.out, f"envmap_{i:03d}_hdr.npy"), hdr)
        ldr = np.asarray(linear_to_sRGB(jnp.clip(jnp.asarray(hdr), 0, 1)))
        save_png(os.path.join(args.out, f"envmap_{i:03d}.png"), ldr)
    print(json.dumps({"envmaps": int(latents.shape[0]), "out": args.out}))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    def common(p):
        p.add_argument("--method", default="neusky-tiny")
        p.add_argument("--load-dir", default=None)
        p.add_argument("--out", default="outputs/animation")
        p.add_argument("--chunk-size", type=int, default=4096)
        p.add_argument("--illumination-idx", type=int, default=0)
        p.add_argument("--data", default=None)
        p.add_argument("--scene", default="site1")
        p.add_argument("--downscale", type=int, default=4)
        p.add_argument("--rays-per-batch", type=int, default=1024)
        p.add_argument("--synthetic-demo", action="store_true", default=True)

    p = sub.add_parser("camera-path", help="render along a nerfstudio camera-path JSON")
    p.add_argument("path_json")
    p.add_argument("--start", type=int, default=0)
    p.add_argument("--stride", type=int, default=1)
    p.add_argument("--height", type=int, default=None)
    p.add_argument("--width", type=int, default=None)
    common(p)

    p = sub.add_parser("illumination-rotation", help="rotate the sky about z")
    p.add_argument("--frames", type=int, default=60)
    common(p)

    p = sub.add_parser("envmaps", help="export per-image envmap figures")
    p.add_argument("--envmap-width", type=int, default=128)
    common(p)

    args = ap.parse_args()
    {"camera-path": cmd_camera_path,
     "illumination-rotation": cmd_illumination_rotation,
     "envmaps": cmd_envmaps}[args.cmd](args)


if __name__ == "__main__":
    main()
