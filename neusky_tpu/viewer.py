"""Minimal interactive viewer: HTTP server rendering the scene on demand.

The reference integrates nerfstudio's websocket viewer (``setup_gui``,
``neusky_model.py:1780-1894``) with render-output toggles, shadow-map
sliders (azimuth/elevation/threshold/scale), a DDF depth overlay and a
camera-on-DDF button.  This standalone equivalent serves a single-page UI:

  - orbit camera (azimuth/elevation/distance) rendering rgb / albedo /
    normal / depth / accumulation,
  - shadow-map mode with sun azimuth/elevation + threshold + sigmoid-scale
    controls (``compute_visibility(compute_shadow_map=True)`` path),
  - DDF depth view from the sphere.

Run:  python -m neusky_tpu.viewer --load-dir outputs/run --method neusky-tiny
"""

from __future__ import annotations

import argparse
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

_PAGE = """<!doctype html><html><head><title>neusky-tpu viewer</title>
<style>body{font-family:sans-serif;background:#111;color:#eee;margin:20px}
img{image-rendering:pixelated;border:1px solid #444}
label{display:inline-block;width:130px}</style></head><body>
<h2>neusky-tpu viewer</h2>
<div><img id="view" width="512" height="512"/></div>
<div>
<p><label>mode</label><select id="mode">
<option>rgb</option><option>albedo</option><option>normal</option>
<option>depth</option><option>accumulation</option><option>shadow_map</option>
<option>ddf_depth</option></select></p>
<p><label>azimuth</label><input id="az" type="range" min="-180" max="180" value="0"/></p>
<p><label>elevation</label><input id="el" type="range" min="-80" max="80" value="20"/></p>
<p><label>distance</label><input id="dist" type="range" min="5" max="30" value="12"/></p>
<p><label>sun azimuth</label><input id="saz" type="range" min="-180" max="180" value="45"/></p>
<p><label>sun elevation</label><input id="sel" type="range" min="0" max="90" value="45"/></p>
<p><label>threshold</label><input id="thr" type="range" min="0" max="200" value="50"/></p>
<p><label>sigmoid scale</label><input id="sig" type="range" min="1" max="500" value="50"/></p>
<button onclick="render()">render</button></div>
<script>
function render(){
  const q = new URLSearchParams({
    mode: document.getElementById('mode').value,
    az: az.value, el: el.value, dist: (dist.value/10),
    saz: saz.value, sel: sel.value, thr: (thr.value/100), sig: sig.value});
  document.getElementById('view').src = '/render?' + q.toString() + '&t=' + Date.now();
}
for (const id of ['mode','az','el','dist','saz','sel','thr','sig'])
  document.getElementById(id).addEventListener('change', render);
render();
</script></body></html>"""


class ViewerState:
    def __init__(self, model, params, resolution: int = 96):
        self.model = model
        self.params = params
        self.resolution = resolution
        self.lock = threading.Lock()

    def render(self, q) -> np.ndarray:
        import jax
        import jax.numpy as jnp

        from neusky_tpu.core.cameras import Cameras, CameraType
        from neusky_tpu.core.spherical import look_at_target
        from neusky_tpu.engine.eval_loop import render_camera
        from neusky_tpu.engine.render_features import render_shadow_map
        from neusky_tpu.utils.viz import apply_colormap, apply_depth_colormap

        mode = q.get("mode", ["rgb"])[0]
        az = np.deg2rad(float(q.get("az", [0])[0]))
        el = np.deg2rad(float(q.get("el", [20])[0]))
        dist = float(q.get("dist", [1.2])[0])
        res = self.resolution
        pos = dist * np.array(
            [np.cos(az) * np.cos(el), np.sin(az) * np.cos(el), np.sin(el)]
        )
        c2w = look_at_target(jnp.asarray(pos, jnp.float32)[None], jnp.zeros((1, 3)))[..., :3, :]
        cam = Cameras(
            camera_to_worlds=c2w,
            fx=jnp.asarray([0.9 * res]), fy=jnp.asarray([0.9 * res]),
            cx=jnp.asarray([res / 2.0]), cy=jnp.asarray([res / 2.0]),
            width=res, height=res, camera_type=int(CameraType.PERSPECTIVE),
        )
        rb = cam.generate_rays(0)
        with self.lock:
            if mode == "shadow_map":
                out = render_shadow_map(
                    self.model, self.params, rb, jax.random.PRNGKey(0),
                    azimuth_deg=float(q.get("saz", [45])[0]),
                    elevation_deg=float(q.get("sel", [45])[0]),
                    threshold=float(q.get("thr", [0.5])[0]),
                    sigmoid_scale=float(q.get("sig", [50])[0]),
                )
                return apply_colormap(out["shadow_map"].reshape(res, res))
            if mode == "ddf_depth":
                import jax.numpy as jnp2

                o = rb.origins / jnp2.maximum(
                    jnp2.linalg.norm(rb.origins, axis=-1, keepdims=True), 1e-6
                ) * self.model.config.ddf_radius
                out = self.model.ddf.apply(
                    self.params["ddf_field"], o, rb.directions
                )
                dd = np.asarray(out["expected_termination_dist"]).reshape(res, res, 1)
                return apply_depth_colormap(dd, near_plane=0.0,
                                            far_plane=2 * self.model.config.ddf_radius)
            outs = render_camera(self.model, self.params, rb, 0, jax.random.PRNGKey(0),
                                 chunk_size=res * res)
            if mode == "rgb":
                return outs["rgb"].reshape(res, res, 3)
            if mode == "albedo":
                return outs["albedo"].reshape(res, res, 3)
            if mode == "normal":
                return (outs["normal"].reshape(res, res, 3) + 1) / 2
            if mode == "depth":
                return apply_depth_colormap(
                    outs["depth"].reshape(res, res, 1),
                    accumulation=outs["accumulation"].reshape(res, res, 1),
                )
            return apply_colormap(outs["accumulation"].reshape(res, res))


def make_handler(state: ViewerState):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            url = urlparse(self.path)
            if url.path == "/":
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.end_headers()
                self.wfile.write(_PAGE.encode())
                return
            if url.path == "/render":
                try:
                    img = state.render(parse_qs(url.query))
                    from PIL import Image

                    buf = io.BytesIO()
                    arr = np.clip(img * 255, 0, 255).astype(np.uint8)
                    Image.fromarray(arr).resize((512, 512), Image.NEAREST).save(
                        buf, "PNG"
                    )
                    self.send_response(200)
                    self.send_header("Content-Type", "image/png")
                    self.end_headers()
                    self.wfile.write(buf.getvalue())
                except Exception as e:  # surface errors to the browser
                    self.send_response(500)
                    self.end_headers()
                    self.wfile.write(str(e).encode())
                return
            self.send_response(404)
            self.end_headers()

    return Handler


def serve(model, params, port: int = 7007, resolution: int = 96):
    state = ViewerState(model, params, resolution)
    server = ThreadingHTTPServer(("0.0.0.0", port), make_handler(state))
    print(f"viewer at http://localhost:{port}")
    server.serve_forever()


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--method", default="neusky-tiny")
    parser.add_argument("--load-dir", default=None)
    parser.add_argument("--port", type=int, default=7007)
    parser.add_argument("--resolution", type=int, default=96)
    parser.add_argument("--data", default=None)
    parser.add_argument("--scene", default="site1")
    parser.add_argument("--downscale", type=int, default=1)
    parser.add_argument("--rays-per-batch", type=int, default=1024)
    parser.add_argument("--synthetic-demo", action="store_true", default=True)
    args = parser.parse_args()

    from neusky_tpu.engine.eval_loop import _load_run

    model, params, _ = _load_run(args, [])
    serve(model, params, args.port, args.resolution)


if __name__ == "__main__":
    main()
