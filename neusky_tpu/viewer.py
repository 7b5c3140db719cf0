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
label{display:inline-block;width:130px}
#probe{position:absolute;border:2px solid #fa0;display:none}
#wrap{position:relative;display:inline-block}</style></head><body>
<h2>neusky-tpu viewer</h2>
<div id="wrap"><img id="view" width="512" height="512"/>
<img id="probe" width="128" height="64"/></div>
<div>
<p><label>mode</label><select id="mode">
<option>rgb</option><option>albedo</option><option>normal</option>
<option>depth</option><option>accumulation</option><option>shadow_map</option>
<option>ddf_depth</option><option>ddf_overlay</option></select></p>
<p><label>azimuth</label><input id="az" type="range" min="-180" max="180" value="0"/></p>
<p><label>elevation</label><input id="el" type="range" min="-80" max="80" value="20"/></p>
<p><label>distance</label><input id="dist" type="range" min="5" max="30" value="12"/></p>
<p><label>sun azimuth</label><input id="saz" type="range" min="-180" max="180" value="45"/></p>
<p><label>sun elevation</label><input id="sel" type="range" min="0" max="90" value="45"/></p>
<p><label>threshold</label><input id="thr" type="range" min="0" max="200" value="50"/></p>
<p><label>sigmoid scale</label><input id="sig" type="range" min="1" max="500" value="50"/></p>
<p style="color:#888">click the image to open a sky-visibility probe at that
surface point (reference: ViewerClick → shadow envmap overlay)</p>
<button onclick="render()">render</button></div>
<script>
function params(){
  return new URLSearchParams({
    mode: document.getElementById('mode').value,
    az: az.value, el: el.value, dist: (dist.value/10),
    saz: saz.value, sel: sel.value, thr: (thr.value/100), sig: sig.value});
}
function render(){
  document.getElementById('probe').style.display = 'none';
  document.getElementById('view').src = '/render?' + params().toString() + '&t=' + Date.now();
}
document.getElementById('view').addEventListener('click', (e) => {
  const r = e.target.getBoundingClientRect();
  const q = params();
  q.set('px', (e.clientX - r.left) / r.width);
  q.set('py', (e.clientY - r.top) / r.height);
  const probe = document.getElementById('probe');
  probe.style.left = (e.clientX - r.left - 64) + 'px';
  probe.style.top = (e.clientY - r.top - 32) + 'px';
  probe.style.display = 'block';
  probe.src = '/probe?' + q.toString() + '&t=' + Date.now();
});
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

    def _camera_rays(self, q):
        import jax.numpy as jnp

        from neusky_tpu.core.cameras import Cameras, CameraType
        from neusky_tpu.core.spherical import look_at_target

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
        return cam.generate_rays(0)

    def probe(self, q) -> np.ndarray:
        """Click probe: unproject the clicked pixel through the rendered
        depth to a surface point, then render the sky-visibility envmap at
        that point (the reference's ViewerClick → shadow-envmap-overlay
        path, ``neusky_model.py:1803-1810`` — whose render side is
        commented out upstream at :1442-1444; implemented live here)."""
        import jax

        from neusky_tpu.engine.eval_loop import render_camera
        from neusky_tpu.engine.render_features import render_shadow_probe
        from neusky_tpu.utils.viz import apply_colormap

        res = self.resolution
        px = min(int(float(q.get("px", [0.5])[0]) * res), res - 1)
        py = min(int(float(q.get("py", [0.5])[0]) * res), res - 1)
        rb = self._camera_rays(q)
        with self.lock:
            outs = render_camera(
                self.model, self.params, rb, 0, jax.random.PRNGKey(0),
                chunk_size=res * res,
            )
            idx = py * res + px
            depth = float(np.asarray(outs["depth"]).reshape(-1)[idx])
            origin = np.asarray(rb.origins).reshape(-1, 3)[idx]
            direction = np.asarray(rb.directions).reshape(-1, 3)[idx]
            point = origin + depth * direction
            vis = render_shadow_probe(
                self.model, self.params, point, jax.random.PRNGKey(0),
                side_length=64,
                threshold=float(q.get("thr", [0.5])[0]),
                sigmoid_scale=float(q.get("sig", [50])[0]),
            )
        return apply_colormap(vis)

    def render(self, q) -> np.ndarray:
        import jax
        import jax.numpy as jnp

        from neusky_tpu.engine.eval_loop import render_camera
        from neusky_tpu.engine.render_features import render_shadow_map
        from neusky_tpu.utils.viz import apply_colormap, apply_depth_colormap

        mode = q.get("mode", ["rgb"])[0]
        res = self.resolution
        rb = self._camera_rays(q)
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
            if mode in ("ddf_depth", "ddf_overlay"):
                o = rb.origins / jnp.maximum(
                    jnp.linalg.norm(rb.origins, axis=-1, keepdims=True), 1e-6
                ) * self.model.config.ddf_radius
                out = self.model.ddf.apply(
                    self.params["ddf_field"], o, rb.directions
                )
                dd = np.asarray(out["expected_termination_dist"]).reshape(res, res, 1)
                ddf_img = apply_depth_colormap(
                    dd, near_plane=0.0, far_plane=2 * self.model.config.ddf_radius
                )
                if mode == "ddf_depth":
                    return ddf_img
                # "Show DDF" overlay (``neusky_model.py:924-929``): DDF
                # depth blended over the scene render
                outs = render_camera(
                    self.model, self.params, rb, 0, jax.random.PRNGKey(0),
                    chunk_size=res * res,
                )
                rgb = np.asarray(outs["rgb"]).reshape(res, res, 3)
                return 0.5 * rgb + 0.5 * np.asarray(ddf_img)
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
            if url.path in ("/render", "/probe"):
                try:
                    q = parse_qs(url.query)
                    img = state.probe(q) if url.path == "/probe" else state.render(q)
                    from PIL import Image

                    buf = io.BytesIO()
                    arr = np.clip(img * 255, 0, 255).astype(np.uint8)
                    h, w = arr.shape[:2]
                    out_size = (512, 512) if url.path == "/render" else (2 * w, 2 * h)
                    Image.fromarray(arr).resize(out_size, Image.NEAREST).save(
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
