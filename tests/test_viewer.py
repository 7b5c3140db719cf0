"""Viewer rendering tests: every mode of the interactive HTTP viewer
produces a finite image, and the click-probe path (pixel → depth unproject →
sky-visibility envmap) works (tiny model, CPU).

Reference surface: ``setup_gui`` (``neusky_model.py:1780-1894``) — output
toggles, shadow-map sliders, show-DDF overlay, ViewerClick probe."""

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full-model compile / subprocess mesh / HTTP

from neusky_tpu.configs.tiny_config import tiny_model_config
from neusky_tpu.models.neusky import NeuSkyModel
from neusky_tpu.viewer import ViewerState


@pytest.fixture(scope="module")
def state():
    cfg = tiny_model_config(num_train_data=2, num_eval_data=1)
    model = NeuSkyModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    return ViewerState(model, params, resolution=12)


BASE_Q = {
    "az": ["10"], "el": ["25"], "dist": ["1.2"],
    "saz": ["45"], "sel": ["45"], "thr": ["0.5"], "sig": ["50"],
}


@pytest.mark.parametrize(
    "mode",
    ["rgb", "albedo", "normal", "depth", "accumulation",
     "shadow_map", "ddf_depth", "ddf_overlay"],
)
def test_render_modes(state, mode):
    img = np.asarray(state.render({**BASE_Q, "mode": [mode]}))
    assert img.shape == (12, 12, 3)
    assert np.isfinite(img).all()


def test_click_probe(state):
    probe = np.asarray(
        state.probe({**BASE_Q, "px": ["0.5"], "py": ["0.5"]})
    )
    # equirect visibility probe: [H, W, 3] colormapped, finite, in [0, 1]
    assert probe.shape == (32, 64, 3)
    assert np.isfinite(probe).all()
    assert probe.min() >= 0.0 and probe.max() <= 1.0


def test_http_roundtrip(state):
    """Serve one render and one probe request through the real HTTP stack."""
    import threading
    import urllib.request
    from http.server import ThreadingHTTPServer

    from neusky_tpu.viewer import make_handler

    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(state))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        page = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/", timeout=120
        ).read()
        assert b"neusky-tpu viewer" in page
        png = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/render?mode=rgb&az=0&el=20&dist=1.2",
            timeout=600,
        ).read()
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
        probe = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/probe?px=0.5&py=0.5&az=0&el=20&dist=1.2",
            timeout=600,
        ).read()
        assert probe[:8] == b"\x89PNG\r\n\x1a\n"
    finally:
        server.shutdown()
