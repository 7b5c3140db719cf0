"""End-to-end NeRF-OSR relighting protocol on the fabricated fixture:
CLI train → checkpoint → session-holdout latent fit → building-masked
compare metrics (VERDICT r1 missing #4)."""

import json
import types

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full-model compile / subprocess mesh / HTTP

from neusky_tpu.data.fixtures import make_nerfosr_fixture


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("osr")
    make_nerfosr_fixture(root, num_sessions=2, train_per_session=2,
                         test_per_session=2, width=24, height=16)
    return root


def test_fixture_parses(fixture_dir):
    from neusky_tpu.data.dataparsers.nerfosr import (
        NeRFOSRDataparserConfig,
        parse_nerfosr_scene,
    )

    cfg = NeRFOSRDataparserConfig(data=str(fixture_dir), scene="site1")
    po = parse_nerfosr_scene(cfg, "test")
    assert po["session_to_indices"] == {0: [0, 1], 1: [2, 3]}
    # holdout image 0 per session; eval masks on image 1 of each session
    assert sorted(po["test_eval_mask_dict"].keys()) == [1, 3]


def test_protocol_end_to_end(fixture_dir, tmp_path):
    """Train a few steps via the CLI entry, then run the full protocol
    eval — one command each, metrics JSON produced, values finite."""
    from neusky_tpu.cli import main

    out_dir = tmp_path / "run"
    main([
        "train", "neusky-tiny",
        "--data", str(fixture_dir), "--scene", "site1",
        "--max-iterations", "3", "--rays-per-batch", "32",
        "--output-dir", str(out_dir),
    ])

    metrics_path = tmp_path / "metrics.json"
    main([
        "eval", "neusky-tiny",
        "--data", str(fixture_dir), "--scene", "site1",
        "--load-dir", str(out_dir),
        "--protocol", "nerfosr",
        "--output", str(metrics_path),
    ])

    result = json.loads(metrics_path.read_text())
    assert result["num_sessions"] == 2
    assert len(result["per_image"]) == 2  # one compare image per session
    for p in result["per_image"]:
        assert np.isfinite(p["psnr"]) and np.isfinite(p["mse"])
        assert p["session"] in (0, 1)
    assert np.isfinite(result["mean"]["psnr"])
    # the latent fit actually optimised something
    assert np.isfinite(result["fit_loss_last"])
    assert result["fit_loss_last"] <= result["fit_loss_first"] * 1.5
