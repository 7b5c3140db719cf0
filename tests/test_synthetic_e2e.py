"""End-to-end drive of the Blender-synthetic path: fabricated
``transforms.json`` dataset → ``cli train neusky-synthetic-tiny`` → steps +
checkpoint.  Covers the ``custom_neusky`` dataparser wiring through the CLI
(reference ``configs/neusky_synthetic_config.py`` consumed by ``ns-train
neusky-synthetic``)."""

import json
import subprocess
import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.slow  # full-model compile / subprocess mesh / HTTP

REPO = Path(__file__).resolve().parent.parent


def test_synthetic_cli_train(tmp_path):
    from neusky_tpu.data.fixtures import make_blender_fixture

    data = make_blender_fixture(tmp_path / "blender")
    out = tmp_path / "run"
    proc = subprocess.run(
        [
            sys.executable, "-m", "neusky_tpu.cli", "train",
            "neusky-synthetic-tiny", "--data", str(data),
            "--max-iterations", "4", "--rays-per-batch", "32",
            "--downscale", "1", "--output-dir", str(out),
        ],
        capture_output=True, text=True, timeout=900, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    # a training log line with the full loss dict appeared
    logs = [
        json.loads(line) for line in proc.stdout.splitlines()
        if line.startswith("{")
    ]
    assert any("total_loss" in r for r in logs), proc.stdout[-2000:]
    assert (out / "latest.json").exists() or any(out.iterdir())
