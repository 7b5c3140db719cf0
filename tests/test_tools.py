"""Tests for the offline tools: NeRF-OSR data prep/validation."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from neusky_tpu.data.fixtures import make_nerfosr_fixture  # noqa: E402
from prepare_nerfosr import copy_masks, validate  # noqa: E402


def test_validate_fixture_ok(tmp_path):
    root = make_nerfosr_fixture(tmp_path / "data", num_sessions=2,
                                train_per_session=2, test_per_session=1)
    report = validate("lk2", Path(root))
    assert report["ok"], report
    assert report["train"]["images"] == report["train"]["masks"] == 4
    assert report["envmap_sessions"] == 2


def test_validate_catches_missing_masks(tmp_path):
    root = make_nerfosr_fixture(tmp_path / "data", num_sessions=2,
                                train_per_session=2, test_per_session=1)
    base = Path(root) / "lk2" / "final"
    victim = next((base / "train" / "cityscapes_mask").iterdir())
    victim.unlink()
    report = validate("lk2", Path(root))
    assert not report["ok"]
    assert any("without cityscapes masks" in p for p in report["problems"])


def test_copy_masks_into_layout(tmp_path):
    root = make_nerfosr_fixture(tmp_path / "data", num_sessions=2,
                                train_per_session=2, test_per_session=1)
    # strip the masks, then restore them with copy_masks from a source tree
    base = Path(root) / "lk2" / "final"
    src = tmp_path / "masks_src"
    for split in ("train", "validation", "test"):
        d = base / split / "cityscapes_mask"
        sdir = src / "lk2" / split / "cityscapes_mask"
        sdir.mkdir(parents=True)
        for f in list(d.iterdir()):
            (sdir / f.name).write_bytes(f.read_bytes())
            f.unlink()
    assert not validate("lk2", Path(root))["ok"]
    copied = copy_masks("lk2", src, Path(root))
    assert all(isinstance(v, int) and v > 0 for v in copied.values()), copied
    assert validate("lk2", Path(root))["ok"]


def test_postrun_queue_markers_failures_resume(tmp_path):
    """r4 weak #5: the old runner reported tee's exit status (crashes
    logged exit=0) and a mid-queue death silently ate later items.  The
    hardened queue must (a) record a failing item's real nonzero status,
    (b) keep running later items, (c) skip completed items on re-run."""
    import subprocess

    repo = Path(__file__).resolve().parent.parent
    queue = tmp_path / "queue.txt"
    state = tmp_path / "state"
    queue.write_text(
        "# comment line\n"
        f"echo one > {tmp_path}/a.out\n"
        "bash -c 'echo boom; exit 3'\n"
        f"echo three > {tmp_path}/c.out\n"
    )
    r = subprocess.run(
        ["bash", str(repo / "tools/postrun_queue.sh"), str(queue), str(state)],
        capture_output=True, text=True,
    )
    # queue exits nonzero because an item failed ...
    assert r.returncode == 1, r.stdout + r.stderr
    # ... the failure is recorded with its REAL status (not tee's 0) ...
    failed = (state / "FAILED").read_text()
    assert "item02 rc=3" in failed
    # ... later items still ran ...
    assert (tmp_path / "c.out").read_text().strip() == "three"
    assert (state / "item01.done").exists()
    assert (state / "item03.done").exists()
    assert not (state / "item02.done").exists()

    # re-run: completed items are skipped (outputs untouched), the failed
    # item retries
    (tmp_path / "a.out").unlink()
    r2 = subprocess.run(
        ["bash", str(repo / "tools/postrun_queue.sh"), str(queue), str(state)],
        capture_output=True, text=True,
    )
    assert "item01 already done" in r2.stdout
    assert not (tmp_path / "a.out").exists()  # skipped, not re-run
