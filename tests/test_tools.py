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
