"""Adversarial NeRF-OSR parser fixtures (VERDICT r2 item 9).

All protocol tests elsewhere run on the well-formed fabricated fixture;
real NeRF-OSR data is messier.  Each test here perturbs the fixture into
one of the layouts the reference parser actually encounters and asserts
our parser exhibits the REFERENCE's behaviour
(``/root/reference/neusky/data/dataparsers/nerfosr_cityscapes_dataparser.py``):

- crop+pad both set        → error            (:216-219)
- holdout-count mismatch   → error, val/test only (:361-364)
- holdout image in eval set→ error            (:430-437)
- session dir w/o images   → silently dropped (:346-348)
- odd image sizes          → min-cx crop rule, int-truncated W/H (:247-254)
- missing/partial object masks → None entries (:397-413)
- missing cityscapes masks → error            (:377-381)
- ``mask_source="none"``   → no masks at all  (:365-367)
"""

import numpy as np
import pytest

from neusky_tpu.data.dataparsers.nerfosr import (
    NeRFOSRDataparserConfig,
    parse_holdout_arg,
    parse_nerfosr_scene,
)
from neusky_tpu.data.fixtures import make_nerfosr_fixture


@pytest.fixture()
def osr(tmp_path):
    make_nerfosr_fixture(tmp_path, num_sessions=2, train_per_session=2,
                         test_per_session=2, width=24, height=16)
    return tmp_path


def _cfg(root, **kw):
    kw.setdefault("session_holdout_indices", (0, 0))
    return NeRFOSRDataparserConfig(data=str(root), scene="site1", **kw)


def test_crop_and_pad_together_rejected(osr):
    with pytest.raises(ValueError, match="crop and pad"):
        parse_nerfosr_scene(
            _cfg(osr, crop_to_equal_size=True, pad_to_equal_size=True), "train"
        )


def test_holdout_count_mismatch_rejected_on_eval_splits(osr):
    # 2 sessions, 5 holdout entries (the reference's own default) — the
    # reference asserts on validation/test but NOT on train
    bad = _cfg(osr, session_holdout_indices=(0, 0, 0, 0, 0))
    parse_nerfosr_scene(bad, "train")  # no error
    for split in ("validation", "test"):
        with pytest.raises(ValueError, match="unique sessions"):
            parse_nerfosr_scene(bad, split)


def test_holdout_collides_with_eval_mask(osr):
    # fixture: image 0 of each session has no eval mask, image 1 does —
    # holding out image 1 collides with the eval compare set
    with pytest.raises(ValueError, match="holdout and eval"):
        parse_nerfosr_scene(_cfg(osr, session_holdout_indices=(1, 0)), "test")


def test_empty_session_dir_dropped(osr):
    # a lighting session folder whose name matches no image filename must
    # not claim a latent slot
    (osr / "lk2" / "final" / "ENV_MAP_CC" / "session_Z").mkdir()
    po = parse_nerfosr_scene(_cfg(osr), "test")
    assert po["session_names"] == ["session_A", "session_B"]
    assert set(po["session_to_indices"].keys()) == {0, 1}


def test_ragged_sessions(osr):
    # delete one test image of session_B: sessions keep their own (ragged)
    # index lists; nothing is padded or dropped
    rgb = osr / "lk2" / "final" / "test" / "rgb"
    victims = sorted(rgb.glob("session_B*"))
    victims[-1].unlink()
    po = parse_nerfosr_scene(_cfg(osr), "test")
    assert po["session_to_indices"] == {0: [0, 1], 1: [2]}


def test_odd_image_sizes_min_cx_crop_rule(osr):
    # one camera with a smaller, fractional principal point: crop rule is
    # min over ALL splits, width/height = int-truncated 2*min (odd sizes
    # happen on real NeRF-OSR captures)
    intr_dir = osr / "lk2" / "final" / "train" / "intrinsics"
    f = sorted(intr_dir.glob("*.txt"))[0]
    K = np.eye(4)
    K[0, 0] = K[1, 1] = 28.8
    K[0, 2], K[1, 2] = 10.5, 6.5
    f.write_text(" ".join(str(x) for x in K.reshape(-1)))
    po = parse_nerfosr_scene(_cfg(osr), "test")
    assert po["width_height"] == [21, 13]
    # every camera's principal point is clamped to the shared min
    assert np.allclose(np.asarray(po["cameras"].cx), 10.5)
    assert np.allclose(np.asarray(po["cameras"].cy), 6.5)


def test_pad_to_equal_size_max_rule(osr):
    intr_dir = osr / "lk2" / "final" / "train" / "intrinsics"
    f = sorted(intr_dir.glob("*.txt"))[0]
    K = np.eye(4)
    K[0, 0] = K[1, 1] = 28.8
    K[0, 2], K[1, 2] = 15.5, 9.0
    f.write_text(" ".join(str(x) for x in K.reshape(-1)))
    po = parse_nerfosr_scene(
        _cfg(osr, crop_to_equal_size=False, pad_to_equal_size=True), "test"
    )
    assert po["width_height"] == [31, 18]
    assert np.allclose(np.asarray(po["cameras"].cx), 15.5)


def test_missing_object_mask_folder_gives_all_none(osr):
    po = parse_nerfosr_scene(_cfg(osr), "test")
    assert po["out_of_view_frustum_objects_masks"] == [None] * 4


def test_partial_object_masks_match_by_stem(osr):
    from PIL import Image

    test_dir = osr / "lk2" / "final" / "test"
    of = test_dir / "out_of_view_frustum_objects_mask"
    of.mkdir()
    stem = sorted((test_dir / "rgb").glob("*.png"))[0].stem
    Image.fromarray(np.zeros((16, 24), np.uint8)).save(of / f"{stem}.png")
    Image.fromarray(np.zeros((16, 24), np.uint8)).save(of / "not_an_image.png")
    po = parse_nerfosr_scene(_cfg(osr), "test")
    masks = po["out_of_view_frustum_objects_masks"]
    assert masks[0] is not None and masks[0].endswith(f"{stem}.png")
    assert masks[1:] == [None] * 3


def test_missing_cityscapes_folder_errors(osr):
    import shutil

    shutil.rmtree(osr / "lk2" / "final" / "train" / "cityscapes_mask")
    with pytest.raises(FileNotFoundError, match="cityscapes"):
        parse_nerfosr_scene(_cfg(osr), "train")


def test_mask_source_none(osr):
    po = parse_nerfosr_scene(_cfg(osr, mask_source="none"), "test")
    assert po["mask_filenames"] is None
    assert po["segmentation_filenames"] is None


def test_parse_holdout_arg():
    assert parse_holdout_arg("0,1,0") == (0, 1, 0)
    assert parse_holdout_arg((2, 3)) == (2, 3)
    assert parse_holdout_arg("") == ()
