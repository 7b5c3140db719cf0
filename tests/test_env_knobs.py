"""Every NEUSKY_* experiment knob must reach its config field — bench.py
and tools/train_sanity.py share ``apply_env_knobs`` so an A/B pair differs
only in its environment (PERF.md methodology)."""

import os
from unittest import mock

from neusky_tpu.configs.env_overrides import apply_env_knobs, knob_summary
from neusky_tpu.configs.neusky_config import neusky_model_config


def _cfg(**env):
    with mock.patch.dict(os.environ, env, clear=False):
        return apply_env_knobs(neusky_model_config(num_train_data=8, num_eval_data=2))


def test_defaults_untouched():
    clean = {
        k: "" for k in (
            "NEUSKY_BENCH_BF16", "NEUSKY_VIS_CHUNK", "NEUSKY_EXACT_PROPOSAL_FWD",
            "NEUSKY_EXACT_TABLE_GRADS", "NEUSKY_STOCH_DXT",
            "NEUSKY_BF16_MAPPING", "NEUSKY_VECTORIZED",
        )
    }
    cfg = _cfg(**clean)
    assert cfg == neusky_model_config(num_train_data=8, num_eval_data=2)
    with mock.patch.dict(os.environ, clean, clear=False):
        assert knob_summary() == {}


def test_each_knob_reaches_its_field():
    assert _cfg(NEUSKY_BENCH_BF16="1").sdf_field.use_bf16_compute
    assert _cfg(NEUSKY_VIS_CHUNK="65536").visibility_query_chunk == 65536
    assert all(
        not p.stochastic_forward
        for p in _cfg(NEUSKY_EXACT_PROPOSAL_FWD="1").proposal_fields
    )
    assert not _cfg(NEUSKY_EXACT_TABLE_GRADS="1").sdf_field.stochastic_table_grads
    assert _cfg(NEUSKY_STOCH_DXT="1").sdf_field.stochastic_dxt
    assert not _cfg(NEUSKY_STOCH_DXT="0").sdf_field.stochastic_dxt
    assert _cfg(NEUSKY_BF16_MAPPING="1").ddf.field.use_bf16_mapping
    assert not _cfg(NEUSKY_BF16_MAPPING="0").ddf.field.use_bf16_mapping
    vec = _cfg(NEUSKY_VECTORIZED="1")
    assert vec.sdf_field.hash.vectorized
    assert all(p.hash.vectorized for p in vec.proposal_fields)
    bft = _cfg(NEUSKY_BF16_TABLES="1")
    assert bft.sdf_field.hash.bf16_gather
    assert all(p.hash.bf16_gather for p in bft.proposal_fields)
    assert bft.ddf.field.hash.bf16_gather
    assert not _cfg(NEUSKY_BF16_TABLES="0").sdf_field.hash.bf16_gather
    assert _cfg(NEUSKY_VIS_REMAT="dots").visibility_remat_policy == "dots"
    assert _cfg(NEUSKY_FUSED_GT="1").fused_ddf_gt_pass
    assert not _cfg(NEUSKY_FUSED_GT="0").fused_ddf_gt_pass
    dh = _cfg(NEUSKY_DDF_HASH_LEVELS="8", NEUSKY_DDF_HASH_LOG2="15")
    assert dh.ddf.field.hash.num_levels == 8
    assert dh.ddf.field.hash.log2_hashmap_size == 15
    # only the DDF grid shrinks — SDF grid untouched
    assert dh.sdf_field.hash.num_levels == 16


def test_knob_summary_reports_set_knobs():
    with mock.patch.dict(
        os.environ, {"NEUSKY_STOCH_DXT": "1", "NEUSKY_VIS_CHUNK": "16384"}
    ):
        s = knob_summary()
    assert s["NEUSKY_STOCH_DXT"] == "1"
    assert s["NEUSKY_VIS_CHUNK"] == "16384"
