"""torch→jax RENI++ checkpoint converter round-trip tests.

No published ns_reni checkpoint exists in this environment (the submodule is
empty in the reference snapshot), so correctness of the MACHINERY is proven
by round-trip: flax params → torch-convention state dict (nn.Linear /
nn.MultiheadAttention layouts) → nerfstudio-style ckpt file → converter →
bit-identical params and identical decoder outputs.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neusky_tpu.engine.reni_convert import (
    convert_torch_reni_checkpoint,
    filter_reni_state_dict,
    params_to_torch_state,
    torch_state_to_params,
)
from neusky_tpu.fields.reni import RENIField, RENIFieldConfig

CFG = RENIFieldConfig(
    latent_dim=16,
    hidden_features=32,
    num_attention_heads=4,
    num_attention_layers=2,
    fixed_decoder=False,
)


@pytest.fixture(scope="module")
def field_and_params():
    field = RENIField(CFG)
    params = field.init(
        jax.random.PRNGKey(0),
        jnp.zeros((2, 3)),
        jnp.zeros((2, CFG.latent_dim, 3)),
    )
    return field, params


def _tree_equal(a, b):
    fa = jax.tree_util.tree_leaves_with_path(a)
    fb = dict(jax.tree_util.tree_leaves_with_path(b))
    assert len(fa) == len(fb)
    for path, leaf in fa:
        other = fb[path]
        np.testing.assert_array_equal(
            np.asarray(leaf), np.asarray(other), err_msg=str(path)
        )


def test_round_trip_exact(field_and_params):
    _, params = field_and_params
    sd = params_to_torch_state(params, CFG)
    # every tensor is a plain torch-layout array
    assert all(isinstance(v, np.ndarray) for v in sd.values())
    back = torch_state_to_params(sd, CFG)
    _tree_equal(params, back)


def test_round_trip_decode_identical(field_and_params):
    field, params = field_and_params
    back = torch_state_to_params(params_to_torch_state(params, CFG), CFG)
    d = jax.random.normal(jax.random.PRNGKey(1), (8, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    z = jax.random.normal(jax.random.PRNGKey(2), (8, CFG.latent_dim, 3))
    a = field.apply(params, d, z)["rgb"]
    b = field.apply(back, d, z)["rgb"]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_full_checkpoint_path(field_and_params, tmp_path):
    """End-to-end through a real torch .ckpt file in the reference's
    nerfstudio layout: ``{"pipeline": {"_model.field.<name>": tensor}}``
    with the latent banks present (they must be filtered out)."""
    torch = pytest.importorskip("torch")
    _, params = field_and_params
    sd = params_to_torch_state(params, CFG)
    pipeline = {f"_model.field.{k}": torch.from_numpy(np.asarray(v)) for k, v in sd.items()}
    # latent banks the reference excludes (neusky_model.py:286-300)
    pipeline["_model.field.train_mu"] = torch.zeros(5, CFG.latent_dim, 3)
    pipeline["_model.field.train_logvar"] = torch.zeros(5, CFG.latent_dim, 3)
    pipeline["_model.field.eval_mu"] = torch.zeros(2, CFG.latent_dim, 3)
    pipeline["_model.field.eval_logvar"] = torch.zeros(2, CFG.latent_dim, 3)
    # plus an unrelated pipeline key that must be ignored by the prefix filter
    pipeline["_model.ddf.something.weight"] = torch.zeros(3)
    path = tmp_path / "step-000050000.ckpt"
    torch.save({"pipeline": pipeline, "step": 50000}, path)

    back = convert_torch_reni_checkpoint(str(path), CFG)
    _tree_equal(params, back)


def test_alias_names_accepted(field_and_params):
    """nn.TransformerDecoder-style naming (layers.N.norm1/linear1/self_attn)
    maps through TORCH_NAME_ALIASES."""
    _, params = field_and_params
    sd = params_to_torch_state(params, CFG)
    renamed = {}
    for k, v in sd.items():
        k = k.replace("decoder.blocks.", "decoder.layers.")
        k = k.replace(".norm_q.", ".norm1.")
        k = k.replace(".norm_ff.", ".norm2.")
        k = k.replace(".ff1.", ".linear1.")
        k = k.replace(".ff2.", ".linear2.")
        k = k.replace(".attn.", ".self_attn.")
        k = k.replace("decoder.norm_out.", "decoder.norm.")
        renamed[k] = v
    back = torch_state_to_params(renamed, CFG)
    _tree_equal(params, back)


def test_incomplete_mapping_is_loud(field_and_params):
    _, params = field_and_params
    sd = params_to_torch_state(params, CFG)
    sd.pop("decoder.out.weight")
    sd["decoder.mystery.weight"] = np.zeros((4, 4), np.float32)
    with pytest.raises(KeyError) as e:
        torch_state_to_params(sd, CFG)
    msg = str(e.value)
    assert "decoder.out.kernel" in msg  # missing flax leaf reported
    assert "decoder.mystery.weight" in msg  # unconsumed tensor reported


def test_filter_reni_state_dict():
    state = {
        "_model.field.decoder.out.weight": np.ones((3, 4)),
        "_model.field.train_mu": np.zeros((5,)),
        "_model.other.thing": np.zeros((2,)),
    }
    f = filter_reni_state_dict(state)
    assert list(f) == ["decoder.out.weight"]
