"""Tests: checkpoint subtree restore, writer, schedules, DDF trainer,
RENI prior trainer, eval panels."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neusky_tpu.engine.checkpoint import (
    latest_step,
    load_checkpoint,
    load_param_subtrees,
    save_checkpoint,
)
from neusky_tpu.engine.optimizers import (
    cosine_decay_schedule,
    exponential_decay_schedule,
)
from neusky_tpu.engine.writer import Writer


def test_schedules():
    s = cosine_decay_schedule(1e-2, max_steps=1000, warm_up_end=100, learning_rate_alpha=0.05)
    assert float(s(0)) == 0.0
    assert abs(float(s(100)) - 1e-2) < 1e-6
    assert abs(float(s(1000)) - 0.05 * 1e-2) < 1e-6
    e = exponential_decay_schedule(1e-1, 1e-7, max_steps=250)
    assert abs(float(e(0)) - 1e-1) < 1e-6
    assert abs(float(e(250)) - 1e-7) < 1e-10
    # warmup variant starts small
    ew = exponential_decay_schedule(1e-3, 1e-4, 1000, warmup_steps=100)
    assert float(ew(0)) < 1e-4


def test_checkpoint_subtree_restore(tmp_path):
    params = {
        "fields": {"w": jnp.ones((3,))},
        "ddf_field": {"w": jnp.full((2,), 2.0)},
        "illumination_decoder": {"w": jnp.full((2,), 3.0)},
    }
    save_checkpoint(tmp_path, 7, params, {"opt": jnp.zeros(1)})
    assert latest_step(tmp_path) == 7

    fresh = {
        "fields": {"w": jnp.zeros((3,))},
        "ddf_field": {"w": jnp.zeros((2,))},
        "illumination_decoder": {"w": jnp.zeros((2,))},
    }
    # decoder-only restore (RENI++ surgical load)
    out = load_param_subtrees(tmp_path, 7, fresh, include=("illumination_decoder",))
    assert np.allclose(out["illumination_decoder"]["w"], 3.0)
    assert np.allclose(out["fields"]["w"], 0.0)
    # everything-but-visibility restore
    out2 = load_param_subtrees(tmp_path, 7, fresh, exclude=("ddf_field",))
    assert np.allclose(out2["fields"]["w"], 1.0)
    assert np.allclose(out2["ddf_field"]["w"], 0.0)


def test_checkpoint_eval_latents_resize(tmp_path):
    """A checkpoint trained against one eval split must stay loadable for a
    DIFFERENT-sized eval set: the mismatched ``eval_latents`` subtree keeps
    the fresh template (refit by the eval loop, reference
    ``neusky_model.py:262-270``); any OTHER mismatched subtree fails loudly."""
    import pytest

    params = {
        "fields": {"w": jnp.ones((3,))},
        "eval_latents": {
            "eval_latents": jnp.ones((2, 4, 3)),
            "eval_scale": jnp.ones((2,)),
        },
    }
    save_checkpoint(tmp_path, 1, params, {"opt": jnp.zeros(1)})

    # same shapes: eval latents restore normally
    same = {
        "fields": {"w": jnp.zeros((3,))},
        "eval_latents": {
            "eval_latents": jnp.zeros((2, 4, 3)),
            "eval_scale": jnp.zeros((2,)),
        },
    }
    out = load_param_subtrees(tmp_path, 1, same)
    assert np.allclose(out["eval_latents"]["eval_latents"], 1.0)

    # different eval-set size: template kept, rest restored
    bigger = {
        "fields": {"w": jnp.zeros((3,))},
        "eval_latents": {
            "eval_latents": jnp.zeros((5, 4, 3)),
            "eval_scale": jnp.zeros((5,)),
        },
    }
    out = load_param_subtrees(tmp_path, 1, bigger)
    assert out["eval_latents"]["eval_latents"].shape == (5, 4, 3)
    assert np.allclose(out["eval_latents"]["eval_latents"], 0.0)
    assert np.allclose(out["fields"]["w"], 1.0)

    # a mismatch anywhere else is an ERROR, not a silent wrong-shape merge
    broken = {
        "fields": {"w": jnp.zeros((7,))},
        "eval_latents": dict(same["eval_latents"]),
    }
    with pytest.raises(ValueError, match="fields"):
        load_param_subtrees(tmp_path, 1, broken)


def test_eval_latent_optimizer_scale_only():
    """``optimise_compare_eval_scale`` (``neusky_model.py:1511-1514``):
    scale_only masks latent updates to zero, scale still moves."""
    from neusky_tpu.engine.optimizers import build_eval_latent_optimizer

    params = {
        "eval_latents": {
            "eval_latents": jnp.ones((2, 4, 3)),
            "eval_scale": jnp.ones((2,)),
        },
        "fields": {"w": jnp.ones((3,))},
    }
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    for scale_only in (False, True):
        opt = build_eval_latent_optimizer(scale_only=scale_only)
        state = opt.init(params)
        updates, _ = opt.update(grads, state, params)
        assert np.allclose(updates["fields"]["w"], 0.0)
        assert not np.allclose(updates["eval_latents"]["eval_scale"], 0.0)
        moved = not np.allclose(updates["eval_latents"]["eval_latents"], 0.0)
        assert moved == (not scale_only)


def test_load_illumination_prior(tmp_path):
    """Regression (r2): every training entry point must restore the trained
    frozen decoder — train_sanity/bench once skipped it and trained against
    a RANDOM decoder."""
    import dataclasses

    from neusky_tpu.engine.checkpoint import load_illumination_prior

    prior_params = {"illumination_decoder": {"w": jnp.full((2,), 9.0)}}
    save_checkpoint(tmp_path / "prior", 5, prior_params, {"o": jnp.zeros(1)})

    @dataclasses.dataclass
    class Cfg:
        illumination_prior_dir: str = str(tmp_path / "prior")

    params = {"illumination_decoder": {"w": jnp.zeros((2,))},
              "fields": {"w": jnp.ones((1,))}}
    out = load_illumination_prior(params, Cfg())
    assert np.allclose(out["illumination_decoder"]["w"], 9.0)
    assert np.allclose(out["fields"]["w"], 1.0)
    # unconfigured → no-op; configured-but-missing → loud no-op
    assert load_illumination_prior(params, Cfg(illumination_prior_dir="")) is params
    out2 = load_illumination_prior(params, Cfg(illumination_prior_dir=str(tmp_path / "nope")))
    assert np.allclose(out2["illumination_decoder"]["w"], 0.0)


def test_load_illumination_prior_seeds_init_latent(tmp_path):
    """When the prior ships ``init_latent.npz`` (fit by
    ``tools/fit_prior_init_latent.py``), train/eval latents are seeded with
    it instead of zeros.  Restores the reference's effective init semantics
    (``neusky_model.py:261-263`` zero-init works there because the
    *variational* RENI++ prior decodes z=0 to a mean sky; the in-framework
    autodecoder prior decodes z=0 out-of-domain — r3 convergence diagnosis,
    sky loss bit-flat for 800 steps)."""
    import dataclasses

    from neusky_tpu.engine.checkpoint import load_illumination_prior

    prior_params = {"illumination_decoder": {"w": jnp.full((2,), 9.0)}}
    save_checkpoint(tmp_path / "prior", 5, prior_params, {"o": jnp.zeros(1)})
    z0 = np.arange(12, dtype=np.float32).reshape(4, 3)
    np.savez(tmp_path / "prior" / "init_latent.npz", latent=z0)

    @dataclasses.dataclass
    class Cfg:
        illumination_prior_dir: str = str(tmp_path / "prior")

    def fresh():
        return {
            "illumination_decoder": {"w": jnp.zeros((2,))},
            "illumination_field": {
                "train_latents": jnp.zeros((3, 4, 3)),
                "train_scale": jnp.ones((3,)),
            },
            "eval_latents": {
                "eval_latents": jnp.zeros((2, 4, 3)),
                "eval_scale": jnp.ones((2,)),
            },
        }

    out = load_illumination_prior(fresh(), Cfg())
    assert np.allclose(out["illumination_field"]["train_latents"],
                       np.broadcast_to(z0, (3, 4, 3)))
    assert np.allclose(out["eval_latents"]["eval_latents"],
                       np.broadcast_to(z0, (2, 4, 3)))
    # scales untouched; decoder still restored
    assert np.allclose(out["illumination_field"]["train_scale"], 1.0)
    assert np.allclose(out["illumination_decoder"]["w"], 9.0)

    # opt-out (e.g. the fit tool itself must see the raw decoder)
    out2 = load_illumination_prior(fresh(), Cfg(), init_latent=False)
    assert np.allclose(out2["illumination_field"]["train_latents"], 0.0)

    # shape mismatch → loud no-op on the latents, decoder still loads
    np.savez(tmp_path / "prior" / "init_latent.npz",
             latent=np.ones((7, 3), np.float32))
    out3 = load_illumination_prior(fresh(), Cfg())
    assert np.allclose(out3["illumination_field"]["train_latents"], 0.0)
    assert np.allclose(out3["illumination_decoder"]["w"], 9.0)


def test_writer(tmp_path):
    w = Writer(str(tmp_path))
    w.write_scalars(1, {"loss": 0.5})
    w.write_scalars(2, {"loss": 0.25})
    w.write_image(2, "panel", np.zeros((4, 4, 3)))
    w.close()
    lines = (tmp_path / "events.jsonl").read_text().strip().split("\n")
    assert len(lines) == 2
    assert json.loads(lines[1])["loss"] == 0.25
    assert (tmp_path / "images" / "step-000000002" / "panel.png").exists()


def test_ddf_predicted_normals():
    from neusky_tpu.fields.ddf import DDFFieldConfig
    from neusky_tpu.models.ddf_model import (
        DDFModel,
        DDFModelConfig,
        ddf_predicted_normals,
    )

    cfg = DDFModelConfig(
        field=DDFFieldConfig(
            conditioning="Concat", position_encoding_type="none",
            direction_encoding_type="none", hidden_layers=2, hidden_features=32,
        )
    )
    model = DDFModel(cfg, ddf_radius=1.0)
    o = jax.random.normal(jax.random.PRNGKey(0), (8, 3))
    o = o / jnp.linalg.norm(o, axis=-1, keepdims=True)
    d = -o
    params = model.init(jax.random.PRNGKey(1), o, d)
    n = ddf_predicted_normals(model, params, o, d)
    assert n.shape == (8, 3)
    norms = np.linalg.norm(np.asarray(n), axis=-1)
    assert np.allclose(norms, 1.0, atol=1e-4)
    # oriented against the ray
    dots = np.sum(np.asarray(n) * np.asarray(d), axis=-1)
    assert np.all(dots <= 1e-5)


def test_eval_panels_and_depth_alignment():
    from neusky_tpu.engine.eval_panels import (
        normalized_depth_scale_and_shift,
    )

    rng = np.random.default_rng(0)
    gt = rng.uniform(1.0, 3.0, (16, 16))
    pred = (gt - 0.5) / 2.0  # gt = 2*pred + 0.5
    mask = np.ones_like(gt)
    s, t = normalized_depth_scale_and_shift(pred, gt, mask)
    assert abs(s - 2.0) < 1e-6 and abs(t - 0.5) < 1e-6


def test_reni_trainer_variational_mechanics():
    """The default prior trainer is VARIATIONAL (r4): per-image (mu,
    logvar) posteriors, reparameterised sampling, analytic KL — this is
    what makes z=0 decode to a mean sky, the property the reference's
    zero-init latent semantics silently rely on (``neusky_model.py:261-263,
    1537-1540``)."""
    from neusky_tpu.engine.reni_trainer import RENITrainer, RENITrainerConfig
    from neusky_tpu.fields.reni import RENIFieldConfig

    rng = np.random.default_rng(0)
    envmaps = rng.uniform(0.01, 5.0, (3, 8, 16, 3)).astype(np.float32)
    cfg = RENITrainerConfig(
        field=RENIFieldConfig(
            latent_dim=4, hidden_features=16, num_attention_heads=2,
            num_attention_layers=1, fixed_decoder=False,
        ),
        pixels_per_step=64, steps_per_call=10,
    )
    assert cfg.variational and cfg.logvar_init == 0.0
    trainer = RENITrainer(cfg, envmaps)
    assert trainer.params["logvar"].shape == (3, 4, 3)
    hist = trainer.run(num_steps=30, log_every=10)
    assert np.isfinite(hist[-1]["kl"]) and np.isfinite(hist[-1]["recon"])
    # both posterior halves actually train
    assert not np.allclose(np.asarray(trainer.params["latents"]), 0.0)
    assert not np.allclose(np.asarray(trainer.params["logvar"]), 0.0)
    # mean-latent decode path (reconstruction_psnr) still works
    assert np.isfinite(trainer.reconstruction_psnr(0))

    # legacy autodecoder path preserved behind the flag
    import dataclasses

    tr2 = RENITrainer(
        dataclasses.replace(cfg, variational=False, kl_weight=1e-5), envmaps
    )
    assert "logvar" not in tr2.params
    h2 = tr2.run(num_steps=20, log_every=10)
    assert np.isfinite(h2[-1]["total"])


def test_reni_trainer_smoke():
    from neusky_tpu.engine.reni_trainer import RENITrainer, RENITrainerConfig
    from neusky_tpu.fields.reni import RENIFieldConfig

    rng = np.random.default_rng(0)
    envmaps = rng.uniform(0.01, 5.0, (2, 8, 16, 3)).astype(np.float32)
    trainer = RENITrainer(
        RENITrainerConfig(
            field=RENIFieldConfig(
                latent_dim=4, hidden_features=16, num_attention_heads=2,
                num_attention_layers=1, fixed_decoder=False,
            ),
            pixels_per_step=64,
            steps_per_call=10,
        ),
        envmaps,
    )
    hist = trainer.run(num_steps=30, log_every=10)
    assert np.isfinite(hist[-1]["total"])
    assert hist[-1]["recon"] < hist[0]["recon"] * 1.5  # not exploding
    env = trainer.decode_envmap(trainer.params["latents"][0], width=16)
    assert env.shape == (8, 16, 3)
    assert (env > 0).all()


def test_sky_generator_and_heldout_fit():
    """Procedural sky corpus trains the prior and a frozen-decoder
    held-out latent fit improves over the zero latent (the generalisation
    gate used by tools/train_reni_prior.py)."""
    from neusky_tpu.data.sky_generator import generate_sky_corpus
    from neusky_tpu.engine.reni_trainer import RENITrainer, RENITrainerConfig
    from neusky_tpu.fields.reni import RENIFieldConfig

    corpus = generate_sky_corpus(6, width=16, seed=0)
    assert corpus.shape == (6, 8, 16, 3) and np.isfinite(corpus).all()
    trainer = RENITrainer(
        RENITrainerConfig(
            field=RENIFieldConfig(
                latent_dim=4, hidden_features=16, num_attention_heads=2,
                num_attention_layers=1, fixed_decoder=False,
            ),
            pixels_per_step=128,
            steps_per_call=25,
        ),
        corpus[:4],
    )
    trainer.run(num_steps=50, log_every=25)
    psnr_train = trainer.reconstruction_psnr(0)
    assert np.isfinite(psnr_train)
    z, psnr = trainer.fit_heldout_latents(
        corpus[4:], steps=30, pixels_per_step=128
    )
    assert z.shape == (2, 4, 3) and np.isfinite(psnr).all()


def test_lpips_native():
    """JAX VGG-LPIPS: zero on identical images, positive and ordered on
    distortions; flavour reported (random fallback without weights)."""
    from neusky_tpu.engine.metrics import lpips_flavour, lpips_image

    rng = np.random.default_rng(0)
    a = rng.uniform(size=(48, 48, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.15, a.shape).astype(np.float32), 0, 1)
    assert lpips_image(a, a) < 1e-6
    assert lpips_image(a, b) > 1e-4
    assert lpips_flavour() in ("vgg16-random", "vgg16-pretrained")


def test_lpips_pretrained_loader(tmp_path, monkeypatch):
    """The torch-state_dict branch of the LPIPS loader actually works: a
    torchvision-format VGG16 ``state_dict`` (random values, REAL layout —
    conv weights at ``features.{0,2,5,...,28}``) round-trips through
    ``_convert_torch_vgg`` and flips the flavour to ``vgg16-pretrained``.
    Reference metric: ``/root/reference/neusky/models/ddf_model.py:29-31,146-149``.
    With real torchvision weights the one-command path is:
    ``NEUSKY_VGG_WEIGHTS=/path/vgg16.pth`` (or drop the file at
    ``checkpoints/vgg16.pth``)."""
    import torch

    from neusky_tpu.engine import lpips as lpips_mod

    # torchvision VGG16 'features' conv indices and channel plan
    conv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    chans = [64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512]
    sd = {}
    cin = 3
    g = torch.Generator().manual_seed(0)
    for i, cout in zip(conv_idx, chans):
        sd[f"features.{i}.weight"] = torch.randn(
            (cout, cin, 3, 3), generator=g
        ) * 0.05
        sd[f"features.{i}.bias"] = torch.zeros((cout,))
        cin = cout
    # classifier keys must be ignored by the converter
    sd["classifier.0.weight"] = torch.zeros((8, 8))
    path = tmp_path / "vgg16.pth"
    torch.save(sd, path)

    convs = lpips_mod._convert_torch_vgg(path)
    assert len(convs) == 13
    assert convs[0][0].shape == (3, 3, 3, 64)  # HWIO
    assert convs[-1][0].shape == (3, 3, 512, 512)
    # bit-exact layout mapping: torch [cout,cin,kh,kw] → jax [kh,kw,cin,cout]
    np.testing.assert_allclose(
        convs[2][0][1, 2, 3, 7],
        sd["features.5.weight"][7, 3, 1, 2].numpy(),
    )

    # end-to-end: env var → pretrained flavour → finite, ordered metric
    monkeypatch.setenv("NEUSKY_VGG_WEIGHTS", str(path))
    saved_cache = dict(lpips_mod._cache)
    lpips_mod._cache.clear()
    try:
        rng = np.random.default_rng(1)
        a = rng.uniform(size=(48, 48, 3)).astype(np.float32)
        b = np.clip(a + rng.normal(0, 0.2, a.shape).astype(np.float32), 0, 1)
        same, flavour = lpips_mod.lpips(a, a)
        diff, _ = lpips_mod.lpips(a, b)
        assert flavour == "vgg16-pretrained"
        assert same < 1e-6
        assert np.isfinite(diff) and diff > same
    finally:
        lpips_mod._cache.clear()
        lpips_mod._cache.update(saved_cache)
