"""End-to-end training tests on the synthetic sphere scene.

Mirrors BASELINE configs: first the minimal NeuS slice, then the full
joint NeuSky step (SDF + RENI++ illumination + DDF visibility + DDF fit)
— asserting the loss goes down and training metrics improve.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full-model compile / subprocess mesh / HTTP

from neusky_tpu.data.datamanager import DataManager, DataManagerConfig
from neusky_tpu.data.pixel_sampler import PixelSamplerConfig
from neusky_tpu.data.synthetic import SyntheticSceneConfig, generate_synthetic_scene
from neusky_tpu.engine.optimizers import (
    OptimizerGroupConfig,
    default_neusky_optimizer_groups,
)
from neusky_tpu.engine.trainer import Trainer, TrainerConfig
from neusky_tpu.fields.ddf import DDFFieldConfig
from neusky_tpu.fields.density_field import DensityFieldConfig
from neusky_tpu.fields.reni import RENIFieldConfig
from neusky_tpu.fields.sdf_albedo import SDFAlbedoFieldConfig
from neusky_tpu.models.ddf_model import DDFLossConfig, DDFModelConfig
from neusky_tpu.models.neusky import LossInclusions, NeuSkyModel, NeuSkyModelConfig
from neusky_tpu.models.pipeline import PipelineConfig
from neusky_tpu.ops.hashgrid import HashGridConfig
from neusky_tpu.sampling.ddf_sampler import DDFSamplerConfig
from neusky_tpu.sampling.proposal import ProposalSamplerConfig

TINY_HASH = HashGridConfig(
    num_levels=4, features_per_level=2, log2_hashmap_size=13, base_res=4, max_res=64,
)
TINY_PROP_HASH = HashGridConfig(
    num_levels=3, features_per_level=2, log2_hashmap_size=11, base_res=4, max_res=32,
)


def tiny_model_config(use_visibility: bool, fit_visibility: bool) -> NeuSkyModelConfig:
    return NeuSkyModelConfig(
        sdf_field=SDFAlbedoFieldConfig(
            num_layers=2, hidden_dim=64, geo_feat_dim=32,
            num_layers_color=2, hidden_dim_color=64,
            bias=0.3, hash=TINY_HASH,
        ),
        proposal=ProposalSamplerConfig(num_proposal_samples=(32, 16), num_final_samples=12),
        proposal_fields=(
            DensityFieldConfig(hidden_dim=16, num_layers=2, hash=TINY_PROP_HASH),
            DensityFieldConfig(hidden_dim=16, num_layers=2, hash=TINY_PROP_HASH),
        ),
        illumination=RENIFieldConfig(
            latent_dim=8, hidden_features=32, num_attention_heads=4,
            num_attention_layers=2, fixed_decoder=False,
        ),
        ddf=DDFModelConfig(
            field=DDFFieldConfig(
                conditioning="FiLM", position_encoding_type="nerf",
                direction_encoding_type="nerf", hidden_layers=2,
                hidden_features=32, mapping_layers=2, mapping_features=32,
            ),
            losses=DDFLossConfig(
                depth_l1=True, sdf_l2=True, multi_view=True, sky_ray=True,
            ),
        ) if use_visibility or fit_visibility else None,
        num_illumination_directions=12,
        use_visibility=use_visibility,
        fit_visibility_field=fit_visibility,
        num_train_data=6,
        num_eval_data=2,
        collider_shape="sphere",
        collider_radius=1.0,
        ddf_radius=1.0,
        losses=LossInclusions(
            hashgrid_density_grid_resolution=6,
            sdf_level_set_visibility=use_visibility,
        ),
        visibility_query_chunk=2048,
    )


def make_scene_dm(num_cams=6, size=24):
    scene = generate_synthetic_scene(
        SyntheticSceneConfig(num_cameras=num_cams, width=size, height=size)
    )
    dm = DataManager(
        DataManagerConfig(
            pixel_sampler=PixelSamplerConfig(images_per_batch=4, rays_per_image=32),
            num_sky_rays=32,
        ),
        scene["cameras"],
        scene["images"],
        scene["masks"],
    )
    return scene, dm


@pytest.fixture(scope="module")
def sphere_scene():
    return make_scene_dm()


def _tiny_trainer(cfg, dm, steps=60):
    model = NeuSkyModel(cfg)
    pipe = PipelineConfig(
        visibility_train_sampler=DDFSamplerConfig(
            num_samples_on_sphere=2, num_rays_per_sample=16,
            only_sample_upper_hemisphere=True, concentration=20.0,
        ),
        num_sky_rays=32,
    )
    groups = default_neusky_optimizer_groups(max_steps=max(steps, 10))
    # shorter warmups for tiny runs
    groups = {
        k: OptimizerGroupConfig(
            lr=g.lr, schedule="constant", max_steps=steps,
        )
        for k, g in groups.items()
    }
    trainer = Trainer(
        TrainerConfig(
            max_num_iterations=steps, steps_per_save=10**9,
            steps_per_log=10, output_dir="/tmp/neusky_test_run",
        ),
        model, pipe, dm, optimizer_groups=groups,
    )
    return trainer


def test_neus_slice_trains(sphere_scene):
    """Minimal slice (no visibility): the optimisation signals improve.

    Asserts total_loss (substantially) and the rgb L1 (foreground fit)
    improve.  Batch PSNR is deliberately NOT asserted here: this tiny
    test trains against a RANDOM frozen RENI decoder (no prior
    checkpoint fits the tiny config), and since the r2 straight-through
    sRGB/domain clips (``core/colour.py``, ``fields/reni.py``) the sky
    latents actually receive gradient through that random decoder — the
    sky-dominated batch PSNR transiently DIPS (~6.0 → ~4.0 by step 60,
    recovering past step 200) while every loss decreases monotonically.
    At scale with the trained prior the same config climbs past the old
    PSNR plateau (PERF.md r3 20k run), which is the behaviour that
    matters; the dip is an artefact of the random decoder, and removing
    the straight-through clips would reintroduce the r2 flat-sky-loss
    pathology."""
    _, dm = sphere_scene
    cfg = tiny_model_config(use_visibility=False, fit_visibility=False)
    trainer = _tiny_trainer(cfg, dm, steps=60)
    history = trainer.run()
    first, last = history[0], history[-1]
    assert np.isfinite(last["total_loss"])
    assert last["total_loss"] < 0.95 * first["total_loss"], (first, last)
    assert last["rgb_l1_loss"] < first["rgb_l1_loss"], (first, last)
    assert np.isfinite(last["psnr"])


def test_full_joint_step_runs(sphere_scene):
    """Full NeuSky joint step (visibility + DDF fit) runs and stays finite."""
    _, dm = sphere_scene
    cfg = tiny_model_config(use_visibility=True, fit_visibility=True)
    trainer = _tiny_trainer(cfg, dm, steps=12)
    history = trainer.run()
    last = history[-1]
    assert np.isfinite(last["total_loss"])
    # DDF losses present in the joint step
    assert "depth_l1_loss" in last
    assert "sky_ray_loss" in last
    assert "ddf_depth_psnr" in last
    # visibility-coupled loss present
    assert "sdf_level_set_visibility_loss" in last


def test_gt_illumination_probe_trains(sphere_scene):
    """Ceiling-probe mode (oracle light table + analytic sky background,
    ``NeuSkyModelConfig.gt_illumination_probe``) trains end-to-end: with
    illumination estimation removed, batch PSNR must CLIMB from step 0
    (no random-decoder sky dip — the background is exact by construction)
    and the free light table must receive gradient updates."""
    import dataclasses

    _, dm = sphere_scene
    cfg = tiny_model_config(use_visibility=False, fit_visibility=False)
    cfg = dataclasses.replace(cfg, gt_illumination_probe=True)
    model = NeuSkyModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    assert "gt_probe_illumination" in params
    table0 = np.asarray(params["gt_probe_illumination"]["log_light"])

    trainer = _tiny_trainer(cfg, dm, steps=60)
    history = trainer.run()
    first, last = history[0], history[-1]
    assert np.isfinite(last["total_loss"])
    assert last["total_loss"] < 0.9 * first["total_loss"], (first, last)
    # the probe's signature: batch PSNR starts HIGH (~14 vs ~6 in RENI
    # mode) because the sky is exact from step 0, and must not collapse
    # while the foreground fits (60 tiny steps is too short for a climb)
    assert first["psnr"] > 12.0, first
    assert last["psnr"] > first["psnr"] - 0.5, (first, last)
    # sky pixels match the analytic background up to residual geometry
    # occlusion (acc not yet 0 on sky rays at step 60): small and falling
    assert last["sky_pixel_loss"] < 0.1, last
    assert last["sky_pixel_loss"] <= first["sky_pixel_loss"], (first, last)
    table1 = np.asarray(
        trainer.params["gt_probe_illumination"]["log_light"]
    )
    assert not np.array_equal(table0, table1)  # oracle table actually trains


def test_blinn_phong_e2e(sphere_scene):
    """``predict_shininess=True`` drives the Blinn-Phong compositing branch
    through the FULL model forward + losses + train steps (reference wires
    it at ``sdf_albedo_field.py:76`` and ``neusky_model.py:797-813``;
    renderer semantics ``renderers.py:179-253``)."""
    import dataclasses

    _, dm = sphere_scene
    cfg = tiny_model_config(use_visibility=True, fit_visibility=True)
    cfg = dataclasses.replace(
        cfg,
        sdf_field=dataclasses.replace(cfg.sdf_field, predict_shininess=True),
    )
    model = NeuSkyModel(cfg)
    # the colour head must actually emit the extra shininess channel
    params = model.init(jax.random.PRNGKey(0))
    from neusky_tpu.core.rays import RayBundle
    from neusky_tpu.sampling.proposal import (
        bins_to_ray_samples,
        uniform_lindisp_samples,
    )

    n = 4
    d = jax.random.normal(jax.random.PRNGKey(1), (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    rb = RayBundle.create(
        origins=jnp.tile(jnp.array([[0.0, -0.9, 0.2]]), (n, 1)), directions=d,
        nears=jnp.full((n, 1), 0.05), fars=jnp.full((n, 1), 2.0),
    )
    bins = uniform_lindisp_samples(None, rb, 8, train=False)
    rs = bins_to_ray_samples(rb, bins)
    field_out = model.field.apply(
        params["fields"], rs, True, 1.0, None,
        method=model.field.field_outputs,
    )
    assert "shininess" in field_out
    assert field_out["shininess"].shape == (n, 8, 1)

    # and the full joint step trains finite with the specular branch live
    trainer = _tiny_trainer(cfg, dm, steps=12)
    history = trainer.run()
    first, last = history[0], history[-1]
    assert np.isfinite(last["total_loss"]), last
    assert last["total_loss"] < first["total_loss"], (first, last)


def test_upper_hemisphere_pruning_exact(sphere_scene):
    """Pruned visibility (top-K z cull) must equal the unpruned computation
    on the upper hemisphere and the fill constant below."""
    import jax
    import jax.numpy as jnp

    from neusky_tpu.core.rays import RayBundle
    from neusky_tpu.models.neusky import NeuSkyModel
    from neusky_tpu.sampling.proposal import (
        bins_to_ray_samples,
        uniform_lindisp_samples,
    )

    cfg_pruned = tiny_model_config(use_visibility=True, fit_visibility=True)
    cfg_all = dataclasses_replace_vis(cfg_pruned, False)
    m1 = NeuSkyModel(cfg_pruned)
    m2 = NeuSkyModel(cfg_all)
    params = m1.init(jax.random.PRNGKey(0))

    n = 8
    d = jax.random.normal(jax.random.PRNGKey(1), (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    rb = RayBundle.create(
        origins=jnp.tile(jnp.array([[0.0, -0.9, 0.2]]), (n, 1)), directions=d,
        nears=jnp.full((n, 1), 0.05), fars=jnp.full((n, 1), 2.0),
    )
    bins = uniform_lindisp_samples(None, rb, 8, train=False)
    rs = bins_to_ray_samples(rb, bins)
    dirs = m1.illumination_sampler(None, apply_random_rotation=False)
    depth = jnp.full((n, 1), 0.8)

    v1 = m1.compute_visibility(
        params, rs, depth, dirs, jnp.asarray(0.5), jnp.asarray(25.0), True, False
    )["visibility"][:, 0, :]
    v2 = m2.compute_visibility(
        params, rs, depth, dirs, jnp.asarray(0.5), jnp.asarray(25.0), True, False
    )["visibility"][:, 0, :]
    upper = np.asarray(dirs[:, 2] > 0)
    assert np.allclose(np.asarray(v1)[:, upper], np.asarray(v2)[:, upper], atol=1e-5)
    assert np.allclose(np.asarray(v1)[:, ~upper], 1.0, atol=1e-6)


def dataclasses_replace_vis(cfg, upper):
    import dataclasses

    return dataclasses.replace(cfg, only_upperhemisphere_visibility=upper)


def test_split_step_matches_fused(sphere_scene):
    """The 3-executable split step must match the fused step numerically
    (same rng → same grads → same update)."""
    import jax
    import jax.numpy as jnp

    from neusky_tpu.engine.optimizers import OptimizerGroupConfig, build_optimizer
    from neusky_tpu.models.neusky import NeuSkyModel
    from neusky_tpu.models.pipeline import PipelineConfig
    from neusky_tpu.parallel.mesh import make_train_step, make_train_step_split
    from neusky_tpu.sampling.ddf_sampler import DDFSamplerConfig

    _, dm = sphere_scene
    cfg = tiny_model_config(use_visibility=True, fit_visibility=True)
    model = NeuSkyModel(cfg)
    pipe = PipelineConfig(
        visibility_train_sampler=DDFSamplerConfig(
            num_samples_on_sphere=2, num_rays_per_sample=16,
        ),
        num_sky_rays=32,
    )
    params = model.init(jax.random.PRNGKey(0))
    groups = {
        name: OptimizerGroupConfig(lr=1e-3, schedule="constant", max_steps=10)
        for name in ("proposal_networks", "fields", "illumination_field",
                     "visibility_sigmoid", "ddf_field")
    }
    opt = build_optimizer(params, groups)
    opt_state = opt.init(params)
    batch = dm.next_train(0)
    rng = jax.random.PRNGKey(7)
    step = jnp.asarray(0.0)

    fused = make_train_step(model, pipe, opt, donate=False)
    p1, _, aux1 = fused(params, opt_state, batch, rng, step)
    split = make_train_step_split(model, pipe, opt)
    p2, _, aux2 = split(params, opt_state, batch, rng, step)

    assert np.allclose(float(aux1["total_loss"]), float(aux2["total_loss"]), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_checkpoint_roundtrip(sphere_scene, tmp_path):
    _, dm = sphere_scene
    cfg = tiny_model_config(use_visibility=False, fit_visibility=False)
    trainer = _tiny_trainer(cfg, dm, steps=3)
    trainer.run()
    trainer.save(str(tmp_path))

    trainer2 = _tiny_trainer(cfg, dm, steps=3)
    trainer2.load(str(tmp_path))
    assert trainer2.step == 3
    a = jax.tree_util.tree_leaves(trainer.params)
    b = jax.tree_util.tree_leaves(trainer2.params)
    for x, y in zip(a, b):
        assert np.allclose(np.array(x), np.array(y))


def test_fused_ddf_gt_matches_separate(sphere_scene):
    """``forward_with_ddf_gt`` (one concatenated proposal+field pass) must
    match the two separate passes — the fusion changes op structure, not
    math.  Compared in deterministic eval mode (train=False: no stratified
    jitter, no stochastic estimators), where the scene slice must equal
    ``forward`` and the GT slice must equal ``generate_ddf_ground_truth``
    (its ``stop_gradients=True`` variant is the deterministic one)."""
    _, dm = sphere_scene
    from neusky_tpu.models.pipeline import batch_ray_bundle
    from neusky_tpu.sampling.ddf_sampler import vmf_ddf_samples

    cfg = tiny_model_config(use_visibility=True, fit_visibility=True)
    model = NeuSkyModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    batch = dm.next_train(0)
    rb = batch_ray_bundle(batch)
    vis = vmf_ddf_samples(
        jax.random.PRNGKey(5),
        DDFSamplerConfig(
            num_samples_on_sphere=2, num_rays_per_sample=16,
            only_sample_upper_hemisphere=True, concentration=20.0,
        ),
        ddf_sphere_radius=cfg.ddf_radius,
    )
    k = jax.random.PRNGKey(3)
    step = jnp.asarray(100.0)
    out_f, gt_f = model.forward_with_ddf_gt(
        params, k, rb, batch["image_indices"], batch["ray_image_idx"],
        vis, step=step, train=False, gt_mask_threshold=0.5,
    )
    out_s = model.forward(
        params, k, rb, batch["image_indices"], batch["ray_image_idx"],
        step=step, train=False,
    )
    gt_s = model.generate_ddf_ground_truth(
        params, k, vis, mask_threshold=0.5, stop_gradients=True, step=step,
    )
    for key in (
        "rgb", "albedo", "accumulation", "depth", "normal", "visibility",
        "bg_transmittance", "sdf_at_termination",
    ):
        np.testing.assert_allclose(
            np.asarray(out_f[key]), np.asarray(out_s[key]),
            rtol=1e-5, atol=1e-5, err_msg=key,
        )
    for key in gt_s:
        np.testing.assert_allclose(
            np.asarray(gt_f[key]), np.asarray(gt_s[key]),
            rtol=1e-5, atol=1e-5, err_msg=key,
        )


def test_fused_joint_step_trains(sphere_scene):
    """Full joint step with NEUSKY_FUSED_GT semantics (fused_ddf_gt_pass):
    runs, all losses present and finite, loss decreases."""
    import dataclasses

    _, dm = sphere_scene
    cfg = dataclasses.replace(
        tiny_model_config(use_visibility=True, fit_visibility=True),
        fused_ddf_gt_pass=True,
    )
    trainer = _tiny_trainer(cfg, dm, steps=12)
    history = trainer.run()
    first, last = history[0], history[-1]
    assert np.isfinite(last["total_loss"])
    assert "depth_l1_loss" in last and "sky_ray_loss" in last
    assert "sdf_level_set_visibility_loss" in last
    assert last["total_loss"] < first["total_loss"]
