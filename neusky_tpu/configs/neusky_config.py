"""Canonical NeuSky recipe (NeRF-OSR).

TPU-native mirror of ``neusky/configs/neusky_config.py:33-242`` — the full
hyperparameter set captured in SURVEY §2.6: 100,001 iters, 1024 rays/batch,
SDF 2×256 geo + 2×256 colour (bias 0.1, beta_init 0.1, hash grid on),
RENI++ latent 100 attention decoder, 512 icosphere light directions with
random rotation, the 13-loss configuration, five optimizer groups, VMF
visibility sampler 8×128 @ κ=20, L2 scene contraction, sphere collider.
"""

from __future__ import annotations

from neusky_tpu.configs.registry import MethodSpec, register_method
from neusky_tpu.engine.optimizers import default_neusky_optimizer_groups
from neusky_tpu.engine.trainer import TrainerConfig
from neusky_tpu.fields.ddf import DDFFieldConfig
from neusky_tpu.fields.density_field import DensityFieldConfig
from neusky_tpu.fields.reni import RENIFieldConfig
from neusky_tpu.fields.sdf_albedo import SDFAlbedoFieldConfig
from neusky_tpu.models.ddf_model import DDFLossConfig, DDFModelConfig
from neusky_tpu.models.neusky import LossInclusions, NeuSkyModelConfig
from neusky_tpu.models.pipeline import PipelineConfig
from neusky_tpu.ops.hashgrid import HashGridConfig
from neusky_tpu.sampling.ddf_sampler import DDFSamplerConfig
from neusky_tpu.sampling.proposal import ProposalSamplerConfig

# nerfstudio SDFField defaults used by the reference config
SDF_HASH = HashGridConfig(
    num_levels=16, features_per_level=2, log2_hashmap_size=19,
    base_res=16, max_res=2048, use_hash=True, smoothstep=False,
)
PROPOSAL_HASH_0 = HashGridConfig(
    num_levels=5, features_per_level=2, log2_hashmap_size=17,
    base_res=16, max_res=128,
)
PROPOSAL_HASH_1 = HashGridConfig(
    num_levels=5, features_per_level=2, log2_hashmap_size=17,
    base_res=16, max_res=256,
)


def neusky_model_config(
    num_train_data: int, num_eval_data: int, **overrides
) -> NeuSkyModelConfig:
    """The canonical model config (``configs/neusky_config.py:65-214``)."""
    base = dict(
        sdf_field=SDFAlbedoFieldConfig(
            num_layers=2, hidden_dim=256, geo_feat_dim=256,
            num_layers_color=2, hidden_dim_color=256,
            bias=0.1, beta_init=0.1,
            use_grid_feature=True, inside_outside=False,
            predict_shininess=False, hash=SDF_HASH,
            contraction_order="l2",
            stochastic_table_grads=True,
        ),
        proposal=ProposalSamplerConfig(
            num_proposal_samples=(256, 96), num_final_samples=48,
        ),
        proposal_fields=(
            DensityFieldConfig(hidden_dim=16, num_layers=2, hash=PROPOSAL_HASH_0),
            DensityFieldConfig(hidden_dim=16, num_layers=2, hash=PROPOSAL_HASH_1),
        ),
        illumination=RENIFieldConfig(
            conditioning="Attention", invariant_function="VN",
            equivariance="SO2", axis_of_invariance="z",
            positional_encoding="NeRF", encoded_input="Directions",
            latent_dim=100, hidden_features=128, hidden_layers=9,
            mapping_layers=5, mapping_features=128,
            num_attention_heads=8, num_attention_layers=6,
            output_activation="None", last_layer_linear=True,
            fixed_decoder=True, trainable_scale=True,
        ),
        # frozen pretrained prior (reference ``neusky_model.py:272-300``):
        # produced in-repo by tools/train_reni_prior.py (procedural skies).
        # VARIATIONAL since r5 (the reference's published RENI++ prior is
        # variational too, ckpt train_mu/train_logvar,
        # ``neusky_model.py:288-293``): the r3/r4 autodecoder default
        # ("reni_prior_latent100") decodes every near-origin latent out of
        # LDR domain — measured train-PSNR plateau at ~10.3; the
        # variational prior + its shipped LDR-exposed init latent descends
        # from step 0 and lands +3.3 dB (PERF.md r4 long-run verdict,
        # results/r4_long_variational.jsonl vs r4_20k_seeded.jsonl).
        illumination_prior_dir="checkpoints/reni_prior_variational",
        ddf=DDFModelConfig(
            field=DDFFieldConfig(
                ddf_type="ddf",
                # TPU divergence from ``configs/neusky_config.py:165``
                # ("hash"): XLA scatter-add runs at ~12M rows/s on TPU, and a
                # hash-encoded DDF costs 33M gradient-scatter rows per step
                # in the N·D visibility pass alone.  The DDF domain is a
                # smooth 2-sphere × hemisphere — frequency encoding + the
                # 5×256 FiLM mapping net carries it without grids.  Set
                # "hash" to reproduce the reference architecture exactly.
                position_encoding_type="nerf",
                direction_encoding_type="nerf", conditioning="FiLM",
                termination_output_activation="sigmoid",
                hidden_layers=5, hidden_features=256,
                mapping_layers=5, mapping_features=256,
                num_attention_heads=8, num_attention_layers=6,
                predict_probability_of_hit=False,
            ),
            losses=DDFLossConfig(
                depth_l1=True, depth_l2=False, sdf_l1=False, sdf_l2=True,
                prob_hit=False, normal=False, multi_view=True, sky_ray=True,
            ),
            include_depth_loss_scene_center_weight=True,
            scene_center_weight_exp=3.0,
            scene_center_weight_include_z=False,
            mask_to_circumference=False,
            inverse_depth_weight=False,
            log_depth=False,
        ),
        num_illumination_directions=512,
        illumination_sampler_random_rotation=True,
        fix_test_illumination_directions=True,
        use_visibility=True,
        fit_visibility_field=True,
        sdf_to_visibility_stop_gradients="depth",
        only_upperhemisphere_visibility=True,
        lower_hemisphere_visibility=True,
        scene_contraction_order="l2",
        collider_shape="sphere",
        collider_radius=1.0,
        collider_near=0.05,
        ddf_radius=1.0,  # "AABB" → |aabb[0,0]| of the parsed scene
        num_train_data=num_train_data,
        num_eval_data=num_eval_data,
        losses=LossInclusions(
            rgb_l1=True, rgb_l2=False, cosine_colour=False,
            eikonal=True, fg_mask=True, normal=False, depth=False,
            sdf_level_set_visibility=True, interlevel=True,
            sky_pixel=True, sky_pixel_cosine_weight=0.1,
            hashgrid_density=True, hashgrid_density_grid_resolution=10,
            ground_plane=True,
            vis_sigmoid_method="learnable",
            vis_optimise_sigmoid_bias=True,
            vis_optimise_sigmoid_scale=False,
            vis_target_min_bias=0.1,
            vis_target_max_scale=25.0,
            vis_steps_until_min_bias=50000,
        ),
        eval_latent_optimise_method="per_image",
    )
    base.update(overrides)
    return NeuSkyModelConfig(**base)


def neusky_pipeline_config(**overrides) -> PipelineConfig:
    base = dict(
        stop_sdf_gradients=False,  # ``neusky_config.py:45``
        visibility_accumulation_mask_threshold=0.0,
        visibility_train_sampler=DDFSamplerConfig(
            num_samples_on_sphere=8, num_rays_per_sample=128,
            only_sample_upper_hemisphere=True, concentration=20.0,
        ),
        num_sky_rays=256,
    )
    base.update(overrides)
    return PipelineConfig(**base)


def _build(num_train_data: int = 8, num_eval_data: int = 2, **_):
    return {
        "model_config": neusky_model_config(num_train_data, num_eval_data),
        "pipeline_config": neusky_pipeline_config(),
        "trainer_config": TrainerConfig(
            max_num_iterations=100001,
            steps_per_save=5000,
            steps_per_eval_image=5000,
            mixed_precision=False,
        ),
        "optimizer_groups": default_neusky_optimizer_groups(100001),
    }


neusky_method = register_method(
    MethodSpec(
        name="neusky",
        description="Canonical NeuSky on NeRF-OSR (``configs/neusky_config.py``).",
        build=_build,
    )
)
