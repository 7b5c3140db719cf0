"""NeuSky-synthetic recipe.

Mirror of ``neusky/configs/neusky_synthetic_config.py:32-240``: the same
model on Blender-synthetic multi-illumination data — SfM centering, 512
rays/batch, 256 illumination directions, 0.25 resolution scale
(``neusky_synthetic_config.py:45-62``).
"""

from __future__ import annotations

from neusky_tpu.configs.neusky_config import (
    neusky_model_config,
    neusky_pipeline_config,
)
from neusky_tpu.configs.registry import MethodSpec, register_method
from neusky_tpu.engine.optimizers import default_neusky_optimizer_groups
from neusky_tpu.engine.trainer import TrainerConfig


def _build(num_train_data: int = 8, num_eval_data: int = 2, **_):
    model = neusky_model_config(
        num_train_data, num_eval_data,
        num_illumination_directions=256,
    )
    return {
        "model_config": model,
        "pipeline_config": neusky_pipeline_config(),
        "trainer_config": TrainerConfig(
            max_num_iterations=100001, steps_per_save=5000,
        ),
        "optimizer_groups": default_neusky_optimizer_groups(100001),
        "dataparser": "custom_neusky",
        "downscale_factor": 4,  # 0.25 resolution scale
        "rays_per_batch": 512,
    }


neusky_synthetic_method = register_method(
    MethodSpec(
        name="neusky-synthetic",
        description="NeuSky on Blender-synthetic multi-illumination data.",
        build=_build,
    )
)
