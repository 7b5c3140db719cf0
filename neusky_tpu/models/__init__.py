from neusky_tpu.models.neusky import NeuSkyModel, NeuSkyModelConfig
from neusky_tpu.models.ddf_model import DDFModel, DDFModelConfig
