from neusky_tpu.data.dataparsers.nerfosr import (
    NeRFOSRDataparserConfig,
    parse_nerfosr_scene,
)
from neusky_tpu.data.dataparsers.custom_synthetic import (
    CustomSyntheticDataparserConfig,
    parse_custom_synthetic_scene,
)
