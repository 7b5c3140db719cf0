from neusky_tpu.nets.mlp import MLP, WNDense, geometric_geo_mlp_init
from neusky_tpu.nets.siren import Siren, FiLMSiren, MappingNetwork
from neusky_tpu.nets.transformer import TransformerDecoder
from neusky_tpu.nets.density import LearnedVariance, LaplaceDensity, neus_alpha
