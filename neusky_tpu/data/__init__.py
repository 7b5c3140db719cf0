from neusky_tpu.data.synthetic import SyntheticSceneConfig, generate_synthetic_scene
from neusky_tpu.data.pixel_sampler import PixelSamplerConfig, PixelSampler
from neusky_tpu.data.datamanager import DataManager, DataManagerConfig
