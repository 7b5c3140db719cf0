from neusky_tpu.ops.encodings import nerf_encoding, sh_encoding, nerf_encoding_dim
from neusky_tpu.ops.hashgrid import HashGridConfig, HashGridEncoding
