from neusky_tpu.sampling.proposal import (
    ProposalSamplerConfig,
    proposal_sample,
    uniform_lindisp_samples,
    pdf_sample_bins,
    anneal_bias,
)
from neusky_tpu.sampling.illumination import (
    IcosahedronSampler,
    EquirectangularSampler,
)
from neusky_tpu.sampling.ddf_sampler import (
    DDFSamplerConfig,
    uniform_ddf_samples,
    vmf_ddf_samples,
    sample_vmf,
)
