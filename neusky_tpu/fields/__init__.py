from neusky_tpu.fields.density_field import HashMLPDensityField, DensityFieldConfig
from neusky_tpu.fields.sdf_albedo import SDFAlbedoField, SDFAlbedoFieldConfig
from neusky_tpu.fields.ddf import DirectionalDistanceField, DDFFieldConfig
from neusky_tpu.fields.reni import RENIField, RENIFieldConfig
