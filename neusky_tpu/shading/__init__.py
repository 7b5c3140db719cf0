from neusky_tpu.shading.lambertian import (
    lambertian_composite,
    blinn_phong_composite,
)
