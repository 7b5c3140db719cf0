from neusky_tpu.core.rays import (
    RayBundle,
    RaySamples,
    weights_and_transmittance_from_alphas,
    weights_from_densities,
)
from neusky_tpu.core.cameras import Cameras, CameraType
from neusky_tpu.core.scene import (
    SceneBox,
    aabb_collider,
    sphere_collider,
    contract_l2,
    contract_linf,
)
from neusky_tpu.core.spherical import (
    sph2cart,
    cart2sph,
    ray_sphere_intersection,
    random_points_on_unit_sphere,
    look_at_target,
    rot_z,
    icosphere_vertices,
)
from neusky_tpu.core.colour import linear_to_sRGB, sRGB_to_linear
