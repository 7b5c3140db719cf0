"""Differentiable shading compositors: Lambertian and Blinn-Phong with
per-direction visibility.

TPU-native rebuild of the reference renderers
(``neusky/model_components/renderers.py:56-288``), preserving their exact
numerics — including the count-normalisation quirk at ``renderers.py:
100-106`` (the n·l sum is divided by the number of *lit* directions, not by
a solid-angle weight) — because training dynamics depend on it.

Layout: the reference flattens rays×samples; here we keep [N, S, ...] and
let the light-direction axis D be the contraction axis of one einsum so XLA
maps it onto the MXU.  Shading is linear in D, so D can be sharded and
psum-reduced across a mesh axis (see ``parallel/``) without changing the
result.

No packed-sample path is needed: shapes are static, so the dense
``sum(weights · radiance)`` branch (``renderers.py:122-123``) is always
exact.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from neusky_tpu.core.colour import linear_to_sRGB


def lambertian_composite(
    albedos: jnp.ndarray,  # [N, S, 3]
    normals: jnp.ndarray,  # [N, S, 3]
    light_directions: jnp.ndarray,  # [D, 3]
    light_colours: jnp.ndarray,  # [N, D, 3]  (per-ray HDR illumination)
    visibility: Optional[jnp.ndarray],  # [N, S, D] or [N, 1, D] or None
    background_illumination: jnp.ndarray,  # [N, 3]
    weights: jnp.ndarray,  # [N, S, 1]
    clip_output: bool = False,
) -> jnp.ndarray:
    """Composite sRGB pixel colour (``renderers.py:59-130`` semantics).

    Per sample: shade = Σ_d albedo · clamp(n·l_d) / count_lit · vis_d · L_d,
    then volume-composite with the sky as background, then linear→sRGB.
    ``clip_output=True`` reproduces the eval-time clamp
    (``renderers.py:173-174``).
    """
    # n·l over directions: [N, S, D]
    dot = jnp.einsum("nsi,di->nsd", normals, light_directions)
    dot = jnp.clip(dot, 0.0, 1.0)

    count = jnp.sum((dot > 0).astype(dot.dtype), axis=-1, keepdims=True)  # [N,S,1]
    count = jnp.where(count > 0, count, 1.0)
    dot = dot / count

    if visibility is not None:
        dot = dot * visibility  # broadcast [N,1,D] or [N,S,D]

    # colour_c = albedo_c · Σ_d dot_d · L_{d,c}   (``renderers.py:113``)
    radiance = albedos * jnp.einsum("nsd,ndc->nsc", dot, light_colours)  # [N,S,3]

    comp_rgb = jnp.sum(weights * radiance, axis=-2)  # [N, 3]
    acc = jnp.sum(weights, axis=-2)  # [N, 1]
    comp_rgb = comp_rgb + background_illumination * (1.0 - acc)
    comp_rgb = linear_to_sRGB(comp_rgb)
    if clip_output:
        comp_rgb = jnp.clip(comp_rgb, 0.0, 1.0)
    return comp_rgb


def blinn_phong_composite(
    albedos: jnp.ndarray,  # [N, S, 3]
    normals: jnp.ndarray,  # [N, S, 3]
    light_directions: jnp.ndarray,  # [D, 3]
    light_colours: jnp.ndarray,  # [N, D, 3]
    visibility: Optional[jnp.ndarray],  # [N, S, D] or None
    background_illumination: jnp.ndarray,  # [N, 3]
    weights: jnp.ndarray,  # [N, S, 1]
    shininess: jnp.ndarray,  # [N, S, 1]
    view_dirs_world: jnp.ndarray,  # [N, 3]  (from c2w · [0,0,-1])
    clip_output: bool = False,
) -> jnp.ndarray:
    """Blinn-Phong variant (``renderers.py:179-253``): adds a half-vector
    specular lobe with per-sample shininess; no count normalisation (matches
    the reference, which sums raw contributions at ``renderers.py:237-239``).
    """
    # half vectors between each light direction and the view direction
    h = light_directions[None, :, :] + view_dirs_world[:, None, :]  # [N, D, 3]
    h = h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-12)

    dot_nl = jnp.clip(jnp.einsum("nsi,di->nsd", normals, light_directions), 0.0, 1.0)
    dot_nh = jnp.clip(jnp.einsum("nsi,ndi->nsd", normals, h), 0.0, 1.0)

    if visibility is not None:
        lit = light_colours[:, None, :, :] * visibility[..., None]  # [N,S,D,3]
    else:
        lit = jnp.broadcast_to(
            light_colours[:, None, :, :],
            (albedos.shape[0], albedos.shape[1]) + light_colours.shape[1:],
        )

    diffuse = albedos[:, :, None, :] * dot_nl[..., None]  # [N,S,D,3]
    # shininess [N,S,1] broadcasts over the direction axis of dot_nh [N,S,D]
    specular = jnp.power(jnp.maximum(dot_nh, 1e-6), shininess)[..., None]  # [N,S,D,1]
    radiance = jnp.sum(lit * (diffuse + specular), axis=2)  # [N,S,3]

    comp_rgb = jnp.sum(weights * radiance, axis=-2)
    acc = jnp.sum(weights, axis=-2)
    comp_rgb = comp_rgb + background_illumination * (1.0 - acc)
    comp_rgb = linear_to_sRGB(comp_rgb)
    if clip_output:
        comp_rgb = jnp.clip(comp_rgb, 0.0, 1.0)
    return comp_rgb
