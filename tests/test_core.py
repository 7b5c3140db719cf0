"""Unit tests for neusky_tpu.core — closed-form checks of ray/sphere math,
compositing, cameras, contraction, colour."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neusky_tpu.core import (
    Cameras,
    CameraType,
    RayBundle,
    SceneBox,
    aabb_collider,
    cart2sph,
    contract_l2,
    contract_linf,
    icosphere_vertices,
    linear_to_sRGB,
    look_at_target,
    ray_sphere_intersection,
    random_points_on_unit_sphere,
    rot_z,
    sph2cart,
    sphere_collider,
    sRGB_to_linear,
    weights_and_transmittance_from_alphas,
)
from neusky_tpu.core.rays import render_depth, render_accumulation, RaySamples


def test_sph_cart_roundtrip():
    rng = jax.random.PRNGKey(0)
    pts = random_points_on_unit_sphere(rng, 100)
    assert np.allclose(np.linalg.norm(pts, axis=-1), 1.0, atol=1e-5)
    theta, phi = cart2sph(pts)
    back = sph2cart(theta, phi)
    assert np.allclose(back, pts, atol=1e-5)


def test_ray_sphere_intersection_inside():
    # from the centre, intersection is at radius along direction
    o = jnp.zeros((4, 3))
    d = jnp.array([[1.0, 0, 0], [0, 1, 0], [0, 0, 1], [0, 0, -1]])
    p = ray_sphere_intersection(o, d, 2.0)
    assert np.allclose(np.linalg.norm(p, axis=-1), 2.0, atol=1e-5)
    assert np.allclose(p, 2.0 * d, atol=1e-5)


def test_ray_sphere_intersection_off_center():
    o = jnp.array([[0.5, 0.0, 0.0]])
    d = jnp.array([[1.0, 0.0, 0.0]])
    p = ray_sphere_intersection(o, d, 1.0)
    assert np.allclose(p, [[1.0, 0.0, 0.0]], atol=1e-5)


def test_weights_from_alphas():
    alphas = jnp.array([[[0.5], [0.5], [1.0]]])  # [1, 3, 1]
    w, t = weights_and_transmittance_from_alphas(alphas)
    # w0 = 0.5, w1 = 0.5*0.5, w2 = 1.0 * 0.25
    assert np.allclose(w[0, :, 0], [0.5, 0.25, 0.25], atol=1e-5)
    # bg transmittance = prod(1 - a) = 0
    assert np.allclose(t[0, -1, 0], 0.0, atol=1e-5)
    assert np.allclose(render_accumulation(w)[0, 0], 1.0, atol=1e-5)


def test_opaque_surface_depth():
    n, s = 2, 8
    starts = jnp.tile(jnp.linspace(0.0, 7.0, s)[None, :, None], (n, 1, 1))
    ends = starts + 1.0
    rs = RaySamples(
        origins=jnp.zeros((n, s, 3)),
        directions=jnp.ones((n, s, 3)),
        starts=starts,
        ends=ends,
        pixel_area=jnp.ones((n, s, 1)),
        camera_indices=jnp.zeros((n, s, 1), jnp.int32),
        deltas=ends - starts,
        spacing_starts=starts / 8.0,
        spacing_ends=ends / 8.0,
    )
    # all weight on sample 3
    w = jnp.zeros((n, s, 1)).at[:, 3, 0].set(1.0)
    d = render_depth(w, rs)
    assert np.allclose(d[:, 0], 3.5, atol=1e-5)


def test_aabb_collider():
    aabb = jnp.array([[-1.0, -1, -1], [1, 1, 1]])
    rb = RayBundle.create(
        origins=jnp.array([[-2.0, 0, 0]]), directions=jnp.array([[1.0, 0, 0]])
    )
    rb = aabb_collider(rb, aabb, near_plane=0.05)
    assert np.allclose(rb.nears[0, 0], 1.0, atol=1e-5)
    assert np.allclose(rb.fars[0, 0], 3.0, atol=1e-5)


def test_sphere_collider():
    rb = RayBundle.create(
        origins=jnp.array([[0.0, 0, 0], [5.0, 0, 0]]),
        directions=jnp.array([[1.0, 0, 0], [0.0, 1, 0]]),
    )
    rb = sphere_collider(rb, radius=1.0, near_plane=0.05)
    assert np.allclose(rb.fars[0, 0], 1.0, atol=1e-5)
    # second ray misses: degenerate interval
    assert rb.fars[1, 0] - rb.nears[1, 0] < 1e-3


def test_contraction():
    inside = jnp.array([[0.5, 0.0, 0.0]])
    assert np.allclose(contract_l2(inside), inside)
    far = jnp.array([[100.0, 0.0, 0.0]])
    c = contract_l2(far)
    assert np.linalg.norm(c) < 2.0
    assert np.linalg.norm(contract_l2(jnp.array([[1e6, 0, 0]]))) < 2.0 + 1e-4
    # linf: cube-shaped contraction
    c2 = contract_linf(jnp.array([[3.0, 3.0, 3.0]]))
    assert np.max(np.abs(c2)) < 2.0


def test_srgb_roundtrip():
    x = jnp.linspace(0.0, 1.0, 64).reshape(-1, 1)
    srgb = linear_to_sRGB(x)
    back = sRGB_to_linear(srgb)
    assert np.allclose(back, x, atol=1e-4)
    # reference piecewise values
    assert np.allclose(linear_to_sRGB(jnp.array([0.0])), [0.0])
    assert np.allclose(linear_to_sRGB(jnp.array([1.0])), [1.0], atol=1e-6)


def test_look_at():
    cam = jnp.array([[0.0, -3.0, 0.0]])
    target = jnp.zeros((1, 3))
    c2w = look_at_target(cam, target)
    # forward column (-z view dir) points away from target: -y→ forward = (0,-1,0)
    assert np.allclose(c2w[0, :3, 2], [0, -1, 0], atol=1e-5)
    assert np.allclose(c2w[0, :3, 3], cam[0], atol=1e-5)
    # columns orthonormal
    R = np.array(c2w[0, :3, :3])
    assert np.allclose(R.T @ R, np.eye(3), atol=1e-5)


def test_rot_z():
    R = rot_z(jnp.pi / 2)
    assert np.allclose(R @ jnp.array([1.0, 0, 0]), [0, 1, 0], atol=1e-6)


def test_icosphere():
    for order, n in [(1, 12), (2, 42), (7, 492)]:
        v = icosphere_vertices(order)
        assert v.shape == (n, 3), (order, v.shape)
        assert np.allclose(np.linalg.norm(v, axis=-1), 1.0, atol=1e-6)


def test_perspective_camera_rays():
    c2w = jnp.eye(4)[None, :3, :]  # identity: camera at origin looking -z
    cams = Cameras(
        camera_to_worlds=c2w,
        fx=jnp.array([100.0]),
        fy=jnp.array([100.0]),
        cx=jnp.array([50.0]),
        cy=jnp.array([50.0]),
        width=100,
        height=100,
        camera_type=int(CameraType.PERSPECTIVE),
    )
    rb = cams.generate_rays(0)
    assert rb.origins.shape == (10000, 3)
    assert np.allclose(np.linalg.norm(rb.directions, axis=-1), 1.0, atol=1e-5)
    # centre pixel looks straight down -z
    centre = rb.directions.reshape(100, 100, 3)[50, 50]
    assert centre[2] < -0.99
    # top row should look up (+y)
    top = rb.directions.reshape(100, 100, 3)[0, 50]
    assert top[1] > 0.3


def test_equirect_camera_rays():
    c2w = jnp.eye(4)[None, :3, :]
    H, W = 32, 64
    cams = Cameras(
        camera_to_worlds=c2w,
        fx=jnp.array([1.0]),
        fy=jnp.array([1.0]),
        cx=jnp.array([W / 2.0]),
        cy=jnp.array([H / 2.0]),
        width=W,
        height=H,
        camera_type=int(CameraType.EQUIRECTANGULAR),
    )
    rb = cams.generate_rays(0)
    dirs = np.array(rb.directions.reshape(H, W, 3))
    assert np.allclose(np.linalg.norm(dirs, axis=-1), 1.0, atol=1e-4)
    # top rows point up (+y in camera space), bottom rows point down
    assert dirs[0, :, 1].mean() > 0.9
    assert dirs[-1, :, 1].mean() < -0.9
