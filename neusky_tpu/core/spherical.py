"""Sphere math: coordinate transforms, ray-sphere intersection, icosphere.

TPU-native re-implementations of the helpers in
``/root/reference/neusky/utils/utils.py`` plus an in-repo icosphere
generator (the reference depends on the external ``icosphere`` package,
``model_components/illumination_samplers.py:97``).
All functions are pure, fixed-shape, and jit-safe.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


def sph2cart(theta: jnp.ndarray, phi: jnp.ndarray) -> jnp.ndarray:
    """Spherical → cartesian with z-up (``utils.py:95-99``).

    theta: azimuth, phi: polar angle from +z.  Returns [..., 3].
    """
    x = jnp.sin(phi) * jnp.cos(theta)
    y = jnp.sin(phi) * jnp.sin(theta)
    z = jnp.cos(phi)
    return jnp.stack([x, y, z], axis=-1)


def cart2sph(xyz: jnp.ndarray):
    """Cartesian → (theta, phi) (``utils.py:102-106``)."""
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    r = jnp.sqrt(x**2 + y**2 + z**2)
    theta = jnp.arctan2(y, x)
    phi = jnp.arccos(jnp.clip(z / jnp.maximum(r, 1e-12), -1.0, 1.0))
    return theta, phi


def random_points_on_unit_sphere(rng: jax.Array, num_points: int) -> jnp.ndarray:
    """Uniform points on S² (``utils.py:33-46``): theta ~ U[0,2π),
    cos(phi) ~ U[-1,1]."""
    k_t, k_p = jax.random.split(rng)
    theta = 2.0 * jnp.pi * jax.random.uniform(k_t, (num_points,))
    phi = jnp.arccos(2.0 * jax.random.uniform(k_p, (num_points,)) - 1.0)
    return sph2cart(theta, phi)


def random_inward_facing_directions(
    rng: jax.Array, num_directions: int, normals: jnp.ndarray
) -> jnp.ndarray:
    """For each normal [P,3], sample directions in its hemisphere
    (``utils.py:49-65``): sample uniformly on the sphere, negate those with
    negative dot product — fixed-shape via ``jnp.where``."""
    num_p = normals.shape[0]
    dirs = random_points_on_unit_sphere(rng, num_directions * num_p)
    dirs = dirs.reshape(num_p, num_directions, 3)
    dots = jnp.sum(normals[:, None, :] * dirs, axis=-1, keepdims=True)
    return jnp.where(dots < 0, -dirs, dirs)


def ray_sphere_intersection(
    positions: jnp.ndarray, directions: jnp.ndarray, radius
) -> jnp.ndarray:
    """Intersection point of rays with an origin-centred sphere, taking the
    positive root (rays assumed to start inside the sphere).

    Matches ``neusky_model.py:1590-1622`` including the clamp of the
    discriminant to ≥0 and the normalisation of directions.
    positions/directions: [..., 3]; returns [..., 3].
    """
    directions = directions / jnp.linalg.norm(directions, axis=-1, keepdims=True)
    b = 2.0 * jnp.sum(directions * positions, axis=-1)
    c = jnp.sum(positions * positions, axis=-1) - radius**2
    disc = jnp.clip(b**2 - 4.0 * c, 0.0, None)
    sq = jnp.sqrt(disc)
    t0 = (-b - sq) / 2.0
    t1 = (-b + sq) / 2.0
    t = jnp.maximum(t0, t1)
    return positions + t[..., None] * directions


def look_at_target(
    camera_positions: jnp.ndarray,
    target_positions: jnp.ndarray,
    up_vector=(0.0, 0.0, 1.0),
) -> jnp.ndarray:
    """c2w matrices looking from camera positions at targets
    (``utils.py:109-129``; OpenGL convention, forward = -view dir).
    Returns [..., 4, 4]."""
    up = jnp.asarray(up_vector, dtype=camera_positions.dtype)

    def normalize(v):
        return v / jnp.linalg.norm(v, axis=-1, keepdims=True)

    forward = -normalize(target_positions - camera_positions)
    right = normalize(jnp.cross(jnp.broadcast_to(up, forward.shape), forward))
    actual_up = normalize(jnp.cross(forward, right))

    batch = camera_positions.shape[:-1]
    c2w = jnp.zeros(batch + (4, 4), dtype=camera_positions.dtype)
    c2w = c2w.at[..., :3, 0].set(right)
    c2w = c2w.at[..., :3, 1].set(actual_up)
    c2w = c2w.at[..., :3, 2].set(forward)
    c2w = c2w.at[..., :3, 3].set(camera_positions)
    c2w = c2w.at[..., 3, 3].set(1.0)
    return c2w


def rot_z(gamma: jnp.ndarray) -> jnp.ndarray:
    """Rotation about z (``utils.py:168-173``). gamma: scalar or [...]."""
    c, s = jnp.cos(gamma), jnp.sin(gamma)
    zeros = jnp.zeros_like(c)
    ones = jnp.ones_like(c)
    rows = jnp.stack(
        [
            jnp.stack([c, -s, zeros], axis=-1),
            jnp.stack([s, c, zeros], axis=-1),
            jnp.stack([zeros, zeros, ones], axis=-1),
        ],
        axis=-2,
    )
    return rows


def rotation_matrix_from_axis_angle(axis: np.ndarray, angle: float) -> np.ndarray:
    """Host-side axis-angle rotation (``utils.py:135-150``)."""
    axis = np.asarray(axis, dtype=np.float64)
    axis = axis / np.sqrt(np.dot(axis, axis))
    a = np.cos(angle / 2.0)
    b, c, d = -axis * np.sin(angle / 2.0)
    aa, bb, cc, dd = a * a, b * b, c * c, d * d
    bc, ad, ac, ab, bd, cd = b * c, a * d, a * c, a * b, b * d, c * d
    return np.array(
        [
            [aa + bb - cc - dd, 2 * (bc + ad), 2 * (bd - ac)],
            [2 * (bc - ad), aa + cc - bb - dd, 2 * (cd + ab)],
            [2 * (bd + ac), 2 * (cd - ab), aa + dd - bb - cc],
        ],
        dtype=np.float32,
    )


def random_rotation_matrix(rng: jax.Array) -> jnp.ndarray:
    """Uniform random SO(3) rotation (replaces scipy ``Rotation.random`` at
    ``illumination_samplers.py:113``), via a random unit quaternion."""
    q = jax.random.normal(rng, (4,))
    q = q / jnp.linalg.norm(q)
    w, x, y, z = q[0], q[1], q[2], q[3]
    return jnp.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
        ]
    )


@lru_cache(maxsize=16)
def icosphere_vertices(order: int) -> np.ndarray:
    """Vertices of an icosphere of subdivision ``order`` (host-side numpy).

    Replaces the external ``icosphere`` package used by the reference
    (``illumination_samplers.py:97``).  Vertex count = 10*order² + 2.
    Deterministic ordering; unit-norm; z-up.
    """
    t = (1.0 + np.sqrt(5.0)) / 2.0
    verts = np.array(
        [
            [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
            [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
            [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1],
        ],
        dtype=np.float64,
    )
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)
    faces = np.array(
        [
            [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
            [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
            [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
            [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
        ],
        dtype=np.int64,
    )
    if order <= 1:
        return verts.astype(np.float32)

    # n-frequency subdivision: split each edge into `order` segments and
    # triangulate each face barycentrically, deduplicating shared vertices.
    vert_list = [v for v in verts]
    key_to_idx = {tuple(np.round(v, 9)): i for i, v in enumerate(vert_list)}

    def get_idx(p):
        p = p / np.linalg.norm(p)
        key = tuple(np.round(p, 9))
        if key in key_to_idx:
            return key_to_idx[key]
        idx = len(vert_list)
        vert_list.append(p)
        key_to_idx[key] = idx
        return idx

    n = order
    for f in faces:
        a, b, c = verts[f[0]], verts[f[1]], verts[f[2]]
        for i in range(n + 1):
            for j in range(n + 1 - i):
                k = n - i - j
                p = (i * a + j * b + k * c) / n
                get_idx(p)
    out = np.stack(vert_list).astype(np.float32)
    return out
