"""Small vector-math helpers over trailing-dim-3 arrays.

Replaces the reference's GLM usage (vec3/mat3/mat4 host math and GLSL vector
ops).  All functions are shape-polymorphic over leading batch dims and operate
on float32 arrays of shape (..., 3).  Safe normalization guards the
zero-vector case (GLSL normalize of 0 is UB; we return 0).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched dot product over the trailing axis; keeps no dims."""
    return jnp.sum(a * b, axis=-1)


def cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.cross(a, b)


def length(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(jnp.maximum(dot(a, a), 0.0))


def normalize(a: jnp.ndarray, eps: float = 1e-20) -> jnp.ndarray:
    return a * jax.lax.rsqrt(jnp.maximum(dot(a, a), eps))[..., None]


def reflect(incident: jnp.ndarray, normal: jnp.ndarray) -> jnp.ndarray:
    """GLSL reflect: i - 2*dot(n,i)*n."""
    return incident - 2.0 * dot(normal, incident)[..., None] * normal


def mix(a, b, t):
    """GLSL mix / lerp."""
    return a * (1.0 - t) + b * t


def transform_points(mat4: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply a (4,4) homogeneous transform to (..., 3) points."""
    return pts @ mat4[:3, :3].T + mat4[:3, 3]


def transform_dirs(mat4: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Apply the linear part of a (4,4) transform to (..., 3) directions."""
    return dirs @ mat4[:3, :3].T


def normal_matrix(mat4: jnp.ndarray) -> jnp.ndarray:
    """Inverse-transpose 3x3 for transforming normals.

    (Reference computes this per-hit in GLSL: closesthit.rchit:73-76.)
    """
    return jnp.linalg.inv(mat4[:3, :3]).T


def look_at_angles(position, look_at):
    """Yaw/pitch (degrees) of the direction from position to look_at.

    Matches the reference fly camera's angle convention
    (camera.cppm:84-86: pitch = asin(dir.y), yaw = atan2(dir.z, dir.x)).
    """
    import numpy as np

    d = np.asarray(look_at, np.float64) - np.asarray(position, np.float64)
    d = d / np.linalg.norm(d)
    pitch = np.degrees(np.arcsin(d[1]))
    yaw = np.degrees(np.arctan2(d[2], d[0]))
    return float(yaw), float(pitch)
