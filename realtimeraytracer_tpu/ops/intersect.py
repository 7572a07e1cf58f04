"""Ray-primitive intersection (Moller-Trumbore triangles, analytic spheres).

Capability parity targets: the hardware ``traceRayEXT`` closest-hit /
any-hit ray casts of the reference (shaders/raygen.rgen:99-107 primary,
:226-241 shadow with terminate-on-first-hit; the orphaned procedural sphere
path at shaders/intersect.rint + scene/sphere.cppm is promoted here to a
first-class analytic ray-sphere intersector per BASELINE.json).

TPU-first design: there is no RT core, so intersection is a *vectorized batch
problem*: R rays x T triangles.  Rather than per-ray pointer chasing, the
brute-force path streams triangle chunks through a ``lax.scan`` keeping a
running closest-hit record per ray — static shapes, no divergence, pure VPU
math that XLA fuses into a handful of elementwise kernels.  The BVH path
(ops/bvh.py, ops/traversal.py) uses the same chunk primitive at its leaves.

All math is float32 (never bf16: SURVEY.md §7 "numerics parity").
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from realtimeraytracer_tpu.ops.vecmath import cross, dot

# numpy scalar, NOT jnp: a module-scope jnp constant initializes the XLA
# backend at import time, which breaks jax.distributed.initialize for every
# importer (tests/test_multihost.py found this).
import numpy as _np

BIG_T = _np.float32(3.0e38)


class HitRecord(NamedTuple):
    """Closest-hit result for a batch of rays (all fields shape (R,))."""

    t: jnp.ndarray        # hit distance (BIG_T if miss)
    prim_id: jnp.ndarray  # triangle index into the global soup (-1 if miss)
    u: jnp.ndarray        # barycentric u (weight of v1)
    v: jnp.ndarray        # barycentric v (weight of v2)
    # Instance id for shared-geometry scenes (render/hier_backend.py);
    # None on non-instanced paths, -1 for misses/spheres.
    inst: jnp.ndarray | None = None

    @property
    def hit(self) -> jnp.ndarray:
        return self.prim_id >= 0


def ray_triangle(o, d, v0, v1, v2, eps: float = 1e-9):
    """Moller-Trumbore. Broadcasts over any matching batch shape.

    Returns (t, u, v, valid); t is +inf-like where invalid.  Backface hits
    are reported (the reference traces with no cull flags, raygen.rgen:101).
    """
    e1 = v1 - v0
    e2 = v2 - v0
    pvec = cross(d, e2)
    det = dot(e1, pvec)
    valid = jnp.abs(det) > eps
    inv_det = jnp.where(valid, 1.0 / jnp.where(valid, det, 1.0), 0.0)
    tvec = o - v0
    u = dot(tvec, pvec) * inv_det
    qvec = cross(tvec, e1)
    v = dot(d, qvec) * inv_det
    t = dot(e2, qvec) * inv_det
    valid = valid & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
    t = jnp.where(valid, t, BIG_T)
    return t, u, v, valid


def ray_sphere(o, d, center, radius):
    """Analytic ray-sphere intersection; returns (t, valid) for nearest root.

    Solves |o + t d - c|^2 = r^2 assuming |d| = 1.  Picks the smallest
    positive root (front or inside hit).
    """
    oc = o - center
    b = dot(oc, d)
    c = dot(oc, oc) - radius * radius
    disc = b * b - c
    valid = disc >= 0.0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0 = -b - sq
    t1 = -b + sq
    t = jnp.where(t0 > 0.0, t0, t1)
    valid = valid & (t > 0.0)
    return jnp.where(valid, t, BIG_T), valid


def as_per_ray(x, r) -> jnp.ndarray:
    """Broadcast a scalar-or-(R,) ray-interval bound to (R,) f32."""
    return jnp.broadcast_to(jnp.asarray(x, jnp.float32), (r,))


def _chunk_closest(o, d, tri_v0, tri_v1, tri_v2, tri_base, t_min, t_max):
    """Closest hit of R rays against one triangle chunk. Shapes: o,d (R,3);
    tri_* (C,3); t_min/t_max (R,). Returns per-ray (t, local_id, u, v)."""
    t, u, v, valid = ray_triangle(
        o[:, None, :], d[:, None, :], tri_v0[None], tri_v1[None], tri_v2[None]
    )  # (R, C)
    valid = valid & (t >= t_min[:, None]) & (t <= t_max[:, None])
    t = jnp.where(valid, t, BIG_T)
    idx = jnp.argmin(t, axis=1)
    r = jnp.arange(t.shape[0])
    tb, ub, vb = t[r, idx], u[r, idx], v[r, idx]
    prim = jnp.where(tb < BIG_T, tri_base + idx, -1)
    return tb, prim, ub, vb


def intersect_tris_bruteforce(
    origins: jnp.ndarray,
    dirs: jnp.ndarray,
    vertices: jnp.ndarray,
    faces: jnp.ndarray,
    t_min: float,
    t_max: float,
    chunk: int = 512,
) -> HitRecord:
    """Closest-hit of all rays against a whole triangle soup.

    vertices: (V, 3) f32; faces: (T, 3) int32.  Triangles are streamed in
    chunks via lax.scan so peak memory is O(R * chunk) regardless of T.
    The face array is padded with degenerate (0,0,0) triangles to a chunk
    multiple; degenerates never report valid hits (det ~ 0).  t_min/t_max
    may be scalars or per-ray (R,).
    """
    R = origins.shape[0]
    t_min = as_per_ray(t_min, R)
    t_max = as_per_ray(t_max, R)
    T = faces.shape[0]
    n_chunks = max(1, -(-T // chunk))
    pad = n_chunks * chunk - T
    faces_p = jnp.pad(faces, ((0, pad), (0, 0)))  # pads with vertex 0 -> degenerate
    tv = vertices[faces_p]  # (Tp, 3, 3)
    tv = tv.reshape(n_chunks, chunk, 3, 3)

    def body(carry, xs):
        best_t, best_id, best_u, best_v = carry
        tri_v, base = xs
        t, prim, u, v = _chunk_closest(
            origins, dirs, tri_v[:, 0], tri_v[:, 1], tri_v[:, 2], base, t_min, t_max
        )
        closer = t < best_t
        carry = (
            jnp.where(closer, t, best_t),
            jnp.where(closer, prim, best_id),
            jnp.where(closer, u, best_u),
            jnp.where(closer, v, best_v),
        )
        return carry, None

    # Derive carries from the ray arrays so their varying-axis type matches
    # the body outputs under shard_map (see jax shard_map VMA docs).
    zero_r = jnp.zeros_like(origins[:, 0])
    init = (
        zero_r + BIG_T,
        zero_r.astype(jnp.int32) - 1,
        zero_r,
        zero_r,
    )
    bases = (jnp.arange(n_chunks, dtype=jnp.int32) * chunk)
    (t, pid, u, v), _ = jax.lax.scan(body, init, (tv, bases))
    return HitRecord(t=t, prim_id=pid.astype(jnp.int32), u=u, v=v)


def occluded_tris_bruteforce(
    origins: jnp.ndarray,
    dirs: jnp.ndarray,
    vertices: jnp.ndarray,
    faces: jnp.ndarray,
    t_min: float,
    t_max: jnp.ndarray,
    chunk: int = 512,
) -> jnp.ndarray:
    """Any-hit query: True where some triangle lies in [t_min, t_max).

    The semantic twin of the reference's shadow rays with
    gl_RayFlagsTerminateOnFirstHitEXT | SkipClosestHit (raygen.rgen:233-241).
    t_min/t_max may be scalars or per-ray (R,).
    """
    R = origins.shape[0]
    T = faces.shape[0]
    n_chunks = max(1, -(-T // chunk))
    pad = n_chunks * chunk - T
    faces_p = jnp.pad(faces, ((0, pad), (0, 0)))
    tv = vertices[faces_p].reshape(n_chunks, chunk, 3, 3)
    t_min = as_per_ray(t_min, R)
    t_max = as_per_ray(t_max, R)

    def body(occ, tri_v):
        t, _, _, valid = ray_triangle(
            origins[:, None, :], dirs[:, None, :],
            tri_v[None, :, 0], tri_v[None, :, 1], tri_v[None, :, 2],
        )
        hit_any = jnp.any(
            valid & (t >= t_min[:, None]) & (t < t_max[:, None]), axis=1)
        return occ | hit_any, None

    occ, _ = jax.lax.scan(body, jnp.zeros_like(origins[:, 0], bool), tv)
    return occ


def intersect_spheres(
    origins: jnp.ndarray,
    dirs: jnp.ndarray,
    centers: jnp.ndarray,
    radii: jnp.ndarray,
    t_min: float,
    t_max: float,
) -> HitRecord:
    """Closest-hit against a (small) list of analytic spheres.

    prim_id indexes the sphere list.  Sphere counts are small (the reference's
    procedural-geometry path had exactly one), so a full broadcast is fine.
    t_min/t_max may be scalars or per-ray (R,).
    """
    R = origins.shape[0]
    t_min = as_per_ray(t_min, R)
    t_max = as_per_ray(t_max, R)
    t, valid = ray_sphere(origins[:, None, :], dirs[:, None, :], centers[None], radii[None])
    valid = valid & (t >= t_min[:, None]) & (t <= t_max[:, None])
    t = jnp.where(valid, t, BIG_T)
    idx = jnp.argmin(t, axis=1)
    r = jnp.arange(R)
    tb = t[r, idx]
    prim = jnp.where(tb < BIG_T, idx, -1).astype(jnp.int32)
    return HitRecord(t=tb, prim_id=prim, u=jnp.zeros((R,)), v=jnp.zeros((R,)))
