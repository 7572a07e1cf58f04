"""Stackless vectorized BVH traversal — the TPU traceRayEXT.

Replaces the reference's hardware BVH traversal (traceRayEXT over TLAS/BLAS,
raygen.rgen:99-107; AS built at blas.cppm/tlas.cppm).  Design (see
ops/bvh.py for the build):

  * one lax.while_loop advances ALL rays in lock-step; each ray's state is
    just its DFS node index (threaded/skip-link traversal — no stacks);
  * on an AABB hit the ray descends (node+1); otherwise it follows the
    node's skip link; a leaf tests `leaf_size` CONSECUTIVE Morton-sorted
    triangles (dense gather) then follows its skip link;
  * closest-hit prunes AABBs against the running best t; the occlusion
    variant parks a ray at the end sentinel as soon as any hit lands in
    [t_min, t_max) — the analogue of gl_RayFlagsTerminateOnFirstHitEXT
    (raygen.rgen:233).

All control flow is masked vector math inside the while body, so the XLA
program is a fixed sequence of gathers + VPU ops per step; the loop ends
when every lane reaches the sentinel (or after cfg.max_traversal_steps).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from realtimeraytracer_tpu.config import RenderConfig
from realtimeraytracer_tpu.ops import intersect
from realtimeraytracer_tpu.ops.intersect import BIG_T, HitRecord
from realtimeraytracer_tpu.render.backends import TraceBackend, _merge_sphere_hits
from realtimeraytracer_tpu.scene.gpu_scene import GPUScene


def _ray_aabb(o, inv_d, bmin, bmax, t_lo, t_hi):
    """Slab test; true where the box overlaps [t_lo, t_hi]."""
    t0 = (bmin - o) * inv_d
    t1 = (bmax - o) * inv_d
    tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
    return (tn <= tf) & (tf >= t_lo) & (tn <= t_hi)


def _leaf_test(gpu: GPUScene, leaf_first, leaf_count, o, d, leaf_size,
               t_lo, t_hi):
    """Test up to leaf_size consecutive sorted triangles per ray.

    Returns (t, sorted_id, u, v) of each ray's best hit in this leaf.
    """
    T = gpu.bvh_tri_v0.shape[0]
    offs = jnp.arange(leaf_size, dtype=jnp.int32)[None, :]       # (1, L)
    ids = jnp.clip(leaf_first[:, None] + offs, 0, T - 1)          # (R, L)
    in_leaf = offs < leaf_count[:, None]
    v0 = gpu.bvh_tri_v0[ids]
    v1 = gpu.bvh_tri_v1[ids]
    v2 = gpu.bvh_tri_v2[ids]
    t, u, v, ok = intersect.ray_triangle(o[:, None, :], d[:, None, :], v0, v1, v2)
    ok = ok & in_leaf & (t >= t_lo[:, None]) & (t <= t_hi[:, None])
    t = jnp.where(ok, t, BIG_T)
    j = jnp.argmin(t, axis=1)
    r = jnp.arange(t.shape[0])
    tb = t[r, j]
    sid = jnp.where(tb < BIG_T, ids[r, j], -1)
    return tb, sid, u[r, j], v[r, j]


def traverse_closest(gpu: GPUScene, cfg: RenderConfig, origins, dirs,
                     t_min, t_max, return_stats: bool = False):
    R = origins.shape[0]
    N = gpu.bvh_node_min.shape[0]
    leaf_size = max(cfg.bvh_leaf_size, 1)  # must match the compile-time build
    inv_d = jnp.where(jnp.abs(dirs) > 1e-12, 1.0 / dirs, jnp.sign(dirs) * 1e12 + 1e12)
    tmin_v = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (R,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (R,))

    def cond(state):
        node, best_t, best_p, best_u, best_v, step = state
        return jnp.logical_and(jnp.any(node < N), step < cfg.max_traversal_steps)

    def body(state):
        node, best_t, best_p, best_u, best_v, step = state
        active = node < N
        nc = jnp.clip(node, 0, N - 1)
        bmin = gpu.bvh_node_min[nc]
        bmax = gpu.bvh_node_max[nc]
        skip = gpu.bvh_node_skip[nc]
        count = gpu.bvh_node_count[nc]
        first = gpu.bvh_node_first[nc]

        t_hi = jnp.minimum(best_t, t_max)
        box_hit = _ray_aabb(origins, inv_d, bmin, bmax, tmin_v, t_hi) & active
        is_leaf = (count > 0) & box_hit

        lt, lp, lu, lv = _leaf_test(
            gpu, first, jnp.where(is_leaf, count, 0), origins, dirs,
            leaf_size, tmin_v, t_hi,
        )
        better = is_leaf & (lt < best_t)
        best_t = jnp.where(better, lt, best_t)
        best_p = jnp.where(better, lp, best_p)
        best_u = jnp.where(better, lu, best_u)
        best_v = jnp.where(better, lv, best_v)

        descend = box_hit & (count == 0)
        nxt = jnp.where(descend, node + 1, skip)
        node = jnp.where(active, nxt, node)
        return node, best_t, best_p, best_u, best_v, step + 1

    zero_r = jnp.zeros_like(origins[:, 0])  # varying-axis-typed carry seed
    init = (
        zero_r.astype(jnp.int32),
        zero_r + BIG_T,
        zero_r.astype(jnp.int32) - 1,
        zero_r,
        zero_r,
        jnp.int32(0),
    )
    node, best_t, best_p, best_u, best_v, steps = jax.lax.while_loop(
        cond, body, init)
    # Map sorted ids back to original triangle ids for the soup tables.
    orig = jnp.where(best_p >= 0, gpu.bvh_tri_id[jnp.clip(best_p, 0, None)], -1)
    hit = HitRecord(t=best_t, prim_id=orig.astype(jnp.int32), u=best_u, v=best_v)
    if return_stats:
        # Lanes still inside the tree (node < N) at exit were clipped by
        # max_traversal_steps — their hits may be silently wrong.
        return hit, {"cap_clipped": jnp.sum((node < N).astype(jnp.int32)),
                     "steps": steps, "cap": cfg.max_traversal_steps}
    return hit


def traverse_occluded(gpu: GPUScene, cfg: RenderConfig, origins, dirs,
                      t_min, t_max, return_stats: bool = False):
    """Any-hit query with per-lane early termination."""
    R = origins.shape[0]
    N = gpu.bvh_node_min.shape[0]
    leaf_size = cfg.bvh_leaf_size
    inv_d = jnp.where(jnp.abs(dirs) > 1e-12, 1.0 / dirs, jnp.sign(dirs) * 1e12 + 1e12)
    t_max = jnp.broadcast_to(t_max, (R,)).astype(jnp.float32)
    tmin_v = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (R,))

    def cond(state):
        node, occ, step = state
        return jnp.logical_and(jnp.any(node < N), step < cfg.max_traversal_steps)

    def body(state):
        node, occ, step = state
        active = node < N
        nc = jnp.clip(node, 0, N - 1)
        bmin = gpu.bvh_node_min[nc]
        bmax = gpu.bvh_node_max[nc]
        skip = gpu.bvh_node_skip[nc]
        count = gpu.bvh_node_count[nc]
        first = gpu.bvh_node_first[nc]

        box_hit = _ray_aabb(origins, inv_d, bmin, bmax, tmin_v, t_max) & active
        is_leaf = (count > 0) & box_hit
        lt, lp, _, _ = _leaf_test(
            gpu, first, jnp.where(is_leaf, count, 0), origins, dirs,
            leaf_size, tmin_v, t_max,
        )
        found = is_leaf & (lp >= 0) & (lt < t_max)
        occ = occ | found

        descend = box_hit & (count == 0)
        nxt = jnp.where(descend, node + 1, skip)
        nxt = jnp.where(found, N, nxt)      # early out: park at sentinel
        node = jnp.where(active, nxt, node)
        return node, occ, step + 1

    zero_r = jnp.zeros_like(origins[:, 0])
    init = (zero_r.astype(jnp.int32), zero_r.astype(bool), jnp.int32(0))
    node, occ, steps = jax.lax.while_loop(cond, body, init)
    if return_stats:
        return occ, {"cap_clipped": jnp.sum((node < N).astype(jnp.int32)),
                     "steps": steps, "cap": cfg.max_traversal_steps}
    return occ


def make_bvh_backend(gpu: GPUScene, cfg: RenderConfig) -> TraceBackend:
    """Straight-through gradients: lax.while_loop has no reverse rule, and
    the hit SEARCH is discrete anyway — so inputs are stop_gradient'ed here
    and render/surface.py recomputes the continuous hit quantities
    differentiably from the selected primitive (SURVEY.md §7 "custom VJP
    through discrete traversal")."""
    num_tris = gpu.faces.shape[0]
    num_spheres = gpu.sph_center.shape[0]
    sg = jax.lax.stop_gradient

    def closest(origins, dirs, t_min, t_max, common=None):
        origins, dirs = sg(origins), sg(dirs)
        hit = traverse_closest(sg(gpu), cfg, origins, dirs, t_min, t_max)
        if num_spheres:
            sph = intersect.intersect_spheres(
                origins, dirs, gpu.sph_center, gpu.sph_radius, t_min, t_max
            )
            hit = _merge_sphere_hits(hit, sph, num_tris)
        return hit

    def occluded(origins, dirs, t_min, t_max, common=None):
        origins, dirs, t_max = sg(origins), sg(dirs), sg(t_max)
        occ = traverse_occluded(sg(gpu), cfg, origins, dirs, t_min, t_max)
        if num_spheres:
            sph = intersect.intersect_spheres(
                origins, dirs, gpu.sph_center, gpu.sph_radius, t_min, jnp.inf
            )
            occ = occ | (sph.t < jnp.broadcast_to(t_max, sph.t.shape))
        return occ

    return TraceBackend(closest=closest, occluded=occluded,
                        num_tris=num_tris, num_spheres=num_spheres)
