"""Packet BVH traversal — coherent ray packets share one traversal.

The lane-per-ray traversal (render/bvh_backend.py) is gather-bound on TPU:
every step gathers node data at 2M divergent indices from HBM.  This
backend is the TPU-native answer, borrowed from classic SIMD "packet
tracing": rays are grouped into packets of `cfg.packet_size` coherent rays
(raster-order pixels / same-light shadow rays), and each PACKET — not each
ray — walks the skip-link BVH:

  * traversal state is ONE node index per packet -> the per-step gather
    shrinks by packet_size x (32k rows instead of 2M);
  * the packet descends if ANY of its rays overlaps the node AABB
    (speculative descent); box and triangle tests are dense (P, TILE)
    vector ops — exactly what the VPU wants;
  * node records are packed into (N, 8) f32 rows [min.xyz, max.xyz,
    bitcast(skip), bitcast(first*16+count)] so each step costs a single
    contiguous-row gather; triangles are packed (T, 9) [v0, e1, e2] for a
    precomputed-edge Moller-Trumbore at leaves.

Incoherent packets degrade gracefully (they visit the union of their rays'
nodes); primary and shadow rays — the workload that dominates this
renderer — are coherent by construction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from realtimeraytracer_tpu.config import RenderConfig
from realtimeraytracer_tpu.ops import intersect
from realtimeraytracer_tpu.ops.intersect import BIG_T, HitRecord
from realtimeraytracer_tpu.render.backends import TraceBackend, _merge_sphere_hits
from realtimeraytracer_tpu.scene.gpu_scene import GPUScene


def _pack_nodes(gpu: GPUScene) -> tuple[jnp.ndarray, jnp.ndarray]:
    """((N, 6) f32 boxes, (N, 2) i32 [skip, first*16+count]).

    Links must stay integer-typed: bitcasting small int32s into a float
    array turns them into denormals, which TPU hardware flushes to zero.
    """
    boxes = jnp.concatenate([gpu.bvh_node_min, gpu.bvh_node_max], axis=1)
    links = jnp.stack(
        [gpu.bvh_node_skip, gpu.bvh_node_first * 16 + gpu.bvh_node_count],
        axis=1,
    )
    return boxes, links


def _pack_tris(gpu: GPUScene) -> jnp.ndarray:
    """(T, 9) f32 rows [v0, e1, e2] in Morton-sorted order."""
    return jnp.concatenate(
        [gpu.bvh_tri_v0, gpu.bvh_tri_v1 - gpu.bvh_tri_v0,
         gpu.bvh_tri_v2 - gpu.bvh_tri_v0],
        axis=1,
    )


def _mt_packed(o, d, v0, e1, e2, eps=1e-9):
    """Moller-Trumbore with precomputed edges; broadcasts (..., 3) operands."""
    pvec = jnp.cross(d, e2)
    det = jnp.sum(e1 * pvec, -1)
    ok = jnp.abs(det) > eps
    inv = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
    tvec = o - v0
    u = jnp.sum(tvec * pvec, -1) * inv
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(d * qvec, -1) * inv
    t = jnp.sum(e2 * qvec, -1) * inv
    ok = ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
    return jnp.where(ok, t, BIG_T), u, v, ok


def _pad_packets(origins, dirs, tile):
    r = origins.shape[0]
    p = -(-r // tile)
    pad = p * tile - r
    if pad:
        origins = jnp.concatenate([origins, origins[:1].repeat(pad, 0)])
        dirs = jnp.concatenate([dirs, dirs[:1].repeat(pad, 0)])
    return origins.reshape(p, tile, 3), dirs.reshape(p, tile, 3), r, pad


def packet_closest(gpu: GPUScene, cfg: RenderConfig, origins, dirs,
                   t_min, t_max) -> HitRecord:
    tile = cfg.packet_size
    leaf = cfg.bvh_leaf_size
    n_nodes = gpu.bvh_node_min.shape[0]
    n_tris = gpu.bvh_tri_v0.shape[0]
    boxes, links = _pack_nodes(gpu)
    tris = _pack_tris(gpu)

    r = origins.shape[0]
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (r,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (r,))
    o, d, r_orig, pad = _pad_packets(origins, dirs, tile)
    if pad:
        t_min = jnp.concatenate([t_min, jnp.full((pad,), BIG_T, jnp.float32)])
        t_max = jnp.concatenate([t_max, jnp.full((pad,), -BIG_T, jnp.float32)])
    P = o.shape[0]
    tmin_p = t_min.reshape(P, tile)
    tmax_p = t_max.reshape(P, tile)
    inv_d = jnp.where(jnp.abs(d) > 1e-12, 1.0 / d, jnp.sign(d) * 1e12 + 1e12)

    zero_p = jnp.zeros_like(o[:, 0, 0])                       # (P,)
    zero_pt = jnp.zeros_like(o[:, :, 0])                      # (P, TILE)
    init = (
        zero_p.astype(jnp.int32),        # node per packet
        zero_pt + BIG_T,                 # best_t
        zero_pt.astype(jnp.int32) - 1,   # best sorted-tri id
        zero_pt,                         # u
        zero_pt,                         # v
        jnp.int32(0),
    )

    def cond(s):
        return jnp.logical_and(jnp.any(s[0] < n_nodes),
                               s[5] < cfg.max_traversal_steps)

    def body(s):
        # Unroll several serial skip-link steps per while iteration: the
        # loop's fixed overhead dominates the tiny per-step vector work.
        for _ in range(cfg.traversal_unroll):
            s = _step(s)
        return s

    def _step(s):
        node, best_t, best_p, best_u, best_v, step = s
        active = node < n_nodes
        nc = jnp.clip(node, 0, n_nodes - 1)
        rec = boxes[nc]                                        # (P, 6) gather
        lnk = links[nc]                                        # (P, 2) gather
        bmin = rec[:, None, 0:3]
        bmax = rec[:, None, 3:6]
        skip = lnk[:, 0]
        first = lnk[:, 1] >> 4
        count = lnk[:, 1] & 15

        t0 = (bmin - o) * inv_d
        t1 = (bmax - o) * inv_d
        tn = jnp.max(jnp.minimum(t0, t1), -1)                  # (P, TILE)
        tf = jnp.min(jnp.maximum(t0, t1), -1)
        ray_hit = (tn <= tf) & (tf >= tmin_p) & (tn <= jnp.minimum(best_t, tmax_p))
        box_hit = jnp.any(ray_hit, axis=1) & active            # (P,)

        is_leaf = (count > 0) & box_hit
        ids = jnp.clip(first[:, None] + jnp.arange(leaf, dtype=jnp.int32)[None],
                       0, n_tris - 1)                          # (P, L)
        in_leaf = (jnp.arange(leaf, dtype=jnp.int32)[None] <
                   jnp.where(is_leaf, count, 0)[:, None])      # (P, L)
        trow = tris[ids]                                       # (P, L, 9) gather
        tt, tu, tv, ok = _mt_packed(
            o[:, :, None, :], d[:, :, None, :],
            trow[:, None, :, 0:3], trow[:, None, :, 3:6], trow[:, None, :, 6:9],
        )                                                      # (P, TILE, L)
        ok = (ok & in_leaf[:, None, :] & (tt >= tmin_p[..., None])
              & (tt <= jnp.minimum(best_t, tmax_p)[..., None]))
        tt = jnp.where(ok, tt, BIG_T)
        j = jnp.argmin(tt, axis=2)                             # (P, TILE)
        tbest = jnp.take_along_axis(tt, j[..., None], 2)[..., 0]
        better = tbest < best_t
        sel_id = jnp.take_along_axis(
            jnp.broadcast_to(ids[:, None, :], tt.shape), j[..., None], 2
        )[..., 0]
        best_t = jnp.where(better, tbest, best_t)
        best_p = jnp.where(better, sel_id, best_p)
        best_u = jnp.where(better, jnp.take_along_axis(tu, j[..., None], 2)[..., 0], best_u)
        best_v = jnp.where(better, jnp.take_along_axis(tv, j[..., None], 2)[..., 0], best_v)

        descend = box_hit & (count == 0)
        nxt = jnp.where(descend, node + 1, skip)
        node = jnp.where(active, nxt, node)
        return node, best_t, best_p, best_u, best_v, step + 1

    _, best_t, best_p, best_u, best_v, _ = jax.lax.while_loop(cond, body, init)
    best_t = best_t.reshape(-1)[:r_orig]
    best_p = best_p.reshape(-1)[:r_orig]
    best_u = best_u.reshape(-1)[:r_orig]
    best_v = best_v.reshape(-1)[:r_orig]
    orig = jnp.where(best_p >= 0, gpu.bvh_tri_id[jnp.clip(best_p, 0, None)], -1)
    return HitRecord(t=best_t, prim_id=orig.astype(jnp.int32), u=best_u, v=best_v)


def packet_occluded(gpu: GPUScene, cfg: RenderConfig, origins, dirs,
                    t_min, t_max) -> jnp.ndarray:
    tile = cfg.packet_size
    leaf = cfg.bvh_leaf_size
    n_nodes = gpu.bvh_node_min.shape[0]
    n_tris = gpu.bvh_tri_v0.shape[0]
    boxes, links = _pack_nodes(gpu)
    tris = _pack_tris(gpu)

    r = origins.shape[0]
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (r,))
    t_max = jnp.broadcast_to(t_max, (r,)).astype(jnp.float32)
    o, d, r_orig, pad = _pad_packets(origins, dirs, tile)
    if pad:
        t_min = jnp.concatenate([t_min, jnp.full((pad,), BIG_T, jnp.float32)])
        t_max = jnp.concatenate([t_max, jnp.full((pad,), -1.0, jnp.float32)])
    P = o.shape[0]
    tmin_pk = t_min.reshape(P, tile)
    tmax_p = t_max.reshape(P, tile)
    inv_d = jnp.where(jnp.abs(d) > 1e-12, 1.0 / d, jnp.sign(d) * 1e12 + 1e12)

    zero_p = jnp.zeros_like(o[:, 0, 0])
    zero_pt = jnp.zeros_like(o[:, :, 0])
    init = (zero_p.astype(jnp.int32), zero_pt.astype(bool), jnp.int32(0))

    def cond(s):
        return jnp.logical_and(jnp.any(s[0] < n_nodes),
                               s[2] < cfg.max_traversal_steps)

    def body(s):
        for _ in range(cfg.traversal_unroll):
            s = _step(s)
        return s

    def _step(s):
        node, occ, step = s
        active = node < n_nodes
        nc = jnp.clip(node, 0, n_nodes - 1)
        rec = boxes[nc]
        lnk = links[nc]
        bmin = rec[:, None, 0:3]
        bmax = rec[:, None, 3:6]
        skip = lnk[:, 0]
        first = lnk[:, 1] >> 4
        count = lnk[:, 1] & 15

        # Unresolved rays only: resolved (occluded) rays stop driving descent.
        pending = ~occ
        t0 = (bmin - o) * inv_d
        t1 = (bmax - o) * inv_d
        tn = jnp.max(jnp.minimum(t0, t1), -1)
        tf = jnp.min(jnp.maximum(t0, t1), -1)
        ray_hit = (tn <= tf) & (tf >= tmin_pk) & (tn <= tmax_p) & pending
        box_hit = jnp.any(ray_hit, axis=1) & active

        is_leaf = (count > 0) & box_hit
        ids = jnp.clip(first[:, None] + jnp.arange(leaf, dtype=jnp.int32)[None],
                       0, n_tris - 1)
        in_leaf = (jnp.arange(leaf, dtype=jnp.int32)[None] <
                   jnp.where(is_leaf, count, 0)[:, None])
        trow = tris[ids]
        tt, _, _, ok = _mt_packed(
            o[:, :, None, :], d[:, :, None, :],
            trow[:, None, :, 0:3], trow[:, None, :, 3:6], trow[:, None, :, 6:9],
        )
        ok = (ok & in_leaf[:, None, :] & (tt >= tmin_pk[..., None])
              & (tt < tmax_p[..., None]))
        occ = occ | jnp.any(ok, axis=2)

        # Early out once every pending ray in the packet is resolved.
        all_done = ~jnp.any(~occ, axis=1)
        descend = box_hit & (count == 0)
        nxt = jnp.where(descend, node + 1, skip)
        nxt = jnp.where(all_done, n_nodes, nxt)
        node = jnp.where(active, nxt, node)
        return node, occ, step + 1

    _, occ, _ = jax.lax.while_loop(cond, body, init)
    return occ.reshape(-1)[:r_orig]


def make_packet_backend(gpu: GPUScene, cfg: RenderConfig) -> TraceBackend:
    """Straight-through like the lane backend (no grads through the search)."""
    num_tris = gpu.faces.shape[0]
    num_spheres = gpu.sph_center.shape[0]
    sg = jax.lax.stop_gradient

    def closest(origins, dirs, t_min, t_max, common=None):
        hit = packet_closest(sg(gpu), cfg, sg(origins), sg(dirs), t_min, t_max)
        if num_spheres:
            sph = intersect.intersect_spheres(
                origins, dirs, gpu.sph_center, gpu.sph_radius, t_min, t_max)
            hit = _merge_sphere_hits(hit, sph, num_tris)
        return hit

    def occluded(origins, dirs, t_min, t_max, common=None):
        occ = packet_occluded(sg(gpu), cfg, sg(origins), sg(dirs), t_min,
                              sg(t_max))
        if num_spheres:
            sph = intersect.intersect_spheres(
                origins, dirs, gpu.sph_center, gpu.sph_radius, t_min, jnp.inf)
            occ = occ | (sph.t < jnp.broadcast_to(t_max, sph.t.shape))
        return occ

    return TraceBackend(closest=closest, occluded=occluded,
                        num_tris=num_tris, num_spheres=num_spheres)
