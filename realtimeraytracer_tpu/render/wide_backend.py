"""Wide two-level acceleration: dense cluster culling + MXU intersection.

The TPU-first answer to hardware BVH traversal (third backend generation;
see render/bvh_backend.py and render/packet_backend.py for the ladder).
Deep per-ray or per-packet traversal loops are hostile to this hardware:
each lock-step while iteration costs fixed overhead and random gathers, and
tens of thousands of iterations swamp the actual math.  This backend turns
ray casting into a handful of DENSE stages:

  1. **Cluster culling (VPU, no loop):** triangles are Morton/SAH-sorted
     (reusing the BVH build's order) and blocked into clusters of
     `cluster_size` consecutive triangles.  Each tile of `wide_tile` rays
     slab-tests ALL cluster AABBs densely — a (TILE, C) vector op — and
     sorts clusters by entry distance.

  2. **Cluster visits (MXU, tiny bounded loop):** per while step, every
     tile fetches its next candidate cluster (one contiguous block of
     triangle rows — a chunky, DMA-friendly gather) and intersects all its
     rays against all its triangles with the Baldwin-Weber formulation
     (precomputed per-triangle world->barycentric rows), whose inner
     products become two (TILE,3)x(3,3K) matmuls on the MXU.  Tiles stop
     when their next cluster's entry distance exceeds their worst
     outstanding hit — typical visit counts are single digits, and the
     loop's global trip count is the max over tiles (capped by
     cfg.max_cluster_visits).

Exactness: sorted-entry processing with the best-t stopping rule is the
classic ordered-traversal argument — a cluster whose entry t exceeds every
ray's current best cannot improve any hit.  The only approximation is the
visit cap, set far above coherent-tile visit counts (tests compare against
brute force).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from realtimeraytracer_tpu.config import RenderConfig
from realtimeraytracer_tpu.ops import intersect
from realtimeraytracer_tpu.ops.intersect import BIG_T, HitRecord
from realtimeraytracer_tpu.render.backends import TraceBackend, _merge_sphere_hits
from realtimeraytracer_tpu.scene.gpu_scene import GPUScene

F32 = jnp.float32


class WideData(NamedTuple):
    cl_min: jnp.ndarray     # (C, 3) cluster AABB lows
    cl_max: jnp.ndarray     # (C, 3)
    bw_rows: jnp.ndarray    # (C, 3*K, 3) per-tri rows [n; r1; r2] per cluster
    bw_offs: jnp.ndarray    # (C, 3*K) row offsets [n.A; r1.A; r2.A]
    num_tris: int           # true (unpadded) triangle count


def build_wide(gpu: GPUScene, cluster_size: int) -> WideData:
    """Derive cluster boxes + Baldwin-Weber rows from the sorted soup.

    Runs in-graph (cheap elementwise + reshapes); triangle padding uses
    degenerate rows that can never produce a valid barycentric hit.
    """
    v0, v1, v2 = gpu.bvh_tri_v0, gpu.bvh_tri_v1, gpu.bvh_tri_v2
    t = v0.shape[0]
    k = cluster_size
    c = -(-t // k)
    pad = c * k - t

    def padv(x):
        return jnp.concatenate([x, jnp.zeros((pad, 3), F32)]) if pad else x

    v0p, v1p, v2p = padv(v0), padv(v1), padv(v2)
    e1 = v1p - v0p
    e2 = v2p - v0p
    n = jnp.cross(e1, e2)
    # Inverse of [e1 e2 n] via adjugate; rows r1, r2 give barycentrics.
    # det = n.n (since n = e1 x e2).
    det = jnp.sum(n * n, -1, keepdims=True)
    inv_det = jnp.where(det > 1e-24, 1.0 / jnp.where(det > 1e-24, det, 1.0), 0.0)
    r1 = jnp.cross(e2, n) * inv_det
    r2 = jnp.cross(n, e1) * inv_det

    rows = jnp.stack([n, r1, r2], axis=1)            # (T, 3, 3)
    offs = jnp.sum(rows * v0p[:, None, :], -1)       # (T, 3): [n.A, r1.A, r2.A]

    tmin = jnp.minimum(jnp.minimum(v0p, v1p), v2p).reshape(c, k, 3)
    tmax = jnp.maximum(jnp.maximum(v0p, v1p), v2p).reshape(c, k, 3)
    if pad:
        # Padded tris must not poison the last cluster's box.
        valid = (jnp.arange(c * k) < t).reshape(c, k, 1)
        tmin = jnp.where(valid, tmin, BIG_T)
        tmax = jnp.where(valid, tmax, -BIG_T)
    return WideData(
        cl_min=tmin.min(axis=1),
        cl_max=tmax.max(axis=1),
        bw_rows=rows.reshape(c, 3 * k, 3),
        bw_offs=offs.reshape(c, 3 * k),
        num_tris=t,
    )


def _bw_tuv(o, d, rows, offs, k):
    """Baldwin-Weber (t, u, v, valid) of shape (Ts, TILE, K).

    Written as component-wise FMAs (the contraction dim is only 3 — useless
    for the MXU) so XLA can FUSE the whole (Ts, TILE, K) loop nest into the
    consumer's reduction without materializing multi-GB intermediates.
    """
    rows = rows.reshape(rows.shape[0], k, 3, 3)
    offs = offs.reshape(offs.shape[0], 1, k, 3)

    def dot_rays(vec, row_idx):
        r = rows[:, :, row_idx, :]                    # (Ts, K, 3)
        return (
            vec[:, :, None, 0] * r[:, None, :, 0]
            + vec[:, :, None, 1] * r[:, None, :, 1]
            + vec[:, :, None, 2] * r[:, None, :, 2]
        )                                             # (Ts, TILE, K)

    n_o, n_d = dot_rays(o, 0), dot_rays(d, 0)
    r1_o, r1_d = dot_rays(o, 1), dot_rays(d, 1)
    r2_o, r2_d = dot_rays(o, 2), dot_rays(d, 2)
    n_a, r1_a, r2_a = offs[..., 0], offs[..., 1], offs[..., 2]

    den_ok = jnp.abs(n_d) > 1e-12
    t = jnp.where(den_ok, (n_a - n_o) / jnp.where(den_ok, n_d, 1.0), BIG_T)
    u = r1_o + t * r1_d - r1_a
    v = r2_o + t * r2_d - r2_a
    valid = den_ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
    return t, u, v, valid


def _bw_best(o, d, rows, offs, k, in_range_fn):
    """Fused best-hit over a cluster: returns (t_best, k_best) (Ts, TILE).

    Only the min/argmin reductions leave the fused loop nest; barycentrics
    for the winning triangle are recomputed afterwards on the small result.
    """
    t, u, v, valid = _bw_tuv(o, d, rows, offs, k)
    t = jnp.where(valid & in_range_fn(t), t, BIG_T)
    k_best = jnp.argmin(t, axis=2).astype(jnp.int32)
    t_best = jnp.min(t, axis=2)
    return t_best, k_best


def _bw_single(o, d, rows, offs, k_best):
    """Recompute (u, v) for one selected triangle per ray.

    rows (Ts, 3K, 3) gathered at k_best (Ts, TILE) -> small per-ray math.
    """
    ts, tile = k_best.shape
    rows = rows.reshape(ts, -1, 3, 3)
    offs = offs.reshape(ts, -1, 3)
    sel_rows = jnp.take_along_axis(rows, k_best[:, :, None, None], axis=1)
    sel_offs = jnp.take_along_axis(offs, k_best[:, :, None], axis=1)
    n = sel_rows[:, :, 0, :]
    r1 = sel_rows[:, :, 1, :]
    r2 = sel_rows[:, :, 2, :]
    n_a, r1_a, r2_a = sel_offs[..., 0], sel_offs[..., 1], sel_offs[..., 2]
    n_d = jnp.sum(n * d, -1)
    den_ok = jnp.abs(n_d) > 1e-12
    t = jnp.where(den_ok, (n_a - jnp.sum(n * o, -1)) / jnp.where(den_ok, n_d, 1.0), BIG_T)
    u = jnp.sum(r1 * o, -1) + t * jnp.sum(r1 * d, -1) - r1_a
    v = jnp.sum(r2 * o, -1) + t * jnp.sum(r2 * d, -1) - r2_a
    return u, v


def _tile_rays(origins, dirs, tile):
    r = origins.shape[0]
    ts = -(-r // tile)
    pad = ts * tile - r
    if pad:
        origins = jnp.concatenate([origins, origins[:1].repeat(pad, 0)])
        dirs = jnp.concatenate([dirs, dirs[:1].repeat(pad, 0)])
    return origins.reshape(ts, tile, 3), dirs.reshape(ts, tile, 3), r, pad


def _cluster_entries(o, d, wd, tmin_p, tmax_p):
    """Conservative per-TILE cluster entry lower bounds: (Ts, C).

    Interval-arithmetic slab test against the tile's ray bundle (origin box
    x direction interval): never excludes a cluster any tile ray could hit
    (false positives just cost extra visits), and returns an entry-distance
    LOWER bound — which keeps the ordered-visit stopping rule exact.
    Memory is O(tiles x clusters), not O(rays x clusters): the per-ray
    version materializes multi-GB tensors at 1080p.
    """
    big = jnp.float32(BIG_T)
    o_lo = o.min(axis=1)[:, None, :]                 # (Ts, 1, 3)
    o_hi = o.max(axis=1)[:, None, :]
    d_lo = d.min(axis=1)[:, None, :]
    d_hi = d.max(axis=1)[:, None, :]

    # Reciprocal interval of the direction (per axis).
    pos = d_lo > 1e-12
    neg = d_hi < -1e-12
    safe = lambda x: jnp.where(jnp.abs(x) > 1e-12, x, 1e-12)
    inv_lo = jnp.where(pos, 1.0 / safe(d_hi), jnp.where(neg, 1.0 / safe(d_hi), -big))
    inv_hi = jnp.where(pos, 1.0 / safe(d_lo), jnp.where(neg, 1.0 / safe(d_lo), big))

    def times(a_lo, a_hi, b_lo, b_hi):
        p1, p2 = a_lo * b_lo, a_lo * b_hi
        p3, p4 = a_hi * b_lo, a_hi * b_hi
        return (jnp.minimum(jnp.minimum(p1, p2), jnp.minimum(p3, p4)),
                jnp.maximum(jnp.maximum(p1, p2), jnp.maximum(p3, p4)))

    bmin = wd.cl_min[None]                            # (1, C, 3)
    bmax = wd.cl_max[None]
    # t0 = (bmin - o) * inv ; t1 = (bmax - o) * inv   (intervals, per axis)
    t0_lo, t0_hi = times(bmin - o_hi, bmin - o_lo, inv_lo, inv_hi)
    t1_lo, t1_hi = times(bmax - o_hi, bmax - o_lo, inv_lo, inv_hi)
    near_lo = jnp.minimum(t0_lo, t1_lo)               # (Ts, C, 3)
    far_hi = jnp.maximum(t0_hi, t1_hi)
    tn_lo = jnp.max(near_lo, axis=-1)                 # (Ts, C)
    tf_hi = jnp.min(far_hi, axis=-1)

    tmin_lb = tmin_p.min(axis=1)[:, None]
    tmax_ub = tmax_p.max(axis=1)[:, None]
    possible = (tn_lo <= tf_hi) & (tf_hi >= tmin_lb) & (tn_lo <= tmax_ub)
    return jnp.where(possible, jnp.maximum(tn_lo, 0.0), big)


def wide_closest(gpu: GPUScene, cfg: RenderConfig, origins, dirs,
                 t_min, t_max, return_stats: bool = False):
    k = cfg.cluster_size
    wd = build_wide(gpu, k)
    c = wd.cl_min.shape[0]
    tile = cfg.wide_tile

    r = origins.shape[0]
    t_min = jnp.broadcast_to(jnp.asarray(t_min, F32), (r,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, F32), (r,))
    o, d, r_orig, pad = _tile_rays(origins, dirs, tile)
    if pad:
        t_min = jnp.concatenate([t_min, jnp.full((pad,), BIG_T, F32)])
        t_max = jnp.concatenate([t_max, jnp.full((pad,), -BIG_T, F32)])
    ts = o.shape[0]
    tmin_p = t_min.reshape(ts, tile)
    tmax_p = t_max.reshape(ts, tile)

    entry = _cluster_entries(o, d, wd, tmin_p, tmax_p)   # (Ts, C)
    order = jnp.argsort(entry, axis=1)                   # (Ts, C)
    entry_sorted = jnp.take_along_axis(entry, order, axis=1)

    max_visits = min(cfg.max_cluster_visits, c)

    def cond(s):
        step, pending, *_ = s
        return jnp.logical_and(step < max_visits, jnp.any(pending))

    k_range = jnp.arange(k, dtype=jnp.int32)

    def body(s):
        step, _, best_t, best_p, best_u, best_v = s
        idx = jnp.minimum(step, c - 1)
        cid = order[:, idx]                              # (Ts,)
        ent = entry_sorted[:, idx]                       # (Ts,)
        worst = jnp.max(jnp.minimum(best_t, tmax_p), axis=1)
        active = (ent < BIG_T) & (ent <= worst)          # (Ts,)

        rows = wd.bw_rows[cid]                           # (Ts, 3K, 3) chunky gather
        offs = wd.bw_offs[cid]                           # (Ts, 3K)
        last_valid = jnp.minimum(
            wd.num_tris - cid * k - 1, k - 1)            # (Ts,) pad cutoff

        def in_range(t):
            return ((t >= tmin_p[..., None])
                    & (t <= jnp.minimum(best_t, tmax_p)[..., None])
                    & (k_range[None, None, :] <= last_valid[:, None, None])
                    & active[:, None, None])

        tb, kb = _bw_best(o, d, rows, offs, k, in_range)  # (Ts, TILE)
        better = tb < best_t
        ub, vb = _bw_single(o, d, rows, offs, kb)
        best_t = jnp.where(better, tb, best_t)
        best_p = jnp.where(better, cid[:, None] * k + kb, best_p)
        best_u = jnp.where(better, ub, best_u)
        best_v = jnp.where(better, vb, best_v)

        nxt_ent = entry_sorted[:, jnp.minimum(idx + 1, c - 1)]
        worst = jnp.max(jnp.minimum(best_t, tmax_p), axis=1)
        pending = active & (idx + 1 < c) & (nxt_ent < BIG_T) & (nxt_ent <= worst)
        return step + 1, pending, best_t, best_p, best_u, best_v

    zt = jnp.zeros_like(o[:, :, 0])
    init = (
        jnp.int32(0),
        jnp.ones_like(o[:, 0, 0], bool),
        zt + BIG_T,
        zt.astype(jnp.int32) - 1,
        zt,
        zt,
    )
    steps, pending, best_t, best_p, best_u, best_v = jax.lax.while_loop(
        cond, body, init)

    best_t = best_t.reshape(-1)[:r_orig]
    best_p = best_p.reshape(-1)[:r_orig]
    best_u = best_u.reshape(-1)[:r_orig]
    best_v = best_v.reshape(-1)[:r_orig]
    orig = jnp.where(best_p >= 0, gpu.bvh_tri_id[jnp.clip(best_p, 0, None)], -1)
    hit = HitRecord(t=best_t, prim_id=orig.astype(jnp.int32),
                    u=best_u, v=best_v)
    if return_stats:
        # `pending` survives the loop exit: nonzero here means the visit
        # cap clipped tiles that still had candidate clusters — results for
        # those tiles may silently miss hits (VERDICT r1 item 8).
        return hit, {"cap_clipped": jnp.sum(pending.astype(jnp.int32)),
                     "steps": steps, "cap": max_visits}
    return hit


def wide_occluded(gpu: GPUScene, cfg: RenderConfig, origins, dirs,
                  t_min, t_max, return_stats: bool = False):
    k = cfg.cluster_size
    wd = build_wide(gpu, k)
    c = wd.cl_min.shape[0]
    tile = cfg.wide_tile

    r = origins.shape[0]
    t_min = jnp.broadcast_to(jnp.asarray(t_min, F32), (r,))
    t_max = jnp.broadcast_to(t_max, (r,)).astype(F32)
    o, d, r_orig, pad = _tile_rays(origins, dirs, tile)
    if pad:
        t_min = jnp.concatenate([t_min, jnp.full((pad,), BIG_T, F32)])
        t_max = jnp.concatenate([t_max, jnp.full((pad,), -BIG_T, F32)])
    ts = o.shape[0]
    tmin_p = t_min.reshape(ts, tile)
    tmax_p = t_max.reshape(ts, tile)

    entry = _cluster_entries(o, d, wd, tmin_p, tmax_p)
    order = jnp.argsort(entry, axis=1)
    entry_sorted = jnp.take_along_axis(entry, order, axis=1)
    max_visits = min(cfg.max_cluster_visits, c)

    def cond(s):
        step, pending, _ = s
        return jnp.logical_and(step < max_visits, jnp.any(pending))

    k_range = jnp.arange(k, dtype=jnp.int32)

    def body(s):
        step, _, occ = s
        idx = jnp.minimum(step, c - 1)
        cid = order[:, idx]
        ent = entry_sorted[:, idx]
        unresolved = jnp.any(~occ, axis=1)
        active = (ent < BIG_T) & unresolved

        rows = wd.bw_rows[cid]
        offs = wd.bw_offs[cid]
        last_valid = jnp.minimum(wd.num_tris - cid * k - 1, k - 1)
        t, u, v, ok = _bw_tuv(o, d, rows, offs, k)
        hit = (ok & (t >= tmin_p[..., None]) & (t < tmax_p[..., None])
               & (k_range[None, None, :] <= last_valid[:, None, None])
               & active[:, None, None])
        occ = occ | jnp.any(hit, axis=2)

        nxt_ent = entry_sorted[:, jnp.minimum(idx + 1, c - 1)]
        pending = active & (idx + 1 < c) & (nxt_ent < BIG_T) & jnp.any(~occ, axis=1)
        return step + 1, pending, occ

    init = (jnp.int32(0), jnp.ones_like(o[:, 0, 0], bool),
            jnp.zeros_like(o[:, :, 0], bool))
    steps, pending, occ = jax.lax.while_loop(cond, body, init)
    occ_flat = occ.reshape(-1)[:r_orig]
    if return_stats:
        return occ_flat, {"cap_clipped": jnp.sum(pending.astype(jnp.int32)),
                          "steps": steps, "cap": max_visits}
    return occ_flat


def make_wide_backend(gpu: GPUScene, cfg: RenderConfig) -> TraceBackend:
    """Straight-through gradients, like the other traversal backends."""
    num_tris = gpu.faces.shape[0]
    num_spheres = gpu.sph_center.shape[0]
    sg = jax.lax.stop_gradient

    def closest(origins, dirs, t_min, t_max, common=None):
        hit = wide_closest(sg(gpu), cfg, sg(origins), sg(dirs), sg(t_min), sg(t_max))
        if num_spheres:
            sph = intersect.intersect_spheres(
                origins, dirs, gpu.sph_center, gpu.sph_radius, t_min, t_max)
            hit = _merge_sphere_hits(hit, sph, num_tris)
        return hit

    def occluded(origins, dirs, t_min, t_max, common=None):
        occ = wide_occluded(sg(gpu), cfg, sg(origins), sg(dirs), sg(t_min), sg(t_max))
        if num_spheres:
            sph = intersect.intersect_spheres(
                origins, dirs, gpu.sph_center, gpu.sph_radius, t_min, jnp.inf)
            occ = occ | (sph.t < jnp.broadcast_to(t_max, sph.t.shape))
        return occ

    return TraceBackend(closest=closest, occluded=occluded,
                        num_tris=num_tris, num_spheres=num_spheres)
