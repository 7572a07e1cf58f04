"""Pallas traversal kernel: per-tile cluster visits without global lockstep.

Fourth backend generation (see wide_backend.py).  The wide backend's one
weakness is XLA lockstep: its while loop advances ALL ray tiles together,
so every step pays for every tile until the slowest tile finishes.  Here
each Pallas grid cell owns ONE tile of 128 rays and runs its OWN visit
loop with per-tile early exit — total work is the sum of per-tile visit
counts, not tiles x max.

Layout (all chosen for the f32 (8, 128) VMEM tile):
  * rays:      (Ts, 8, 128) — rows o.xyz, d.xyz, t_min, t_max; one VMEM
               tile per ray tile;
  * clusters:  (C, 16, K=128) — per-cluster Baldwin-Weber rows
               [n.xyz r1.xyz r2.xyz | n.A r1.A r2.A | valid] along
               sublanes, K triangles along lanes; stays in HBM and is
               DMA'd per visit into a double-buffered VMEM scratch;
  * candidates:(Ts, V) int32 cluster ids + (Ts, V) f32 entry lower bounds,
               sorted ascending — produced by the wide backend's
               interval-arithmetic culling (XLA phase A);
  * per-visit math is dense (128 rays x 128 tris) VPU FMA nests; the
    winning triangle's (u, v) are extracted with one-hot masked sums (TPU
    has no per-lane gather).

The stop rule matches wide_backend: visits end when the next candidate's
entry lower bound exceeds every ray's current best t (exact, since
candidates are entry-sorted lower bounds).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from realtimeraytracer_tpu.config import RenderConfig
from realtimeraytracer_tpu.ops import intersect
from realtimeraytracer_tpu.ops.intersect import BIG_T, HitRecord

# Python float for in-kernel use (a jnp scalar would be a captured constant,
# which pallas kernels reject).
BIG = 3.0e38
from realtimeraytracer_tpu.render.backends import TraceBackend, _merge_sphere_hits
from realtimeraytracer_tpu.render.wide_backend import _cluster_entries, build_wide
from realtimeraytracer_tpu.scene.gpu_scene import GPUScene

F32 = jnp.float32
TILE = 128          # rays per tile (lanes of the ray block)
K = 128             # triangles per cluster (lanes of the cluster block)
ROWS = 16           # cluster block sublanes (10 used + valid row + pad)


def _pack_rays(origins, dirs, t_min, t_max):
    """(R,3)x2 + (R,)x2 -> (Ts, 8, 128) ray blocks (+ true ray count)."""
    r = origins.shape[0]
    ts = -(-r // TILE)
    pad = ts * TILE - r
    if pad:
        origins = jnp.concatenate([origins, origins[:1].repeat(pad, 0)])
        dirs = jnp.concatenate([dirs, dirs[:1].repeat(pad, 0)])
        t_min = jnp.concatenate([t_min, jnp.full((pad,), BIG_T, F32)])
        t_max = jnp.concatenate([t_max, jnp.full((pad,), -BIG_T, F32)])
    blk = jnp.stack(
        [
            origins[:, 0].reshape(ts, TILE), origins[:, 1].reshape(ts, TILE),
            origins[:, 2].reshape(ts, TILE),
            dirs[:, 0].reshape(ts, TILE), dirs[:, 1].reshape(ts, TILE),
            dirs[:, 2].reshape(ts, TILE),
            t_min.reshape(ts, TILE), t_max.reshape(ts, TILE),
        ],
        axis=1,
    )
    return blk, r, ts


def pack_clusters(gpu: GPUScene) -> jnp.ndarray:
    """(C, 16, 128) cluster blocks from the Morton/SAH-sorted soup.

    Rows: 0-2 n.xyz, 3-5 r1.xyz, 6-8 r2.xyz, 9 n.A, 10 r1.A, 11 r2.A,
    12 valid flag (1/0), 13-15 zero.
    """
    wd = build_wide(gpu, K)
    c = wd.cl_min.shape[0]
    rows = wd.bw_rows.reshape(c, K, 3, 3)       # (C, K, [n r1 r2], xyz)
    offs = wd.bw_offs.reshape(c, K, 3)
    t = wd.num_tris
    valid = (jnp.arange(c * K) < t).reshape(c, K).astype(F32)
    blk = jnp.concatenate(
        [
            rows[:, :, 0, :].transpose(0, 2, 1),     # n.xyz   -> rows 0-2
            rows[:, :, 1, :].transpose(0, 2, 1),     # r1.xyz  -> rows 3-5
            rows[:, :, 2, :].transpose(0, 2, 1),     # r2.xyz  -> rows 6-8
            offs.transpose(0, 2, 1),                 # A-offs  -> rows 9-11
            valid[:, None, :],                       # valid   -> row 12
            jnp.zeros((c, 3, K), F32),               # pad     -> rows 13-15
        ],
        axis=1,
    )
    return blk


def _visit_kernel(cand_ref, entry_ref, rays_ref, clusters_hbm,
                  outf_ref, outi_ref,
                  scratch, sems, *, v_max, mode):
    """One grid cell = one ray tile. mode: 'closest' or 'occluded'.

    Outputs are (1, 8, 128) blocks (the minimum f32 VMEM tile): outf rows
    0-2 = best t/u/v, outi row 0 = best sorted-tri id (or occluded flag).
    Candidate ids/entries live in SMEM blocks of 8 tile-rows shared by 8
    consecutive grid cells (SMEM sublane-divisibility rule); all per-ray
    state uses column layout (TILE, 1) so no lane<->sublane transposes
    happen inside the visit loop.
    """
    row = jax.lax.rem(pl.program_id(0), 8)

    def cand_at(j):
        return cand_ref[row, j]

    def entry_at(j):
        return entry_ref[row, j]

    def rayc(r):
        return rays_ref[0, r, :][:, None]       # (128, 1) column

    tmin_c = rayc(6)
    tmax_c = rayc(7)

    def dma(slot, j):
        cid = cand_at(j)
        return pltpu.make_async_copy(
            clusters_hbm.at[cid], scratch.at[slot], sems.at[slot])

    def cond(state):
        j = state[0]
        best_t = state[2]
        go = j < v_max
        nxt = entry_at(jnp.minimum(j, v_max - 1))
        worst = jnp.max(jnp.minimum(best_t, tmax_c))
        return go & (nxt < BIG) & (nxt <= worst)

    def body(state):
        j, prefetched, best_t, best_k = state
        slot = jax.lax.rem(j, 2)

        # Double buffering: visit j's DMA was usually prefetched by the
        # previous iteration; issue it now only on the first iteration.
        @pl.when(jnp.logical_not(prefetched))
        def _():
            dma(slot, j).start()

        # Speculatively prefetch j+1 while j computes. The speculation
        # ignores the best-t stop rule, so the epilogue below must wait on
        # a possibly-dangling prefetch.
        will_prefetch = (j + 1 < v_max) & (entry_at(jnp.minimum(j + 1, v_max - 1)) < BIG)

        @pl.when(will_prefetch)
        def _():
            dma(1 - slot, jnp.minimum(j + 1, v_max - 1)).start()

        dma(slot, j).wait()
        blk = scratch[slot]                     # (16, 128): fields x K tris

        # Rays along SUBLANES (columns) x tris along LANES (rows of blk).
        nx, ny, nz = blk[0, :][None, :], blk[1, :][None, :], blk[2, :][None, :]
        r1x, r1y, r1z = blk[3, :][None, :], blk[4, :][None, :], blk[5, :][None, :]
        r2x, r2y, r2z = blk[6, :][None, :], blk[7, :][None, :], blk[8, :][None, :]
        na, r1a, r2a = blk[9, :][None, :], blk[10, :][None, :], blk[11, :][None, :]
        tri_ok = blk[12, :][None, :] > 0.5

        ox_c, oy_c, oz_c = rayc(0), rayc(1), rayc(2)
        dx_c, dy_c, dz_c = rayc(3), rayc(4), rayc(5)

        n_o = ox_c * nx + oy_c * ny + oz_c * nz          # (128, 128)
        n_d = dx_c * nx + dy_c * ny + dz_c * nz
        den_ok = jnp.abs(n_d) > 1e-12
        t = jnp.where(den_ok, (na - n_o) / jnp.where(den_ok, n_d, 1.0), BIG)
        u = (ox_c * r1x + oy_c * r1y + oz_c * r1z
             + t * (dx_c * r1x + dy_c * r1y + dz_c * r1z) - r1a)
        v = (ox_c * r2x + oy_c * r2y + oz_c * r2z
             + t * (dx_c * r2x + dy_c * r2y + dz_c * r2z) - r2a)
        ok = (den_ok & tri_ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
              & (t >= tmin_c))

        if mode == "closest":
            tm = jnp.where(ok & (t <= jnp.minimum(best_t, tmax_c)), t, BIG)
            col_best = jnp.min(tm, axis=1, keepdims=True)    # (128, 1)
            better = col_best < best_t
            # Lane argmin with lowest-lane tie-break; the winner's (u, v)
            # are recomputed OUTSIDE the kernel from its triangle id (same
            # differentiable recompute the surface pass does anyway).
            lane = jax.lax.broadcasted_iota(jnp.int32, (TILE, K), 1)
            big_lane = jnp.where(tm == col_best, lane, K)
            kmin = jnp.min(big_lane, axis=1, keepdims=True)  # (128, 1)
            cid = cand_at(j)
            best_t = jnp.where(better, col_best, best_t)
            best_k = jnp.where(better, cid * K + kmin, best_k)
        else:
            hit_any = jnp.any(ok & (t < tmax_c), axis=1, keepdims=True)
            # Collapse best_t so the stop rule exits once all rays resolve
            # (occluded rays carry -BIG; the 'occluded' flag is t < 0).
            best_t = jnp.where(hit_any, -BIG, best_t)

        return j + 1, will_prefetch, best_t, best_k

    init = (
        jnp.int32(0),
        jnp.bool_(False),
        jnp.full((TILE, 1), BIG, F32),
        jnp.full((TILE, 1), -1, jnp.int32),
    )
    j_end, prefetched_end, best_t, best_k = jax.lax.while_loop(
        cond, body, init)

    # A speculative prefetch for j_end may still be in flight: retire it.
    @pl.when(prefetched_end)
    def _():
        dma(jax.lax.rem(j_end, 2), jnp.minimum(j_end, v_max - 1)).wait()

    if mode == "closest":
        outf_ref[0, 0, :] = best_t[:, 0]
        outi_ref[0, 0, :] = best_k[:, 0]
    else:
        outf_ref[0, 0, :] = jnp.where(best_t[:, 0] < 0.0, 1.0, 0.0)
        outi_ref[0, 0, :] = best_k[:, 0]


def _run(gpu: GPUScene, cfg: RenderConfig, origins, dirs, t_min, t_max, mode):
    r = origins.shape[0]
    t_min = jnp.broadcast_to(jnp.asarray(t_min, F32), (r,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, F32), (r,)).astype(F32)
    rays, r_orig, ts = _pack_rays(origins, dirs, t_min, t_max)

    clusters = pack_clusters(gpu)
    c = clusters.shape[0]
    v_max = min(cfg.max_cluster_visits, c)

    # Phase A (XLA): conservative per-tile candidate list, entry-sorted.
    wd = build_wide(gpu, K)
    o_t = jnp.stack([rays[:, 0], rays[:, 1], rays[:, 2]], axis=-1)
    d_t = jnp.stack([rays[:, 3], rays[:, 4], rays[:, 5]], axis=-1)
    entries = _cluster_entries(o_t, d_t, wd, rays[:, 6], rays[:, 7])
    order = jnp.argsort(entries, axis=1).astype(jnp.int32)
    entry_sorted = jnp.take_along_axis(entries, order, axis=1)
    # Candidate lists live in SMEM; blocks span 8 tile-rows (sublane rule),
    # so pad the tile dimension to a multiple of 8.
    ts8 = -(-ts // 8) * 8
    cand = jnp.zeros((ts8, v_max), jnp.int32)
    cand = cand.at[:ts].set(order[:, :v_max])
    entry = jnp.full((ts8, v_max), BIG_T, F32)
    entry = entry.at[:ts].set(entry_sorted[:, :v_max])

    kernel = functools.partial(_visit_kernel, v_max=v_max, mode=mode)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(ts,),
        in_specs=[
            pl.BlockSpec((8, v_max), lambda i: (i // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, v_max), lambda i: (i // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8, TILE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),     # clusters stay in HBM
        ],
        out_specs=[
            pl.BlockSpec((1, 8, TILE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, TILE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, ROWS, K), F32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    outf, outi = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((ts, 8, TILE), F32),
            jax.ShapeDtypeStruct((ts, 8, TILE), jnp.int32),
        ],
        grid_spec=grid_spec,
        interpret=jax.default_backend() != "tpu",
    )(cand, entry, rays, clusters)

    tb = outf[:, 0, :].reshape(-1)[:r_orig]
    kb = outi[:, 0, :].reshape(-1)[:r_orig]
    if mode == "closest":
        # One exact Moller-Trumbore on each ray's winning triangle gives
        # (u, v) — cheaper than extracting them per visit in the kernel.
        sid = jnp.clip(kb, 0, gpu.bvh_tri_v0.shape[0] - 1)
        t_, ub, vb, ok_ = intersect.ray_triangle(
            origins[:r_orig], dirs[:r_orig], gpu.bvh_tri_v0[sid],
            gpu.bvh_tri_v1[sid], gpu.bvh_tri_v2[sid])
        ub = jnp.where(kb >= 0, ub, 0.0)
        vb = jnp.where(kb >= 0, vb, 0.0)
    else:
        ub = vb = jnp.zeros_like(tb)
    return tb, kb, ub, vb


def pallas_closest(gpu, cfg, origins, dirs, t_min, t_max) -> HitRecord:
    tb, kb, ub, vb = _run(gpu, cfg, origins, dirs, t_min, t_max, "closest")
    orig = jnp.where(kb >= 0, gpu.bvh_tri_id[jnp.clip(kb, 0, None)], -1)
    return HitRecord(t=tb, prim_id=orig.astype(jnp.int32), u=ub, v=vb)


def pallas_occluded(gpu, cfg, origins, dirs, t_min, t_max) -> jnp.ndarray:
    tb, _, _, _ = _run(gpu, cfg, origins, dirs, t_min, t_max, "occluded")
    return tb > 0.5


def make_pallas_backend(gpu: GPUScene, cfg: RenderConfig) -> TraceBackend:
    num_tris = gpu.faces.shape[0]
    num_spheres = gpu.sph_center.shape[0]
    sg = jax.lax.stop_gradient

    def closest(origins, dirs, t_min, t_max):
        hit = pallas_closest(sg(gpu), cfg, sg(origins), sg(dirs), sg(t_min), sg(t_max))
        if num_spheres:
            sph = intersect.intersect_spheres(
                origins, dirs, gpu.sph_center, gpu.sph_radius, t_min, t_max)
            hit = _merge_sphere_hits(hit, sph, num_tris)
        return hit

    def occluded(origins, dirs, t_min, t_max):
        occ = pallas_occluded(sg(gpu), cfg, sg(origins), sg(dirs), sg(t_min), sg(t_max))
        if num_spheres:
            sph = intersect.intersect_spheres(
                origins, dirs, gpu.sph_center, gpu.sph_radius, t_min, jnp.inf)
            occ = occ | (sph.t < jnp.broadcast_to(t_max, sph.t.shape))
        return occ

    return TraceBackend(closest=closest, occluded=occluded,
                        num_tris=num_tris, num_spheres=num_spheres)
