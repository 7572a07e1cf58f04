"""Pallas traversal kernel: packed-key ordered visits, MXU intersection.

Fifth backend generation (ladder: bvh_backend -> packet_backend ->
wide_backend -> pallas v1 -> this).  Profiling v1 on a v5e chip showed
the XLA argsort of per-tile cluster candidates cost 4x the whole visit
kernel, the (R, 3) ray layout padded 3 -> 128 lanes everywhere, and
in-kernel scalar work (interval culling, argmin selection) serialized
against the vector units.  This design splits the work by what each unit
is good at:

  * rays live in hardware-native (Ts, 8, 128) tiles end to end — rows
    [o.xyz | d.xyz | t_min | t_max], one (16x8)-pixel block per tile
    (ops/camera_rays.generate_ray_blocks emits them with pure iota math);
  * XLA culls every cluster AABB against each tile's ray-bundle cone
    (interval arithmetic, dense (Ts, C) vector math) and emits per tile a
    block of **packed int32 keys**: the entry-distance lower bound's f32
    bits with the low bits replaced by the cluster id.  Positive-float
    bitcasts preserve order, and clearing the id bits only rounds the
    lower bound DOWN, so key order is entry order and the stop rule stays
    exact.  No sort anywhere — the kernel pops candidates with one
    min-reduction each;
  * the kernel owns the ordered-visit loop.  Per iteration it pops the
    PACK nearest remaining clusters, DMAs their premultiplied
    Baldwin-Weber coefficient panels (6, 8, K) from HBM into a composite
    (6, 8, 128) scratch — small clusters (K=32) keep boxes tight so far
    fewer triangles are tested, while the composite keeps every VPU op
    at full 128-lane width — and intersects 128 rays x 128 triangles
    with six (8,128)^T x (8,128) MXU matmuls (S_f = R^T P_f giving
    n.o - n.A, n.d, r1.o - r1.A, r1.d, r2.o - r2.A, r2.d for every
    (ray, tri) pair); the VPU epilogue forms t = -S0/S1,
    u = S2 + t S3, v = S4 + t S5 and min-reduces per ray.  DMA groups
    alternate so the next pack streams in while the current computes;
  * visits stop when the nearest remaining entry exceeds every ray's
    current best t (classic ordered-traversal exactness; duplicate or
    past-the-stop visits are idempotent, so the tail needs no masking).

Capability parity: this replaces the reference's hardware BVH query
(traceRayEXT at src/shaders/raygen.rgen:99-107 over the BLAS/TLAS stack,
src/vulkan/raytracing/blas.cppm:75-167, tlas.cppm:44-149).  Two-level
instancing is flattened at scene compile; alpha-tested any-hit
(opacity.rahit) wraps this backend in render/alpha.py.
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from realtimeraytracer_tpu.config import RenderConfig
from realtimeraytracer_tpu.ops import intersect
from realtimeraytracer_tpu.ops.intersect import BIG_T, HitRecord
from realtimeraytracer_tpu.render.backends import TraceBackend, _merge_sphere_hits
from realtimeraytracer_tpu.render.wide_backend import build_wide
from realtimeraytracer_tpu.scene.gpu_scene import GPUScene

F32 = jnp.float32
I32 = jnp.int32
TILE = 128          # rays per tile (lanes of the ray block)
K = int(_os.environ.get("PB_K", "32"))   # triangles per cluster
BT = int(_os.environ.get("PB_BT", "8"))  # ray tiles per grid step
_ABLATE = _os.environ.get("PB_ABLATE", "")     # "", "empty", "novisit"
_MAX_VISITS = int(_os.environ.get("PB_MAX_VISITS", "0"))  # 0 = unlimited
_VARIANT = _os.environ.get("PB_VARIANT", "mxu")  # "mxu" | "fma"
PACK = 128 // K     # clusters intersected per visit (composite width 128)
CPB = 1024          # clusters per (8, 128) key block
# Python float for in-kernel use (a jnp scalar would be a captured constant,
# which pallas kernels reject).
BIG = 3.0e38
EPS = 1e-12
INVALID = 0x7F800000                     # +inf bits: "no candidate left"
# (a Python int: jnp scalars become captured constants, which pallas
# kernels reject)


def _id_bits(total_clusters: int) -> int:
    return max(13, int(total_clusters - 1).bit_length())


def _pack_rays(origins, dirs, t_min, t_max):
    """(R,3)x2 + (R,)x2 -> (Ts, 8, 128) ray blocks (+ true ray count).

    Two big transposes instead of eight stride-3 slices — XLA lowers the
    former to efficient relayouts, the latter to strided gathers.
    """
    r = origins.shape[0]
    ts = -(-r // TILE)
    pad = ts * TILE - r
    if pad:
        origins = jnp.concatenate([origins, origins[:1].repeat(pad, 0)])
        dirs = jnp.concatenate([dirs, dirs[:1].repeat(pad, 0)])
        t_min = jnp.concatenate([t_min, jnp.full((pad,), BIG_T, F32)])
        t_max = jnp.concatenate([t_max, jnp.full((pad,), -BIG_T, F32)])
    rows = jnp.concatenate(
        [origins.T, dirs.T, t_min[None, :], t_max[None, :]], axis=0)  # (8, R)
    blk = rows.reshape(8, ts, TILE).transpose(1, 0, 2)
    return blk, r, ts


# Panel storage geometry: DMA units must be whole (x, 128) lane rows, so
# each cluster's six (8, K) coefficient families are tiled into a compact
# (8 * ROWBANDS, 128) block — family f lives at sublanes
# [8*(f // BPR), +8), lanes [K*(f % BPR), +K).
BPR = 128 // K                   # family blocks per 128-lane row band
ROWBANDS = -(-6 // BPR)
PROWS = 8 * ROWBANDS


def _family_pos(f: int) -> tuple[int, int]:
    return 8 * (f // BPR), K * (f % BPR)


def pack_clusters_np(tv0, tv1, tv2):
    """NumPy twin of pack_clusters, run ONCE at scene compile.

    (T, 3) Morton/SAH-sorted triangle vertices -> (panels, cl_min, cl_max)
    as numpy arrays; see pack_clusters for the layout contract.
    """
    import numpy as np

    t = tv0.shape[0]
    c = -(-t // K)
    pad = c * K - t

    def padv(x):
        x = np.asarray(x, np.float32)
        return np.concatenate([x, np.zeros((pad, 3), np.float32)]) if pad else x

    v0, v1, v2 = padv(tv0), padv(tv1), padv(tv2)
    e1, e2 = v1 - v0, v2 - v0
    n = np.cross(e1, e2)
    det = (n * n).sum(-1, keepdims=True)
    inv = np.where(det > 1e-24, 1.0 / np.where(det > 1e-24, det, 1.0), 0.0)
    r1 = np.cross(e2, n) * inv
    r2 = np.cross(n, e1) * inv
    rows = np.stack([n, r1, r2], 1).astype(np.float32)      # (T', 3, 3)
    offs = (rows * v0[:, None, :]).sum(-1).astype(np.float32)  # (T', 3)

    panels = np.zeros((c, PROWS, 128), np.float32)
    rows_c = rows.reshape(c, K, 3, 3)
    offs_c = offs.reshape(c, K, 3)
    for f, (row_idx, want_d) in enumerate(
            [(0, False), (0, True), (1, False), (1, True),
             (2, False), (2, True)]):
        rs, cs = _family_pos(f)
        lo = rs + (4 if want_d else 0)
        panels[:, lo:lo + 3, cs:cs + K] = rows_c[:, :, row_idx, :].transpose(0, 2, 1)
        if not want_d:
            panels[:, rs + 3, cs:cs + K] = -offs_c[:, :, row_idx]

    tmin = np.minimum(np.minimum(v0, v1), v2).reshape(c, K, 3)
    tmax = np.maximum(np.maximum(v0, v1), v2).reshape(c, K, 3)
    if pad:
        valid = (np.arange(c * K) < t).reshape(c, K, 1)
        tmin = np.where(valid, tmin, BIG_T)
        tmax = np.where(valid, tmax, -BIG_T)
    return panels, tmin.min(1).astype(np.float32), tmax.max(1).astype(np.float32)


def pack_clusters(gpu: GPUScene):
    """Scene -> (panels, cl_min, cl_max) for the kernel.

    panels: (C, PROWS, 128) premultiplied Baldwin-Weber coefficient
      panels; family f (an (8, K) matmul rhs) sits at _family_pos(f).
      With ray row R = [o.x o.y o.z 1 d.x d.y d.z 0] the product R P_f
      yields [n.o - n.A, n.d, r1.o - r1.A, r1.d, r2.o - r2.A, r2.d][f].
      Padded triangles are all-zero (plane normal 0 -> rejected by the
      denominator test), so no validity lane is needed.
    cl_min/cl_max: (C, 3) cluster AABBs for the XLA cull.
    """
    wd = build_wide(gpu, K)
    c = wd.cl_min.shape[0]
    rows = wd.bw_rows.reshape(c, K, 3, 3)       # (C, K, [n r1 r2], xyz)
    offs = wd.bw_offs.reshape(c, K, 3)          # (C, K, [n.A r1.A r2.A])

    panels = jnp.zeros((c, PROWS, 128), F32)
    for f, (row_idx, want_d) in enumerate(
            [(0, False), (0, True), (1, False), (1, True),
             (2, False), (2, True)]):
        coeff = rows[:, :, row_idx, :].transpose(0, 2, 1)   # (C, 3, K)
        rs, cs = _family_pos(f)
        lo = rs + (4 if want_d else 0)
        panels = panels.at[:, lo:lo + 3, cs:cs + K].set(coeff)
        if not want_d:
            panels = panels.at[:, rs + 3, cs:cs + K].set(
                -offs[:, :, row_idx])
    return panels, wd.cl_min, wd.cl_max


def cull_keys(rays, cl_min, cl_max):
    """Per-tile packed candidate keys (Ts, CBn, 8, 128) int32, XLA-side.

    Interval-arithmetic slab test of every cluster AABB against each
    tile's ray bundle (origin box x direction interval): conservative
    (false positives only cost visits) and yields an entry-distance
    LOWER bound, keeping the kernel's ordered-visit stop rule exact.
    The key packs the bound's f32 bits (id-bits cleared = rounded down,
    still a lower bound) with the cluster id.
    """
    ts = rays.shape[0]
    c = cl_min.shape[0]
    cbn = -(-c // CPB)
    bits = _id_bits(cbn * CPB)
    id_mask = (1 << bits) - 1

    tmin_lb = rays[:, 6, :].min(axis=1)[:, None]
    tmax_ub = rays[:, 7, :].max(axis=1)[:, None]

    # Per-axis 2D loop: every intermediate is (Ts, C) or (Ts, 1) — no
    # (Ts, C, 3) tensors for XLA to materialize.
    tn = None
    tf = None
    safe = lambda x: jnp.where(jnp.abs(x) > EPS, x, EPS)
    for a in range(3):
        o_lo = rays[:, a, :].min(axis=1)[:, None]          # (Ts, 1)
        o_hi = rays[:, a, :].max(axis=1)[:, None]
        d_lo = rays[:, 3 + a, :].min(axis=1)[:, None]
        d_hi = rays[:, 3 + a, :].max(axis=1)[:, None]
        span = (d_lo > EPS) | (d_hi < -EPS)                # sign-definite
        inv_lo = jnp.where(span, 1.0 / safe(d_hi), -BIG)
        inv_hi = jnp.where(span, 1.0 / safe(d_lo), BIG)

        def times(a_lo, a_hi, b_lo, b_hi):
            p1, p2 = a_lo * b_lo, a_lo * b_hi
            p3, p4 = a_hi * b_lo, a_hi * b_hi
            return (jnp.minimum(jnp.minimum(p1, p2), jnp.minimum(p3, p4)),
                    jnp.maximum(jnp.maximum(p1, p2), jnp.maximum(p3, p4)))

        bmin = cl_min[None, :, a]                          # (1, C)
        bmax = cl_max[None, :, a]
        t0l, t0h = times(bmin - o_hi, bmin - o_lo, inv_lo, inv_hi)
        t1l, t1h = times(bmax - o_hi, bmax - o_lo, inv_lo, inv_hi)
        lo_a = jnp.minimum(t0l, t1l)
        hi_a = jnp.maximum(t0h, t1h)
        tn = lo_a if tn is None else jnp.maximum(tn, lo_a)
        tf = hi_a if tf is None else jnp.minimum(tf, hi_a)
    possible = (tn <= tf) & (tf >= tmin_lb) & (tn <= tmax_ub)

    ent = jnp.maximum(tn, 0.0)
    ids = jnp.arange(c, dtype=I32)[None, :]
    key = (jax.lax.bitcast_convert_type(ent, I32) & ~id_mask) | ids
    key = jnp.where(possible, key, INVALID)
    pad = cbn * CPB - c
    if pad:
        key = jnp.concatenate(
            [key, jnp.full((ts, pad), INVALID, I32)], axis=1)
    return key.reshape(ts, cbn, 8, 128), id_mask


def _trace_kernel(rays_ref, keys_ref, panels_hbm, outf_ref, outi_ref,
                  ent_ref, panel_buf, sems, *, cbn, c, mode, id_mask):
    """One grid cell = BT 128-ray tiles; mode 'closest' or 'occluded'.

    BT tiles share one grid step (fori_loop below) because Mosaic
    serializes grid steps whose kernels hold manual DMAs inside a while
    loop — batching amortizes that per-step cost.

    Scratch: ent_ref (cbn, 8, 128) int32 remaining candidate keys,
    panel_buf (2, PACK, PROWS, 128) double-buffered compact-panel DMA
    target, sems (2, PACK) DMA semaphores.
    """
    if _ABLATE == "empty":                       # grid machinery only
        outf_ref[0, 0, :] = rays_ref[0, 6, :]
        outf_ref[0, 1, :] = rays_ref[0, 7, :]
        outf_ref[0, 2, :] = rays_ref[0, 0, :]
        outi_ref[0, 0, :] = keys_ref[0, 0, 0, :]
        outi_ref[0, 1, :] = keys_ref[0, 0, 1, :]
        return

    jax.lax.fori_loop(
        0, BT,
        lambda b, _: _tile_body(b, rays_ref, keys_ref, panels_hbm, outf_ref,
                                outi_ref, ent_ref, panel_buf, sems,
                                cbn=cbn, c=c, mode=mode, id_mask=id_mask),
        jnp.int32(0))


def _tile_body(b, rays_ref, keys_ref, panels_hbm, outf_ref, outi_ref,
               ent_ref, panel_buf, sems, *, cbn, c, mode, id_mask):
    """Full ordered-visit trace of ONE 128-ray tile (index b in the step)."""
    rays = rays_ref[b]                           # (8, 128)
    tmin_c = rays[6, :][:, None]                 # (128, 1) column
    tmax_c = rays[7, :][:, None]

    ent_ref[...] = keys_ref[b]

    def pop_group():
        """Pop PACK near-minimal keys with ONE full-array pass.

        Lane-distinct selection: reduce to per-lane minima (1, 128), then
        take PACK successive minima of that small vector.  The first is
        the true global minimum (so the ordered-visit stop rule stays
        exact); later ones are merely near-minimal, which only perturbs
        visit order, not correctness.  One masked write retires all PACK.
        """
        e = ent_ref[...]
        lane_min = jnp.min(e, axis=(0, 1), keepdims=True)[0]   # (1, 128)
        ms = []
        for _ in range(PACK):
            m = jnp.min(lane_min)
            ms.append(m)
            if PACK > 1:
                lane_min = jnp.where(lane_min == m, INVALID, lane_min)
        popped = e == ms[0]
        for m in ms[1:]:
            popped = popped | (e == m)
        ent_ref[...] = jnp.where(popped, INVALID, e)
        return ms

    def dma(group, u, key):
        cid = jnp.minimum(key & id_mask, c - 1)
        return pltpu.make_async_copy(
            panels_hbm.at[cid], panel_buf.at[group, u], sems.at[group, u])

    def composite(group):
        """(8, 768) matmul rhs: 6 families x PACK clusters side by side."""
        parts = []
        for f in range(6):
            rs, cs = _family_pos(f)
            parts += [panel_buf[group, u, rs:rs + 8, cs:cs + K]
                      for u in range(PACK)]
        return jnp.concatenate(parts, axis=1)

    # Matmul lhs: rays extended with a ones row (for the -A offsets) and a
    # zeros row, so S_f = lhs^T P_f gives the six inner-product families.
    lhs = jnp.concatenate(
        [rays[0:3], jnp.ones((1, TILE), F32), rays[3:6],
         jnp.zeros((1, TILE), F32)], axis=0)     # (8, 128)

    lane = jax.lax.broadcasted_iota(I32, (TILE, 1), 0)  # 0..127 column

    def cond(state):
        keys, best_t, best_k, uv_c, visits = state
        limit_bits = jax.lax.bitcast_convert_type(
            jnp.minimum(best_t, tmax_c), I32)
        worst = jnp.max(limit_bits)              # int-ordered: pads (<0) lose
        go = (keys[0] != INVALID) & ((keys[0] & ~id_mask) <= worst)
        if _ABLATE in ("novisit", "nopop", "nodma"):
            go = go & (visits < 0)
        elif _MAX_VISITS:
            go = go & (visits < _MAX_VISITS)
        return go

    def body(state):
        keys, best_t, best_k, uv_c, visits = state
        g = jax.lax.rem(visits, 2)

        # Pop + start the NEXT pack's DMAs while this pack computes.
        nxt = pop_group()
        for u in range(PACK):
            dma(1 - g, u, nxt[u]).start()
        if _ABLATE != "nowait":                  # perf probe only
            for u in range(PACK):
                dma(g, u, keys[u]).wait()

        if _VARIANT == "fma":
            # 21 outer-product FMAs on the VPU: exact f32, no MXU passes.
            comp = composite(g)                  # (8, 768)
            cols = [lhs[a, :][:, None] for a in range(7)]  # (128,1) each

            def fam(f):
                return comp[:, f * TILE:(f + 1) * TILE]

            def dot_o(f):
                p = fam(f)
                return (cols[0] * p[0:1, :] + cols[1] * p[1:2, :]
                        + cols[2] * p[2:3, :] + p[3:4, :])

            def dot_d(f):
                p = fam(f)
                return (cols[4] * p[4:5, :] + cols[5] * p[5:6, :]
                        + cols[6] * p[6:7, :])

            s0, s1 = dot_o(0), dot_d(1)
            s2, s3 = dot_o(2), dot_d(3)
            s4, s5 = dot_o(4), dot_d(5)
        else:
            s = jax.lax.dot_general(
                lhs, composite(g),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=F32,
            )                                    # (128 rays, 6*128)
            s0, s1, s2, s3, s4, s5 = [
                s[:, f * TILE:(f + 1) * TILE] for f in range(6)]

        den_ok = jnp.abs(s1) > EPS
        t = jnp.where(den_ok, -s0 / jnp.where(den_ok, s1, 1.0), BIG)
        u = s2 + t * s3
        v = s4 + t * s5
        limit = jnp.minimum(best_t, tmax_c)
        ok = (den_ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
              & (t >= tmin_c) & (t <= limit))

        if mode == "closest":
            # Pack (t | lane) into one int so ONE lane-reduction finds both
            # the best t and its lane (bitcasts of non-negative f32 are
            # order-preserving; clearing the low 7 bits rounds t down by
            # <= 2^-16 relative — far below f32 hit-point noise).
            # Misses use +inf: its bits (0x7F800000 | lane) order above any
            # finite t-key, so a no-hit visit can never look "better".
            tm = jnp.where(ok, t, jnp.float32(jnp.inf))
            lane_t = jax.lax.broadcasted_iota(I32, (TILE, TILE), 1)
            tkey = (jax.lax.bitcast_convert_type(tm, I32) & ~127) | lane_t
            kbest = jnp.min(tkey, axis=1, keepdims=True)      # (128, 1)
            best_bits = jax.lax.bitcast_convert_type(best_t, I32)
            better = kbest < best_bits
            kmin = kbest & 127
            # Second reduction extracts the winner's (u, v), quantized to
            # 12 bits each in one f32-exact integer (<= 2^24).
            uvq = (jnp.clip(u * 4095.0, 0.0, 4095.0).astype(I32) * 4096
                   + jnp.clip(v * 4095.0, 0.0, 4095.0).astype(I32))
            uv_win = jnp.max(jnp.where(lane_t == kmin, uvq, -1),
                             axis=1, keepdims=True)           # (128, 1)
            # Composite lane -> sorted-triangle id: cluster = packed slot
            # kmin // K (its id from this pack's keys), tri = kmin % K.
            if PACK == 1:
                tri = (keys[0] & id_mask) * K + kmin
            else:
                slot = jax.lax.shift_right_logical(kmin, K.bit_length() - 1)
                cid_sel = keys[PACK - 1] & id_mask
                for uu in range(PACK - 2, -1, -1):
                    cid_sel = jnp.where(slot == uu, keys[uu] & id_mask,
                                        cid_sel)
                tri = cid_sel * K + jax.lax.rem(kmin, K)
            best_t = jnp.where(
                better,
                jax.lax.bitcast_convert_type(kbest & ~127, F32), best_t)
            best_k = jnp.where(better, tri, best_k)
            uv_c = jnp.where(better, uv_win, uv_c)
        else:
            hit_any = jnp.any(ok, axis=1, keepdims=True)
            # Occluded rays collapse to -BIG so the stop rule retires them.
            best_t = jnp.where(hit_any, -BIG, best_t)

        return (tuple(nxt), best_t, best_k, uv_c, visits + 1)

    if _ABLATE == "nopop":
        first = [jnp.int32(INVALID)] * PACK
    else:
        first = pop_group()
    if _ABLATE != "nodma":
        for u in range(PACK):
            dma(0, u, first[u]).start()
    init = (
        tuple(first),
        jnp.full((TILE, 1), BIG, F32),
        jnp.full((TILE, 1), -1, I32),
        jnp.zeros((TILE, 1), I32),
        jnp.int32(0),
    )
    keys_end, best_t, best_k, uv_c, visits = jax.lax.while_loop(
        cond, body, init)

    # The last started pack (group visits%2) was never waited on: retire it.
    if _ABLATE != "nodma":
        for u in range(PACK):
            dma(jax.lax.rem(visits, 2), u, keys_end[u]).wait()

    if mode == "closest":
        outf_ref[b, 0, :] = best_t[:, 0]
        outf_ref[b, 1, :] = (uv_c[:, 0] >> 12).astype(F32) * (1.0 / 4095.0)
        outf_ref[b, 2, :] = (uv_c[:, 0] & 4095).astype(F32) * (1.0 / 4095.0)
    else:
        outf_ref[b, 0, :] = jnp.where(best_t[:, 0] < 0.0, 1.0, 0.0)
        outf_ref[b, 1, :] = jnp.zeros((TILE,), F32)
        outf_ref[b, 2, :] = jnp.zeros((TILE,), F32)
    outi_ref[b, 0, :] = best_k[:, 0]
    outi_ref[b, 1, :] = jnp.full((TILE,), 1, I32) * visits
    return jnp.int32(0)


def trace_blocks(gpu: GPUScene, cfg: RenderConfig, ray_blocks, mode):
    """Trace packed (Ts, 8, 128) ray blocks.

    Returns (outf, outi): outf rows [t | u | v] ('closest') or
    [occluded-flag | - | -] ('occluded'); outi rows [sorted-tri id or -1 |
    visit count].
    """
    ts = ray_blocks.shape[0]
    if gpu.pallas_panels is not None and gpu.pallas_panels.shape[1] == PROWS:
        panels = gpu.pallas_panels
        cl_min, cl_max = gpu.pallas_cl_min, gpu.pallas_cl_max
    else:
        panels, cl_min, cl_max = pack_clusters(gpu)
    c = panels.shape[0]
    # Pad the tile count to a BT multiple; pad tiles carry t_min=+BIG /
    # t_max=-BIG so the cull yields no candidates and visits exit at once.
    pad = (-ts) % BT
    if pad:
        pad_blk = jnp.broadcast_to(ray_blocks[:1], (pad, 8, TILE))
        pad_blk = pad_blk.at[:, 6, :].set(BIG_T)
        pad_blk = pad_blk.at[:, 7, :].set(-BIG_T)
        ray_blocks = jnp.concatenate([ray_blocks, pad_blk])
    tsp = ts + pad
    keys, id_mask = cull_keys(ray_blocks, cl_min, cl_max)
    cbn = keys.shape[1]

    kernel = functools.partial(_trace_kernel, cbn=cbn, c=c, mode=mode,
                               id_mask=id_mask)
    outf, outi = pl.pallas_call(
        kernel,
        grid=(tsp // BT,),
        in_specs=[
            pl.BlockSpec((BT, 8, TILE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BT, cbn, 8, 128), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),   # panels stay in HBM
        ],
        out_specs=[
            pl.BlockSpec((BT, 8, TILE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BT, 8, TILE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((tsp, 8, TILE), F32),
            jax.ShapeDtypeStruct((tsp, 8, TILE), I32),
        ],
        scratch_shapes=[
            pltpu.VMEM((cbn, 8, 128), I32),
            pltpu.VMEM((2, PACK, PROWS, 128), F32),
            pltpu.SemaphoreType.DMA((2, PACK)),
        ],
        interpret=jax.default_backend() != "tpu",
    )(ray_blocks, keys, panels)
    return outf[:ts], outi[:ts]


def _run(gpu: GPUScene, cfg: RenderConfig, origins, dirs, t_min, t_max, mode):
    r = origins.shape[0]
    t_min = jnp.broadcast_to(jnp.asarray(t_min, F32), (r,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, F32), (r,)).astype(F32)
    rays, r_orig, ts = _pack_rays(origins, dirs, t_min, t_max)
    outf, outi = trace_blocks(gpu, cfg, rays, mode)
    tb = outf[:, 0, :].reshape(-1)[:r_orig]
    kb = outi[:, 0, :].reshape(-1)[:r_orig]
    ub = outf[:, 1, :].reshape(-1)[:r_orig]
    vb = outf[:, 2, :].reshape(-1)[:r_orig]
    return tb, kb, ub, vb


def pallas_closest(gpu, cfg, origins, dirs, t_min, t_max) -> HitRecord:
    tb, kb, ub, vb = _run(gpu, cfg, origins, dirs, t_min, t_max, "closest")
    # scene.compile permutes the face table into BVH order (bvh_tri_id is
    # the identity), so the sorted triangle id IS the face id — no gather.
    orig = jnp.where(kb >= 0, kb, -1)
    ub = jnp.where(kb >= 0, ub, 0.0)
    vb = jnp.where(kb >= 0, vb, 0.0)
    return HitRecord(t=tb, prim_id=orig.astype(I32), u=ub, v=vb)


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
