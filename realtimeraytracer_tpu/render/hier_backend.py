"""Pallas traversal kernel v8: in-kernel per-ray hierarchical culling.

Seventh backend generation (ladder: bvh -> packet -> wide -> pallas v1 ->
packed-key v5 -> resident v7 -> this).  v7's two structural ceilings
(VERDICT r2):

  * the XLA hull cull is FLAT — every 128-ray tile slab-tests all T/32
    subcluster AABBs, so cull cost and the candidate-key tensor grow
    linearly with scene size (>>130k tris falls off a cliff); and
  * it is PER-TILE — each tile pays the union of its rays' shafts
    (interval-arithmetic hull of 128 origins x directions), which for
    shadow/bounce rays admits ~4-5x more candidate blocks than any single
    ray needs (PERF.md: ~36 blocks/tile for lit shadow rays).

v8 moves the whole cull INSIDE the kernel as a two-level per-ray
hierarchy over the Morton/SAH-sorted triangle order:

  block  = 128 consecutive sorted triangles (one coefficient panel),
  super  = 128 consecutive blocks (16 384 triangles).

Per tile: slab-test all 128 rays against all supercluster AABBs (one
(128 rays x 128 supers) VPU pass per 16.7M-triangle page), pop supers in
entry order; per popped super, slab-test 128 rays x its 128 block AABBs
(entry window clipped per ray by the CURRENT best_t — the cull adapts as
hits land), pop blocks in entry order and run v7's 128-wide visits.
Every entry bound is a per-ray exact slab result reduced over the tile's
live rays — not a hull — so candidate unions shrink to what some ray
actually needs, occluded/retired rays (empty windows) stop contributing,
and total work is proportional to per-ray-relevant geometry, not scene
size.  No candidate-key tensor leaves the kernel at all.

**Shared-geometry instancing** (GPUScene.instanced): the top level
becomes (instance, supercluster) pairs with world-space AABBs.  Popping
a pair reads the instance's inverse transform from SMEM and transforms
the tile's ray columns into MESH space once (~30 VPU ops); block culls
and visits then run against the instance's shared mesh-space panels.
Ray parameters stay world-valid because directions are NOT renormalized
— t is invariant under the affine map — so best-t ordering and the stop
rule work globally across instances.  Parity: one BLAS per unique mesh,
instanced N x (geometry_builder.cppm:178-198, tlas.cppm:60-67).

Capability parity: replaces traceRayEXT's hardware BLAS/TLAS descent
(src/shaders/raygen.rgen:99-107; src/vulkan/raytracing/blas.cppm:75-167,
tlas.cppm:44-149) with a TPU-shaped hierarchy: levels are 128-wide AABB
panels matched to the VPU lane width instead of binary nodes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from realtimeraytracer_tpu.config import RenderConfig
from realtimeraytracer_tpu.ops import intersect
from realtimeraytracer_tpu.ops.intersect import BIG_T, HitRecord
from realtimeraytracer_tpu.render.backends import TraceBackend, _merge_sphere_hits
from realtimeraytracer_tpu.render.pallas_backend import (
    CB,
    CROWS,
    PACK,
    RESIDENT_CB,
    _knob,
    _pack_rays,
    pack_clusters,
)
from realtimeraytracer_tpu.scene.gpu_scene import GPUScene

F32 = jnp.float32
I32 = jnp.int32
TILE = 128
SUP = 128            # blocks per supercluster
BT = 8               # ray tiles per grid step
BIG = 3.0e38
EPS = 1e-12
INVALID = 0x7F800000  # +inf bits: "no candidate left"
# Low bits carrying ids inside packed entry keys: 12 bits covers the
# SPAGES*128 = 3072 L1 pair/super ids (r5 — 10 bits silently corrupted
# ids >= 1024 once SPAGES grew past 8).  Clearing 12 entry-mantissa bits
# only rounds entries DOWN (~2^-11 relative), which stays conservative
# for the ordered-visit stop rule: extra tail visits, never missed ones.
SMASK = 0xFFF
# L1 key rows in scratch: SPAGES*128 supers / (instance, super) pairs max.
# 24 pages = 3072 pairs covers reference-scale instanced scenes (the r5
# foliage_field flagship carries ~2.6k pairs); non-instanced scenes only
# pay the pad pages an INVALID fill each (measured noise), and the
# scratch is 12 KB of VMEM.
SPAGES = int(_knob("HB_SPAGES", "24"))
# Exact-ordered pop->visit cycles per while-loop body (resident path):
# pays the cond's unoverlappable stop-rule reduce once per STRIDE visits
# for <= STRIDE-1 tail-overshoot visits (~4% extra, r4 probe 080).
STRIDE = 2
# Capped-visit round lengths before each mid-traversal re-cull of a
# super's block list against the now-tight per-ray limits (empty = off).
# Closest gets two rounds (bounce rays: 386 -> 264 ms, probe 160);
# occlusion one round — neutral on coherent frame shadows (89.2 vs
# 89.9 ms) but 9% on incoherent bounce-NEE segments (192 -> 175 ms,
# probe 180).  See outer_body.
RECULL_ROUNDS_CLOSEST = (8, 8)
RECULL_ROUNDS_OCCLUDED = (8,)
# Occlusion L2 visit order: live-ray coverage (descending) instead of
# entry distance — see cull(count_order=...).  Flipped by the r5 A/B.
OCC_COUNT_ORDER = False


def nsup_pages(n: int) -> int:
    return -(-n // 128)


def pack_hierarchy(cl_min, cl_max):
    """Subcluster AABBs (NB*4, 3) -> (sup_panel, blk_panels) AABB pages.

    blk_panels (NSUP, 8, 128): rows [minx,miny,minz,maxx,maxy,maxz,0,0],
    lanes = block index within the super.  sup_panel (SPAGES, 8, 128):
    lanes = supercluster index (page-major).  Invalid lanes carry
    (+BIG, -BIG) boxes, masked by the cull's box-validity row.  Works
    under jit (refit path) and on host numpy alike.
    """
    xp = jnp if isinstance(cl_min, jnp.ndarray) else np
    c32 = cl_min.shape[0]
    nb = c32 // 4
    bmin = cl_min.reshape(nb, 4, 3).min(axis=1)
    bmax = cl_max.reshape(nb, 4, 3).max(axis=1)
    nsup = -(-nb // SUP)
    padb = nsup * SUP - nb
    if padb:
        bmin = xp.concatenate(
            [bmin, xp.full((padb, 3), BIG_T, bmin.dtype)])
        bmax = xp.concatenate(
            [bmax, xp.full((padb, 3), -BIG_T, bmax.dtype)])
    pad2 = xp.zeros((nsup, 2, SUP), bmin.dtype)
    blk = xp.concatenate([
        bmin.reshape(nsup, SUP, 3).transpose(0, 2, 1),
        bmax.reshape(nsup, SUP, 3).transpose(0, 2, 1),
        pad2,
    ], axis=1)

    smin = bmin.reshape(nsup, SUP, 3).min(axis=1)
    smax = bmax.reshape(nsup, SUP, 3).max(axis=1)
    if nsup > SPAGES * 128:
        raise ValueError(
            f"{nsup} superclusters exceeds the {SPAGES * 128} scratch limit "
            f"({SPAGES * 128 * SUP * CB} tris); raise SPAGES")
    pads = SPAGES * 128 - nsup
    smin = xp.concatenate([smin, xp.full((pads, 3), BIG_T, smin.dtype)])
    smax = xp.concatenate([smax, xp.full((pads, 3), -BIG_T, smax.dtype)])
    pad2 = xp.zeros((SPAGES, 2, 128), smin.dtype)
    sup = xp.concatenate([
        smin.reshape(SPAGES, 128, 3).transpose(0, 2, 1),
        smax.reshape(SPAGES, 128, 3).transpose(0, 2, 1),
        pad2,
    ], axis=1)
    return sup, blk


def _tile_body(b, rays_ref, sup_ref, blk_ref, coeff_ref, outf_ref, outi_ref,
               sk_ref, cbuf, sems, tab_ref, inv_ref, hint_ref=None,
               am_ref=None, *, cb, nl1, mode, common, resident, pack,
               instanced, stride=1, recull_rounds=(), count_order=False):
    """Full hierarchical trace of ONE 128-ray tile (index b in the step).

    nl1: number of valid L1 entries (superclusters, or (instance, super)
    pairs when instanced).
    """
    rays = rays_ref[b]                              # (8, 128)
    tmin_c = rays[6, :][:, None]                    # (128, 1)
    tmax_c = rays[7, :][:, None]

    # World-space ray columns (L1 culls always run in world space).
    wo = [rays[a, :][:, None] for a in range(3)]
    wd = [rays[3 + a, :][:, None] for a in range(3)]

    def derive(dcols):
        """Parallel-axis flags + guarded inverse directions for a slab
        test: axes where |d| <= EPS conservatively pass every slab
        (exactness is load-bearing; false positives only cost visits)."""
        fl = [jnp.abs(dcols[a]) <= EPS for a in range(3)]
        iv = [1.0 / jnp.where(fl[a], 1.0, dcols[a]) for a in range(3)]
        return iv, fl

    winv, wfl = derive(wd)

    # Visit-math ray columns for the NON-instanced path (v7's
    # collapsed-dot fast paths; instanced visits use per-pair transformed
    # columns instead).
    vocol, vdcol = wo, wd
    if common == "origin":
        vocol = [rays[a, 0:1][:, None] for a in range(3)]
    elif common == "dir":
        vdcol = [rays[3 + a, 0:1][:, None] for a in range(3)]

    lane_t = jax.lax.broadcasted_iota(I32, (TILE, CB), 1)
    lane_row = jax.lax.broadcasted_iota(I32, (1, 128), 1)

    def cull(panel, limit, base_id, oc, iv, fl, count_order=False):
        """(128 rays) x (128 boxes) slab test -> packed (1, 128) keys.

        panel: (8, 128) AABB rows; limit: (128, 1) per-ray upper window
        min(best_t, tmax).  Key = (min-entry-over-rays bits & ~SMASK) |
        (base_id + lane); INVALID where no live ray overlaps.

        count_order (occlusion L2 only): order by DESCENDING live-ray
        coverage instead of entry — any-hit traversal needs no entry
        order for correctness (retirement is idempotent and the cull
        itself excludes out-of-window boxes), and the block covering the
        most live shafts is the likeliest dominant occluder, so visiting
        it first retires rays (and whole tiles) earliest.  Keys stay
        int-ordered small positives, so the `<= worst` stop rule still
        exits exactly when every ray is occluded (worst < 0).
        """
        near = None
        far = None
        for a in range(3):
            bmin = panel[a:a + 1, :]                 # (1, 128)
            bmax = panel[3 + a:4 + a, :]
            t0 = (bmin - oc[a]) * iv[a]              # (128, 128)
            t1 = (bmax - oc[a]) * iv[a]
            na = jnp.where(fl[a], -BIG, jnp.minimum(t0, t1))
            fa = jnp.where(fl[a], BIG, jnp.maximum(t0, t1))
            near = na if near is None else jnp.maximum(near, na)
            far = fa if far is None else jnp.minimum(far, fa)
        # Pad lanes carry INVERTED boxes (+BIG, -BIG) — the reordered slab
        # test (min/max of t0,t1) would PASS them for every ray with
        # near=-inf, making phantom entry-0 candidates that pop before all
        # real geometry (measured: 128 outer iterations and ~14k
        # visits/tile at 16 real blocks).  Mask them explicitly.
        valid = panel[0:1, :] <= panel[3:4, :]       # (1, 128)
        ok = valid & (near <= far) & (far >= tmin_c) & (near <= limit)
        if count_order:
            cnt = jnp.sum(ok.astype(F32), axis=0, keepdims=True)  # (1, 128)
            key = ((jnp.int32(TILE) - cnt.astype(I32)) << 12) \
                | (lane_row + base_id)
            return jnp.where(cnt > 0.0, key, INVALID)
        ent = jnp.where(ok, jnp.maximum(near, 0.0), jnp.float32(jnp.inf))
        emin = jnp.min(ent, axis=0, keepdims=True)   # (1, 128)
        key = (jax.lax.bitcast_convert_type(emin, I32) & ~SMASK) \
            | (lane_row + base_id)
        return jnp.where(jnp.isfinite(emin), key, INVALID)

    def intersect_block(c, oc, dc, cid=None):
        """Baldwin-Weber t of 128 rays x this block's 128 tris (v7 math).

        c: (12, 128) rows [n | -nA | r1 | -r1A | r2 | -r2A]; oc/dc: ray
        columns ((128,1) or collapsed (1,1)); cid: panel id for the
        alpha-mask row lookup (None disables the mask)."""
        def dot_o(base):
            return (oc[0] * c[base + 0:base + 1]
                    + oc[1] * c[base + 1:base + 2]
                    + oc[2] * c[base + 2:base + 3]
                    + c[base + 3:base + 4])

        def dot_d(base):
            return (dc[0] * c[base + 0:base + 1]
                    + dc[1] * c[base + 1:base + 2]
                    + dc[2] * c[base + 2:base + 3])

        s0, s1 = dot_o(0), dot_d(0)
        den_ok = jnp.abs(s1) > EPS
        t = jnp.where(den_ok, -s0 / jnp.where(den_ok, s1, 1.0), BIG)
        u = dot_o(4) + t * dot_d(4)
        v = dot_o(8) + t * dot_d(8)
        ok = (den_ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
              & (t >= tmin_c))
        if am_ref is not None and cid is not None:
            # In-kernel conservative alpha mask (ops/alpha_mask.py):
            # rejects definitely-transparent hits exactly as the re-trace
            # ladder's texture eval would — barycentrics are affine-
            # invariant, so the mesh-space u/v of the instanced path
            # index the same mask cells as world-space ones.
            from realtimeraytracer_tpu.render.pallas_backend import _mask_ok
            ok = _mask_ok(ok, u, v, am_ref[cid])
        return t, ok

    def worst_of(best_t):
        limit_bits = jax.lax.bitcast_convert_type(
            jnp.minimum(best_t, tmax_c), I32)
        return jnp.max(limit_bits)

    def visit(cid, c, oc, dc, inst, best_t, best_k, best_i):
        t, ok = intersect_block(c, oc, dc, cid)
        if mode == "closest":
            limit = jnp.minimum(best_t, tmax_c)
            ok = ok & (t <= limit)
            tm = jnp.where(ok, t, jnp.float32(jnp.inf))
            tkey = (jax.lax.bitcast_convert_type(tm, I32) & ~127) | lane_t
            kbest = jnp.min(tkey, axis=1, keepdims=True)
            best_bits = jax.lax.bitcast_convert_type(best_t, I32)
            better = kbest < best_bits
            tri = cid * CB + (kbest & 127)
            best_t = jnp.where(
                better,
                jax.lax.bitcast_convert_type(kbest & ~127, F32), best_t)
            best_k = jnp.where(better, tri, best_k)
            if instanced:
                best_i = jnp.where(better, inst, best_i)
        else:
            ok = ok & (t <= tmax_c)
            hit_any = jnp.any(ok, axis=1, keepdims=True)
            # Record each ray's FIRST occluder block (best_k is otherwise
            # unused in occluded mode): two cheap vector ops feeding the
            # per-tile shadow-hint outputs (see _tile_body).
            best_k = jnp.where(hit_any & (best_k < 0), cid, best_k)
            best_t = jnp.where(hit_any, -BIG, best_t)
        return best_t, best_k, best_i

    # ---- shadow-hint warm start (occluded, resident only) --------------
    # Visit the previous sample's dominant occluder blocks FIRST: per-tile
    # occluder sets are heavily concentrated (measured 1080p/100k area
    # shadows: the top-2 blocks cover 93% of occluded rays) and transfer
    # losslessly across a light's stochastic samples (0.990 vs 0.991
    # coverage, r5 probe 160).  Rays the hints occlude enter the L1/L2
    # culls with EMPTY windows, so the whole traversal below prices only
    # the lit + missed remainder.  Extra visits are idempotent — results
    # are exactly those of the unhinted trace.
    best_t0 = jnp.full((TILE, 1), BIG, F32)
    best_k0 = jnp.full((TILE, 1), -1, I32)
    if hint_ref is not None:
        for j in range(hint_ref.shape[1]):
            h = hint_ref[b, j]

            def hint_visit(args, h=h):
                bt, bk = args
                cid = jnp.minimum(h, cb - 1)
                bt, bk, _ = visit(cid, coeff_ref[cid], vocol, vdcol,
                                  jnp.int32(0), bt, bk,
                                  jnp.full((TILE, 1), -1, I32))
                return bt, bk

            best_t0, best_k0 = jax.lax.cond(
                h >= 0, hint_visit, lambda a: a, (best_t0, best_k0))

    # ---- L1: per-ray cull of supers / (instance, super) pairs ----------
    limit0 = jnp.minimum(best_t0, tmax_c)
    for sp in range(nsup_pages(nl1)):
        sk_ref[sp] = cull(sup_ref[sp], limit0, sp * 128, wo, winv, wfl)[0]
    for sp in range(nsup_pages(nl1), SPAGES):
        sk_ref[sp] = jnp.full((128,), INVALID, I32)

    def pop_l1():
        e = sk_ref[...]
        m = jnp.min(e)
        sk_ref[...] = jnp.where(e == m, INVALID, e)
        return m

    def pop_blocks(bkeys):
        """Pop `pack` near-minimal keys (v7's lane-distinct multi-pop).

        The FIRST popped is the true minimum (the inner stop rule stays
        exact); later ones are merely near-minimal, which only perturbs
        visit order.  Amortizes the while-loop cond + scalar machinery
        over `pack` visits."""
        ms = []
        e = bkeys
        for _ in range(pack):
            m = jnp.min(e)
            ms.append(m)
            e = jnp.where(e == m, INVALID, e)
        return tuple(ms), e

    def dma(slot, u, cid):
        return pltpu.make_async_copy(coeff_ref.at[cid], cbuf.at[slot, u],
                                     sems.at[slot, u])

    # ---- nested ordered-pop loops --------------------------------------
    # Both loop conds use a CARRIED `worst` bound refreshed inside the
    # bodies from the best_t available at body entry (one iteration
    # stale).  best_t only decreases, so the stale bound is >= the fresh
    # one: the loops can only run extra tail iterations, and an extra
    # ordered visit can never improve best (its entry exceeds every live
    # limit), so output is bit-identical.  The win: the stop-rule reduce
    # (a (128,1) max + vector->scalar trip that loop control could never
    # overlap) now issues inside the body, overlapping visit FMAs, and
    # the conds are pure scalar compares (measured on v9: 53.0 ->
    # 49.7 ms primaries, r5).
    def outer_cond(st):
        nexts, best_t, best_k, best_i, worst, visits, oiters = st
        return (nexts != INVALID) & ((nexts & ~SMASK) <= worst)

    def outer_body(st):
        nexts, best_t, best_k, best_i, worst, visits, oiters = st
        # (worst is re-refreshed at inner-loop init and inside its body;
        # the value returned below is the inner loop's final refresh.)
        l1 = jnp.minimum(nexts & SMASK, nl1 - 1)
        if instanced:
            # (instance, super) pair: fetch the instance transform and
            # this super's mesh-space panel/coefficient bases, then
            # transform the tile's ray columns into mesh space ONCE.
            # SMEM packing (r5): SMEM 2-D arrays pad the MINOR dim to 128
            # elements (512 B/row — a (PP, 4) tab at 2.7k pairs is
            # 1.4 MB, over the 1 MB SMEM), so the tab is TRANSPOSED
            # (2, PP) packed words (row0 = inst, row1 = blk_panel |
            # block_base << 16 — 21 KB) and the (I, 12) instance
            # transforms live in VMEM, read per pair as one row + 12
            # lane extracts (amortized over the pair's whole visit loop;
            # the flagship's 2.6k instances would need 16 MB as SMEM).
            inst = tab_ref[0, l1]
            w1 = tab_ref[1, l1]
            bp = w1 & 0xFFFF
            bbase = jax.lax.shift_right_logical(w1, 16)
            irow = inv_ref[jnp.minimum(inst, inv_ref.shape[0] - 1)]
            ir = [irow[k] for k in range(12)]
            oc = [ir[3 * i + 0] * wo[0] + ir[3 * i + 1] * wo[1]
                  + ir[3 * i + 2] * wo[2] + ir[9 + i] for i in range(3)]
            dc = [ir[3 * i + 0] * wd[0] + ir[3 * i + 1] * wd[1]
                  + ir[3 * i + 2] * wd[2] for i in range(3)]
            iv, fl = derive(dc)
            panel = blk_ref[bp]
            voc, vdc = oc, dc
        else:
            inst = jnp.int32(0)
            bbase = l1 * SUP
            oc, iv, fl = wo, winv, wfl
            panel = blk_ref[l1]
            voc, vdc = vocol, vdcol
        # L2: per-ray block cull, window clipped by the live best_t;
        # occlusion orders by live-ray coverage (see cull).
        corder = mode == "occluded" and count_order
        bkeys = cull(panel, jnp.minimum(best_t, tmax_c), 0, oc, iv, fl,
                     count_order=corder)
        nxt_l1 = pop_l1()                  # pop-ahead: overlaps below
        nextg, bkeys = pop_blocks(bkeys)
        if not resident:
            # HBM coefficient path (scenes > RESIDENT_CB blocks): start
            # the first group's copies; each iteration starts the NEXT
            # group into the other buffer slot before waiting on the
            # current — v7's double-buffering, per 6 KB block.
            for u in range(pack):
                dma(0, u, bbase + jnp.minimum(nextg[u] & SMASK, SUP - 1)
                    ).start()

        def make_inner(cap):
            """Ordered-visit while loop over this super's block keys;
            cap (static int or None) bounds BODY iterations for the
            re-cull split below."""
            def inner_cond(st2):
                nextg, _, _, best_t, _, _, worst, _, lv = st2
                ok = ((nextg[0] != INVALID)
                      & ((nextg[0] & ~SMASK) <= worst))
                if cap is not None:
                    ok = ok & (lv < cap)
                return ok

            def inner_body(st2):
                nextg, g, bkeys, best_t, best_k, best_i, worst, visits, \
                    lv = st2
                worst = worst_of(best_t)     # stale-worst refresh (above)
                # Popped INVALID group members clamp to block 0 of this
                # super — a redundant (harmless) visit at the
                # candidate-list tail, the same trade v7 makes.
                #
                # stride > 1 (resident path): run `stride` exact-ordered
                # {pop-ahead, visit} cycles per while-loop body.  The
                # cond's stop-rule reduce (a (128,1) max + vector->scalar
                # trip that CANNOT overlap anything — loop control gates
                # the next iteration) is paid once per `stride` visits.
                # Visit order is IDENTICAL to stride=1 (each cycle pops
                # sequentially, unlike pack's near-minimal multi-pop);
                # the only cost is up to stride-1 overshoot visits at the
                # candidate-list tail (~4% extra visits, r4 probe 080).
                for _ in range(stride):
                    nxt, bkeys = pop_blocks(bkeys)
                    if not resident:
                        for u in range(pack):
                            dma(1 - g, u, bbase
                                + jnp.minimum(nxt[u] & SMASK, SUP - 1)
                                ).start()
                        for u in range(pack):
                            dma(g, u, bbase
                                + jnp.minimum(nextg[u] & SMASK, SUP - 1)
                                ).wait()
                    for u, m in enumerate(nextg):
                        cid = bbase + jnp.minimum(m & SMASK, SUP - 1)
                        c = coeff_ref[cid] if resident else cbuf[g, u]
                        best_t, best_k, best_i = visit(
                            cid, c, voc, vdc, inst, best_t, best_k, best_i)
                    nextg = nxt
                    g = 1 - g
                    visits = visits + pack
                return nextg, g, bkeys, best_t, best_k, best_i, worst, \
                    visits, lv + 1
            return inner_cond, inner_body

        # Mid-traversal re-cull (r4): the block list above was computed
        # against the PRE-super best_t; for incoherent tiles most rays
        # finalize within the first few ordered visits, after which the
        # stale list keeps feeding blocks only relevant to already-
        # finished rays (measured: 62 visits/tile on bounce rays vs an
        # oracle-t union of 18).  So: run RECULL_AFTER capped visits,
        # re-run the per-ray block cull against the NOW-tight limits
        # (limits only shrink, so the fresh pass-set is a subset; popped
        # blocks stay retired via the INVALID mask), repeat per round,
        # then finish uncapped.  Costs one extra cull per round per
        # super; exactness unchanged (same ordered-visit stop rule,
        # conservative culls throughout; measured bit-identical, probe
        # 150).  Applies on the HBM path too — the re-cull reads only
        # the always-resident block AABB panels, and the round split
        # preserves the DMA double-buffer invariant (the pending group's
        # copy is started before every round exit).
        rounds = [max(1, r // stride) for r in recull_rounds]
        st2 = (nextg, jnp.int32(0), bkeys, best_t, best_k, best_i,
               worst_of(best_t), visits, jnp.int32(0))
        for cap1 in rounds:
            cond1, body1 = make_inner(cap1)
            st2 = jax.lax.while_loop(cond1, body1, st2)
            endg, g_end, bkeys, best_t, best_k, best_i, worst, visits, \
                _ = st2
            fresh = cull(panel, jnp.minimum(best_t, tmax_c), 0, oc, iv, fl,
                         count_order=corder)
            bkeys = jnp.where(bkeys == INVALID, INVALID, fresh)
            st2 = (endg, g_end, bkeys, best_t, best_k, best_i, worst,
                   visits, jnp.int32(0))
        cond2, body2 = make_inner(None)
        st2 = jax.lax.while_loop(cond2, body2, st2)
        endg, g_end, _, best_t, best_k, best_i, worst, visits, _ = st2
        if not resident:
            # The exit iteration's group was started but never waited on.
            for u in range(pack):
                dma(g_end, u,
                    bbase + jnp.minimum(endg[u] & SMASK, SUP - 1)).wait()
        return nxt_l1, best_t, best_k, best_i, worst, visits, oiters + 1

    init = (
        pop_l1(),
        best_t0,
        best_k0,
        jnp.full((TILE, 1), -1, I32),
        worst_of(best_t0),
        jnp.int32(0),
        jnp.int32(0),
    )
    _, best_t, best_k, best_i, _, visits, oiters = jax.lax.while_loop(
        outer_cond, outer_body, init)

    if mode == "closest":
        outf_ref[b, 0, :] = best_t[:, 0]
    else:
        outf_ref[b, 0, :] = jnp.where(best_t[:, 0] < 0.0, 1.0, 0.0)
    outf_ref[b, 1, :] = jnp.ones((TILE,), F32) * oiters.astype(F32)
    outf_ref[b, 2, :] = jnp.zeros((TILE,), F32)
    outi_ref[b, 0, :] = best_k[:, 0]
    outi_ref[b, 1, :] = jnp.full((TILE,), 1, I32) * visits
    outi_ref[b, 2, :] = best_i[:, 0]
    if mode != "closest":
        # Per-tile shadow hints for the NEXT correlated sample: min/max of
        # the per-ray first-occluder blocks — two distinct representatives
        # of the (heavily concentrated) occluder set, from two lane
        # reduces.  -1 = no occluder seen.
        kcol = best_k[:, 0]
        bigi = jnp.int32(1 << 30)
        hmin = jnp.min(jnp.where(kcol >= 0, kcol, bigi))
        hmax = jnp.max(kcol)
        outi_ref[b, 3, :] = jnp.full((TILE,), 1, I32) \
            * jnp.where(hmin == bigi, -1, hmin)
        outi_ref[b, 4, :] = jnp.full((TILE,), 1, I32) * hmax
    return jnp.int32(0)


def _trace_kernel(rays_ref, sup_ref, blk_ref, coeff_ref, *rest, cb, nl1,
                  mode, common, resident, pack, instanced, stride=1,
                  recull_rounds=(), count_order=False, hinted=False,
                  amasked=False):
    rest = list(rest)
    am_ref = rest.pop(0) if amasked else None
    tab_ref = rest.pop(0) if instanced else None
    inv_ref = rest.pop(0) if instanced else None
    hint_ref = rest.pop(0) if hinted else None
    outf_ref, outi_ref, sk_ref = rest[0], rest[1], rest[2]
    cbuf = rest[3] if not resident else None
    sems = rest[4] if not resident else None
    jax.lax.fori_loop(
        0, BT,
        lambda b, _: _tile_body(b, rays_ref, sup_ref, blk_ref, coeff_ref,
                                outf_ref, outi_ref, sk_ref, cbuf, sems,
                                tab_ref, inv_ref, hint_ref, am_ref,
                                cb=cb, nl1=nl1, mode=mode, common=common,
                                resident=resident, pack=pack,
                                instanced=instanced, stride=stride,
                                recull_rounds=recull_rounds,
                                count_order=count_order),
        jnp.int32(0))


def trace_blocks_hier(gpu: GPUScene, cfg: RenderConfig, ray_blocks, mode,
                      common: str | None = None, count_order: bool = False,
                      hints=None, use_amask: bool = False):
    """Trace packed (Ts, 8, 128) ray blocks through the v8 hierarchy.

    Same contract as pallas_backend.trace_blocks: outf rows
    [t | outer-iterations | -] ('closest') or [occluded-flag |
    outer-iterations | -]; outi rows [sorted-tri id or -1 | visited-block
    count | instance id].  Row outf[1]'s L1-pop count is a diagnostics
    channel for perf probes.

    Occluded mode additionally emits per-tile shadow hints in outi rows
    3/4 (two representative occluder block ids, -1 = none) and accepts
    `hints` ((Ts, Hn) int32) from a previous correlated trace: hint
    blocks are visited unconditionally before the traversal so the rays
    they occlude never price the cull/pop machinery (resident,
    non-instanced scenes; results are exactly the unhinted trace's).
    """
    ts = ray_blocks.shape[0]
    instanced = gpu.instanced
    if gpu.pallas_panels is not None and gpu.pallas_panels.shape[1] == CROWS:
        coeff = gpu.pallas_panels
        cl_min, cl_max = gpu.pallas_cl_min, gpu.pallas_cl_max
    else:
        coeff, cl_min, cl_max = pack_clusters(gpu)
    cb = coeff.shape[0]
    if instanced:
        # L1 = (instance, super) pairs with world AABBs; mesh-space block
        # panels come precompiled from the instanced scene compile.
        blk_panels = gpu.blk_panel
        pp = gpu.pair_panel.shape[0]
        sup_panel = jnp.concatenate([
            gpu.pair_panel,
            jnp.broadcast_to(
                jnp.concatenate([jnp.full((1, 3, 128), BIG_T, F32),
                                 jnp.full((1, 3, 128), -BIG_T, F32),
                                 jnp.zeros((1, 2, 128), F32)], axis=1),
                (SPAGES - pp, 8, 128)),
        ]) if pp < SPAGES else gpu.pair_panel
        # nl1 must be static: use the padded tab length (pad rows carry
        # inverted pair AABBs, so they never pop).
        nl1 = gpu.pair_tab.shape[0]
    else:
        sup_panel, blk_panels = pack_hierarchy(cl_min, cl_max)
        nl1 = -(-cb // SUP)
    resident = cb <= RESIDENT_CB

    pad = (-ts) % BT
    if pad:
        pad_blk = jnp.broadcast_to(ray_blocks[:1], (pad, 8, TILE))
        pad_blk = pad_blk.at[:, 6, :].set(BIG_T)
        pad_blk = pad_blk.at[:, 7, :].set(-BIG_T)
        ray_blocks = jnp.concatenate([ray_blocks, pad_blk])
    tsp = ts + pad

    # Unlike v7 (OPACK=4), v8's per-ray-exact candidate lists are SHORT,
    # so multi-pop overshoot wastes more than it amortizes on occlusion
    # (measured: 91 ms pack=1 vs 116 ms pack=4 at 1080p/100k); closest
    # keeps v7's PACK=2 (bounce traces: 1639 -> 1392 ms).
    pack = PACK if mode == "closest" else 1
    # Cond-stride + re-cull (r4) apply per RAY CLASS, where they were
    # measured to win: incoherent closest (bounces: 420 -> 264 ms) and
    # occlusion (bounce-NEE: 192 -> 175 ms).  COHERENT closest traces
    # (common-origin primaries / common-dir) were already at their
    # oracle visit count — there both knobs only ADD machinery
    # (SCENESCALE 100k closest regressed 108 -> 144 ms before this
    # gate), so they keep the plain r3 loop.
    coherent_closest = mode == "closest" and common is not None
    stride = 1 if coherent_closest else STRIDE
    if coherent_closest:
        recull_rounds = ()
    elif mode == "closest":
        recull_rounds = RECULL_ROUNDS_CLOSEST
    else:
        recull_rounds = RECULL_ROUNDS_OCCLUDED
    hinted = (hints is not None and mode == "occluded" and resident
              and not instanced)
    # In-kernel alpha masks: resident closest only (the mask panels ride
    # VMEM next to the coefficients; HBM-path scenes keep the pure
    # re-trace ladder, still exact).
    amask = (gpu.pallas_amask
             if use_amask and mode == "closest" and resident else None)
    kw = dict(cb=cb, nl1=nl1, mode=mode, common=common, resident=resident,
              pack=pack, instanced=instanced, stride=stride,
              recull_rounds=recull_rounds, count_order=count_order,
              hinted=hinted, amasked=amask is not None)
    # Coefficients stay in VMEM up to RESIDENT_CB blocks; bigger scenes
    # keep them in HBM and the inner loop double-buffers per-visit DMAs.
    coeff_spec = (pl.BlockSpec(memory_space=pltpu.VMEM) if resident
                  else pl.BlockSpec(memory_space=pltpu.ANY))
    in_specs = [
        pl.BlockSpec((BT, 8, TILE), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),   # sup/pair panel pages
        pl.BlockSpec(memory_space=pltpu.VMEM),   # blk panels
        coeff_spec,
    ]
    inputs = [ray_blocks, sup_panel, blk_panels, coeff]
    if amask is not None:
        in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)]
        inputs += [amask]
    if instanced:
        # Packed 2-word pair tab (see _tile_body) + VMEM transforms.
        tab = gpu.pair_tab
        tab_packed = jnp.stack(
            [tab[:, 0], tab[:, 1] | (tab[:, 2] << 16)], axis=0)
        in_specs += [pl.BlockSpec(memory_space=pltpu.SMEM),   # pair_tab
                     pl.BlockSpec(memory_space=pltpu.VMEM)]   # inst_inv
        inputs += [tab_packed, gpu.inst_inv]
    if hinted:
        hn = hints.shape[1]
        if hints.shape[0] < tsp:
            hints = jnp.concatenate([
                hints,
                jnp.full((tsp - hints.shape[0], hn), -1, I32)])
        in_specs += [pl.BlockSpec((BT, hn), lambda i: (i, 0),
                                  memory_space=pltpu.SMEM)]
        inputs += [hints[:tsp]]
    scratch = [pltpu.VMEM((SPAGES, 128), I32)]
    if not resident:
        scratch += [pltpu.VMEM((2, pack, CROWS, CB), F32),
                    pltpu.SemaphoreType.DMA((2, pack))]
    outf, outi = pl.pallas_call(
        functools.partial(_trace_kernel, **kw),
        grid=(tsp // BT,),
        in_specs=in_specs,
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
        scratch_shapes=scratch,
        interpret=jax.default_backend() != "tpu",
    )(*inputs)
    return outf[:ts], outi[:ts]


def _run(gpu, cfg, origins, dirs, t_min, t_max, mode, common=None,
         count_order=False, use_amask=False):
    r = origins.shape[0]
    t_min = jnp.broadcast_to(jnp.asarray(t_min, F32), (r,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, F32), (r,)).astype(F32)
    rays, r_orig, ts = _pack_rays(origins, dirs, t_min, t_max)
    outf, outi = trace_blocks_hier(gpu, cfg, rays, mode, common=common,
                                   count_order=count_order,
                                   use_amask=use_amask)
    tb = outf[:, 0, :].reshape(-1)[:r_orig]
    kb = outi[:, 0, :].reshape(-1)[:r_orig]
    ib = outi[:, 2, :].reshape(-1)[:r_orig]
    return tb, kb, ib


def hier_closest(gpu, cfg, origins, dirs, t_min, t_max,
                 common=None, use_amask=False) -> HitRecord:
    tb, kb, ib = _run(gpu, cfg, origins, dirs, t_min, t_max, "closest",
                      common=common, use_amask=use_amask)
    orig = jnp.where(kb >= 0, kb, -1)
    z = jnp.zeros_like(tb)
    inst = ib.astype(I32) if gpu.instanced else None
    return HitRecord(t=tb, prim_id=orig.astype(I32), u=z, v=z, inst=inst)


def hier_occluded(gpu, cfg, origins, dirs, t_min, t_max,
                  common=None,
                  count_order=OCC_COUNT_ORDER) -> jnp.ndarray:
    tb, _, _ = _run(gpu, cfg, origins, dirs, t_min, t_max, "occluded",
                    common=common, count_order=count_order)
    return tb > 0.5


def hier_occluded_hinted(gpu, cfg, origins, dirs, t_min, t_max, hints=None,
                         common=None):
    """Occlusion with the cross-sample shadow-hint warm start.

    Returns (occ_mask, hints_out (Ts, 2) int32).  Feed hints_out to the
    next CORRELATED occlusion call (same ray layout, nearby segments —
    e.g. the next stochastic sample of the same area light,
    raygen.rgen:226-241).  Exact: hints only short-circuit cost, never
    change the mask.  Resident non-instanced scenes only.
    """
    r = origins.shape[0]
    t_min = jnp.broadcast_to(jnp.asarray(t_min, F32), (r,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, F32), (r,)).astype(F32)
    rays, r_orig, ts = _pack_rays(origins, dirs, t_min, t_max)
    outf, outi = trace_blocks_hier(gpu, cfg, rays, "occluded",
                                   common=common, hints=hints)
    occ = outf[:, 0, :].reshape(-1)[:r_orig] > 0.5
    return occ, outi[:, 3:5, 0]


# ---------------------------------------------------------------------------
# Multi-segment occlusion: S shadow samples per pixel SHARE an origin
# (the megakernel's per-light-triangle stochastic samples, raygen.rgen:
# 206-241) so one kernel pass can amortize the per-tile cull/pop/grid
# machinery over all S segments.  Culls use a per-ray DIRECTION-INTERVAL
# hull (the S directions aim at the same light triangle, so the interval
# is tight); visits share the origin dot family and evaluate each
# sample's segment exactly.  Measured: 3x91.6 -> ~1.7x one trace.
# ---------------------------------------------------------------------------

def _pack_rays_multi(origins, dirs_s, t_lo, t_hi_s):
    """(R,3) origin + S x (R,3) dirs + (R,) tmin + S x (R,) thi
    -> (Ts, 4+4S, 128) ray blocks, rows [o3 | tmin | (d3 | thi) x S]."""
    s_count = len(dirs_s)
    r = origins.shape[0]
    ts = -(-r // TILE)
    pad = ts * TILE - r

    def padv(x, fill):
        if not pad:
            return x
        return jnp.concatenate(
            [x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)])

    rows = [padv(origins, 0.0).T, padv(t_lo, BIG_T)[None, :]]
    for d, hi in zip(dirs_s, t_hi_s):
        rows.append(padv(d, 0.0).T)
        rows.append(padv(hi, -BIG_T)[None, :])
    rows = jnp.concatenate(rows, axis=0)              # (4+4S, R')
    nrows = 4 + 4 * s_count
    blk = rows.reshape(nrows, ts, TILE).transpose(1, 0, 2)
    return blk, r, ts


def _tile_body_multi(b, rays_ref, sup_ref, blk_ref, coeff_ref, outf_ref,
                     outi_ref, sk_ref, *, cb, nl1, s_count):
    """Trace S shared-origin occlusion segments for ONE 128-ray tile."""
    rays = rays_ref[b]
    oc = [rays[a, :][:, None] for a in range(3)]
    tmin_c = rays[3, :][:, None]
    dss = [[rays[4 + 4 * s + a, :][:, None] for a in range(3)]
           for s in range(s_count)]
    this = [rays[7 + 4 * s, :][:, None] for s in range(s_count)]

    # Per-axis direction interval over the S samples + interval inverse:
    # sign-definite intervals invert to [1/dhi, 1/dlo]; straddling zero
    # conservatively passes that axis.
    dflag = []
    ilo = []
    ihi = []
    for a in range(3):
        lo = dss[0][a]
        hi = dss[0][a]
        for s in range(1, s_count):
            lo = jnp.minimum(lo, dss[s][a])
            hi = jnp.maximum(hi, dss[s][a])
        definite = (lo > EPS) | (hi < -EPS)
        dflag.append(~definite)
        ilo.append(jnp.where(definite, 1.0 / jnp.where(definite, hi, 1.0),
                             -BIG))
        ihi.append(jnp.where(definite, 1.0 / jnp.where(definite, lo, 1.0),
                             BIG))

    lane_t = jax.lax.broadcasted_iota(I32, (TILE, CB), 1)
    lane_row = jax.lax.broadcasted_iota(I32, (1, 128), 1)

    def cull_int(panel, limit, base_id):
        """Interval slab test: exact per-ray origin x direction interval.
        Conservative for EVERY sample's direction (the hull contains each
        d), so entry keys stay valid lower bounds for all segments."""
        near = None
        far = None
        for a in range(3):
            s0 = panel[a:a + 1, :] - oc[a]            # (128, 128)
            s1 = panel[3 + a:4 + a, :] - oc[a]
            t0l = jnp.minimum(s0 * ilo[a], s0 * ihi[a])
            t0h = jnp.maximum(s0 * ilo[a], s0 * ihi[a])
            t1l = jnp.minimum(s1 * ilo[a], s1 * ihi[a])
            t1h = jnp.maximum(s1 * ilo[a], s1 * ihi[a])
            na = jnp.minimum(t0l, t1l)
            fa = jnp.maximum(t0h, t1h)
            na = jnp.where(dflag[a], -BIG, na)
            fa = jnp.where(dflag[a], BIG, fa)
            near = na if near is None else jnp.maximum(near, na)
            far = fa if far is None else jnp.minimum(far, fa)
        valid = panel[0:1, :] <= panel[3:4, :]
        ok = valid & (near <= far) & (far >= tmin_c) & (near <= limit)
        ent = jnp.where(ok, jnp.maximum(near, 0.0), jnp.float32(jnp.inf))
        emin = jnp.min(ent, axis=0, keepdims=True)
        key = (jax.lax.bitcast_convert_type(emin, I32) & ~SMASK) \
            | (lane_row + base_id)
        return jnp.where(jnp.isfinite(emin), key, INVALID)

    def limit_union(best):
        lim = None
        for s in range(s_count):
            l = jnp.minimum(best[s], this[s])
            lim = l if lim is None else jnp.maximum(lim, l)
        return lim

    def worst_of(best):
        return jnp.max(jax.lax.bitcast_convert_type(limit_union(best), I32))

    def visit(cid, best):
        """One 128-tri block vs all S segments: the origin dot family is
        shared; each sample pays only its direction dots + tests."""
        c = coeff_ref[cid]

        def dot_o(base):
            return (oc[0] * c[base + 0:base + 1]
                    + oc[1] * c[base + 1:base + 2]
                    + oc[2] * c[base + 2:base + 3]
                    + c[base + 3:base + 4])

        s0o, s4o, s8o = dot_o(0), dot_o(4), dot_o(8)
        out = []
        for s in range(s_count):
            dc = dss[s]

            def dot_d(base):
                return (dc[0] * c[base + 0:base + 1]
                        + dc[1] * c[base + 1:base + 2]
                        + dc[2] * c[base + 2:base + 3])

            s1 = dot_d(0)
            den_ok = jnp.abs(s1) > EPS
            t = jnp.where(den_ok, -s0o / jnp.where(den_ok, s1, 1.0), BIG)
            u = s4o + t * dot_d(4)
            v = s8o + t * dot_d(8)
            ok = (den_ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                  & (t >= tmin_c) & (t <= this[s]))
            hit_any = jnp.any(ok, axis=1, keepdims=True)
            out.append(jnp.where(hit_any, -BIG, best[s]))
        return tuple(out)

    # ---- L1 cull over supercluster pages -------------------------------
    limit0 = limit_union(tuple(jnp.full((TILE, 1), BIG, F32)
                               for _ in range(s_count)))
    for sp in range(nsup_pages(nl1)):
        sk_ref[sp] = cull_int(sup_ref[sp], limit0, sp * 128)[0]
    for sp in range(nsup_pages(nl1), SPAGES):
        sk_ref[sp] = jnp.full((128,), INVALID, I32)

    def pop_l1():
        e = sk_ref[...]
        m = jnp.min(e)
        sk_ref[...] = jnp.where(e == m, INVALID, e)
        return m

    def pop_block(bkeys):
        m = jnp.min(bkeys)
        return m, jnp.where(bkeys == m, INVALID, bkeys)

    def outer_cond(st):
        nexts, best, visits = st
        return (nexts != INVALID) & ((nexts & ~SMASK) <= worst_of(best))

    def outer_body(st):
        nexts, best, visits = st
        sid = jnp.minimum(nexts & SMASK, nl1 - 1)
        bkeys = cull_int(blk_ref[sid], limit_union(best), 0)
        nxt_s = pop_l1()
        nextb, bkeys = pop_block(bkeys)

        def inner_cond(st2):
            nextb, _, best, _ = st2
            return ((nextb != INVALID)
                    & ((nextb & ~SMASK) <= worst_of(best)))

        def inner_body(st2):
            nextb, bkeys, best, visits = st2
            cid = sid * SUP + jnp.minimum(nextb & SMASK, SUP - 1)
            best = visit(cid, best)
            nextb, bkeys = pop_block(bkeys)
            return nextb, bkeys, best, visits + 1

        _, _, best, visits = jax.lax.while_loop(
            inner_cond, inner_body, (nextb, bkeys, best, visits))
        return nxt_s, best, visits

    init = (
        pop_l1(),
        tuple(jnp.full((TILE, 1), BIG, F32) for _ in range(s_count)),
        jnp.int32(0),
    )
    _, best, visits = jax.lax.while_loop(outer_cond, outer_body, init)

    for s in range(s_count):
        outf_ref[b, s, :] = jnp.where(best[s][:, 0] < 0.0, 1.0, 0.0)
    outi_ref[b, 0, :] = jnp.full((TILE,), 1, I32) * visits
    return jnp.int32(0)


def _trace_kernel_multi(rays_ref, sup_ref, blk_ref, coeff_ref, outf_ref,
                        outi_ref, sk_ref, *, cb, nl1, s_count):
    jax.lax.fori_loop(
        0, BT,
        lambda b, _: _tile_body_multi(
            b, rays_ref, sup_ref, blk_ref, coeff_ref, outf_ref, outi_ref,
            sk_ref, cb=cb, nl1=nl1, s_count=s_count),
        jnp.int32(0))


def hier_occluded_multi(gpu: GPUScene, cfg: RenderConfig, origins, dirs_s,
                        t_lo, t_hi_s):
    """S shared-origin occlusion segments in ONE kernel pass.

    dirs_s / t_hi_s: length-S lists of (R, 3) / (R,).  Returns a list of
    S (R,) bool masks, each exactly equal to the corresponding
    hier_occluded call.  Resident, non-instanced scenes only (callers
    fall back to per-sample occluded otherwise).
    """
    s_count = len(dirs_s)
    if gpu.pallas_panels is not None and gpu.pallas_panels.shape[1] == CROWS:
        coeff = gpu.pallas_panels
        cl_min, cl_max = gpu.pallas_cl_min, gpu.pallas_cl_max
    else:
        coeff, cl_min, cl_max = pack_clusters(gpu)
    cb = coeff.shape[0]
    if gpu.instanced or cb > RESIDENT_CB:
        raise ValueError("multi-segment occlusion supports resident "
                         "non-instanced scenes; use occluded per sample")
    sup_panel, blk_panels = pack_hierarchy(cl_min, cl_max)
    nl1 = -(-cb // SUP)

    r = origins.shape[0]
    t_lo = jnp.broadcast_to(jnp.asarray(t_lo, F32), (r,))
    t_hi_s = [jnp.broadcast_to(jnp.asarray(h, F32), (r,)) for h in t_hi_s]
    rays, r_orig, ts = _pack_rays_multi(origins, dirs_s, t_lo, t_hi_s)
    pad = (-ts) % BT
    if pad:
        pad_blk = jnp.broadcast_to(rays[:1], (pad,) + rays.shape[1:])
        pad_blk = pad_blk.at[:, 3, :].set(BIG_T)
        for s in range(s_count):
            pad_blk = pad_blk.at[:, 7 + 4 * s, :].set(-BIG_T)
        rays = jnp.concatenate([rays, pad_blk])
    tsp = ts + pad

    kw = dict(cb=cb, nl1=nl1, s_count=s_count)
    nrows = rays.shape[1]
    outf, outi = pl.pallas_call(
        functools.partial(_trace_kernel_multi, **kw),
        grid=(tsp // BT,),
        in_specs=[
            pl.BlockSpec((BT, nrows, TILE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
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
        scratch_shapes=[pltpu.VMEM((SPAGES, 128), I32)],
        interpret=jax.default_backend() != "tpu",
    )(rays, sup_panel, blk_panels, coeff)
    return [outf[:, s, :].reshape(-1)[:r_orig] > 0.5
            for s in range(s_count)]


def make_hier_backend(gpu: GPUScene, cfg: RenderConfig) -> TraceBackend:
    num_tris = gpu.faces.shape[0]
    num_spheres = gpu.sph_center.shape[0]
    sg = jax.lax.stop_gradient
    # Same in-kernel alpha-mask gate as make_pallas_backend (masks were
    # built at the default threshold; any runtime threshold >= it stays
    # conservative).
    from realtimeraytracer_tpu.config import RenderConfig as _RC
    use_amask = bool(cfg.alpha_test) and (
        cfg.alpha_threshold >= _RC.alpha_threshold)

    def closest(origins, dirs, t_min, t_max, common=None):
        hit = hier_closest(sg(gpu), cfg, sg(origins), sg(dirs), sg(t_min),
                           sg(t_max), common=common, use_amask=use_amask)
        if num_spheres:
            sph = intersect.intersect_spheres(
                origins, dirs, gpu.sph_center, gpu.sph_radius, t_min, t_max)
            hit = _merge_sphere_hits(hit, sph, num_tris)
        return hit

    def occluded(origins, dirs, t_min, t_max, common=None):
        occ = hier_occluded(sg(gpu), cfg, sg(origins), sg(dirs), sg(t_min),
                            sg(t_max), common=common)
        if num_spheres:
            sph = intersect.intersect_spheres(
                origins, dirs, gpu.sph_center, gpu.sph_radius, t_min, jnp.inf)
            occ = occ | (sph.t < jnp.broadcast_to(t_max, sph.t.shape))
        return occ

    hintable = (not gpu.instanced and gpu.pallas_panels is not None
                and gpu.pallas_panels.shape[0] <= RESIDENT_CB)

    def occluded_hinted(origins, dirs, t_min, t_max, hints=None,
                        common=None):
        occ, h = hier_occluded_hinted(
            sg(gpu), cfg, sg(origins), sg(dirs), sg(t_min), sg(t_max),
            hints=hints, common=common)
        if num_spheres:
            sph = intersect.intersect_spheres(
                origins, dirs, gpu.sph_center, gpu.sph_radius, t_min,
                jnp.inf)
            occ = occ | (sph.t < jnp.broadcast_to(t_max, sph.t.shape))
        return occ, h

    # hier_occluded_multi exists (exact, tested) but is NOT wired by
    # default: measured at 1080p/100k the fused 3-sample trace costs
    # 268 ms vs 258 ms for three separate traces — the union candidate
    # list makes every sample pay every block's per-sample math, which
    # cancels the amortized cull/pop machinery.  Revisit if per-sample
    # lane predication lands in Mosaic.
    return TraceBackend(closest=closest, occluded=occluded,
                        num_tris=num_tris, num_spheres=num_spheres,
                        perray_cull=True, occluded_multi=None,
                        occluded_hinted=occluded_hinted if hintable
                        else None)
