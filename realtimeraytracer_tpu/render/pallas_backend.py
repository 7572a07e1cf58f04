"""Pallas traversal kernel v7: resident coefficients, ordered block visits.

Sixth backend generation (ladder: bvh_backend -> packet_backend ->
wide_backend -> pallas v1 -> packed-key v5 -> this).  On-chip ablations of
v5 showed the ~1.9 us/visit floor was almost entirely *overhead*: 8 DMA
start/waits per visit (PACK=4 double-buffered panels), 4 vector->scalar
round trips in the pop, and the while-loop machinery — the actual
intersection math is ~0.35 us.  v7 removes the overhead instead of
shrinking the math:

  * **Coefficient table lives in VMEM.**  The Baldwin-Weber rows for ONE
    triangle are 12 floats, so 100k triangles are only ~4.8 MB laid out as
    (CB, 12, 128) — one 128-triangle block per leading index, rows
    [n.xyz | -n.A | r1.xyz | -r1.A | r2.xyz | -r2.A], lanes = triangles.
    Scenes up to RESIDENT_CB blocks (~130k tris) are pinned in VMEM and a
    visit is a direct dynamic-slice read — NO DMA, no semaphores, no
    double buffering.  Larger scenes fall back to per-visit (12, 128)
    DMAs from HBM with the same loop structure (double-buffered).
  * **Cull fine, visit coarse.**  XLA culls every K=32-triangle
    subcluster AABB against each tile's ray-bundle cone (tight boxes =
    few false candidates) and then reduces to 128-triangle block keys:
    entry = min entry over the block's passing subclusters.  Visits keep
    v5's packed-key ordered pops (entry-bits | block id, one
    min-reduction per pop, exact stop rule) but each visit now covers 128
    triangles with ONE scalar round trip.
  * **Pop-ahead.**  The loop carry holds the next popped key, so the
    pop's vector->scalar latency for visit j+1 overlaps visit j's
    intersection math.
  * **All-VPU exact f32 math.**  The intersection is ~21 outer-product
    FMAs on (128, 128) tiles; ablations showed the MXU formulation needs
    HIGHEST precision to avoid bf16 truncation of the cancellation-prone
    n.o - n.A term (ADVICE r1) and is then *slower* than the FMA form.
  * **Common-origin / common-direction algebra.**  Primary rays share one
    origin (pinhole camera) and sun shadow rays share one direction, so
    the corresponding three dot-product families collapse to (1, 128)
    per-triangle rows — ~40% fewer full-width VPU ops for those traces.
    Callers opt in via trace_blocks(..., common="origin"|"dir").

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
from realtimeraytracer_tpu.scene.gpu_scene import GPUScene

F32 = jnp.float32
I32 = jnp.int32
TILE = 128          # rays per tile (lanes of the ray block)
CB = 128            # triangles per visit block (lanes of a coeff read)
SUBK = 32           # triangles per cull subcluster (4 boxes per block)
CROWS = 12          # coefficient rows per block

# PB_* env knobs mutate kernel behavior (layout, precision, even
# correctness via ablations).  They are DEBUG-ONLY: without RTRT_DEBUG=1
# they are ignored with a loud warning so a stray deployment env var can
# never silently corrupt renders (ADVICE r1).
_DEBUG = _os.environ.get("RTRT_DEBUG", "") == "1"


def _knob(name: str, default: str) -> str:
    val = _os.environ.get(name)
    if val is None:
        return default
    if not _DEBUG:
        import warnings

        warnings.warn(
            f"{name}={val!r} is set but RTRT_DEBUG!=1 — ignoring debug "
            "override (would change kernel behavior)", stacklevel=2)
        return default
    import warnings

    warnings.warn(f"RTRT_DEBUG kernel override active: {name}={val!r}",
                  stacklevel=2)
    return val


BT = int(_knob("PB_BT", "8"))    # ray tiles per grid step
_ABLATE = _knob("PB_ABLATE", "")           # "", "empty", "novisit"
_MAX_VISITS = int(_knob("PB_MAX_VISITS", "0"))  # 0 = unlimited
# Blocks intersected per pop, by trace mode.  Closest wants the tightest
# ordered visits (stop rule retires tiles fast); occlusion amortizes
# pop/loop overhead over more triangles since lit rays must exhaust every
# candidate anyway.
PACK = max(1, int(_knob("PB_PACK", "2")))
OPACK = max(1, int(_knob("PB_OPACK", "4")))
# VMEM-residency limit for the coefficient table, in blocks (6 KB each).
RESIDENT_CB = int(_knob("PB_RESIDENT_CB", "1024"))
# Sub-bundles per 128-ray tile in the cull (1 = whole-tile hull).
BUNDLES = max(1, int(_knob("PB_BUNDLES", "1")))
# Exact-ordered pop->visit cycles per while-loop body (resident path):
# pays the cond's unoverlappable stop-rule reduce once per STRIDE cycles
# for <= STRIDE-1 tail-overshoot pops (r4 probe 080).
STRIDE = max(1, int(_knob("PB_STRIDE", "1")))  # v7: stride 2 measured NEUTRAL-to-worse (67 vs 62 ms primaries, r4)

CPB = 1024          # block keys per (8, 128) key page
# Python float for in-kernel use (a jnp scalar would be a captured constant,
# which pallas kernels reject).
BIG = 3.0e38
EPS = 1e-12
INVALID = 0x7F800000                     # +inf bits: "no candidate left"


def _id_bits(total_blocks: int) -> int:
    return max(13, int(total_blocks - 1).bit_length())


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


def pack_clusters_np(tv0, tv1, tv2):
    """NumPy twin of pack_clusters, run ONCE at scene compile.

    (T, 3) Morton/SAH-sorted triangle vertices -> (coeff, cl_min, cl_max):
    coeff (CBn, 12, 128) Baldwin-Weber coefficient blocks, cl_min/cl_max
    (CBn*4, 3) SUBK-granular subcluster AABBs for the cull.
    """
    import numpy as np

    t = tv0.shape[0]
    cb = -(-t // CB)
    pad = cb * CB - t

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

    coeff = np.zeros((cb, CROWS, CB), np.float32)
    for fam, (rows, base) in enumerate([(n, 0), (r1, 4), (r2, 8)]):
        offs = (rows * v0).sum(-1)                     # (T',)
        coeff[:, base + 0] = rows[:, 0].reshape(cb, CB)
        coeff[:, base + 1] = rows[:, 1].reshape(cb, CB)
        coeff[:, base + 2] = rows[:, 2].reshape(cb, CB)
        coeff[:, base + 3] = -offs.reshape(cb, CB)

    c32 = cb * (CB // SUBK)
    tmin = np.minimum(np.minimum(v0, v1), v2).reshape(c32, SUBK, 3)
    tmax = np.maximum(np.maximum(v0, v1), v2).reshape(c32, SUBK, 3)
    if pad:
        valid = (np.arange(cb * CB) < t).reshape(c32, SUBK, 1)
        tmin = np.where(valid, tmin, BIG_T)
        tmax = np.where(valid, tmax, -BIG_T)
    return coeff, tmin.min(1).astype(np.float32), tmax.max(1).astype(np.float32)


def pack_clusters(gpu: GPUScene):
    """In-graph twin of pack_clusters_np (for scenes compiled without the
    host precompute, e.g. device-side refits).  Same layout contract."""
    v0, v1, v2 = gpu.bvh_tri_v0, gpu.bvh_tri_v1, gpu.bvh_tri_v2
    t = v0.shape[0]
    cb = -(-t // CB)
    pad = cb * CB - t

    def padv(x):
        return jnp.concatenate([x, jnp.zeros((pad, 3), F32)]) if pad else x

    v0, v1, v2 = padv(v0), padv(v1), padv(v2)
    e1, e2 = v1 - v0, v2 - v0
    n = jnp.cross(e1, e2)
    det = jnp.sum(n * n, -1, keepdims=True)
    inv = jnp.where(det > 1e-24, 1.0 / jnp.where(det > 1e-24, det, 1.0), 0.0)
    r1 = jnp.cross(e2, n) * inv
    r2 = jnp.cross(n, e1) * inv

    parts = []
    for rows in (n, r1, r2):
        offs = jnp.sum(rows * v0, -1)
        parts += [rows[:, 0], rows[:, 1], rows[:, 2], -offs]
    coeff = jnp.stack(parts, axis=0).reshape(CROWS, cb, CB).transpose(1, 0, 2)

    c32 = cb * (CB // SUBK)
    tmin = jnp.minimum(jnp.minimum(v0, v1), v2).reshape(c32, SUBK, 3)
    tmax = jnp.maximum(jnp.maximum(v0, v1), v2).reshape(c32, SUBK, 3)
    if pad:
        valid = (jnp.arange(cb * CB) < t).reshape(c32, SUBK, 1)
        tmin = jnp.where(valid, tmin, BIG_T)
        tmax = jnp.where(valid, tmax, -BIG_T)
    return coeff, tmin.min(axis=1), tmax.max(axis=1)


def _sub_entries(rays, cl_min, cl_max, bundles: int = 1):
    """Per-tile conservative entry distance of every SUBK-tri subcluster.

    Interval-arithmetic slab test of every subcluster AABB against each
    tile's ray bundle (origin box x direction interval): conservative
    (false positives only cost visits) and yields an entry-distance LOWER
    bound, keeping the kernels' ordered-visit stop rules exact.

    bundles: split each 128-ray tile into this many sub-bundles for the
    cull (the union of tighter hulls is a subset of the whole tile's
    interval hull — fewer false candidates on tiles spanning depth
    discontinuities).  Entry = min over sub-bundles (still a valid lower
    bound for every ray in the tile); each ray is covered by its own
    sub-bundle's conservative test, so correctness is unchanged.

    Returns (ts, C32) f32: max(entry, 0) for passing subclusters, +inf
    where no sub-bundle overlaps.
    """
    ts = rays.shape[0]
    nb = bundles
    lanes = TILE // nb
    rs = rays.reshape(ts, 8, nb, lanes)

    tmin_lb = rs[:, 6].min(axis=2).reshape(ts * nb, 1)
    tmax_ub = rs[:, 7].max(axis=2).reshape(ts * nb, 1)

    # Per-axis 2D loop: every intermediate is (Ts*nb, C) or (Ts*nb, 1) —
    # no (Ts, C, 3) tensors for XLA to materialize.
    tn = None
    tf = None
    safe = lambda x: jnp.where(jnp.abs(x) > EPS, x, EPS)
    for a in range(3):
        o_lo = rs[:, a].min(axis=2).reshape(ts * nb, 1)
        o_hi = rs[:, a].max(axis=2).reshape(ts * nb, 1)
        d_lo = rs[:, 3 + a].min(axis=2).reshape(ts * nb, 1)
        d_hi = rs[:, 3 + a].max(axis=2).reshape(ts * nb, 1)
        span = (d_lo > EPS) | (d_hi < -EPS)                # sign-definite
        inv_lo = jnp.where(span, 1.0 / safe(d_hi), -BIG)
        inv_hi = jnp.where(span, 1.0 / safe(d_lo), BIG)

        def times(a_lo, a_hi, b_lo, b_hi):
            p1, p2 = a_lo * b_lo, a_lo * b_hi
            p3, p4 = a_hi * b_lo, a_hi * b_hi
            return (jnp.minimum(jnp.minimum(p1, p2), jnp.minimum(p3, p4)),
                    jnp.maximum(jnp.maximum(p1, p2), jnp.maximum(p3, p4)))

        bmin = cl_min[None, :, a]                          # (1, C32)
        bmax = cl_max[None, :, a]
        t0l, t0h = times(bmin - o_hi, bmin - o_lo, inv_lo, inv_hi)
        t1l, t1h = times(bmax - o_hi, bmax - o_lo, inv_lo, inv_hi)
        lo_a = jnp.minimum(t0l, t1l)
        hi_a = jnp.maximum(t0h, t1h)
        tn = lo_a if tn is None else jnp.maximum(tn, lo_a)
        tf = hi_a if tf is None else jnp.minimum(tf, hi_a)
    possible = (tn <= tf) & (tf >= tmin_lb) & (tn <= tmax_ub)

    # Sub-bundles -> tiles: entry = min over sub-bundles.
    ent = jnp.where(possible, jnp.maximum(tn, 0.0), jnp.inf)
    return ent.reshape(ts, nb, -1).min(axis=1)                  # (Ts, C32)


def _pack_id_keys(ent, ids, id_mask, pages):
    """Pack entry distances + ids into ordered int32 keys, padded to
    (Ts, pages, 8, 128) key pages.  Id bits cleared from the f32 entry
    bits = rounded down — still a lower bound, so ordered-visit stop
    rules stay exact.  +inf entries become INVALID."""
    ts, n = ent.shape
    finite = jnp.isfinite(ent)
    key = (jax.lax.bitcast_convert_type(
        jnp.where(finite, ent, 0.0), I32) & ~id_mask) | ids
    key = jnp.where(finite, key, INVALID)
    pad = pages * CPB - n
    if pad:
        key = jnp.concatenate(
            [key, jnp.full((ts, pad), INVALID, I32)], axis=1)
    return key.reshape(ts, pages, 8, 128)


def cull_keys(rays, cl_min, cl_max, bundles: int = 1):
    """Per-tile packed block-candidate keys (Ts, CBn, 8, 128) int32.

    Subcluster entries (_sub_entries) reduce to 128-triangle BLOCK keys
    (entry = min over the block's passing subclusters) — cull fine, visit
    coarse.  The key packs the bound's f32 bits with the block id.
    """
    ts = rays.shape[0]
    c32 = cl_min.shape[0]
    cb = c32 // (CB // SUBK)
    cbn = -(-cb // CPB)
    bits = _id_bits(cbn * CPB)
    id_mask = (1 << bits) - 1

    ent = _sub_entries(rays, cl_min, cl_max, bundles)
    ent = ent.reshape(ts, cb, CB // SUBK).min(axis=2)           # (Ts, CB)
    ids = jnp.arange(cb, dtype=I32)[None, :]
    return _pack_id_keys(ent, ids, id_mask, cbn), id_mask


def cull_quarter_keys(rays, cl_min, cl_max, bundles: int = 1):
    """Per-tile subcluster keys SPLIT BY LANE QUARTER, for the v9
    composite-visit kernel (render/quarter_backend.py).

    Quarter q of coefficient block B holds triangles [B*128+32q,
    B*128+32q+32) at lanes [32q, 32q+32) — i.e. subcluster index
    s = 4B + q sits at lane quarter (s & 3) of panel (s >> 2).  Keys for
    quarter q therefore carry the BLOCK id (the panel to load) packed
    with that subcluster's own entry bound; the kernel pops one key per
    quarter and composites the four panels' native lane quarters into
    one 128-lane visit.

    Returns ((Ts, 4, CBn, 8, 128) int32, id_mask).
    """
    ts = rays.shape[0]
    c32 = cl_min.shape[0]
    cb = c32 // (CB // SUBK)
    cbn = -(-cb // CPB)
    bits = _id_bits(cbn * CPB)
    id_mask = (1 << bits) - 1

    ent = _sub_entries(rays, cl_min, cl_max, bundles)
    ent = ent.reshape(ts, cb, CB // SUBK)                       # (Ts,CB,4)
    ids = jnp.arange(cb, dtype=I32)[None, :]
    pages = [
        _pack_id_keys(ent[:, :, q], ids, id_mask, cbn)[:, None]
        for q in range(CB // SUBK)
    ]
    return jnp.concatenate(pages, axis=1), id_mask


def _mask_ok(ok, u, v, m):
    """Conservative in-kernel alpha-mask filter (ops/alpha_mask.py).

    m: (2, 128) i32 mask rows for this visit's 128 triangles — bit
    b = iy*8 + ix of the 8x8 barycentric grid lives in word b>>5, bit
    b&31; bit 0 means every texel bilinear could touch in that cell has
    alpha < threshold, so the hit is definitely transparent and the
    visit rejects it exactly as the re-trace ladder's texture eval
    would (opacity.rahit:55-61 parity at visit granularity).  u/v of
    not-ok lanes are garbage; the int clip bounds them and `ok` keeps
    the result masked."""
    gi = jnp.clip((u * float(8)).astype(I32), 0, 7)
    gj = jnp.clip((v * float(8)).astype(I32), 0, 7)
    b = gj * 8 + gi
    w = jnp.where(b < 32, m[0:1], m[1:2])
    bit = jax.lax.shift_right_logical(w, b & 31) & 1
    return ok & (bit != 0)


def _trace_kernel(rays_ref, keys_ref, coeff_ref, amask_ref, outf_ref,
                  outi_ref, ent_ref, cbuf, sems, *, cbn, cb, mode, id_mask,
                  pack, common, resident, stride=1):
    """One grid cell = BT 128-ray tiles; mode 'closest' or 'occluded'.

    BT tiles share one grid step (fori_loop below) because Mosaic
    serializes grid steps whose kernels hold manual DMAs inside a while
    loop — batching amortizes that per-step cost.

    Scratch: ent_ref (cbn, 8, 128) int32 remaining candidate keys; cbuf +
    sems are the (2, pack, 12, 128) double-buffered coefficient DMA target
    + semaphores, allocated only on the non-resident (HBM) path.
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
        lambda b, _: _tile_body(b, rays_ref, keys_ref, coeff_ref, amask_ref,
                                outf_ref, outi_ref, ent_ref, cbuf, sems,
                                cbn=cbn, cb=cb, mode=mode, id_mask=id_mask,
                                pack=pack, common=common, resident=resident,
                                stride=stride),
        jnp.int32(0))


def _tile_body(b, rays_ref, keys_ref, coeff_ref, amask_ref, outf_ref,
               outi_ref, ent_ref, cbuf, sems, *, cbn, cb, mode, id_mask,
               pack, common, resident, stride=1):
    """Full ordered-visit trace of ONE 128-ray tile (index b in the step)."""
    rays = rays_ref[b]                           # (8, 128)
    tmin_c = rays[6, :][:, None]                 # (128, 1) column
    tmax_c = rays[7, :][:, None]

    if _ABLATE in ("fixed8", "fixed8dyn"):
        # Overhead probes: 8 unconditional visits — no pops, no while loop.
        # fixed8: static block ids (pure slice+intersect floor).
        # fixed8dyn: ids read from the keys page (adds the per-visit
        # vector->scalar extract + dynamic slice of the real loop).
        ocol = [rays[a, :][:, None] for a in range(3)]
        dcol = [rays[3 + a, :][:, None] for a in range(3)]
        best = jnp.full((TILE, 1), BIG, F32)
        kpage = keys_ref[b, 0]                   # (8, 128)
        for j in range(8):
            if _ABLATE == "fixed8dyn":
                cid = jnp.minimum(kpage[j // 128, j % 128] & id_mask, cb - 1)
                c = coeff_ref[cid]
            else:
                c = coeff_ref[j % cb]
            def dot_o(base):
                return (ocol[0] * c[base:base + 1]
                        + ocol[1] * c[base + 1:base + 2]
                        + ocol[2] * c[base + 2:base + 3]
                        + c[base + 3:base + 4])
            def dot_d(base):
                return (dcol[0] * c[base:base + 1]
                        + dcol[1] * c[base + 1:base + 2]
                        + dcol[2] * c[base + 2:base + 3])
            s0, s1 = dot_o(0), dot_d(0)
            den_ok = jnp.abs(s1) > EPS
            t = jnp.where(den_ok, -s0 / jnp.where(den_ok, s1, 1.0), BIG)
            u = dot_o(4) + t * dot_d(4)
            v = dot_o(8) + t * dot_d(8)
            ok = (den_ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                  & (t >= tmin_c))
            best = jnp.minimum(best, jnp.min(
                jnp.where(ok, t, BIG), axis=1, keepdims=True))
        outf_ref[b, 0, :] = best[:, 0]
        outf_ref[b, 1, :] = jnp.zeros((TILE,), F32)
        outf_ref[b, 2, :] = jnp.zeros((TILE,), F32)
        outi_ref[b, 0, :] = jnp.full((TILE,), -1, I32)
        outi_ref[b, 1, :] = jnp.full((TILE,), 8, I32)
        return jnp.int32(0)

    ent_ref[...] = keys_ref[b]

    def pop_group():
        """Pop `pack` near-minimal keys with ONE full-array pass.

        Lane-distinct selection: reduce to per-lane minima (1, 128), then
        take `pack` successive minima of that small vector.  The first is
        the true global minimum (so the ordered-visit stop rule stays
        exact); later ones are merely near-minimal, which only perturbs
        visit order, not correctness.  One masked write retires them all.
        """
        e = ent_ref[...]
        lane_min = jnp.min(e, axis=(0, 1), keepdims=True)[0]   # (1, 128)
        ms = []
        for _ in range(pack):
            m = jnp.min(lane_min)
            ms.append(m)
            if pack > 1:
                lane_min = jnp.where(lane_min == m, INVALID, lane_min)
        popped = e == ms[0]
        for m in ms[1:]:
            popped = popped | (e == m)
        ent_ref[...] = jnp.where(popped, INVALID, e)
        return ms

    def dma(group, u, key):
        cid = jnp.minimum(key & id_mask, cb - 1)
        return pltpu.make_async_copy(
            coeff_ref.at[cid], cbuf.at[group, u], sems.at[group, u])

    # Ray columns for the FMA intersection (exact f32, no MXU).
    ocol = [rays[a, :][:, None] for a in range(3)]       # (128, 1) each
    dcol = [rays[3 + a, :][:, None] for a in range(3)]
    if common == "origin":
        # All rays share one origin: origin dots collapse to (1, 128) rows.
        ocol = [rays[a, 0:1][:, None] for a in range(3)]  # (1, 1) scalars
    elif common == "dir":
        dcol = [rays[3 + a, 0:1][:, None] for a in range(3)]

    lane_t = jax.lax.broadcasted_iota(I32, (TILE, CB), 1)

    def intersect_block(c, m=None):
        """Baldwin-Weber t/u/v of 128 rays x this block's 128 triangles.

        c: (12, 128) rows [n | -nA | r1 | -r1A | r2 | -r2A].  With a
        common origin (or direction) the corresponding dot family
        broadcasts from a (1, 128) row — ~40% fewer full-width ops.
        """
        def dot_o(base):
            return (ocol[0] * c[base + 0:base + 1]
                    + ocol[1] * c[base + 1:base + 2]
                    + ocol[2] * c[base + 2:base + 3]
                    + c[base + 3:base + 4])

        def dot_d(base):
            return (dcol[0] * c[base + 0:base + 1]
                    + dcol[1] * c[base + 1:base + 2]
                    + dcol[2] * c[base + 2:base + 3])

        s0, s1 = dot_o(0), dot_d(0)
        den_ok = jnp.abs(s1) > EPS
        t = jnp.where(den_ok, -s0 / jnp.where(den_ok, s1, 1.0), BIG)
        u = dot_o(4) + t * dot_d(4)
        v = dot_o(8) + t * dot_d(8)
        ok = (den_ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
              & (t >= tmin_c))
        if m is not None:
            ok = _mask_ok(ok, u, v, m)
        return t, ok

    def worst_of(best_t):
        limit_bits = jax.lax.bitcast_convert_type(
            jnp.minimum(best_t, tmax_c), I32)
        return jnp.max(limit_bits)               # int-ordered: pads (<0) lose

    def cond(state):
        keys, best_t, best_k, worst, visits = state
        # `worst` is CARRIED: refreshed in the body from the previous
        # iteration's best_t (one iteration stale).  best_t only
        # decreases, so the stale bound is >= the fresh one — the loop
        # can only run extra tail iterations, and an extra ordered visit
        # can never improve best (its entry exceeds every live limit):
        # output is bit-identical.  Win: the stop-rule reduce (a (128,1)
        # max + vector->scalar trip loop control could never overlap)
        # now issues inside the body, overlapping visit FMAs (measured
        # on v9: 53.0 -> 49.7 ms primaries, r5).
        go = (keys[0] != INVALID) & ((keys[0] & ~id_mask) <= worst)
        if _ABLATE == "novisit":
            go = go & (visits < 0)
        elif _MAX_VISITS:
            go = go & (visits < _MAX_VISITS)
        return go

    def body(state):
        keys, best_t, best_k, worst, visits = state
        worst = worst_of(best_t)                 # stale-worst refresh

        # Cond-stride (r4): run `stride` exact-ordered {pop-ahead, visit}
        # cycles per while body — the cond's stop-rule reduce (a (128,1)
        # max + vector->scalar trip that loop control cannot overlap) is
        # paid once per stride*pack visits.  Tail overshoot <= stride-1
        # pops (~4% extra visits for a ~15-35% machinery saving, r4).
        for _ in range(stride):
            keys, best_t, best_k, visits = _cycle(
                keys, best_t, best_k, visits)
        return (keys, best_t, best_k, worst, visits)

    def _cycle(keys, best_t, best_k, visits):
        g = jax.lax.rem(visits, 2)

        # Pop first: the NEXT keys' vector->scalar trip (and, on the HBM
        # path, their DMAs) overlap this visit's intersection math.
        nxt = pop_group()
        if not resident:
            for u in range(pack):
                dma(1 - g, u, nxt[u]).start()
            for u in range(pack):
                dma(g, u, keys[u]).wait()

        for u in range(pack):
            cid = jnp.minimum(keys[u] & id_mask, cb - 1)
            c = cbuf[g, u] if not resident else coeff_ref[cid]
            # In-kernel alpha masks ride the resident path only (the HBM
            # pipeline would need a second DMA stream; such scenes fall
            # back to the pure re-trace ladder, still exact).
            mrow = (amask_ref[cid] if amask_ref is not None and resident
                    else None)
            t, ok = intersect_block(c, mrow)

            if mode == "closest":
                limit = jnp.minimum(best_t, tmax_c)
                ok = ok & (t <= limit)
                # Pack (t | lane) into one int so ONE lane-reduction finds
                # both the best t and its lane (bitcasts of non-negative
                # f32 are order-preserving; clearing the low 7 bits rounds
                # t down by <= 2^-16 relative — far below f32 hit-point
                # noise).  Misses use +inf: its bits (0x7F800000 | lane)
                # order above any finite t-key, so a no-hit visit can never
                # look "better".  (u, v) are NOT extracted here: the
                # surface resolver recomputes them differentiably from the
                # winning triangle (render/surface.py), saving the uv
                # quantize ops and a second lane reduction per visit.
                tm = jnp.where(ok, t, jnp.float32(jnp.inf))
                tkey = (jax.lax.bitcast_convert_type(tm, I32) & ~127) | lane_t
                kbest = jnp.min(tkey, axis=1, keepdims=True)      # (128, 1)
                best_bits = jax.lax.bitcast_convert_type(best_t, I32)
                better = kbest < best_bits
                tri = cid * CB + (kbest & 127)
                best_t = jnp.where(
                    better,
                    jax.lax.bitcast_convert_type(kbest & ~127, F32), best_t)
                best_k = jnp.where(better, tri, best_k)
            else:
                ok = ok & (t <= tmax_c)
                hit_any = jnp.any(ok, axis=1, keepdims=True)
                # Occluded rays collapse to -BIG: the stop rule retires them.
                best_t = jnp.where(hit_any, -BIG, best_t)

        return (tuple(nxt), best_t, best_k, visits + 1)

    first = pop_group()
    if not resident:
        for u in range(pack):
            dma(0, u, first[u]).start()
    best0 = jnp.full((TILE, 1), BIG, F32)
    init = (
        tuple(first),
        best0,
        jnp.full((TILE, 1), -1, I32),
        worst_of(best0),
        jnp.int32(0),
    )
    keys_end, best_t, best_k, _, visits = jax.lax.while_loop(
        cond, body, init)

    # The last started pack (group visits%2) was never waited on: retire it.
    if not resident:
        for u in range(pack):
            dma(jax.lax.rem(visits, 2), u, keys_end[u]).wait()

    if mode == "closest":
        outf_ref[b, 0, :] = best_t[:, 0]
    else:
        outf_ref[b, 0, :] = jnp.where(best_t[:, 0] < 0.0, 1.0, 0.0)
    outf_ref[b, 1, :] = jnp.zeros((TILE,), F32)
    outf_ref[b, 2, :] = jnp.zeros((TILE,), F32)
    outi_ref[b, 0, :] = best_k[:, 0]
    outi_ref[b, 1, :] = jnp.full((TILE,), 1, I32) * visits * pack
    return jnp.int32(0)


def trace_blocks(gpu: GPUScene, cfg: RenderConfig, ray_blocks, mode,
                 common: str | None = None, amask=None):
    """Trace packed (Ts, 8, 128) ray blocks.

    common: "origin" iff every ray in EVERY tile shares one origin
    (pinhole primaries), "dir" iff one direction (sun shadows) — enables
    the collapsed-dot fast path; None for general rays.

    Returns (outf, outi): outf rows [t | - | -] ('closest') or
    [occluded-flag | - | -] ('occluded'); outi rows [sorted-tri id or -1 |
    visited-block count].
    """
    ts = ray_blocks.shape[0]
    if gpu.pallas_panels is not None and gpu.pallas_panels.shape[1] == CROWS:
        coeff = gpu.pallas_panels
        cl_min, cl_max = gpu.pallas_cl_min, gpu.pallas_cl_max
    else:
        coeff, cl_min, cl_max = pack_clusters(gpu)
    cb = coeff.shape[0]
    resident = cb <= RESIDENT_CB
    # Pad the tile count to a BT multiple; pad tiles carry t_min=+BIG /
    # t_max=-BIG so the cull yields no candidates and visits exit at once.
    pad = (-ts) % BT
    if pad:
        pad_blk = jnp.broadcast_to(ray_blocks[:1], (pad, 8, TILE))
        pad_blk = pad_blk.at[:, 6, :].set(BIG_T)
        pad_blk = pad_blk.at[:, 7, :].set(-BIG_T)
        ray_blocks = jnp.concatenate([ray_blocks, pad_blk])
    tsp = ts + pad
    keys, id_mask = cull_keys(ray_blocks, cl_min, cl_max, bundles=BUNDLES)
    cbn = keys.shape[1]

    pack = PACK if mode == "closest" else OPACK
    # Cond-stride (r4): exact-ordered pop->visit cycles per while body;
    # resident path only (the HBM pipeline keeps stride=1).
    stride = STRIDE if resident else 1
    kw = dict(cbn=cbn, cb=cb, mode=mode, id_mask=id_mask,
              pack=pack, common=common, resident=resident, stride=stride)
    # In-kernel alpha masks: resident closest path only (see _tile_body).
    use_amask = amask is not None and resident and mode == "closest"
    scratch = [pltpu.VMEM((cbn, 8, 128), I32)]
    if resident:
        coeff_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
        if use_amask:
            def kernel(rays, keys, coeff, am, outf, outi, ent):
                _trace_kernel(rays, keys, coeff, am, outf, outi, ent,
                              None, None, **kw)
        else:
            def kernel(rays, keys, coeff, outf, outi, ent):
                _trace_kernel(rays, keys, coeff, None, outf, outi, ent,
                              None, None, **kw)
    else:
        coeff_spec = pl.BlockSpec(memory_space=pltpu.ANY)  # stays in HBM
        scratch += [pltpu.VMEM((2, pack, CROWS, CB), F32),
                    pltpu.SemaphoreType.DMA((2, pack))]

        def kernel(rays, keys, coeff, outf, outi, ent, cbuf, sems):
            _trace_kernel(rays, keys, coeff, None, outf, outi, ent,
                          cbuf, sems, **kw)
    in_specs = [
            pl.BlockSpec((BT, 8, TILE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BT, cbn, 8, 128), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            coeff_spec,
    ]
    inputs = [ray_blocks, keys, coeff]
    if use_amask:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        inputs.append(amask)
    outf, outi = pl.pallas_call(
        kernel,
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


def _run(gpu: GPUScene, cfg: RenderConfig, origins, dirs, t_min, t_max, mode,
         common=None, amask=None):
    r = origins.shape[0]
    t_min = jnp.broadcast_to(jnp.asarray(t_min, F32), (r,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, F32), (r,)).astype(F32)
    rays, r_orig, ts = _pack_rays(origins, dirs, t_min, t_max)
    outf, outi = trace_blocks(gpu, cfg, rays, mode, common=common,
                              amask=amask)
    tb = outf[:, 0, :].reshape(-1)[:r_orig]
    kb = outi[:, 0, :].reshape(-1)[:r_orig]
    ub = outf[:, 1, :].reshape(-1)[:r_orig]
    vb = outf[:, 2, :].reshape(-1)[:r_orig]
    return tb, kb, ub, vb


def pallas_closest(gpu, cfg, origins, dirs, t_min, t_max,
                   common=None, amask=None) -> HitRecord:
    tb, kb, ub, vb = _run(gpu, cfg, origins, dirs, t_min, t_max, "closest",
                          common=common, amask=amask)
    # scene.compile permutes the face table into BVH order (bvh_tri_id is
    # the identity), so the sorted triangle id IS the face id — no gather.
    # (u, v) are zeros: the kernel defers barycentrics to the consumer,
    # which recomputes them exactly (and differentiably) from the winning
    # triangle — see render/surface.py / render/alpha.py.
    orig = jnp.where(kb >= 0, kb, -1)
    return HitRecord(t=tb, prim_id=orig.astype(I32), u=ub, v=vb)


def pallas_occluded(gpu, cfg, origins, dirs, t_min, t_max,
                    common=None) -> jnp.ndarray:
    tb, _, _, _ = _run(gpu, cfg, origins, dirs, t_min, t_max, "occluded",
                       common=common)
    return tb > 0.5


def make_pallas_backend(gpu: GPUScene, cfg: RenderConfig) -> TraceBackend:
    num_tris = gpu.faces.shape[0]
    num_spheres = gpu.sph_center.shape[0]
    sg = jax.lax.stop_gradient
    # In-kernel alpha masks engage exactly when the alpha re-trace ladder
    # will wrap this backend (cfg.alpha_test + opacity maps present): the
    # masked closest rejects definitely-transparent hits the ladder would
    # reject anyway, collapsing most of its rounds.  Non-alpha usage (and
    # oracle comparisons with alpha_test off) keeps the raw kernel.
    # Masks were built at RenderConfig.alpha_threshold: a bit-0 cell
    # bounds max alpha < 0.9, which stays conservative for any runtime
    # threshold >= that — lower thresholds disable the masks.
    amask = (gpu.pallas_amask if cfg.alpha_test
             and cfg.alpha_threshold >= RenderConfig.alpha_threshold
             else None)

    def closest(origins, dirs, t_min, t_max, common=None):
        hit = pallas_closest(sg(gpu), cfg, sg(origins), sg(dirs), sg(t_min),
                             sg(t_max), common=common, amask=amask)
        if num_spheres:
            sph = intersect.intersect_spheres(
                origins, dirs, gpu.sph_center, gpu.sph_radius, t_min, t_max)
            hit = _merge_sphere_hits(hit, sph, num_tris)
        return hit

    def occluded(origins, dirs, t_min, t_max, common=None):
        occ = pallas_occluded(sg(gpu), cfg, sg(origins), sg(dirs), sg(t_min),
                              sg(t_max), common=common)
        if num_spheres:
            sph = intersect.intersect_spheres(
                origins, dirs, gpu.sph_center, gpu.sph_radius, t_min, jnp.inf)
            occ = occ | (sph.t < jnp.broadcast_to(t_max, sph.t.shape))
        return occ

    return TraceBackend(closest=closest, occluded=occluded,
                        num_tris=num_tris, num_spheres=num_spheres)
