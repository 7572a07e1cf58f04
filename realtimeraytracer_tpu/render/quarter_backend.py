"""Pallas traversal kernel v9: quarter-composited ordered visits.

Closest-hit specialization attacking v7's remaining structural cost: a
visit tests 128 CONSECUTIVE sorted triangles, so every ray pays for the
block-mates of the subclusters it actually needs — 7.74 visits x 128 =
990 tris/ray tested at 1080p/100k while the per-ray-relevant set is
~200-300 (PERF.md).  The XLA cull already scores every 32-triangle
subcluster; v7 then throws that resolution away by reducing to block
keys ("cull fine, visit coarse").

v9 keeps the fine keys and composites visits instead:

  * The cull emits FOUR ordered key streams, one per lane quarter
    (cull_quarter_keys): subcluster s = 4B + q lives at lanes
    [32q, 32q+32) of coefficient panel B, so a quarter-q key carries
    panel id B and its own entry bound.
  * Each kernel iteration pops the minimum key of EVERY quarter stream
    and composites the four panels' native lane quarters into ONE
    (12, 128) visit with two iota-mask selects per quarter — no lane
    shuffles, no gathers, no MXU.  The intersection math (the expensive
    (128, 128) FMA part) runs ONCE for four subclusters from (generally)
    four DIFFERENT blocks.
  * Stop rule stays exact: pops are per-quarter nondecreasing, so the
    min over the four popped keys is the min over ALL remaining
    candidates; the loop exits when it exceeds the tile's worst live
    best_t — the same ordered-visit argument as v7/v8.
  * Triangle ids: the winning lane's quarter identifies which popped
    panel it came from (lane // 32), so `tri = cid[lane//32] * 128 +
    lane` — three scalar-broadcast selects, no gather.

Effect: tris tested per ray drop toward the subcluster-exact candidate
set (~4x less block-mate waste) while per-visit cost stays at v7's
slice+intersect floor plus three extra panel reads and ~11 small
(12, 128) select/add ops (~128x smaller than the intersection tensors).

Capability parity: same traceRayEXT replacement as v7/v8
(src/shaders/raygen.rgen:99-107 over blas.cppm:75-167/tlas.cppm:44-149);
VMEM-resident scenes only (<= RESIDENT_CB blocks) — larger scenes route
to v8's HBM-path hierarchy (render/backends.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from realtimeraytracer_tpu.config import RenderConfig
from realtimeraytracer_tpu.ops.intersect import BIG_T, HitRecord
from realtimeraytracer_tpu.render.pallas_backend import (
    BIG,
    BT,
    BUNDLES,
    CB,
    CPB,
    CROWS,
    EPS,
    INVALID,
    RESIDENT_CB,
    SUBK,
    _pack_rays,
    cull_quarter_keys,
    pack_clusters,
)
from realtimeraytracer_tpu.render.pallas_backend import _knob
from realtimeraytracer_tpu.scene.gpu_scene import GPUScene

F32 = jnp.float32
I32 = jnp.int32
TILE = 128
NQ = CB // SUBK      # lane quarters per panel (4)
# Debug-only ablations (RTRT_DEBUG=1 + QB_ABLATE): "qnovisit" (launch +
# cull + init pop only), "qfixedN" (N unconditional composite visits,
# static panel ids — the pure composite+intersect floor), "qfixeddynN"
# (N visits with real pops + dynamic ids, no stop rule).
_ABLATE = _knob("QB_ABLATE", "")
# Repacked-panel id mapping: "smem" (in-kernel per-visit dynamic SMEM
# scalar loads — measured FREE on v5e: 41.2 ms vs 40.7 with no id
# machinery at all) or "post" (slot ids out of the kernel + one XLA
# gather — measured +15 ms per 2M rays; debug comparison path only).
_IDMAP = _knob("QB_IDMAP", "smem")


def _tile_body(b, rays_ref, off_ref, keys_ref, coeff_ref, amask_ref,
               outf_ref, outi_ref, ent_ref, *, cbn, cb, id_mask, common,
               pack):
    """Quarter-composited ordered-visit closest trace of ONE 128-ray tile.

    off_ref: (cb*NQ,) i32 SMEM pads-before-group table (ops/repack.py),
    or None: emitted tri ids are sorted-space ids, slot - off[group].
    The per-visit dynamic SMEM scalar loads measure FREE on v5e (they
    issue alongside the pop's scalar extracts and never touch the VPU
    pipeline); the post-kernel XLA gather alternative costs +15 ms per
    2M rays (QB_IDMAP knob).
    """
    rays = rays_ref[b]                           # (8, 128)
    tmin_c = rays[6, :][:, None]                 # (128, 1)
    tmax_c = rays[7, :][:, None]

    ent_ref[...] = keys_ref[b]                   # (NQ*cbn, 8, 128)

    def pop_all():
        """Pop `pack` near-minimal keys of EVERY quarter stream in one
        full-array pass (not NQ separate ones): reduce to per-quarter
        row minima, take `pack` successive minima per row, one masked
        writeback.  Each quarter's FIRST pop is its true minimum — so the
        min over quarters of first pops is the global min of all
        remaining candidates and the stop rule stays exact; later pops
        are >= the first, merely perturbing visit order.

        Returns keys[q][u]: quarter q's u-th pop (scalars)."""
        eq = ent_ref[...].reshape(NQ, cbn * 8, 128)
        qmin = jnp.min(eq, axis=1, keepdims=True)[:, 0, :]     # (NQ, 128)
        ms = []
        for _ in range(pack):
            m = jnp.min(qmin, axis=1, keepdims=True)           # (NQ, 1)
            ms.append(m)
            if pack > 1:
                qmin = jnp.where(qmin == m, INVALID, qmin)
        popped = eq == ms[0][:, :, None]
        for m in ms[1:]:
            popped = popped | (eq == m[:, :, None])
        ent_ref[...] = jnp.where(popped, INVALID, eq).reshape(
            NQ * cbn, 8, 128)
        return tuple(tuple(m[q, 0] for m in ms) for q in range(NQ))

    # Ray columns (v7's common-origin/direction collapse).
    ocol = [rays[a, :][:, None] for a in range(3)]
    dcol = [rays[3 + a, :][:, None] for a in range(3)]
    if common == "origin":
        ocol = [rays[a, 0:1][:, None] for a in range(3)]
    elif common == "dir":
        dcol = [rays[3 + a, 0:1][:, None] for a in range(3)]

    lane_t = jax.lax.broadcasted_iota(I32, (TILE, CB), 1)
    lane128 = jax.lax.broadcasted_iota(I32, (1, CB), 1)
    qmask = [(lane128 >= q * SUBK) & (lane128 < (q + 1) * SUBK)
             for q in range(NQ)]

    def composite(cids):
        """Four panels' native lane quarters -> one (12, 128) visit."""
        c = None
        for q in range(NQ):
            part = jnp.where(qmask[q], coeff_ref[cids[q]], 0.0)
            c = part if c is None else c + part
        return c

    def composite_amask(cids):
        """Same quarter compositing for the (2, 128) alpha-mask rows."""
        m = None
        for q in range(NQ):
            part = jnp.where(qmask[q], amask_ref[cids[q]], 0)
            m = part if m is None else m + part
        return m

    def intersect_composite(c, m=None):
        """Baldwin-Weber t/ok of 128 rays x the composited 128 tris."""
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
            from realtimeraytracer_tpu.render.pallas_backend import _mask_ok
            ok = _mask_ok(ok, u, v, m)
        return t, ok

    def worst_of(best_t):
        limit_bits = jax.lax.bitcast_convert_type(
            jnp.minimum(best_t, tmax_c), I32)
        return jnp.max(limit_bits)               # int-ordered; pads lose

    def kmin_of(keys):
        kmin = keys[0][0]
        for q in range(1, NQ):
            kmin = jnp.minimum(kmin, keys[q][0])
        return kmin

    def cond(state):
        keys, best_t, best_k, worst, visits = state
        # Quarter first-pops are the quarters' true minima and later pops
        # are >= them, so kmin is the min over ALL remaining candidates.
        # `worst` is CARRIED: computed in the body from the previous
        # iteration's best_t (see body) — one iteration stale.  best_t
        # only decreases, so the stale bound is >= the fresh one: the
        # loop can only run EXTRA tail iterations, and an extra visit can
        # never improve best (entry > limit => no t passes), so output is
        # bit-identical to the fresh-reduce rule.  The win: the cond is
        # now pure scalar compares — the (128,1) reduce + vector->scalar
        # trip that loop control could never overlap now issues inside
        # the body, overlapping the visit FMAs.
        kmin = kmin_of(keys)
        return (kmin != INVALID) & ((kmin & ~id_mask) <= worst)

    def one_visit(cids, offs, best_t, best_k):
        m = composite_amask(cids) if amask_ref is not None else None
        t, ok = intersect_composite(composite(cids), m)
        limit = jnp.minimum(best_t, tmax_c)
        ok = ok & (t <= limit)
        # (t | lane) packed reduction, exactly v7's trick (low 7 bits of
        # the t mantissa traded for the lane id; misses use +inf bits).
        tm = jnp.where(ok, t, jnp.float32(jnp.inf))
        tkey = (jax.lax.bitcast_convert_type(tm, I32) & ~127) | lane_t
        kbest = jnp.min(tkey, axis=1, keepdims=True)          # (128, 1)
        best_bits = jax.lax.bitcast_convert_type(best_t, I32)
        better = kbest < best_bits
        lane = kbest & 127
        # The winning lane's quarter says which popped panel it came from.
        lq = lane // SUBK                                     # (128, 1)
        cid_sel = jnp.where(
            lq == 0, cids[0],
            jnp.where(lq == 1, cids[1],
                      jnp.where(lq == 2, cids[2], cids[3])))
        tri = cid_sel * CB + lane                # slot-space id
        if offs is not None:
            off_sel = jnp.where(
                lq == 0, offs[0],
                jnp.where(lq == 1, offs[1],
                          jnp.where(lq == 2, offs[2], offs[3])))
            tri = tri - off_sel                  # sorted-space id
        best_t = jnp.where(
            better, jax.lax.bitcast_convert_type(kbest & ~127, F32), best_t)
        best_k = jnp.where(better, tri, best_k)
        return best_t, best_k

    def body(state):
        keys, best_t, best_k, worst, visits = state

        # Stale-worst refresh: reduce the PREVIOUS iteration's best_t
        # (available at body entry) so the vector->scalar trip overlaps
        # this iteration's visit math instead of gating the cond.
        worst = worst_of(best_t)

        # Pop-ahead: next keys' vector->scalar trips overlap this visit.
        nxt = pop_all()

        for u in range(pack):
            # A drained quarter stream pops INVALID, which clamps to
            # panel cb-1; that panel is then re-composited every
            # remaining iteration.  Provably harmless (ADVICE r3): the
            # cull is conservative and the (t | lane) min-reduction is
            # idempotent, so a re-visited culled/visited panel can never
            # yield a new best hit — it only wastes that quarter's lanes
            # until the stop rule fires on the surviving streams.
            cids = [jnp.minimum(keys[q][u] & id_mask, cb - 1)
                    for q in range(NQ)]
            offs = ([off_ref[cids[q] * NQ + q] for q in range(NQ)]
                    if off_ref is not None else None)
            best_t, best_k = one_visit(cids, offs, best_t, best_k)
        return (nxt, best_t, best_k, worst, visits + 1)

    best0 = jnp.full((TILE, 1), BIG, F32)
    init = (
        pop_all(),
        best0,
        jnp.full((TILE, 1), -1, I32),
        worst_of(best0),
        jnp.int32(0),
    )
    if _ABLATE == "qnovisit":
        keys0, best_t, best_k, _, visits = init
        best_t = best_t + keys0[0][0].astype(F32) * 0.0
    elif _ABLATE.startswith("qfixeddyn"):
        n = int(_ABLATE[len("qfixeddyn"):] or "5")
        st = init

        def fcond(st):
            return st[4] < n
        _, best_t, best_k, _, visits = jax.lax.while_loop(fcond, body, st)
    elif _ABLATE.startswith("qfixed"):
        n = int(_ABLATE[len("qfixed"):] or "5")
        best_t, best_k = init[1], init[2]
        for j in range(n):
            cids = [(j * NQ + q) % cb for q in range(NQ)]
            best_t, best_k = one_visit(cids, None, best_t, best_k)
        visits = jnp.int32(n)
    else:
        _, best_t, best_k, _, visits = jax.lax.while_loop(cond, body, init)

    outf_ref[b, 0, :] = best_t[:, 0]
    outf_ref[b, 1, :] = jnp.zeros((TILE,), F32)
    outf_ref[b, 2, :] = jnp.zeros((TILE,), F32)
    outi_ref[b, 0, :] = best_k[:, 0]
    outi_ref[b, 1, :] = jnp.full((TILE,), NQ * pack, I32) * visits
    return jnp.int32(0)


def _trace_kernel(rays_ref, off_ref, keys_ref, coeff_ref, amask_ref,
                  outf_ref, outi_ref, ent_ref, *, cbn, cb, id_mask, common,
                  pack):
    jax.lax.fori_loop(
        0, BT,
        lambda b, _: _tile_body(b, rays_ref, off_ref, keys_ref, coeff_ref,
                                amask_ref, outf_ref, outi_ref, ent_ref,
                                cbn=cbn, cb=cb, id_mask=id_mask,
                                common=common, pack=pack),
        jnp.int32(0))


def trace_blocks_quarter(gpu: GPUScene, cfg: RenderConfig, ray_blocks,
                         common: str | None = None, pack: int = 1,
                         use_amask: bool = False):
    """Closest-hit trace of packed (Ts, 8, 128) ray blocks, v9 scheme.

    Same output contract as pallas_backend.trace_blocks closest mode:
    outf rows [t | - | -], outi rows [sorted-tri id or -1 |
    subclusters visited | -].
    """
    ts = ray_blocks.shape[0]
    if gpu.q_panels is not None:
        # SAH-repacked panels (ops/repack.py): tighter subcluster boxes;
        # group_off maps slot ids back to sorted space after the kernel.
        coeff = gpu.q_panels
        cl_min, cl_max = gpu.q_cl_min, gpu.q_cl_max
        group_off = gpu.q_group_off
        amask = gpu.q_amask if use_amask else None
    else:
        if gpu.pallas_panels is not None \
                and gpu.pallas_panels.shape[1] == CROWS:
            coeff = gpu.pallas_panels
            cl_min, cl_max = gpu.pallas_cl_min, gpu.pallas_cl_max
            amask = gpu.pallas_amask if use_amask else None
        else:
            coeff, cl_min, cl_max = pack_clusters(gpu)
            amask = None
        group_off = None
    cb = coeff.shape[0]
    if cb > RESIDENT_CB:
        raise ValueError(
            f"v9 quarter kernel is VMEM-resident only ({cb} blocks > "
            f"{RESIDENT_CB}); callers must route larger scenes to v8")

    # bundles=BUNDLES: the PB_BUNDLES sub-bundle cull knob applies to v9
    # exactly as to v7's cull_keys (ADVICE r3: it was silently ignored
    # here, skewing knob sweeps comparing the two paths).
    keys, id_mask = cull_quarter_keys(ray_blocks, cl_min, cl_max,
                                      bundles=BUNDLES)
    cbn = keys.shape[2]
    keys = keys.reshape(ts, NQ * cbn, 8, 128)

    pad = (-ts) % BT
    if pad:
        pad_blk = jnp.broadcast_to(ray_blocks[:1], (pad, 8, TILE))
        pad_blk = pad_blk.at[:, 6, :].set(BIG_T)
        pad_blk = pad_blk.at[:, 7, :].set(-BIG_T)
        ray_blocks = jnp.concatenate([ray_blocks, pad_blk])
        keys = jnp.concatenate(
            [keys, jnp.full((pad,) + keys.shape[1:], INVALID, I32)])
    tsp = ts + pad

    kw = dict(cbn=cbn, cb=cb, id_mask=id_mask, common=common, pack=pack)
    use_smem = group_off is not None and _IDMAP == "smem"
    in_specs = [
        pl.BlockSpec((BT, 8, TILE), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((BT, NQ * cbn, 8, TILE), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    inputs = [ray_blocks, keys, coeff]
    if amask is not None:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        inputs.append(amask)
    if use_smem:
        in_specs.insert(1, pl.BlockSpec(memory_space=pltpu.SMEM))
        inputs.insert(1, group_off)
        if amask is not None:
            kernel = functools.partial(_trace_kernel, **kw)
        else:
            def kernel(rays, off, keys, coeff, outf, outi, ent):
                _trace_kernel(rays, off, keys, coeff, None, outf, outi,
                              ent, **kw)
    else:
        if amask is not None:
            def kernel(rays, keys, coeff, am, outf, outi, ent):
                _trace_kernel(rays, None, keys, coeff, am, outf, outi,
                              ent, **kw)
        else:
            def kernel(rays, keys, coeff, outf, outi, ent):
                _trace_kernel(rays, None, keys, coeff, None, outf, outi,
                              ent, **kw)
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
        scratch_shapes=[pltpu.VMEM((NQ * cbn, 8, 128), I32)],
        interpret=jax.default_backend() != "tpu",
    )(*inputs)
    if group_off is not None and not use_smem:
        # Slot ids -> sorted ids: one narrow gather into the tiny
        # pads-before-group table (sorted = slot - off[slot // 32]).
        ids = outi[:ts, 0, :]
        g = jnp.clip(ids >> 5, 0, group_off.shape[0] - 1)
        mapped = jnp.where(ids >= 0, ids - group_off[g], ids)
        return outf[:ts], jnp.concatenate(
            [mapped[:, None, :], outi[:ts, 1:, :]], axis=1)
    return outf[:ts], outi[:ts]


def quarter_closest(gpu: GPUScene, cfg: RenderConfig, origins, dirs,
                    t_min, t_max, common: str | None = None,
                    use_amask: bool = False) -> HitRecord:
    """Closest hit via the v9 kernel — v7-bit-identical output contract.

    scene.compile permutes the face table into BVH order, so the sorted
    triangle id IS the face id; (u, v) are zeros (render/surface.py
    recomputes them exactly and differentiably from the winning triangle).
    """
    r = origins.shape[0]
    t_min = jnp.broadcast_to(jnp.asarray(t_min, F32), (r,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, F32), (r,)).astype(F32)
    rays, r_orig, ts = _pack_rays(origins, dirs, t_min, t_max)
    outf, outi = trace_blocks_quarter(gpu, cfg, rays, common=common,
                                      use_amask=use_amask)
    tb = outf[:, 0, :].reshape(-1)[:r_orig]
    kb = outi[:, 0, :].reshape(-1)[:r_orig]
    ub = outf[:, 1, :].reshape(-1)[:r_orig]
    vb = outf[:, 2, :].reshape(-1)[:r_orig]
    orig = jnp.where(kb >= 0, kb, -1)
    return HitRecord(t=tb, prim_id=orig.astype(I32), u=ub, v=vb)


def make_quarter_backend(gpu: GPUScene, cfg: RenderConfig):
    """TraceBackend with v9 closest; occlusion delegates to v7's kernel
    (the quarter scheme has no occlusion win: occlusion already retires
    on ANY hit, so block-mate waste is one visit deep — see PERF.md)."""
    from realtimeraytracer_tpu.ops import intersect
    from realtimeraytracer_tpu.render.backends import (
        TraceBackend,
        _merge_sphere_hits,
    )
    from realtimeraytracer_tpu.render.pallas_backend import pallas_occluded

    num_tris = gpu.faces.shape[0]
    num_spheres = gpu.sph_center.shape[0]
    sg = jax.lax.stop_gradient
    # Same in-kernel alpha-mask gate as make_pallas_backend.
    use_amask = bool(cfg.alpha_test) and (
        cfg.alpha_threshold >= RenderConfig.alpha_threshold)

    def closest(origins, dirs, t_min, t_max, common=None):
        hit = quarter_closest(sg(gpu), cfg, sg(origins), sg(dirs), sg(t_min),
                              sg(t_max), common=common, use_amask=use_amask)
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
