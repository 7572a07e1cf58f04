"""Alpha-tested transparency (the any-hit shader, done wavefront-style).

Parity target: the reference's opacity any-hit shader
(shaders/opacity.rahit:31-64) — for objects with an opacity map, sample the
map at the hit's interpolated uv and IGNORE the intersection when alpha <
0.9, both for primary/closest rays and for shadow rays.

TPU-native design: hardware re-runs the any-hit shader mid-traversal; here
transparency is a bounded re-trace loop around any backend: trace closest,
evaluate alpha at the accepted hit, and for rays whose hit was rejected
re-trace with t_min moved just past it.  A fixed `alpha_rounds` ladder
(masked lanes idle) keeps shapes static; rounds bound the number of
transparent surfaces a single ray can pass through, like the reference's
recursion limit bounds its shadow depth.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from realtimeraytracer_tpu.config import RenderConfig
from realtimeraytracer_tpu.ops.intersect import BIG_T, HitRecord
from realtimeraytracer_tpu.ops.texture import sample_atlas
from realtimeraytracer_tpu.render.backends import TraceBackend
from realtimeraytracer_tpu.scene.gpu_scene import GPUScene


def _alpha_face_row(gpu: GPUScene) -> jnp.ndarray:
    """Per-face wide row for hit_alpha: [v0 v1 v2 | uv0 uv1 uv2 | tex].

    TPU gathers cost ~10-40 ms per 2M rays REGARDLESS of row width
    (PERF.md), and the alpha ladder evaluates opacity once per re-trace
    round: the naive formulation paid ~10 R-sized gathers per round
    (faces, 3x vertices, 3x uvs, obj, tex) — measured as the dominant
    term of the 32 s alpha-on flagship frame (r4).  One (F, 16) row +
    one gather replaces them all; assembled in-graph from the scene
    arrays (F-sized gathers are ~20x cheaper than R-sized ones)."""
    f0, f1, f2 = gpu.faces[:, 0], gpu.faces[:, 1], gpu.faces[:, 2]
    tex = gpu.obj_tex[gpu.face_obj, 3].astype(jnp.float32)
    return jnp.concatenate([
        gpu.vertices[f0], gpu.vertices[f1], gpu.vertices[f2],
        gpu.uvs[f0], gpu.uvs[f1], gpu.uvs[f2],
        tex[:, None],
    ], axis=1)                                           # (F, 16)


def hit_alpha(gpu: GPUScene, hit: HitRecord, origins, dirs,
              face_row: jnp.ndarray | None = None) -> jnp.ndarray:
    """Opacity of each hit (1.0 where the object has no opacity map or the
    hit is a sphere/miss). Mirrors opacity.rahit's uv interpolation.

    Barycentrics are recomputed from the winning triangle (the pallas
    backend defers u/v out of its visit loop); hit.u/hit.v are only the
    fallback for degenerate re-tests.

    Instanced scenes (r5): vertices/uvs are MESH-SPACE pools and the
    per-face object is the INSTANCE's (face_obj is zeros) — the ray is
    transformed into mesh space with inst_inv[hit.inst] (t-invariant:
    directions not renormalized, same as the traversal kernel) and the
    opacity texture comes from obj_tex[inst_obj[hit.inst], 3]."""
    from realtimeraytracer_tpu.ops.intersect import ray_triangle

    num_tris = gpu.faces.shape[0]
    is_tri = (hit.prim_id >= 0) & (hit.prim_id < num_tris)
    tid = jnp.clip(hit.prim_id, 0, max(num_tris - 1, 0))
    if face_row is None:
        face_row = _alpha_face_row(gpu)
    g = face_row[tid]                       # (R, 16) — the one big gather
    v0, v1, v2 = g[..., 0:3], g[..., 3:6], g[..., 6:9]
    if gpu.instanced and hit.inst is not None:
        iid = jnp.clip(hit.inst, 0, gpu.inst_inv.shape[0] - 1)
        inv = gpu.inst_inv[iid]                         # (R, 12) [R|t]
        rot = inv[..., :9].reshape(inv.shape[:-1] + (3, 3))
        origins = (jnp.einsum("...ij,...j->...i", rot, origins)
                   + inv[..., 9:12])
        dirs = jnp.einsum("...ij,...j->...i", rot, dirs)
        is_tri = is_tri & (hit.inst >= 0)
    _, rt_u, rt_v, rt_ok = ray_triangle(origins, dirs, v0, v1, v2)
    hu = jnp.where(rt_ok, rt_u, hit.u)
    hv = jnp.where(rt_ok, rt_v, hit.v)
    w0 = (1.0 - hu - hv)[..., None]
    uv = (g[..., 9:11] * w0 + g[..., 11:13] * hu[..., None]
          + g[..., 13:15] * hv[..., None])
    tex = g[..., 15].astype(jnp.int32)
    if gpu.instanced and hit.inst is not None:
        tex = gpu.obj_tex[gpu.inst_obj[iid], 3].astype(jnp.int32)
    if gpu.tex_atlas_packed is not None and gpu.tex_atlas_packed.shape[0] > 0:
        from realtimeraytracer_tpu.ops.texture import sample_atlas_packed

        a = sample_atlas_packed(gpu.tex_atlas_packed, gpu.tex_size, tex,
                                uv[..., 0], uv[..., 1])[..., 0]
    else:
        a = sample_atlas(gpu.tex_atlas, gpu.tex_size, tex, uv[..., 0],
                         uv[..., 1])[..., 0]
    return jnp.where(is_tri & (tex >= 0), a, 1.0)


def wrap_backend_with_alpha(backend: TraceBackend, gpu: GPUScene,
                            cfg: RenderConfig) -> TraceBackend:
    if gpu.tex_atlas.shape[0] == 0:
        return backend       # no textures -> no opacity maps -> no-op
    # Gate on OPACITY maps, not "any texture": a scene with only color
    # textures that sets cfg.alpha_test=True would otherwise pay
    # alpha_rounds+2 closest traces per occlusion query for nothing
    # (VERDICT r2 weak #6).  Only checkable when the scene is concrete
    # (make_backend is also called inside jit traces, where the values
    # are tracers — then the conservative texture gate above stands).
    try:
        import numpy as _np

        if not bool((_np.asarray(gpu.obj_tex)[:, 3] >= 0).any()):
            return backend
    except Exception:
        pass
    threshold = cfg.alpha_threshold
    face_row = _alpha_face_row(gpu)

    def step_past(t):
        """t_min that provably clears the rejected hit.

        The Mosaic kernels return t rounded DOWN by up to t * 2^-16 (the
        (t | lane) packed reduction clears the low 7 mantissa bits), so
        an absolute epsilon alone lets the re-trace RE-FIND the same
        transparent triangle once t exceeds ~6 — the lane then stays
        rejected through every round and the ladder exhausts without
        progressing (r5 bug: 17% of foliage_field rays came back
        transparent-exhausted, and every cond-skippable round stayed
        live).  Step by max(1e-4, t * 2^-15) — twice the quantization
        bound — so each round provably advances one surface."""
        return t + jnp.maximum(jnp.float32(1e-4), t * jnp.float32(3.1e-5))

    # Two-phase occlusion (r4): when the scene compile produced an
    # opaque/alpha panel split and the production kernel is per-ray-
    # culling (TPU hier/hybrid), occlusion runs phase 1 as the RAW
    # occluded kernel on the OPAQUE subset — exact for every opaque
    # blocker, no ladder — and only lanes it leaves unresolved trace the
    # alpha-mapped subset through the re-trace ladder.  Exactness:
    # occluded <=> (some opaque hit in range) OR (some alpha-mapped hit
    # with sampled alpha >= threshold in range); the phases decide the
    # two disjuncts independently.  Measured economics in PERF.md
    # ("alpha-tested occlusion").
    split = (cfg.alpha_split and gpu.pallas_panels_opq is not None
             and not gpu.instanced and backend.perray_cull)
    if split:
        from realtimeraytracer_tpu.render.hier_backend import (
            make_hier_backend)

        gpu_opq = gpu._replace(
            pallas_panels=gpu.pallas_panels_opq,
            pallas_cl_min=gpu.pallas_cl_min_opq,
            pallas_cl_max=gpu.pallas_cl_max_opq)
        gpu_alp = gpu._replace(
            pallas_panels=gpu.pallas_panels_alp,
            pallas_cl_min=gpu.pallas_cl_min_alp,
            pallas_cl_max=gpu.pallas_cl_max_alp,
            sph_center=jnp.zeros((0, 3), jnp.float32),
            sph_radius=jnp.zeros((0,), jnp.float32))
        opq_backend = make_hier_backend(gpu_opq, cfg)   # spheres: opaque
        alp_backend = make_hier_backend(gpu_alp, cfg)
        alpha_row = face_row[gpu.alpha_tri_id]          # (A, 16)

    def closest(origins, dirs, t_min, t_max, common=None):
        # PYTHON-UNROLLED ladder with a lax.cond early-skip per round.
        # Two measured facts force this shape (r4): (a) Mosaic serializes
        # Pallas kernels inside lax.while/fori loops (~10x per-trace cost
        # — the 32.6 s flagship frame); (b) rays on alpha scenes usually
        # terminate opaque within 1-2 rounds, so rounds whose predicate
        # "any ray still holds an alpha-rejected hit" is false are
        # skipped entirely by the cond.
        r = origins.shape[0]
        t_lo = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (r,))
        hit = backend.closest(origins, dirs, t_lo, t_max, common=common)
        a = hit_alpha(gpu, hit, origins, dirs, face_row)
        rejected = hit.hit & (a < threshold)
        for _ in range(cfg.alpha_rounds):
            def round_fn(args):
                hit, t_lo, rejected = args
                t_lo = jnp.where(rejected, step_past(hit.t), t_lo)
                # Masked-lane discipline (PERF.md): only REJECTED lanes
                # need the re-trace; everyone else gets an empty
                # [BIG, -BIG) interval so their tiles retire instantly —
                # without it every round re-traced all R rays at full
                # cost for a handful of transparent lanes.
                re = backend.closest(
                    origins, dirs,
                    jnp.where(rejected, t_lo, BIG_T),
                    jnp.where(rejected,
                              jnp.broadcast_to(t_max, (r,)).astype(
                                  jnp.float32), -BIG_T),
                    common=common)
                hit = HitRecord(
                    t=jnp.where(rejected, re.t, hit.t),
                    prim_id=jnp.where(rejected, re.prim_id, hit.prim_id),
                    u=jnp.where(rejected, re.u, hit.u),
                    v=jnp.where(rejected, re.v, hit.v),
                    inst=(jnp.where(rejected, re.inst, hit.inst)
                          if hit.inst is not None else None),
                )
                a = hit_alpha(gpu, hit, origins, dirs, face_row)
                return hit, t_lo, hit.hit & (a < threshold)

            hit, t_lo, rejected = jax.lax.cond(
                jnp.any(rejected), round_fn, lambda args: args,
                (hit, t_lo, rejected))
        return hit

    def occluded(origins, dirs, t_min, t_max, common=None):
        # Any-hit with alpha: occluded iff some OPAQUE hit lies in range.
        # Same unrolled cond-skipped ladder, stepping past transparents.
        r = origins.shape[0]
        t_max_v = jnp.broadcast_to(t_max, (r,)).astype(jnp.float32)
        t_lo = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (r,))
        if split:
            occ_opq = opq_backend.occluded(origins, dirs, t_lo, t_max_v,
                                           common=common)
            # Only still-unresolved lanes walk the alpha subset.
            live = ~occ_opq & (t_max_v > t_lo)
            lo2 = jnp.where(live, t_lo, BIG_T)
            hi2 = jnp.where(live, t_max_v, -BIG_T)
            occ_a = _occluded_ladder(alp_backend, alpha_row, origins, dirs,
                                     lo2, hi2, common)
            return occ_opq | occ_a
        return _occluded_ladder(backend, face_row, origins, dirs, t_lo,
                                t_max_v, common)

    def _occluded_ladder(bk, row, origins, dirs, t_lo, t_max_v, common):
        r = origins.shape[0]
        hit = bk.closest(origins, dirs, t_lo, t_max_v, common=common)
        a = hit_alpha(gpu, hit, origins, dirs, row)
        in_range = hit.hit & (hit.t < t_max_v)
        occ = in_range & (a >= threshold)
        transparent = in_range & (a < threshold) & ~occ
        for _ in range(cfg.alpha_rounds + 1):
            def round_fn(args):
                hit, occ, t_lo, transparent = args
                t_lo = jnp.where(transparent, step_past(hit.t), t_lo)
                # Same masked-lane discipline as the closest ladder.
                re = bk.closest(
                    origins, dirs,
                    jnp.where(transparent, t_lo, BIG_T),
                    jnp.where(transparent, t_max_v, -BIG_T),
                    common=common)
                hit = HitRecord(
                    t=jnp.where(transparent, re.t, hit.t),
                    prim_id=jnp.where(transparent, re.prim_id, hit.prim_id),
                    u=jnp.where(transparent, re.u, hit.u),
                    v=jnp.where(transparent, re.v, hit.v),
                    inst=(jnp.where(transparent, re.inst, hit.inst)
                          if hit.inst is not None else None),
                )
                a = hit_alpha(gpu, hit, origins, dirs, row)
                in_range = hit.hit & (hit.t < t_max_v)
                occ = occ | (in_range & (a >= threshold))
                transparent = in_range & (a < threshold) & ~occ
                return hit, occ, t_lo, transparent

            hit, occ, t_lo, transparent = jax.lax.cond(
                jnp.any(transparent), round_fn, lambda args: args,
                (hit, occ, t_lo, transparent))
        return occ

    # occluded_multi is NOT forwarded: alpha-tested occlusion re-traces
    # closest hits, which the fused multi-segment path does not do.
    return TraceBackend(closest=closest, occluded=occluded,
                        num_tris=backend.num_tris,
                        num_spheres=backend.num_spheres,
                        perray_cull=backend.perray_cull)
