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
    fallback for degenerate re-tests."""
    from realtimeraytracer_tpu.ops.intersect import ray_triangle

    num_tris = gpu.faces.shape[0]
    is_tri = (hit.prim_id >= 0) & (hit.prim_id < num_tris)
    tid = jnp.clip(hit.prim_id, 0, max(num_tris - 1, 0))
    if face_row is None:
        face_row = _alpha_face_row(gpu)
    g = face_row[tid]                       # (R, 16) — the one big gather
    v0, v1, v2 = g[..., 0:3], g[..., 3:6], g[..., 6:9]
    _, rt_u, rt_v, rt_ok = ray_triangle(origins, dirs, v0, v1, v2)
    hu = jnp.where(rt_ok, rt_u, hit.u)
    hv = jnp.where(rt_ok, rt_v, hit.v)
    w0 = (1.0 - hu - hv)[..., None]
    uv = (g[..., 9:11] * w0 + g[..., 11:13] * hu[..., None]
          + g[..., 13:15] * hv[..., None])
    tex = g[..., 15].astype(jnp.int32)
    a = sample_atlas(gpu.tex_atlas, gpu.tex_size, tex, uv[..., 0], uv[..., 1])[..., 0]
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
    eps = 1e-4
    face_row = _alpha_face_row(gpu)

    def closest(origins, dirs, t_min, t_max, common=None):
        # while ladder with EARLY EXIT: a round only runs while SOME ray
        # still has an alpha-rejected hit (rounds<cap keeps shapes and
        # semantics of the old fixed fori ladder).  Scenes where most
        # rays terminate opaque in round 0 pay ~1 trace, not alpha_rounds
        # (the fixed ladder cost the flagship frame 6 traces per query
        # regardless of need).
        r = origins.shape[0]
        t_lo0 = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (r,))
        hit0 = backend.closest(origins, dirs, t_lo0, t_max, common=common)
        a0 = hit_alpha(gpu, hit0, origins, dirs, face_row)
        rej0 = hit0.hit & (a0 < threshold)

        def cond(state):
            hit, t_lo, rejected, rounds = state
            return jnp.any(rejected) & (rounds < cfg.alpha_rounds)

        def round_fn(state):
            hit, t_lo, rejected, rounds = state
            t_lo = jnp.where(rejected, hit.t + eps, t_lo)
            re = backend.closest(origins, dirs, t_lo, t_max, common=common)
            hit = HitRecord(
                t=jnp.where(rejected, re.t, hit.t),
                prim_id=jnp.where(rejected, re.prim_id, hit.prim_id),
                u=jnp.where(rejected, re.u, hit.u),
                v=jnp.where(rejected, re.v, hit.v),
            )
            a = hit_alpha(gpu, hit, origins, dirs, face_row)
            rejected = hit.hit & (a < threshold)
            return hit, t_lo, rejected, rounds + 1

        hit, _, _, _ = jax.lax.while_loop(
            cond, round_fn, (hit0, t_lo0, rej0, jnp.int32(0)))
        return hit

    def occluded(origins, dirs, t_min, t_max, common=None):
        # Any-hit with alpha: occluded iff some OPAQUE hit lies in range.
        # Same early-exit ladder, stepping past transparent surfaces.
        r = origins.shape[0]
        t_max_v = jnp.broadcast_to(t_max, (r,)).astype(jnp.float32)
        t_lo0 = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (r,))
        hit0 = backend.closest(origins, dirs, t_lo0, t_max_v, common=common)
        a0 = hit_alpha(gpu, hit0, origins, dirs, face_row)
        in0 = hit0.hit & (hit0.t < t_max_v)
        occ0 = in0 & (a0 >= threshold)
        tr0 = in0 & (a0 < threshold) & ~occ0

        def cond(state):
            hit, occ, t_lo, transparent, rounds = state
            return jnp.any(transparent) & (rounds < cfg.alpha_rounds + 1)

        def round_fn(state):
            hit, occ, t_lo, transparent, rounds = state
            t_lo = jnp.where(transparent, hit.t + eps, t_lo)
            re = backend.closest(origins, dirs, t_lo, t_max_v, common=common)
            hit = HitRecord(
                t=jnp.where(transparent, re.t, hit.t),
                prim_id=jnp.where(transparent, re.prim_id, hit.prim_id),
                u=jnp.where(transparent, re.u, hit.u),
                v=jnp.where(transparent, re.v, hit.v),
            )
            a = hit_alpha(gpu, hit, origins, dirs, face_row)
            in_range = hit.hit & (hit.t < t_max_v)
            occ = occ | (in_range & (a >= threshold))
            transparent = in_range & (a < threshold) & ~occ
            return hit, occ, t_lo, transparent, rounds + 1

        _, occ, _, _, _ = jax.lax.while_loop(
            cond, round_fn, (hit0, occ0, t_lo0, tr0, jnp.int32(0)))
        return occ

    # occluded_multi is NOT forwarded: alpha-tested occlusion re-traces
    # closest hits, which the fused multi-segment path does not do.
    return TraceBackend(closest=closest, occluded=occluded,
                        num_tris=backend.num_tris,
                        num_spheres=backend.num_spheres,
                        perray_cull=backend.perray_cull)
