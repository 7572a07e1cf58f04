"""Trace backends: how a ray batch is intersected against the scene.

The functional stand-in for the reference's ``traceRayEXT`` + acceleration
structure stack (BLAS/TLAS builds at vulkan/raytracing/blas.cppm,
tlas.cppm; pipeline dispatch at ray_tracing_pipeline.cppm:212-214).  A
backend is a pair of pure functions over ray batches:

    closest(origins, dirs, t_min, t_max)  -> HitRecord (unified prim ids)
    occluded(origins, dirs, t_min, t_max) -> bool mask  (any-hit semantics)

Unified prim-id encoding: ids in [0, F) are triangles, [F, F+S) are analytic
spheres.  Backends: "brute" (chunked all-pairs, MXU/VPU-friendly, exact) and
"bvh" (LBVH traversal, ops/traversal.py) — both return identical records so
the shading code is backend-agnostic.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax.numpy as jnp

from realtimeraytracer_tpu.config import RenderConfig
from realtimeraytracer_tpu.ops import intersect
from realtimeraytracer_tpu.scene.gpu_scene import GPUScene


class TraceBackend(NamedTuple):
    closest: Callable
    occluded: Callable
    num_tris: int
    num_spheres: int
    # True when the backend culls per RAY (render/hier_backend.py): tile
    # shaft fatness no longer matters, so callers skip their octant+Morton
    # ray reordering (the sort+permute overhead buys nothing).
    perray_cull: bool = False
    # Optional batched shadow query: S shared-origin segments resolved in
    # ONE kernel pass (occluded_multi(origins, dirs_s, t_lo, t_hi_s) ->
    # list of S masks).  None when the backend has no fused path.
    occluded_multi: Callable | None = None
    # Optional hint-chained occlusion (render/hier_backend.py r5):
    # occluded_hinted(o, d, lo, hi, hints=..., common=...) ->
    # (mask, hints_out); callers thread hints_out into the next
    # CORRELATED occlusion query (e.g. the next stochastic sample of the
    # same light).  Exact — hints only short-circuit traversal cost.
    occluded_hinted: Callable | None = None


def _merge_sphere_hits(tri_hit: intersect.HitRecord,
                       sph_hit: intersect.HitRecord,
                       num_tris: int) -> intersect.HitRecord:
    use_sph = sph_hit.t < tri_hit.t
    inst = tri_hit.inst
    if inst is not None:
        inst = jnp.where(use_sph, -1, inst)
    return intersect.HitRecord(
        t=jnp.where(use_sph, sph_hit.t, tri_hit.t),
        prim_id=jnp.where(
            use_sph,
            jnp.where(sph_hit.prim_id >= 0, sph_hit.prim_id + num_tris, -1),
            tri_hit.prim_id,
        ),
        u=jnp.where(use_sph, sph_hit.u, tri_hit.u),
        v=jnp.where(use_sph, sph_hit.v, tri_hit.v),
        inst=inst,
    )


def make_bruteforce_backend(gpu: GPUScene, cfg: RenderConfig) -> TraceBackend:
    """All-pairs chunked intersection — exact, no build step; the right
    choice for small scenes and the leaf primitive for the BVH."""
    num_tris = gpu.faces.shape[0]
    num_spheres = gpu.sph_center.shape[0]

    def closest(origins, dirs, t_min, t_max, common=None):
        hit = intersect.intersect_tris_bruteforce(
            origins, dirs, gpu.vertices, gpu.faces, t_min, t_max
        )
        if num_spheres:
            sph = intersect.intersect_spheres(
                origins, dirs, gpu.sph_center, gpu.sph_radius, t_min, t_max
            )
            hit = _merge_sphere_hits(hit, sph, num_tris)
        return hit

    def occluded(origins, dirs, t_min, t_max, common=None):
        occ = intersect.occluded_tris_bruteforce(
            origins, dirs, gpu.vertices, gpu.faces, t_min, t_max
        )
        if num_spheres:
            sph = intersect.intersect_spheres(
                origins, dirs, gpu.sph_center, gpu.sph_radius, t_min, jnp.inf
            )
            occ = occ | (sph.t < jnp.broadcast_to(t_max, sph.t.shape))
        return occ

    return TraceBackend(closest=closest, occluded=occluded,
                        num_tris=num_tris, num_spheres=num_spheres)


def make_hybrid_backend(gpu: GPUScene, cfg: RenderConfig) -> TraceBackend:
    """Route each trace class to its measured-fastest Mosaic kernel.

    1080p/100k v5e measurements (scripts/hier_shadow_probe.py, r3):

      | trace                      | v7 hull cull | v8 per-ray | v9 quarter |
      |----------------------------|-------------:|-----------:|-----------:|
      | closest, common origin/dir |      62.4 ms |    99.7 ms |    56.2 ms |
      | closest, incoherent        |      2311 ms |    1392 ms |          — |
      | occluded (area shadows)    | 221 (88 srt) |      91 ms |          — |

    Coherent pinhole/sun bundles get v9's quarter-composited visits when
    the coefficient table is VMEM-resident (v7's hull cull + ~40% less
    block-mate waste per visit), falling back to v7 on larger scenes;
    everything incoherent gets v8's per-ray hierarchy, which also makes
    shadow-ray sorting unnecessary (perray_cull=True — megakernel/
    wavefront skip their octant+Morton permutes).
    """
    from realtimeraytracer_tpu.render.hier_backend import make_hier_backend
    from realtimeraytracer_tpu.render.pallas_backend import (
        RESIDENT_CB,
        make_pallas_backend,
    )
    from realtimeraytracer_tpu.render.quarter_backend import (
        make_quarter_backend,
    )

    v7 = make_pallas_backend(gpu, cfg)
    v8 = make_hier_backend(gpu, cfg)
    resident = (gpu.pallas_panels is not None
                and gpu.pallas_panels.shape[0] <= RESIDENT_CB)
    v9 = make_quarter_backend(gpu, cfg) if resident else v7

    def closest(origins, dirs, t_min, t_max, common=None):
        be = v9 if common in ("origin", "dir") else v8
        return be.closest(origins, dirs, t_min, t_max, common=common)

    def occluded(origins, dirs, t_min, t_max, common=None):
        # v8 wins BOTH occlusion classes (sun common-dir: 69.8 vs 77.8 ms).
        return v8.occluded(origins, dirs, t_min, t_max, common=common)

    return TraceBackend(closest=closest, occluded=occluded,
                        num_tris=v8.num_tris, num_spheres=v8.num_spheres,
                        perray_cull=True,
                        occluded_multi=v8.occluded_multi,
                        occluded_hinted=v8.occluded_hinted)


def make_backend(gpu: GPUScene, cfg: RenderConfig) -> TraceBackend:
    kind = cfg.backend
    if gpu.instanced:
        # Shared-geometry scenes store MESH-SPACE pools: only the v8
        # hierarchical kernel understands the per-instance transform
        # level.  Auto/hybrid route there; anything else would silently
        # intersect mesh-space geometry with world rays.
        if kind in ("auto", "hybrid", "hier", "pallas", "wide", "quarter"):
            kind = "hier"
        else:
            raise ValueError(
                f"backend {kind!r} cannot trace an instanced scene — use "
                "'hier' (or compile with bake_instances=True)")
    if kind == "auto":
        if cfg.use_bvh and gpu.has_bvh:
            # The Mosaic kernels are the fast path on TPU ("hybrid": v7
            # hull-cull for coherent common-origin/dir traces, v8 per-ray
            # hierarchy for shadow/bounce traces — each measured fastest
            # on its ray class, PERF.md r3); the wide XLA backend is the
            # portable twin elsewhere (same culling, same stop rule).
            import jax

            kind = "hybrid" if jax.default_backend() == "tpu" else "wide"
        else:
            kind = "brute"
    if (kind in ("wide", "pallas", "hier", "hybrid", "quarter")
            and not gpu.has_bvh and not gpu.instanced):
        # (instanced scenes carry traversal panels but no LBVH nodes —
        # the hier kernel is their only and correct path)
        kind = "brute"
    if kind == "pallas":
        from realtimeraytracer_tpu.render.pallas_backend import make_pallas_backend

        backend = make_pallas_backend(gpu, cfg)
    elif kind == "hier":
        from realtimeraytracer_tpu.render.hier_backend import make_hier_backend

        backend = make_hier_backend(gpu, cfg)
    elif kind == "quarter":
        from realtimeraytracer_tpu.render.quarter_backend import (
            make_quarter_backend,
        )

        backend = make_quarter_backend(gpu, cfg)
    elif kind == "hybrid":
        backend = make_hybrid_backend(gpu, cfg)
    elif kind == "wide":
        from realtimeraytracer_tpu.render.wide_backend import make_wide_backend

        backend = make_wide_backend(gpu, cfg)
    elif kind in ("packet", "lane"):
        raise ValueError(
            f"backend {kind!r} was retired to render/attic/ (superseded "
            "by wide/hier/quarter); import it from there explicitly if "
            "you need the historical implementation")
    elif kind == "brute":
        backend = make_bruteforce_backend(gpu, cfg)
    else:
        raise ValueError(f"unknown backend {cfg.backend!r}")
    if cfg.debug_traversal:
        from realtimeraytracer_tpu.render.diagnostics import (
            wrap_backend_with_debug)

        backend = wrap_backend_with_debug(backend, gpu, cfg)
    if cfg.alpha_test:
        from realtimeraytracer_tpu.render.alpha import wrap_backend_with_alpha

        backend = wrap_backend_with_alpha(backend, gpu, cfg)
    return backend
