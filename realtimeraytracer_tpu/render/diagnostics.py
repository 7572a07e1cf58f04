"""Runtime traversal diagnostics: detect silent cap saturation.

`max_cluster_visits` / `max_traversal_steps` are safety valves on the
traversal loops; exceeding them silently drops hits (config.py notes this).
The reference has no analogue — its hardware traversal cannot be starved —
so this is the framework's own correctness guard (VERDICT r1 item 8):

  * every capped backend exposes `return_stats=True` returning a
    `cap_clipped` counter (tiles/lanes that still had work when the cap
    fired);
  * `diagnose_traversal` runs a trace with stats under jit;
  * `cfg.debug_traversal=True` makes `make_backend` wrap the trace calls
    with a jax.debug.print warning whenever a cap clips, so production
    renders can flag saturation without restructuring outputs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from realtimeraytracer_tpu.config import RenderConfig
from realtimeraytracer_tpu.scene.gpu_scene import GPUScene


def diagnose_traversal(gpu: GPUScene, cfg: RenderConfig, origins, dirs,
                       t_min, t_max, mode: str = "closest",
                       kind: str | None = None):
    """Run one trace with saturation stats.

    Returns (result, stats) where stats = {"cap_clipped": int32 count of
    unfinished tiles/lanes at cap exit, "steps": loop steps taken,
    "cap": the configured cap}.  kind defaults to the cfg-selected capped
    backend ("wide" or "lane"); the pallas and brute backends have no cap
    (pallas's ordered-visit loop is exact and uncapped) and report zeros.
    """
    kind = kind or ("wide" if cfg.backend in ("auto", "wide") else cfg.backend)
    if kind == "wide":
        from realtimeraytracer_tpu.render.wide_backend import (
            wide_closest, wide_occluded)

        fn = wide_closest if mode == "closest" else wide_occluded
        return fn(gpu, cfg, origins, dirs, t_min, t_max, return_stats=True)
    if kind == "lane":
        from realtimeraytracer_tpu.render.attic.bvh_backend import (
            traverse_closest, traverse_occluded)

        fn = traverse_closest if mode == "closest" else traverse_occluded
        return fn(gpu, cfg, origins, dirs, t_min, t_max, return_stats=True)
    if kind in ("pallas", "brute", "packet"):
        from realtimeraytracer_tpu.render.backends import make_backend

        be = make_backend(gpu, cfg.replace(backend=kind, alpha_test=False))
        fn = be.closest if mode == "closest" else be.occluded
        out = fn(origins, dirs, t_min, t_max)
        zero = jnp.int32(0)
        return out, {"cap_clipped": zero, "steps": zero, "cap": 0}
    raise ValueError(f"unknown backend kind {kind!r}")


def wrap_backend_with_debug(backend, gpu: GPUScene, cfg: RenderConfig):
    """Wrap a TraceBackend so cap saturation prints a loud warning.

    Uses the stats-capable entry points when the configured backend has a
    cap; exact backends pass through unchanged.
    """
    kind = cfg.backend
    if kind == "auto":
        kind = "wide" if (cfg.use_bvh and gpu.has_bvh
                          and jax.default_backend() != "tpu") else "pallas"
    if kind not in ("wide", "lane"):
        return backend

    def _warn(stats, what):
        jax.lax.cond(
            stats["cap_clipped"] > 0,
            lambda c: jax.debug.print(
                "WARNING traversal cap saturated: {} unfinished "
                + what + " (cap " + str(stats["cap"]) + ") — hits may be "
                "dropped; raise max_cluster_visits/max_traversal_steps", c),
            lambda c: None,
            stats["cap_clipped"])

    def closest(origins, dirs, t_min, t_max, common=None):
        hit, stats = diagnose_traversal(gpu, cfg, origins, dirs, t_min,
                                        t_max, "closest", kind)
        _warn(stats, "tiles/lanes in closest")
        from realtimeraytracer_tpu.render.backends import _merge_sphere_hits
        from realtimeraytracer_tpu.ops import intersect

        if backend.num_spheres:
            sph = intersect.intersect_spheres(
                origins, dirs, gpu.sph_center, gpu.sph_radius, t_min, t_max)
            hit = _merge_sphere_hits(hit, sph, backend.num_tris)
        return hit

    def occluded(origins, dirs, t_min, t_max, common=None):
        occ, stats = diagnose_traversal(gpu, cfg, origins, dirs, t_min,
                                        t_max, "occluded", kind)
        _warn(stats, "tiles/lanes in occluded")
        from realtimeraytracer_tpu.ops import intersect

        if backend.num_spheres:
            sph = intersect.intersect_spheres(
                origins, dirs, gpu.sph_center, gpu.sph_radius, t_min, jnp.inf)
            occ = occ | (sph.t < jnp.broadcast_to(t_max, sph.t.shape))
        return occ

    # Drop the hint-chained fast path: callers would bypass these debug
    # wrappers through it (and diagnostics runs are not perf runs).
    return backend._replace(closest=closest, occluded=occluded,
                            occluded_hinted=None)
