"""Headline benchmark: primary-ray closest-hit throughput per chip.

BASELINE.md target: >= 1e9 primary rays/s per chip on a 100k-triangle scene
at 1080p.  Measures the jitted closest-hit trace (camera ray generation +
BVH traversal) over full-frame ray batches, reporting the median of several
timed launches.  Prints ONE JSON line.

Usage: python bench.py            (full: 100k tris, 1920x1080)
       RTRT_BENCH_SCALE=small python bench.py   (quick local check)
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

# Persistent compile cache: axon remote compiles are minutes-long; cached
# executables make repeat benchmark runs start in seconds.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/tmp/rtrt_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main() -> None:
    small = os.environ.get("RTRT_BENCH_SCALE") == "small"
    num_tris = 2_000 if small else 100_000
    width, height = (320, 180) if small else (1920, 1080)

    from realtimeraytracer_tpu.config import RenderConfig
    from realtimeraytracer_tpu.ops.camera_rays import generate_rays
    from realtimeraytracer_tpu.render.backends import make_backend
    from realtimeraytracer_tpu import scenes

    cfg = RenderConfig(width=width, height=height, primary_rays=1,
                       shadow_rays=1, denoise_iterations=0)
    scene = scenes.procedural_mesh(num_tris)
    gpu = scene.compile(bvh_leaf_size=cfg.bvh_leaf_size)
    frame = scene.camera.viewport_frame(width, height)

    from realtimeraytracer_tpu.ops.camera_rays import block_permutation

    perm, _ = block_permutation(width, height)

    @jax.jit
    def trace(g, fr, sample):
        backend = make_backend(g, cfg)
        o, d = generate_rays(fr, width, height, sample_index=sample, jitter=True)
        hit = backend.closest(o[perm], d[perm], cfg.t_min, cfg.t_max)
        return hit.t, hit.prim_id

    n_rays = width * height
    # Warm-up / compile.
    t0 = time.perf_counter()
    t, p = trace(gpu, frame, jnp.uint32(0))
    t.block_until_ready()
    compile_s = time.perf_counter() - t0

    hit_frac = float(jnp.mean((p >= 0).astype(jnp.float32)))

    iters = 3 if small else 5
    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        t, p = trace(gpu, frame, jnp.uint32(i + 1))
        t.block_until_ready()
        times.append(time.perf_counter() - t0)
    times.sort()
    median = times[len(times) // 2]
    rays_per_s = n_rays / median

    baseline = 1e9
    print(json.dumps({
        "metric": "primary_rays_per_sec_per_chip",
        "value": rays_per_s,
        "unit": "rays/s",
        "vs_baseline": rays_per_s / baseline,
        "detail": {
            "tris": num_tris, "resolution": f"{width}x{height}",
            "median_trace_ms": median * 1e3, "compile_s": compile_s,
            "hit_fraction": hit_frac,
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
