"""Scene-size scaling rungs: closest-hit trace at 100k / 500k / 1M tris.

VERDICT r2 missing #2/#3: the v7 kernel's flat cull made cost linear in
scene size and fell off a VMEM cliff past ~131k triangles.  The v8
hierarchy (render/hier_backend.py) culls per ray through supercluster ->
block levels and streams coefficients from HBM when they outgrow VMEM,
so cost tracks per-ray-relevant geometry.  Acceptance: 1M-tri closest
trace within ~3x the 100k cost (measured r3: 2.3x).

Prints one JSON line per rung:
  {"metric": "closest_trace_ms", "tris": N, "value": ms, "rays_per_sec": ...}

Run (TPU): python benchmarks/scene_scaling.py
Quick CPU check: RTRT_SCALE_SMALL=1 JAX_PLATFORMS=cpu python benchmarks/scene_scaling.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/tmp/rtrt_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main() -> None:
    small = os.environ.get("RTRT_SCALE_SMALL") == "1"
    rungs = [2_000, 5_000] if small else [100_000, 500_000, 1_000_000]
    width, height = (320, 180) if small else (1920, 1080)
    iters = 2 if small else 6

    from realtimeraytracer_tpu import scenes
    from realtimeraytracer_tpu.config import RenderConfig
    from realtimeraytracer_tpu.ops.camera_rays import generate_ray_blocks
    from realtimeraytracer_tpu.render import hier_backend as hb

    cfg = RenderConfig(width=width, height=height, primary_rays=1)
    base_ms = None
    for n in rungs:
        scene = scenes.procedural_mesh(n)
        gpu = scene.compile(bvh_leaf_size=cfg.bvh_leaf_size)
        frame = scene.camera.viewport_frame(width, height)

        @jax.jit
        def tr(g, fr, s):
            rays = generate_ray_blocks(
                fr, width, height, sample_index=s, jitter=True,
                t_min=cfg.t_min, t_max=cfg.t_max)
            outf, outi = hb.trace_blocks_hier(g, cfg, rays, "closest")
            return outf[:, 0, :], outi[:, 1, :]

        samples = [jnp.uint32(i) for i in range(iters + 2)]
        jax.block_until_ready(samples)
        out = tr(gpu, frame, samples[0])
        jax.block_until_ready(out)
        # Throwaway batch + MATERIALIZED timing: through the axon tunnel,
        # un-materialized pipelined timings intermittently under-report
        # by ~1000x (PERF.md); forcing a host read of the last output
        # keeps the measurement honest.
        float(tr(gpu, frame, samples[1])[0].sum())
        t0 = time.perf_counter()
        outs = [tr(gpu, frame, samples[i + 2]) for i in range(iters)]
        jax.block_until_ready(outs)
        checksum = float(outs[-1][0].sum())
        ms = (time.perf_counter() - t0) / iters * 1e3
        del checksum
        base_ms = base_ms or ms
        print(json.dumps({
            "metric": "closest_trace_ms",
            "tris": n,
            "value": round(ms, 2),
            "rays_per_sec": round(width * height / ms * 1e3),
            "vs_smallest_rung": round(ms / base_ms, 3),
            "resident": bool(gpu.pallas_panels.shape[0] <= 1024),
        }))


if __name__ == "__main__":
    main()
