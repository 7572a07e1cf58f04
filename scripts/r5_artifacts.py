"""SCENESCALE_r05 generator: scene-size rungs + BOTH flagships.

Rungs (100k/500k/1M procedural): full-pipeline frame + closest trace.
Flagships: textured_obj (1.4k tris, r4's) and foliage_field (~120k
EFFECTIVE tris, r5's reference-shaped instanced scene), alpha on/off.

All timings follow PERF.md discipline: throwaway batch, materialized
checksum, steady state.  Writes SCENESCALE_r05.json.

Usage: python scripts/r5_artifacts.py [--skip-flagship]
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

from realtimeraytracer_tpu import scenes
from realtimeraytracer_tpu.config import RenderConfig
from realtimeraytracer_tpu.ops.camera_rays import generate_ray_blocks
from realtimeraytracer_tpu.render import hier_backend as hb
from realtimeraytracer_tpu.render.pipeline import render_pipeline_gpu

W, H = 1920, 1080


def timed(fn, *args, iters=3):
    out = fn(*args)
    jax.block_until_ready(out)
    float(jnp.sum(jax.tree_util.tree_leaves(fn(*args))[0]))   # throwaway
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    _ = float(jnp.sum(jax.tree_util.tree_leaves(outs[-1])[0]))
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    out = {"metric": "scene_size_scaling_r5", "rungs": []}
    for n in (100_000, 500_000, 1_000_000):
        scene = scenes.procedural_mesh(n)
        gpu = scene.compile()
        frame = scene.camera.viewport_frame(W, H)
        cfg = RenderConfig(width=W, height=H)

        pipe = timed(jax.jit(
            lambda g, f, i: render_pipeline_gpu(g, f, cfg, i)),
            gpu, frame, jnp.uint32(1))

        @jax.jit
        def tr(g, f, s):
            rays = generate_ray_blocks(f, W, H, sample_index=s, jitter=True,
                                       t_min=cfg.t_min, t_max=cfg.t_max)
            outf, outi = hb.trace_blocks_hier(g, cfg, rays, "closest")
            return outf[:, 0, :]
        closest = timed(tr, gpu, frame, jnp.uint32(1))
        out["rungs"].append({
            "tris": n, "pipeline_ms": round(pipe, 2),
            "closest_trace_ms": round(closest, 2),
            "rays_per_sec": round(W * H / pipe * 1e3),
        })
        print(out["rungs"][-1], flush=True)

    if "--skip-flagship" not in sys.argv:
        s = scenes.textured_obj()
        gpu = s.compile()
        frame = s.camera.viewport_frame(W, H)
        cfg_on = RenderConfig(width=W, height=H, alpha_test=True)
        cfg_off = RenderConfig(width=W, height=H, alpha_test=False)
        out["flagship_textured_1080p_ms"] = round(timed(jax.jit(
            lambda g, f, i: render_pipeline_gpu(g, f, cfg_on, i)),
            gpu, frame, jnp.uint32(1)), 1)
        out["flagship_alpha_off_ms"] = round(timed(jax.jit(
            lambda g, f, i: render_pipeline_gpu(g, f, cfg_off, i)),
            gpu, frame, jnp.uint32(1)), 1)
        out["flagship_tris"] = 1446
        print("textured flagship:", out["flagship_textured_1080p_ms"],
              "/", out["flagship_alpha_off_ms"], flush=True)

    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "SCENESCALE_r05.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
