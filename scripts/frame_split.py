"""Full-pipeline frame timing split on TPU + cull candidate stats.

Times each stage of the real 1080p frame (procedural 100k-tri scene, 1
primary ray, 3 shadow samples x 1 light tri + sun) the way the pipeline
composes them, pipelined over ITERS frames with one sync.

Usage: python scripts/frame_split.py
"""

from __future__ import annotations

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
from realtimeraytracer_tpu.render.pipeline import render_pipeline
from realtimeraytracer_tpu.render.megakernel import render_components
from realtimeraytracer_tpu.render.backends import make_backend
from realtimeraytracer_tpu.ops.camera_rays import generate_ray_blocks
from realtimeraytracer_tpu.render import pallas_backend as pb

W, H = 1920, 1080
ITERS = int(os.environ.get("SPLIT_ITERS", "4"))


def timed(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(ITERS)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:32s} {dt*1e3:9.1f} ms", flush=True)
    return out


def main():
    cfg = RenderConfig(width=W, height=H, primary_rays=1, shadow_rays=3)
    scene = scenes.procedural_mesh(100_000, sun=True)
    gpu = scene.compile(bvh_leaf_size=cfg.bvh_leaf_size)
    frame = scene.camera.viewport_frame(W, H)

    # --- candidate-count stats from the cull ------------------------------
    rays0 = jax.jit(lambda fr: generate_ray_blocks(
        fr, W, H, sample_index=jnp.uint32(0), jitter=True,
        t_min=cfg.t_min, t_max=cfg.t_max))(frame)

    @jax.jit
    def cand_stats(g, rays):
        coeff = g.pallas_panels
        keys, _ = pb.cull_keys(rays, g.pallas_cl_min, g.pallas_cl_max)
        n = jnp.sum((keys != pb.INVALID).astype(jnp.int32), axis=(1, 2, 3))
        return n

    n = cand_stats(gpu, rays0)
    print(f"primary candidates/tile: mean={float(n.mean()):.2f} "
          f"p50={float(jnp.percentile(n, 50)):.0f} "
          f"p90={float(jnp.percentile(n, 90)):.0f} "
          f"p99={float(jnp.percentile(n, 99)):.0f} max={int(n.max())}",
          flush=True)

    # --- frame split -------------------------------------------------------
    fi = jnp.uint32(0)

    from realtimeraytracer_tpu.render.pipeline import render_pipeline_gpu

    full = jax.jit(lambda g, fr: render_pipeline_gpu(g, fr, cfg, 0))
    timed("full pipeline", full, gpu, frame)

    comp = jax.jit(lambda g, fr: render_components(
        gpu=g, frame=fr, cfg=cfg, frame_index=0,
        backend=None))
    timed("render_components (no denoise)", comp, gpu, frame)

    cfg0 = cfg.replace(shadow_rays=0)
    comp0 = jax.jit(lambda g, fr: render_components(
        gpu=g, frame=fr, cfg=cfg0, frame_index=0, backend=None))
    try:
        timed("components shadow_rays=0", comp0, gpu, frame)
    except Exception as e:
        print("shadow_rays=0 failed:", e, flush=True)


if __name__ == "__main__":
    main()
