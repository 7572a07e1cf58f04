"""Full-frame and config-4 (multi-bounce wavefront) benchmarks on TPU.

Measures, at 1080p / 100k tris (pipelined, one sync):
  * the full ratio-estimator pipeline frame (trace + LTC + 3x shadow
    samples + sun + denoise x4 + combine) — the reference's whole loop;
  * the BASELINE config-4 wavefront: 4 spp, multi-bounce path tracing.

Usage: python benchmarks/frame.py [out.json]
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
from realtimeraytracer_tpu.render.pipeline import render_pipeline_gpu
from realtimeraytracer_tpu.render.wavefront import render_wavefront

W, H = 1920, 1080
ITERS = int(os.environ.get("FRAME_ITERS", "4"))


def timed(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    # Throwaway batch + MATERIALIZED timing (PERF.md measurement rule):
    # un-materialized pipelined timings through the axon tunnel
    # intermittently under-report ~1000x; the first pipelined batch after
    # compile also reads ~20% high — discard it.
    float(jnp.sum(jax.tree_util.tree_leaves(fn(*args))[0]))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(ITERS)]
    _ = float(jnp.sum(jax.tree_util.tree_leaves(outs[-1])[0]))
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / ITERS


def main():
    scene = scenes.procedural_mesh(100_000, sun=True)
    gpu = scene.compile()
    frame = scene.camera.viewport_frame(W, H)

    # THE reference-default frame (raygen.rgen:8-9 NUM_SAMPLES=4 +
    # 3 stochastic shadow samples per light tri): the parity headline.
    cfg_ref = RenderConfig(width=W, height=H, primary_rays=4, shadow_rays=3)
    full_ref = timed(jax.jit(lambda g, f: render_pipeline_gpu(g, f, cfg_ref,
                                                              0)),
                     gpu, frame)
    print(f"pipeline REF sampling (4 primary x 3 shadow): "
          f"{full_ref*1e3:.0f} ms ({1.0/full_ref:.2f} fps)", flush=True)

    # Interactive frame: 1 spp, 3 shadow samples/tri.
    cfg1 = RenderConfig(width=W, height=H, primary_rays=1, shadow_rays=3)
    full1 = timed(jax.jit(lambda g, f: render_pipeline_gpu(g, f, cfg1, 0)),
                  gpu, frame)
    print(f"pipeline 1spp: {full1*1e3:.0f} ms ({1.0/full1:.2f} fps)",
          flush=True)

    # Near-parity fast preset (SSIM -0.002 vs sr=3, PERF.md): sr=2.
    cfg2 = RenderConfig(width=W, height=H, primary_rays=1, shadow_rays=2)
    full2 = timed(jax.jit(lambda g, f: render_pipeline_gpu(g, f, cfg2, 0)),
                  gpu, frame)
    print(f"pipeline 1spp sr=2: {full2*1e3:.0f} ms", flush=True)

    # Config 4: multi-bounce wavefront, 4 spp.
    cfg4 = RenderConfig(width=W, height=H, primary_rays=4, shadow_rays=1,
                        max_bounces=2, denoise_iterations=0)
    wf = timed(jax.jit(lambda g, f: render_wavefront(g, f, cfg4, 0)),
               gpu, frame)
    # rays/frame: 4 spp x (3 closest bounces + 2x(NEE + sun) shadow).
    rays = W * H * cfg4.primary_rays * (cfg4.max_bounces + 1 + 2 * 2)
    print(f"wavefront 4spp x {cfg4.max_bounces} bounces: {wf*1e3:.0f} ms "
          f"(~{rays/wf/1e6:.0f} Mrays/s incl. shadows)", flush=True)

    out = {
        "pipeline_ref_sampling_4x3_ms": full_ref * 1e3,
        "pipeline_1spp_ms": full1 * 1e3,
        "pipeline_1spp_sr2_fast_ms": full2 * 1e3,
        "wavefront_4spp_2bounce_ms": wf * 1e3,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out))
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
