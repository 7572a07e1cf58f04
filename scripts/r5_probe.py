"""Round-5 probes: headline-bench decomposition + v9 knob sweeps.

Usage: python scripts/r5_probe.py <probe> [args]
  bench_split   — raygen-only vs raygen+trace (the 49 ms headline split)
  v9pack        — v9 pack (pops/iter) sweep on primaries
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
from realtimeraytracer_tpu.ops.camera_rays import generate_ray_blocks
from realtimeraytracer_tpu.render import quarter_backend as qb

W, H = 1920, 1080
NTRIS = int(os.environ.get("PROBE_TRIS", "100000"))
ITERS = int(os.environ.get("PROBE_ITERS", "16"))


def timed(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(ITERS)]
    leaf = jax.tree_util.tree_leaves(outs[-1])[0]
    _ = float(jnp.minimum(leaf.astype(jnp.float32), 1e6).sum())
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / ITERS * 1e3


def setup():
    cfg = RenderConfig(width=W, height=H)
    scene = scenes.procedural_mesh(NTRIS)
    gpu = scene.compile(bvh_leaf_size=cfg.bvh_leaf_size)
    frame = scene.camera.viewport_frame(W, H)
    return cfg, gpu, frame


def bench_split():
    cfg, gpu, frame = setup()

    @jax.jit
    def raygen(fr, sample):
        return generate_ray_blocks(fr, W, H, sample_index=sample,
                                   jitter=True, t_min=cfg.t_min,
                                   t_max=cfg.t_max)

    @jax.jit
    def full(g, fr, sample):
        rays = generate_ray_blocks(fr, W, H, sample_index=sample,
                                   jitter=True, t_min=cfg.t_min,
                                   t_max=cfg.t_max)
        outf, outi = qb.trace_blocks_quarter(g, cfg, rays, common="origin")
        return outf[:, 0, :], outi[:, 0, :]

    rays = raygen(frame, jnp.uint32(0))

    @jax.jit
    def trace_only(g, r):
        outf, outi = qb.trace_blocks_quarter(g, cfg, r, common="origin")
        return outf[:, 0, :], outi[:, 0, :]

    @jax.jit
    def cull_only(g, r):
        from realtimeraytracer_tpu.render.pallas_backend import (
            BUNDLES, cull_quarter_keys)
        keys, _ = cull_quarter_keys(r, g.q_cl_min, g.q_cl_max,
                                    bundles=BUNDLES)
        return keys

    t_gen = timed(raygen, frame, jnp.uint32(1))
    t_full = timed(full, gpu, frame, jnp.uint32(1))
    t_trace = timed(trace_only, gpu, rays)
    t_cull = timed(cull_only, gpu, rays)
    print(f"raygen only       {t_gen:7.2f} ms")
    print(f"cull only         {t_cull:7.2f} ms")
    print(f"trace only        {t_trace:7.2f} ms (incl cull)")
    print(f"raygen+trace      {t_full:7.2f} ms  (bench headline path)")


def v9pack():
    cfg, gpu, frame = setup()
    rays = jax.jit(lambda fr: generate_ray_blocks(
        fr, W, H, sample_index=1, jitter=True, t_min=cfg.t_min,
        t_max=cfg.t_max))(frame)
    base = None
    for pack in (1, 2, 3):
        @jax.jit
        def tr(g, r, pack=pack):
            outf, outi = qb.trace_blocks_quarter(g, cfg, r, common="origin",
                                                 pack=pack)
            return outf[:, 0, :], outi[:, 0, :], outi[:, 1, :]
        t = timed(tr, gpu, rays)
        out = tr(gpu, rays)
        vis = float(jnp.mean(out[2][:, :].astype(jnp.float32)))
        if base is None:
            base = out[0]
        same = bool(jnp.all(out[0] == base))
        print(f"pack={pack}  {t:7.2f} ms  visits*{4}={vis:6.1f}  "
              f"t-identical={same}")


if __name__ == "__main__":
    globals()[sys.argv[1]]()
