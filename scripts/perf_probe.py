"""On-chip perf probe for the pallas traversal kernel.

Measures, at 100k tris / 1080p (pipelined, one sync):
  * closest-hit trace (the bench.py headline)
  * occluded trace, camera-like rays (coherent cones)
  * occluded trace, surface->light shadow rays (the frame-time driver)
plus visit-count stats per mode for diagnosis.

Usage: python scripts/perf_probe.py [ntris] [iters]
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
from realtimeraytracer_tpu.render import pallas_backend as pb


def main():
    ntris = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    w, h = 1920, 1080
    cfg = RenderConfig(width=w, height=h)
    scene = scenes.procedural_mesh(ntris)
    gpu = scene.compile(bvh_leaf_size=cfg.bvh_leaf_size)
    frame = scene.camera.viewport_frame(w, h)
    light = jnp.asarray([0.0, 6.0, 0.0], jnp.float32)

    @jax.jit
    def rays_fn(fr, sample):
        return generate_ray_blocks(fr, w, h, sample_index=sample,
                                   jitter=True, t_min=cfg.t_min,
                                   t_max=cfg.t_max)

    @jax.jit
    def closest_fn(g, rays):
        outf, outi = pb.trace_blocks(g, cfg, rays, "closest",
                                     common=os.environ.get("PROBE_COMMON"))
        return outf[:, 0, :], outi[:, 0, :], outi[:, 1, :]

    @jax.jit
    def occl_cam_fn(g, rays):
        outf, outi = pb.trace_blocks(g, cfg, rays, "occluded",
                                     common=os.environ.get("PROBE_COMMON"))
        return outf[:, 0, :], outi[:, 1, :]

    @jax.jit
    def shadow_rays_fn(g, rays):
        """Surface->light shadow segments, traced from the light end."""
        outf, _ = pb.trace_blocks(g, cfg, rays, "closest")
        t = outf[:, 0, :]
        hit = t < 1e30
        ts = rays.shape[0]
        px = rays[:, 0:3, :] + t[:, None, :] * rays[:, 3:6, :]  # hit points
        delta = px - light[None, :, None]
        dist = jnp.sqrt(jnp.sum(delta * delta, axis=1, keepdims=True))
        sdir = delta / jnp.maximum(dist, 1e-9)
        span = dist[:, 0, :] - cfg.shadow_ray_margin
        good = hit & (span > 0)
        big = jnp.float32(3.0e38)
        srays = jnp.concatenate([
            jnp.broadcast_to(light[None, :, None], (ts, 3, 128)),
            sdir,
            jnp.where(good, 0.0, big)[:, None, :],
            jnp.where(good, span, -big)[:, None, :],
        ], axis=1)
        return srays

    @jax.jit
    def occl_shadow_fn(g, srays):
        outf, outi = pb.trace_blocks(g, cfg, srays, "occluded",
                                     common=os.environ.get("PROBE_COMMON"))
        return outf[:, 0, :], outi[:, 1, :]

    n_rays = w * h
    samples = [jnp.uint32(i) for i in range(iters)]
    rays0 = rays_fn(frame, samples[0])
    srays0 = shadow_rays_fn(gpu, rays0)

    def timed(name, fn, *args):
        out = fn(*args)           # compile
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(iters)]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:24s} {dt*1e3:9.2f} ms  {n_rays/dt/1e6:9.1f} Mrays/s")
        return out, dt

    phases = os.environ.get("PROBE_PHASES", "c,oc,os").split(",")

    if "c" in phases:
        (t, k, visits), dt_c = timed("closest", closest_fn, gpu, rays0)
        print(f"  visits: mean={float(visits[:, 0].mean()):.2f} "
              f"p50={float(jnp.percentile(visits[:, 0], 50)):.0f} "
              f"p99={float(jnp.percentile(visits[:, 0], 99)):.0f} "
              f"max={int(visits[:, 0].max())} "
              f"hit_frac={float((k >= 0).mean()):.3f}")

    if "oc" in phases:
        (occ, v2), dt_o = timed("occluded(camera)", occl_cam_fn, gpu, rays0)
        print(f"  visits: mean={float(v2[:, 0].mean()):.2f} "
              f"p99={float(jnp.percentile(v2[:, 0], 99)):.0f} "
              f"max={int(v2[:, 0].max())} occ_frac={float(occ.mean()):.3f}")

    if "os" in phases:
        (socc, v3), dt_s = timed("occluded(shadow)", occl_shadow_fn, gpu,
                                 srays0)
        print(f"  visits: mean={float(v3[:, 0].mean()):.2f} "
              f"p99={float(jnp.percentile(v3[:, 0], 99)):.0f} "
              f"max={int(v3[:, 0].max())} occ_frac={float(socc.mean()):.3f}")

    print(f"CB={pb.CB} PACK={pb.PACK} OPACK={pb.OPACK} BT={pb.BT} "
          f"blocks={gpu.pallas_panels.shape[0] if gpu.pallas_panels is not None else '?'}")


if __name__ == "__main__":
    main()
