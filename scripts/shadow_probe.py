"""Forward vs reverse shadow-segment tracing with REAL per-ray light samples.

The megakernel traces shadow segments from the light end (reverse) on the
theory that light-side origins are tighter than surface points.  With real
per-ray samples the origins scatter over the whole light quad — this probe
measures both orientations' visit counts and time at 1080p/100k.
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
from realtimeraytracer_tpu.ops import rng
from realtimeraytracer_tpu.ops.camera_rays import generate_ray_blocks
from realtimeraytracer_tpu.render import pallas_backend as pb

W, H = 1920, 1080
ITERS = int(os.environ.get("PROBE_ITERS", "8"))
BIGF = jnp.float32(3.0e38)


def timed(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(ITERS)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / ITERS
    v = out[1][:, 0]
    print(f"{name:28s} {dt*1e3:9.1f} ms   visits mean={float(v.mean()):6.2f} "
          f"p99={float(jnp.percentile(v, 99)):4.0f} max={int(v.max())}",
          flush=True)


def main():
    cfg = RenderConfig(width=W, height=H)
    scene = scenes.procedural_mesh(100_000)
    gpu = scene.compile(bvh_leaf_size=cfg.bvh_leaf_size)
    frame = scene.camera.viewport_frame(W, H)

    rays0 = jax.jit(lambda fr: generate_ray_blocks(
        fr, W, H, sample_index=jnp.uint32(0), jitter=True,
        t_min=cfg.t_min, t_max=cfg.t_max))(frame)

    @jax.jit
    def segments(g, rays):
        """Megakernel-style shadow segments: hit point -> sampled light pos."""
        outf, _ = pb.trace_blocks(g, cfg, rays, "closest")
        t = outf[:, 0, :]
        hit = t < 1e30
        ts = rays.shape[0]
        p = rays[:, 0:3, :] + t[:, None, :] * rays[:, 3:6, :]   # (Ts, 3, 128)
        seed = jax.lax.broadcasted_iota(jnp.uint32, (ts, 128), 0) * 131 \
            + jax.lax.broadcasted_iota(jnp.uint32, (ts, 128), 1)
        r1 = rng.uniform(seed)
        r2 = rng.uniform(seed + jnp.uint32(100))
        over = r1 + r2 > 1.0
        r1 = jnp.where(over, 1.0 - r1, r1)
        r2 = jnp.where(over, 1.0 - r2, r2)
        p0 = gpu.lt_v0[0]
        e1 = (gpu.lt_v1[0] - p0)
        e2 = (gpu.lt_v2[0] - p0)
        lpos = (p0[None, :, None] + r1[:, None, :] * e1[None, :, None]
                + r2[:, None, :] * e2[None, :, None])            # (Ts, 3, 128)
        delta = lpos - p
        dist = jnp.sqrt(jnp.sum(delta * delta, axis=1, keepdims=True))
        sdir = delta / jnp.maximum(dist, 1e-9)
        span = dist[:, 0, :] - cfg.shadow_ray_margin
        good = hit & (span > 0)
        fwd = jnp.concatenate([
            p, sdir,
            jnp.where(good, 0.0, BIGF)[:, None, :],
            jnp.where(good, span, -BIGF)[:, None, :]], axis=1)
        rev = jnp.concatenate([
            lpos, -sdir,
            jnp.where(good, 0.0, BIGF)[:, None, :],
            jnp.where(good, span, -BIGF)[:, None, :]], axis=1)
        return fwd, rev

    fwd, rev = segments(gpu, rays0)
    jax.block_until_ready((fwd, rev))

    occl = jax.jit(lambda g, r: pb.trace_blocks(g, cfg, r, "occluded"))
    timed("occluded forward", occl, gpu, fwd)
    timed("occluded reverse", occl, gpu, rev)


if __name__ == "__main__":
    main()
