"""In-process ablation sweep of the pallas traversal kernel knobs.

Reloads render.pallas_backend per config (knobs are import-time constants)
so one TPU session amortizes the tunnel bring-up across every variant.

Usage: RTRT_DEBUG=1 python scripts/perf_ablate.py
"""

from __future__ import annotations

import importlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("RTRT_DEBUG", "1")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/tmp/rtrt_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from realtimeraytracer_tpu import scenes
from realtimeraytracer_tpu.config import RenderConfig
from realtimeraytracer_tpu.ops.camera_rays import generate_ray_blocks

W, H = 1920, 1080
N_RAYS = W * H
ITERS = int(os.environ.get("ABLATE_ITERS", "16"))


def load_pb(**knobs):
    for k in ("PB_BT", "PB_PACK", "PB_OPACK", "PB_ABLATE", "PB_MAX_VISITS",
              "PB_RESIDENT_CB", "PB_BUNDLES"):
        os.environ.pop(k, None)
    for k, v in knobs.items():
        os.environ[k] = str(v)
    from realtimeraytracer_tpu.render import pallas_backend as pb
    return importlib.reload(pb)


def timed(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(ITERS)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / ITERS


def main():
    import warnings
    warnings.filterwarnings("ignore")
    cfg = RenderConfig(width=W, height=H)
    scene = scenes.procedural_mesh(100_000, sun=True)
    gpu = scene.compile(bvh_leaf_size=cfg.bvh_leaf_size)
    frame = scene.camera.viewport_frame(W, H)
    rays0 = jax.jit(lambda fr: generate_ray_blocks(
        fr, W, H, sample_index=jnp.uint32(0), jitter=True,
        t_min=cfg.t_min, t_max=cfg.t_max))(frame)
    jax.block_until_ready(rays0)

    # Shadow rays built once with the default backend.
    pb0 = load_pb()

    @jax.jit
    def shadow_rays_fn(g, rays):
        """FORWARD shadow segments with per-ray light samples — the
        megakernel's real workload (surface -> sampled light point)."""
        from realtimeraytracer_tpu.ops import rng

        outf, _ = pb0.trace_blocks(g, cfg, rays, "closest")
        t = outf[:, 0, :]
        hit = t < 1e30
        ts = rays.shape[0]
        p = rays[:, 0:3, :] + t[:, None, :] * rays[:, 3:6, :]
        seed = (jax.lax.broadcasted_iota(jnp.uint32, (ts, 128), 0)
                * jnp.uint32(131)
                + jax.lax.broadcasted_iota(jnp.uint32, (ts, 128), 1))
        r1 = rng.uniform(seed)
        r2 = rng.uniform(seed + jnp.uint32(100))
        over = r1 + r2 > 1.0
        r1 = jnp.where(over, 1.0 - r1, r1)
        r2 = jnp.where(over, 1.0 - r2, r2)
        p0 = g.lt_v0[0]
        e1 = g.lt_v1[0] - p0
        e2 = g.lt_v2[0] - p0
        lpos = (p0[None, :, None] + r1[:, None, :] * e1[None, :, None]
                + r2[:, None, :] * e2[None, :, None])
        delta = lpos - p
        dist = jnp.sqrt(jnp.sum(delta * delta, axis=1, keepdims=True))
        sdir = delta / jnp.maximum(dist, 1e-9)
        span = dist[:, 0, :] - cfg.shadow_ray_margin
        good = hit & (span > 0)
        big = jnp.float32(3.0e38)
        return jnp.concatenate([
            p, sdir,
            jnp.where(good, cfg.t_min, big)[:, None, :],
            jnp.where(good, span, -big)[:, None, :]], axis=1)

    srays0 = shadow_rays_fn(gpu, rays0)
    jax.block_until_ready(srays0)

    def run(tag, pb, mode, rays, common=None):
        fn = jax.jit(lambda g, r: pb.trace_blocks(g, cfg, r, mode,
                                                  common=common))
        dt = timed(fn, gpu, rays)
        print(f"{tag:44s} {dt*1e3:9.2f} ms  {N_RAYS/dt/1e6:8.1f} Mrays/s",
              flush=True)
        return dt

    configs = [
        ("shadow OPACK=1", {"PB_OPACK": 1}, "occluded", srays0, None),
        ("shadow OPACK=2", {}, "occluded", srays0, None),
        ("shadow OPACK=4", {"PB_OPACK": 4}, "occluded", srays0, None),
        ("shadow OPACK=2 BT=16", {"PB_BT": 16}, "occluded", srays0, None),
    ]
    for tag, knobs, mode, rays, common in configs:
        pb = load_pb(**knobs)
        try:
            run(tag, pb, mode, rays, common)
        except Exception as e:  # keep the sweep alive
            print(f"{tag:44s} FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
