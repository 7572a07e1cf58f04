"""Does batching the frame's occlusion traces into ONE kernel call pay?

The megakernel issues (num_lights x shadow_rays) + 1 sun = 7 separate
occluded() launches per frame (~91 ms each at 1080p/100k on v8).  Each
launch has fixed costs: XLA dispatch, (R,3)->(Ts,8,128) pack, pallas grid
spin-up, and a tail of partially-empty tiles.  Concatenating all S
segments into one (S*R)-ray trace runs the identical per-tile work (rays
stay grouped by segment, so tile composition is unchanged) while paying
the fixed costs once.

Usage: python scripts/batch_occl_probe.py
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
from realtimeraytracer_tpu.ops.camera_rays import generate_rays, block_permutation
from realtimeraytracer_tpu.ops.intersect import BIG_T
from realtimeraytracer_tpu.render.backends import make_backend
from realtimeraytracer_tpu.render.surface import resolve_surface
from realtimeraytracer_tpu.render import hier_backend as hb

W, H = 1920, 1080
N = int(os.environ.get("PROBE_TRIS", "100000"))
ITERS = int(os.environ.get("PROBE_ITERS", "6"))
S = int(os.environ.get("PROBE_SEGS", "6"))   # 2 light tris x 3 samples


def timed(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(ITERS)]
    jax.block_until_ready(outs)
    # Force a host read: unmaterialized pipelined timings through the
    # axon tunnel intermittently under-report by ~1000x (PERF.md).
    _ = float(jnp.asarray(outs[-1][0] if isinstance(outs[-1], tuple)
                          else outs[-1]).sum())
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:44s} {dt*1e3:9.1f} ms", flush=True)
    return out


def main():
    cfg = RenderConfig(width=W, height=H)
    scene = scenes.procedural_mesh(N)
    gpu = scene.compile(bvh_leaf_size=cfg.bvh_leaf_size)
    frame = scene.camera.viewport_frame(W, H)
    be = make_backend(gpu, cfg)
    perm, _ = block_permutation(W, H)

    @jax.jit
    def build(g, fr):
        o, d = generate_rays(fr, W, H, sample_index=0, jitter=True)
        o, d = o[perm], d[perm]
        hit = be.closest(o, d, cfg.t_min, cfg.t_max, common="origin")
        surf = resolve_surface(g, hit, o, d)
        so = surf.position + surf.normal * cfg.shadow_origin_offset
        R = o.shape[0]
        outs = []
        for s in range(S):
            seed = (jnp.arange(R, dtype=jnp.uint32) * jnp.uint32(733)
                    + jnp.uint32(s * 7919))
            r1 = rng.uniform(seed)
            r2 = rng.uniform(seed + jnp.uint32(100))
            over = r1 + r2 > 1.0
            r1 = jnp.where(over, 1.0 - r1, r1)
            r2 = jnp.where(over, 1.0 - r2, r2)
            li = s % g.lt_v0.shape[0]
            p0, p1, p2 = g.lt_v0[li], g.lt_v1[li], g.lt_v2[li]
            lpos = (p0[None, :] + r1[:, None] * (p1 - p0)[None, :]
                    + r2[:, None] * (p2 - p0)[None, :])
            delta = lpos - so
            dist = jnp.sqrt(jnp.maximum(jnp.sum(delta * delta, -1), 1e-20))
            sdir = delta / dist[:, None]
            span = dist - cfg.shadow_ray_margin
            t_lo = jnp.where(surf.valid, cfg.t_min, BIG_T)
            t_hi = jnp.where(surf.valid, span, -BIG_T)
            outs.append((so, sdir, t_lo, t_hi))
        return outs

    segs = build(gpu, frame)
    segs = jax.tree.map(lambda x: jax.block_until_ready(x), segs)

    occ1 = jax.jit(lambda g, o_, d_, lo, hi: hb.hier_occluded(
        g, cfg, o_, d_, lo, hi))

    def separate(g, segs_):
        return [occ1(g, *sg) for sg in segs_]

    timed(f"{S} separate v8 occluded traces", separate, gpu, segs)

    @jax.jit
    def batched(g, o_, d_, lo, hi):
        return hb.hier_occluded(g, cfg, o_, d_, lo, hi)

    cat = [jnp.concatenate([sg[k] for sg in segs]) for k in range(4)]
    timed(f"1 batched v8 occluded trace ({S}x rays)", batched, gpu, *cat)

    a = jnp.concatenate(separate(gpu, segs))
    b = batched(gpu, *cat)
    print("  equal:", bool(jnp.all(a == b)))


if __name__ == "__main__":
    main()
