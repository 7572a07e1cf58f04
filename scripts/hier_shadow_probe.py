"""v7 vs v8 occlusion cost on REAL megakernel shadow segments.

The decisive round-3 measurement: v8's per-ray in-kernel hierarchy
(render/hier_backend.py) vs v7's per-tile hull cull on light-0 shadow
rays at 1080p/100k — as-is (block pixel order) and octant+Morton sorted.
PERF.md r2: v7 sorted = ~83-115 ms; the shaft-union residual was the
named ceiling.  Also times the closest primary trace for both.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

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
from realtimeraytracer_tpu.render import pallas_backend as pb

W, H = 1920, 1080
N = int(os.environ.get("PROBE_TRIS", "100000"))
ITERS = int(os.environ.get("PROBE_ITERS", "6"))


def timed(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(ITERS)]
    jax.block_until_ready(outs)
    print(f"{name:40s} {(time.perf_counter()-t0)/ITERS*1e3:9.1f} ms",
          flush=True)
    return out


def main():
    cfg = RenderConfig(width=W, height=H)
    scene = scenes.procedural_mesh(N)
    gpu = scene.compile(bvh_leaf_size=cfg.bvh_leaf_size)
    frame = scene.camera.viewport_frame(W, H)
    be = make_backend(gpu, cfg)
    perm, _ = block_permutation(W, H)

    @jax.jit
    def build_segments(g, fr):
        o, d = generate_rays(fr, W, H, sample_index=0, jitter=True)
        o, d = o[perm], d[perm]
        hit = be.closest(o, d, cfg.t_min, cfg.t_max, common="origin")
        surf = resolve_surface(g, hit, o, d)
        p, n = surf.position, surf.normal
        so = p + n * cfg.shadow_origin_offset
        R = o.shape[0]
        seed = jnp.arange(R, dtype=jnp.uint32) * jnp.uint32(733)
        r1 = rng.uniform(seed)
        r2 = rng.uniform(seed + jnp.uint32(100))
        over = r1 + r2 > 1.0
        r1 = jnp.where(over, 1.0 - r1, r1)
        r2 = jnp.where(over, 1.0 - r2, r2)
        p0, p1, p2 = g.lt_v0[0], g.lt_v1[0], g.lt_v2[0]
        lpos = (p0[None, :] + r1[:, None] * (p1 - p0)[None, :]
                + r2[:, None] * (p2 - p0)[None, :])
        delta = lpos - so
        dist = jnp.sqrt(jnp.maximum(jnp.sum(delta * delta, -1), 1e-20))
        sdir = delta / dist[:, None]
        span = dist - cfg.shadow_ray_margin
        t_lo = jnp.where(surf.valid, cfg.t_min, BIG_T)
        t_hi = jnp.where(surf.valid, span, -BIG_T)
        return o, d, so, sdir, t_lo, t_hi, surf.valid

    o, d, so, sdir, t_lo, t_hi, valid = build_segments(gpu, frame)
    print(f"tris={N} live fraction: {float(valid.mean()):.3f}")

    occ7 = jax.jit(lambda g, o_, d_, lo, hi: pb.pallas_occluded(
        g, cfg, o_, d_, lo, hi))
    occ8 = jax.jit(lambda g, o_, d_, lo, hi: hb.hier_occluded(
        g, cfg, o_, d_, lo, hi))
    a = timed("v7 occluded as-is", occ7, gpu, so, sdir, t_lo, t_hi)
    b = timed("v8 occluded as-is", occ8, gpu, so, sdir, t_lo, t_hi)
    print("  occ equal:", bool(jnp.all(a == b)))

    # Octant+Morton sorted order (what megakernel.sort_shadows produces).
    from realtimeraytracer_tpu.render.wavefront import _coherence_key

    key = _coherence_key(so, sdir, valid)
    order = jnp.argsort(key)
    sargs = (gpu, so[order], sdir[order], t_lo[order], t_hi[order])
    a = timed("v7 occluded sorted", occ7, *sargs)
    b = timed("v8 occluded sorted", occ8, *sargs)
    print("  occ equal:", bool(jnp.all(a == b)))

    cl7 = jax.jit(lambda g, o_, d_: pb.pallas_closest(
        g, cfg, o_, d_, cfg.t_min, cfg.t_max, common="origin").t)
    cl8 = jax.jit(lambda g, o_, d_: hb.hier_closest(
        g, cfg, o_, d_, cfg.t_min, cfg.t_max, common="origin").t)
    a = timed("v7 closest primaries", cl7, gpu, o, d)
    b = timed("v8 closest primaries", cl8, gpu, o, d)
    print("  t equal:", bool(jnp.all(a == b)))

    # Incoherent bounce-like rays: sorted secondary directions.
    r = np.random.default_rng(0)
    bd = r.normal(size=(o.shape[0], 3)).astype(np.float32)
    bd /= np.linalg.norm(bd, axis=1, keepdims=True)
    bd = jnp.asarray(bd)
    key = _coherence_key(so, bd, valid)
    order = jnp.argsort(key)
    bargs = (gpu, so[order], bd[order])
    cl7b = jax.jit(lambda g, o_, d_: pb.pallas_closest(
        g, cfg, o_, d_, cfg.t_min, cfg.t_max).t)
    cl8b = jax.jit(lambda g, o_, d_: hb.hier_closest(
        g, cfg, o_, d_, cfg.t_min, cfg.t_max).t)
    a = timed("v7 closest bounce-like sorted", cl7b, *bargs)
    b = timed("v8 closest bounce-like sorted", cl8b, *bargs)
    print("  t equal:", bool(jnp.all(a == b)))


if __name__ == "__main__":
    main()
