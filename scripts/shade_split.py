"""Staged decomposition of shade_sample cost at 1080p/100k tris on TPU.

Each stage adds one piece of the megakernel; the deltas attribute the
~6 s of non-trace frame time.  Pipelined x ITERS, one sync.
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
from realtimeraytracer_tpu.ops.camera_rays import generate_rays, block_permutation
from realtimeraytracer_tpu.render.backends import make_backend
from realtimeraytracer_tpu.render.megakernel import shade_sample, render_components
from realtimeraytracer_tpu.render.surface import resolve_surface
from realtimeraytracer_tpu.ops.ltc import fetch_ltc_params, ltc_evaluate
from realtimeraytracer_tpu.ops.vecmath import cross, dot, normalize

W, H = 1920, 1080
ITERS = int(os.environ.get("SPLIT_ITERS", "4"))


def timed(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(ITERS)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:40s} {dt*1e3:9.1f} ms", flush=True)


def main():
    cfg = RenderConfig(width=W, height=H, primary_rays=1, shadow_rays=3)
    scene = scenes.procedural_mesh(100_000, sun=True)
    gpu = scene.compile(bvh_leaf_size=cfg.bvh_leaf_size)
    frame = scene.camera.viewport_frame(W, H)
    backend = make_backend(gpu, cfg)

    o, d = generate_rays(frame, W, H, sample_index=0, jitter=cfg.jitter)
    perm, inv = block_permutation(W, H)
    o, d = o[perm], d[perm]
    seed = jnp.arange(o.shape[0], dtype=jnp.uint32)
    jax.block_until_ready((o, d))

    @jax.jit
    def s1_closest(g, o, d):
        return make_backend(g, cfg).closest(o, d, cfg.t_min, cfg.t_max).t

    @jax.jit
    def s2_resolve(g, o, d):
        be = make_backend(g, cfg)
        hit = be.closest(o, d, cfg.t_min, cfg.t_max)
        surf = resolve_surface(g, hit, o, d)
        return surf.position, surf.albedo, surf.roughness

    @jax.jit
    def s3_ltc(g, o, d):
        be = make_backend(g, cfg)
        hit = be.closest(o, d, cfg.t_min, cfg.t_max)
        surf = resolve_surface(g, hit, o, d)
        p, n = surf.position, surf.normal
        view = normalize(o - p)
        ndotv = jnp.clip(dot(n, view), 0.0, 1.0)
        minv, t2 = fetch_ltc_params(g.ltc1, g.ltc2, surf.roughness, ndotv,
                                    fast=cfg.fast_lut)
        acc = jnp.zeros_like(p[..., 0])
        for i in range(g.lt_v0.shape[0]):
            p0, p1, p2 = g.lt_v0[i], g.lt_v1[i], g.lt_v2[i]
            nl = normalize(cross(p2 - p1, p0 - p1))
            two = jnp.broadcast_to(g.lt_two_sided[i], p[..., 0].shape)
            acc = acc + ltc_evaluate(n, view, p, None, p0, p1, p2, nl, two,
                                     g.ltc2, fast=cfg.fast_lut)
            acc = acc + ltc_evaluate(n, view, p, minv, p0, p1, p2, nl, two,
                                     g.ltc2, fast=cfg.fast_lut)
        return acc

    @jax.jit
    def s4_shade0(g, o, d, seed):
        c0 = cfg.replace(shadow_rays=0)
        be = make_backend(g, c0)
        out = shade_sample(g, c0, o, d, seed, be)
        return out.analytic

    @jax.jit
    def s5_shade1(g, o, d, seed):
        c1 = cfg.replace(shadow_rays=1)
        be = make_backend(g, c1)
        out = shade_sample(g, c1, o, d, seed, be)
        return out.shadowed

    @jax.jit
    def s6_shade3(g, o, d, seed):
        be = make_backend(g, cfg)
        out = shade_sample(g, cfg, o, d, seed, be)
        return out.shadowed

    timed("closest only", s1_closest, gpu, o, d)
    timed("+ resolve_surface", s2_resolve, gpu, o, d)
    timed("+ LTC (2 tris x2, no shadows)", s3_ltc, gpu, o, d)
    timed("shade_sample shadow_rays=0", s4_shade0, gpu, o, d, seed)
    timed("shade_sample shadow_rays=1", s5_shade1, gpu, o, d, seed)
    timed("shade_sample shadow_rays=3", s6_shade3, gpu, o, d, seed)


if __name__ == "__main__":
    main()
