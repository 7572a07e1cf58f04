"""Isolate where the in-megakernel shadow-sample cost goes.

One 'shadow sample' = lpos sampling math + reversed occluded trace + BRDF
accumulation.  Stages measure each piece composed the way shade_sample
composes them, at 1080p/100k tris.
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
from realtimeraytracer_tpu.ops.shading import (
    base_color_split, cook_torrance_specular, lambert_diffuse)
from realtimeraytracer_tpu.ops.vecmath import dot, normalize
from realtimeraytracer_tpu.render.backends import make_backend
from realtimeraytracer_tpu.render.surface import resolve_surface

W, H = 1920, 1080
ITERS = int(os.environ.get("PROBE_ITERS", "4"))


def timed(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(ITERS)]
    jax.block_until_ready(outs)
    print(f"{name:44s} {(time.perf_counter()-t0)/ITERS*1e3:9.1f} ms", flush=True)


def main():
    cfg = RenderConfig(width=W, height=H, primary_rays=1, shadow_rays=1)
    scene = scenes.procedural_mesh(100_000, sun=True)
    gpu = scene.compile(bvh_leaf_size=cfg.bvh_leaf_size)
    frame = scene.camera.viewport_frame(W, H)
    o, d = generate_rays(frame, W, H, sample_index=0, jitter=True)
    perm, _ = block_permutation(W, H)
    o, d = o[perm], d[perm]
    seed = jnp.arange(o.shape[0], dtype=jnp.uint32)
    jax.block_until_ready((o, d))

    def sample_setup(g, o, d, seed, with_occ, with_brdf, li=0):
        be = make_backend(g, cfg)
        hit = be.closest(o, d, cfg.t_min, cfg.t_max)
        surf = resolve_surface(g, hit, o, d)
        p, n = surf.position, surf.normal
        view = normalize(o - p)
        shadow_origin = p + n * cfg.shadow_origin_offset
        p0, p1, p2 = g.lt_v0[li], g.lt_v1[li], g.lt_v2[li]
        r1 = rng.uniform(seed)
        r2 = rng.uniform(seed + jnp.uint32(100))
        over = r1 + r2 > 1.0
        r1 = jnp.where(over, 1.0 - r1, r1)
        r2 = jnp.where(over, 1.0 - r2, r2)
        lpos = (p0[None, :] + r1[:, None] * (p1 - p0)[None, :]
                + r2[:, None] * (p2 - p0)[None, :])
        delta = lpos - p
        dist = jnp.sqrt(jnp.maximum(jnp.sum(delta * delta, -1), 1e-20))
        sdir = delta / dist[..., None]
        span = dist - cfg.shadow_ray_margin
        if with_occ:
            occ = be.occluded(shadow_origin + span[..., None] * sdir, -sdir,
                              0.0, span - cfg.t_min)
        else:
            occ = dist > 1e30
        lit = jnp.where(occ, 0.0, 1.0)[:, None]
        if not with_brdf:
            return lit
        m_d, m_s = base_color_split(surf.albedo, surf.metallic)
        lam = lambert_diffuse(surf.albedo, surf.metallic)
        ndotl = jnp.maximum(jnp.sum(n * sdir, -1), 0.1)
        spec = cook_torrance_specular(view, sdir, n, surf.roughness, m_s)
        brdf = spec + lam
        atten = 1.0 / jnp.maximum(dist * dist, 1e-20)
        return lit * brdf * (ndotl * atten)[:, None]

    f_math = jax.jit(lambda g, o, d, s: sample_setup(g, o, d, s, False, True))
    f_occ = jax.jit(lambda g, o, d, s: sample_setup(g, o, d, s, True, False))
    f_full = jax.jit(lambda g, o, d, s: sample_setup(g, o, d, s, True, True))
    f_2s = jax.jit(lambda g, o, d, s: (
        sample_setup(g, o, d, s, True, True)
        + sample_setup(g, o, d, s + jnp.uint32(1), True, True)))

    timed("closest+resolve+math only (occ=F)", f_math, gpu, o, d, seed)
    timed("closest+resolve+occ trace (no brdf)", f_occ, gpu, o, d, seed)
    timed("one full shadow sample", f_full, gpu, o, d, seed)
    timed("two full shadow samples", f_2s, gpu, o, d, seed)


if __name__ == "__main__":
    main()
