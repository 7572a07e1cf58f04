"""Attribute the ~850 ms gap between a composed and a standalone occluded
trace: is it the (R,3)->(Ts,8,128) pack, or XLA fusion pathology?

Variants (all jitted, all starting from the closest trace + surface math):
  A  ray math only, reduce to scalar                 (baseline ~136 ms)
  B  A + _pack_rays to blocks, reduce                (pack cost)
  C  A + pack + cull_keys, reduce                    (cull cost)
  D  full occluded via backend (composed)            (~1119 ms known)
  E  block-native: shadow rays built FROM the closest trace's block
     outputs, no (R,3) round trip, occluded on them  (the fix candidate)
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
from realtimeraytracer_tpu.ops.camera_rays import generate_rays, generate_ray_blocks, block_permutation
from realtimeraytracer_tpu.render.backends import make_backend
from realtimeraytracer_tpu.render.surface import resolve_surface
from realtimeraytracer_tpu.render import pallas_backend as pb

W, H = 1920, 1080
ITERS = int(os.environ.get("PROBE_ITERS", "4"))
BIGF = jnp.float32(3.0e38)


def timed(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(ITERS)]
    jax.block_until_ready(outs)
    print(f"{name:46s} {(time.perf_counter()-t0)/ITERS*1e3:9.1f} ms",
          flush=True)


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

    def shadow_inputs(g, o, d, seed):
        be = make_backend(g, cfg)
        hit = be.closest(o, d, cfg.t_min, cfg.t_max)
        surf = resolve_surface(g, hit, o, d)
        p, n = surf.position, surf.normal
        shadow_origin = p + n * cfg.shadow_origin_offset
        p0, p1, p2 = g.lt_v0[0], g.lt_v1[0], g.lt_v2[0]
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
        so = shadow_origin + span[..., None] * sdir
        return so, -sdir, span - cfg.t_min

    @jax.jit
    def va(g, o, d, seed):
        so, sd, tmax = shadow_inputs(g, o, d, seed)
        return jnp.sum(so) + jnp.sum(sd) + jnp.sum(tmax)

    @jax.jit
    def vb(g, o, d, seed):
        so, sd, tmax = shadow_inputs(g, o, d, seed)
        blk, _, _ = pb._pack_rays(so, sd, jnp.zeros_like(tmax), tmax)
        return jnp.sum(blk)

    @jax.jit
    def vc(g, o, d, seed):
        so, sd, tmax = shadow_inputs(g, o, d, seed)
        blk, _, _ = pb._pack_rays(so, sd, jnp.zeros_like(tmax), tmax)
        keys, _ = pb.cull_keys(blk, g.pallas_cl_min, g.pallas_cl_max)
        return jnp.sum(blk) + jnp.sum(keys)

    @jax.jit
    def vd(g, o, d, seed):
        so, sd, tmax = shadow_inputs(g, o, d, seed)
        be = make_backend(g, cfg)
        occ = be.occluded(so, sd, 0.0, tmax)
        return jnp.sum(occ.astype(jnp.float32))

    @jax.jit
    def ve(g, fr, seed2d):
        rays = generate_ray_blocks(fr, W, H, sample_index=jnp.uint32(0),
                                   jitter=True, t_min=cfg.t_min,
                                   t_max=cfg.t_max)
        outf, _ = pb.trace_blocks(g, cfg, rays, "closest")
        t = outf[:, 0, :]
        hitm = t < 1e30
        ts = rays.shape[0]
        p = rays[:, 0:3, :] + t[:, None, :] * rays[:, 3:6, :]
        r1 = rng.uniform(seed2d)
        r2 = rng.uniform(seed2d + jnp.uint32(100))
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
        good = hitm & (span > 0)
        srays = jnp.concatenate([
            lpos, -sdir,
            jnp.where(good, 0.0, BIGF)[:, None, :],
            jnp.where(good, span, -BIGF)[:, None, :]], axis=1)
        o2, _ = pb.trace_blocks(g, cfg, srays, "occluded")
        return jnp.sum(o2[:, 0, :])

    ts = (W * H) // 128
    seed2d = (jax.lax.broadcasted_iota(jnp.uint32, (ts, 128), 0)
              * jnp.uint32(131)
              + jax.lax.broadcasted_iota(jnp.uint32, (ts, 128), 1))

    timed("A ray math only", va, gpu, o, d, seed)
    timed("B + pack to blocks", vb, gpu, o, d, seed)
    timed("C + pack + cull", vc, gpu, o, d, seed)
    timed("D composed occluded (backend)", vd, gpu, o, d, seed)
    timed("E block-native closest+shadow", ve, gpu, frame, seed2d)


if __name__ == "__main__":
    main()
