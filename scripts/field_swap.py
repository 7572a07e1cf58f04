"""[STALE round-1 probe — kept as measurement archaeology; written against
older kernel internals and may no longer run against the current kernel.]

Find which shadow-ray FIELD blows up visit counts: build the megakernel
(K) and block-native (E) shadow rays for the same frame, then trace hybrids
swapping one field group at a time."""

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
from realtimeraytracer_tpu.ops.camera_rays import (
    generate_rays, generate_ray_blocks, block_permutation)
from realtimeraytracer_tpu.render.backends import make_backend
from realtimeraytracer_tpu.render.surface import resolve_surface
from realtimeraytracer_tpu.render import pallas_backend as pb

W, H = 1920, 1080
BIGF = jnp.float32(3.0e38)
cfg = RenderConfig(width=W, height=H, primary_rays=1, shadow_rays=1)


def main():
    scene = scenes.procedural_mesh(100_000, sun=True)
    gpu = scene.compile(bvh_leaf_size=cfg.bvh_leaf_size)
    frame = scene.camera.viewport_frame(W, H)

    o, d = generate_rays(frame, W, H, sample_index=0, jitter=True)
    perm, _ = block_permutation(W, H)
    o, d = o[perm], d[perm]
    seed = jnp.arange(o.shape[0], dtype=jnp.uint32)

    @jax.jit
    def make_k(g, o, d, seed):
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
        good = surf.valid & (span > 0)
        t_lo = jnp.where(good, 0.0, BIGF)
        t_hi = jnp.where(good, span - cfg.t_min, -BIGF)
        blk, _, _ = pb._pack_rays(so, -sdir, t_lo, t_hi)
        return blk

    @jax.jit
    def make_e(g, fr, seed2d):
        rays = generate_ray_blocks(fr, W, H, sample_index=jnp.uint32(0),
                                   jitter=True, t_min=cfg.t_min,
                                   t_max=cfg.t_max)
        outf, _ = pb.trace_blocks(g, cfg, rays, "closest")
        t = outf[:, 0, :]
        hitm = t < 1e30
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
        return jnp.concatenate([
            lpos, -sdir,
            jnp.where(good, 0.0, BIGF)[:, None, :],
            jnp.where(good, span, -BIGF)[:, None, :]], axis=1)

    ts = (W * H) // 128
    seed2d = (jax.lax.broadcasted_iota(jnp.uint32, (ts, 128), 0)
              * jnp.uint32(131)
              + jax.lax.broadcasted_iota(jnp.uint32, (ts, 128), 1))

    kb = make_k(gpu, o, d, seed)
    eb = make_e(gpu, frame, seed2d)
    jax.block_until_ready((kb, eb))

    occl = jax.jit(lambda g, b: pb.trace_blocks(g, cfg, b, "occluded"))

    def stats(name, blk):
        outf, outi = occl(gpu, blk)
        v = outi[:, 1, 0]
        t0 = time.perf_counter()
        outs = [occl(gpu, blk) for _ in range(4)]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / 4
        print(f"{name:36s} {dt*1e3:8.1f} ms  visits mean={float(v.mean()):6.2f} "
              f"p99={float(jnp.percentile(v, 99)):4.0f}", flush=True)

    stats("K all fields", kb)
    stats("E all fields", eb)
    # hybrids: rows 0-2 origins, 3-5 dirs, 6 tmin, 7 tmax
    mix = kb.at[:, 0:3, :].set(eb[:, 0:3, :])
    stats("K with E origins", mix)
    mix = kb.at[:, 3:6, :].set(eb[:, 3:6, :])
    stats("K with E dirs", mix)
    mix = kb.at[:, 6:8, :].set(eb[:, 6:8, :])
    stats("K with E tmin/tmax", mix)
    # how many active rays each?
    print("K active frac", float((kb[:, 7, :] > 0).mean()),
          "E active frac", float((eb[:, 7, :] > 0).mean()))


if __name__ == "__main__":
    main()


def extra():
    import warnings
    warnings.filterwarnings("ignore")
    scene = scenes.procedural_mesh(100_000, sun=True)
    gpu = scene.compile(bvh_leaf_size=cfg.bvh_leaf_size)
    frame = scene.camera.viewport_frame(W, H)
    ts = (W * H) // 128
    seed2d = (jax.lax.broadcasted_iota(jnp.uint32, (ts, 128), 0)
              * jnp.uint32(131)
              + jax.lax.broadcasted_iota(jnp.uint32, (ts, 128), 1))

    @jax.jit
    def make_e2(g, fr, seed2d):
        """Block-native shadow rays with K's EXACT segment semantics but
        parameterized from the light point: origin=lpos, t in
        [margin, dist - t_min]."""
        rays = generate_ray_blocks(fr, W, H, sample_index=jnp.uint32(0),
                                   jitter=True, t_min=cfg.t_min,
                                   t_max=cfg.t_max)
        outf, _ = pb.trace_blocks(g, cfg, rays, "closest")
        t = outf[:, 0, :]
        hitm = t < 1e30
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
        d0 = dist[:, 0, :]
        good = hitm & (d0 - cfg.shadow_ray_margin > 0)
        return jnp.concatenate([
            lpos, -sdir,
            jnp.where(good, cfg.shadow_ray_margin, BIGF)[:, None, :],
            jnp.where(good, d0 - cfg.t_min, -BIGF)[:, None, :]], axis=1)

    eb2 = make_e2(gpu, frame, seed2d)
    jax.block_until_ready(eb2)
    occl = jax.jit(lambda g, b: pb.trace_blocks(g, cfg, b, "occluded"))

    import time as _t
    outf, outi = occl(gpu, eb2)
    v = outi[:, 1, 0]
    jax.block_until_ready(outf)
    t0 = _t.perf_counter()
    outs = [occl(gpu, eb2) for _ in range(4)]
    jax.block_until_ready(outs)
    dt = (_t.perf_counter() - t0) / 4
    print(f"E2 (correct segment, lpos origin)   {dt*1e3:8.1f} ms  "
          f"visits mean={float(v.mean()):6.2f} "
          f"p99={float(jnp.percentile(v, 99)):4.0f} "
          f"occ={float((outf[:, 0, :] > 0.5).mean()):.3f}", flush=True)
