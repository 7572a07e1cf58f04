"""[STALE round-1 probe — kept as measurement archaeology; written against
older kernel internals and may no longer run against the current kernel.]

Test cheaper (R,3)->(Ts,8,128) pack formulations feeding pallas_call.

F  per-component stride-3 slice -> (Ts,1,128) -> concat axis=1
G  reshape (R,3)->(Ts,128,3) then transpose(0,2,1) (one local transpose)
D  current two-big-transposes _pack_rays (known ~1121 ms composed)
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
from realtimeraytracer_tpu.render.backends import make_backend
from realtimeraytracer_tpu.render.surface import resolve_surface
from realtimeraytracer_tpu.render import pallas_backend as pb

W, H = 1920, 1080
ITERS = int(os.environ.get("PROBE_ITERS", "4"))


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

    def run_blocks(g, blk):
        outf, _ = pb.trace_blocks(g, cfg, blk, "occluded")
        return jnp.sum(outf[:, 0, :])

    @jax.jit
    def vf(g, o, d, seed):
        so, sd, tmax = shadow_inputs(g, o, d, seed)
        ts = so.shape[0] // 128
        row = lambda x: x.reshape(ts, 1, 128)
        blk = jnp.concatenate(
            [row(so[:, 0]), row(so[:, 1]), row(so[:, 2]),
             row(sd[:, 0]), row(sd[:, 1]), row(sd[:, 2]),
             row(jnp.zeros_like(tmax)), row(tmax)], axis=1)
        return run_blocks(g, blk)

    @jax.jit
    def vg(g, o, d, seed):
        so, sd, tmax = shadow_inputs(g, o, d, seed)
        ts = so.shape[0] // 128
        od = jnp.concatenate(
            [so, sd, jnp.zeros_like(tmax)[:, None], tmax[:, None]], axis=1)
        blk = od.reshape(ts, 128, 8).transpose(0, 2, 1)
        return run_blocks(g, blk)

    @jax.jit
    def vd(g, o, d, seed):
        so, sd, tmax = shadow_inputs(g, o, d, seed)
        blk, _, _ = pb._pack_rays(so, sd, jnp.zeros_like(tmax), tmax)
        return run_blocks(g, blk)

    timed("F slice rows -> concat", vf, gpu, o, d, seed)
    timed("G reshape+local transpose", vg, gpu, o, d, seed)
    timed("D current _pack_rays", vd, gpu, o, d, seed)


if __name__ == "__main__":
    main()


def extra():
    import warnings
    warnings.filterwarnings("ignore")
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

    def run_blocks(g, blk):
        outf, _ = pb.trace_blocks(g, cfg, blk, "occluded")
        return jnp.sum(outf[:, 0, :])

    @jax.jit
    def vh(g, o, d, seed):
        so, sd, tmax = shadow_inputs(g, o, d, seed)
        so, sd, tmax = jax.lax.optimization_barrier((so, sd, tmax))
        blk, _, _ = pb._pack_rays(so, sd, jnp.zeros_like(tmax), tmax)
        return run_blocks(g, blk)

    @jax.jit
    def vi(g, o, d, seed):
        so, sd, tmax = shadow_inputs(g, o, d, seed)
        blk, _, _ = pb._pack_rays(so, sd, jnp.zeros_like(tmax), tmax)
        blk = jax.lax.optimization_barrier(blk)
        return run_blocks(g, blk)

    timed("H barrier before pack", vh, gpu, o, d, seed)
    timed("I barrier after pack", vi, gpu, o, d, seed)


if __name__ == "__main__":
    pass


def extra2():
    import warnings
    warnings.filterwarnings("ignore")
    cfg = RenderConfig(width=W, height=H, primary_rays=1, shadow_rays=1)
    scene = scenes.procedural_mesh(100_000, sun=True)
    gpu = scene.compile(bvh_leaf_size=cfg.bvh_leaf_size)
    frame = scene.camera.viewport_frame(W, H)
    o, d = generate_rays(frame, W, H, sample_index=0, jitter=True)
    perm, _ = block_permutation(W, H)
    o, d = o[perm], d[perm]
    seed = jnp.arange(o.shape[0], dtype=jnp.uint32)
    jax.block_until_ready((o, d))
    BIGF = jnp.float32(3.0e38)

    @jax.jit
    def vj(g, o, d, seed):
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
        occ = be.occluded(so, -sdir, t_lo, t_hi)
        return jnp.sum(occ.astype(jnp.float32))

    timed("J masked-invalid occluded (composed)", vj, gpu, o, d, seed)


def extra3():
    import warnings
    warnings.filterwarnings("ignore")
    cfg = RenderConfig(width=W, height=H, primary_rays=1, shadow_rays=1)
    scene = scenes.procedural_mesh(100_000, sun=True)
    gpu = scene.compile(bvh_leaf_size=cfg.bvh_leaf_size)
    frame = scene.camera.viewport_frame(W, H)
    o, d = generate_rays(frame, W, H, sample_index=0, jitter=True)
    perm, _ = block_permutation(W, H)
    o, d = o[perm], d[perm]
    seed = jnp.arange(o.shape[0], dtype=jnp.uint32)
    jax.block_until_ready((o, d))
    BIGF = jnp.float32(3.0e38)

    def shadow_masked(g, o, d, seed):
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
        return so, -sdir, t_lo, t_hi

    @jax.jit
    def vk(g, o, d, seed):
        so, sd, t_lo, t_hi = shadow_masked(g, o, d, seed)
        ts = so.shape[0] // 128
        row = lambda x: x.reshape(ts, 1, 128)
        blk = jnp.concatenate(
            [row(so[:, 0]), row(so[:, 1]), row(so[:, 2]),
             row(sd[:, 0]), row(sd[:, 1]), row(sd[:, 2]),
             row(t_lo), row(t_hi)], axis=1)
        outf, _ = pb.trace_blocks(g, cfg, blk, "occluded")
        return jnp.sum(outf[:, 0, :])

    @jax.jit
    def vl(g, o, d, seed):
        so, sd, t_lo, t_hi = shadow_masked(g, o, d, seed)
        blk, _, _ = pb._pack_rays(so, sd, t_lo, t_hi)
        return jnp.sum(blk * blk)

    timed("K masked + slice-rows blocks", vk, gpu, o, d, seed)
    timed("L masked producers+pack only", vl, gpu, o, d, seed)


def extra4():
    import warnings
    warnings.filterwarnings("ignore")
    cfg = RenderConfig(width=W, height=H, primary_rays=1, shadow_rays=1)
    scene = scenes.procedural_mesh(100_000, sun=True)
    gpu = scene.compile(bvh_leaf_size=cfg.bvh_leaf_size)
    frame = scene.camera.viewport_frame(W, H)
    o, d = generate_rays(frame, W, H, sample_index=0, jitter=True)
    perm, _ = block_permutation(W, H)
    o, d = o[perm], d[perm]
    seed = jnp.arange(o.shape[0], dtype=jnp.uint32)
    jax.block_until_ready((o, d))
    BIGF = jnp.float32(3.0e38)

    @jax.jit
    def make_blk(g, o, d, seed):
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

    blk = make_blk(gpu, o, d, seed)
    jax.block_until_ready(blk)

    @jax.jit
    def occl(g, blk):
        outf, outi = pb.trace_blocks(g, cfg, blk, "occluded")
        return jnp.sum(outf[:, 0, :]), outi[:, 1, :]

    out = occl(gpu, blk)
    jax.block_until_ready(out)
    v = out[1][:, 0]
    print(f"K-data visits: mean={float(v.mean()):.2f} "
          f"p99={float(jnp.percentile(v, 99)):.0f} max={int(v.max())}",
          flush=True)
    timed("M kernel alone on K's exact data", occl, gpu, blk)
