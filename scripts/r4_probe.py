"""Round-4 probes: VPU f32 peak + frame/wavefront decomposition.

1. Measures the chip's f32 VPU FMA peak with a Pallas micro-kernel
   (8 independent accumulator chains so throughput, not latency, binds).
2. Candidate counts per tile at block vs subcluster granularity for
   primary / shadow / bounce ray populations.
3. v8 visit counts (outi row 1) for the same populations.

Timing discipline per PERF.md: pipelined (ITERS calls, one sync) AND a
forced host read of a timed output (float(out.sum())) — unmaterialized
pipelined timings through the axon tunnel intermittently under-report.

Usage: python scripts/r4_probe.py [vpu|cand|wave|occl]
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/tmp/rtrt_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

ITERS = int(os.environ.get("PROBE_ITERS", "8"))


def timed(name, fn, *args, iters=None):
    it = iters or ITERS
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(it)]
    # Host-read checksum of the last output: forces materialization.
    last = outs[-1]
    leaves = jax.tree_util.tree_leaves(last)
    cs = float(leaves[0].sum()) if leaves else 0.0
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / it
    print(f"{name:44s} {dt*1e3:9.2f} ms   (checksum {cs:.3e})", flush=True)
    return dt, out


# ---------------------------------------------------------------------------
# 1. VPU f32 FMA peak
# ---------------------------------------------------------------------------

def vpu_peak():
    ROWS, LANES, CHAINS, UNROLL = 512, 128, 8, 64

    def kern(x_ref, o_ref):
        accs = [x_ref[:] * (1.0 + 1e-7 * j) for j in range(CHAINS)]
        b = x_ref[:] * 0.9999999

        def body(i, accs):
            return tuple(a * b + 1e-9 for a in accs)

        accs = jax.lax.fori_loop(0, UNROLL, body, tuple(accs))
        o = accs[0]
        for a in accs[1:]:
            o = o + a
        o_ref[:] = o

    x = jnp.ones((ROWS, LANES), jnp.float32)
    GRID = 64

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kern,
            grid=(GRID,),
            in_specs=[pl.BlockSpec((ROWS, LANES), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((ROWS, LANES), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((ROWS, LANES), jnp.float32),
        )(x)

    dt, _ = timed("vpu fma chain kernel", run, x, iters=32)
    flops = 2 * ROWS * LANES * CHAINS * UNROLL * GRID
    print(f"  -> {flops / dt / 1e12:.3f} TFLOP/s f32 VPU "
          f"({flops/1e9:.2f} GFLOP per call)")


# ---------------------------------------------------------------------------
# 2/3. Candidate + visit statistics per ray population
# ---------------------------------------------------------------------------

def make_scene():
    from realtimeraytracer_tpu import scenes
    from realtimeraytracer_tpu.config import RenderConfig

    W, H = 1920, 1080
    cfg = RenderConfig(width=W, height=H, primary_rays=1, shadow_rays=3)
    scene = scenes.procedural_mesh(100_000, sun=True)
    gpu = scene.compile(bvh_leaf_size=cfg.bvh_leaf_size)
    frame = scene.camera.viewport_frame(W, H)
    return gpu, frame, cfg, W, H


def ray_populations(gpu, frame, cfg, W, H):
    """primary, area-shadow (sample 0, light 0), sun-shadow, bounce-1."""
    from realtimeraytracer_tpu.ops.camera_rays import (block_permutation,
                                                       generate_rays)
    from realtimeraytracer_tpu.ops.intersect import BIG_T
    from realtimeraytracer_tpu.ops import rng
    from realtimeraytracer_tpu.ops.shading import sample_ggx, cosine_hemisphere
    from realtimeraytracer_tpu.ops.vecmath import dot, normalize
    from realtimeraytracer_tpu.render.backends import make_backend
    from realtimeraytracer_tpu.render.surface import resolve_surface
    from realtimeraytracer_tpu.render.wavefront import _coherence_key

    backend = make_backend(gpu, cfg)

    @jax.jit
    def build(gpu, frame):
        o, d = generate_rays(frame, W, H, sample_index=0, jitter=True)
        perm, _ = block_permutation(W, H)
        o, d = o[perm], d[perm]
        R = o.shape[0]
        hit = backend.closest(o, d, cfg.t_min, cfg.t_max, common="origin")
        surf = resolve_surface(gpu, hit, o, d)
        p, n = surf.position, surf.normal
        so = p + n * cfg.shadow_origin_offset
        seed = jnp.arange(R, dtype=jnp.uint32)
        # area light 0, sample 0
        p0, p1, p2 = gpu.lt_v0[0], gpu.lt_v1[0], gpu.lt_v2[0]
        r1 = rng.uniform(seed)
        r2 = rng.uniform(seed + jnp.uint32(100))
        over = r1 + r2 > 1.0
        r1 = jnp.where(over, 1.0 - r1, r1)
        r2 = jnp.where(over, 1.0 - r2, r2)
        lpos = p0[None] + r1[:, None] * (p1 - p0)[None] + r2[:, None] * (p2 - p0)[None]
        delta = lpos - so
        dist = jnp.sqrt(jnp.maximum(jnp.sum(delta * delta, -1), 1e-20))
        sdir = delta / dist[:, None]
        act = surf.valid
        sh_lo = jnp.where(act, cfg.t_min, BIG_T)
        sh_hi = jnp.where(act, dist - cfg.shadow_ray_margin, -BIG_T)
        # sun
        sun_d = jnp.broadcast_to(gpu.sun_direction, (R, 3))
        # bounce-1 rays: GGX/cosine continuation, sorted by coherence key
        view = -d
        r1b = rng.uniform(seed + jnp.uint32(667))
        r2b = rng.uniform(seed + jnp.uint32(787))
        u_lobe = rng.uniform(seed + jnp.uint32(555))
        d_spec = sample_ggx(n, view, jnp.maximum(surf.roughness, 0.03), r1b, r2b)
        d_diff = cosine_hemisphere(n, r1b, r2b)
        nd = normalize(jnp.where((u_lobe < 0.5)[:, None], d_spec, d_diff))
        alive = act & (dot(n, nd) > 1e-4)
        bo = so
        key = _coherence_key(bo, nd, alive)
        order = jnp.argsort(key)
        bo_s, nd_s, alive_s = bo[order], nd[order], alive[order]
        b_lo = jnp.where(alive_s, cfg.t_min, BIG_T)
        b_hi = jnp.where(alive_s, cfg.t_max, -BIG_T)
        return (o, d, so, sdir, sh_lo, sh_hi, sun_d, act,
                bo_s, nd_s, b_lo, b_hi, jnp.mean(alive.astype(jnp.float32)))

    return build(gpu, frame)


def cand_stats(gpu, rays_o, rays_d, t_lo, t_hi, label):
    from realtimeraytracer_tpu.render import pallas_backend as pb

    @jax.jit
    def stats(gpu, o, d, lo, hi):
        rays, _, _ = pb._pack_rays(o, d, lo, hi)
        ent = pb._sub_entries(rays, gpu.pallas_cl_min, gpu.pallas_cl_max)
        sub_n = jnp.sum(jnp.isfinite(ent).astype(jnp.int32), axis=1)
        cb = gpu.pallas_panels.shape[0]
        ent_b = ent.reshape(ent.shape[0], cb, 4).min(axis=2)
        blk_n = jnp.sum(jnp.isfinite(ent_b).astype(jnp.int32), axis=1)
        return sub_n, blk_n

    sub_n, blk_n = stats(gpu, rays_o, rays_d, t_lo, t_hi)
    print(f"{label:24s} subclusters/tile mean={float(sub_n.mean()):7.1f} "
          f"p90={float(jnp.percentile(sub_n, 90)):6.0f}  "
          f"blocks/tile mean={float(blk_n.mean()):6.1f} "
          f"p90={float(jnp.percentile(blk_n, 90)):5.0f}", flush=True)


def visit_stats(gpu, cfg, o, d, lo, hi, mode, label, common=None):
    from realtimeraytracer_tpu.render import hier_backend as hb
    from realtimeraytracer_tpu.render import pallas_backend as pb

    @jax.jit
    def run(gpu, o, d, lo, hi):
        rays, r_orig, ts = pb._pack_rays(o, d, lo, hi)
        outf, outi = hb.trace_blocks_hier(gpu, cfg, rays, mode, common=common)
        return (outi[:, 1, 0].astype(jnp.float32),
                outf[:, 1, 0])

    visits, oiters = run(gpu, o, d, lo, hi)
    print(f"{label:24s} v8 visits/tile mean={float(visits.mean()):7.1f} "
          f"p90={float(jnp.percentile(visits, 90)):6.0f} "
          f"L1 pops/tile mean={float(oiters.mean()):5.1f}", flush=True)
    # timed trace
    @jax.jit
    def trace(gpu, o, d, lo, hi):
        rays, _, _ = pb._pack_rays(o, d, lo, hi)
        outf, outi = hb.trace_blocks_hier(gpu, cfg, rays, mode, common=common)
        return outf[:, 0, :]

    timed(f"  {label} v8 {mode} trace", trace, gpu, o, d, lo, hi)


def cand_main():
    gpu, frame, cfg, W, H = make_scene()
    (o, d, so, sdir, sh_lo, sh_hi, sun_d, act,
     bo_s, nd_s, b_lo, b_hi, alive_frac) = ray_populations(gpu, frame, cfg, W, H)
    print(f"bounce-1 alive fraction: {float(alive_frac):.3f}")
    cand_stats(gpu, o, d, jnp.full_like(sh_lo, cfg.t_min),
               jnp.full_like(sh_hi, cfg.t_max), "primary")
    cand_stats(gpu, so, sdir, sh_lo, sh_hi, "area shadow")
    from realtimeraytracer_tpu.ops.intersect import BIG_T
    sun_lo = jnp.where(act, cfg.t_min, BIG_T)
    sun_hi = jnp.where(act, cfg.t_max, -BIG_T)
    cand_stats(gpu, so, sun_d, sun_lo, sun_hi, "sun shadow")
    cand_stats(gpu, bo_s, nd_s, b_lo, b_hi, "bounce-1 (sorted)")

    visit_stats(gpu, cfg, o, d, jnp.full_like(sh_lo, cfg.t_min),
                jnp.full_like(sh_hi, cfg.t_max), "closest", "primary")
    visit_stats(gpu, cfg, so, sdir, sh_lo, sh_hi, "occluded", "area shadow")
    visit_stats(gpu, cfg, so, sun_d, sun_lo, sun_hi, "occluded", "sun shadow",
                common="dir")
    visit_stats(gpu, cfg, bo_s, nd_s, b_lo, b_hi, "closest", "bounce-1")


# ---------------------------------------------------------------------------
# 4. Wavefront per-stage decomposition (config 4: 4 spp, 2 bounces)
# ---------------------------------------------------------------------------

def wave_main():
    from realtimeraytracer_tpu.render.wavefront import render_wavefront
    from realtimeraytracer_tpu.render.backends import make_backend

    gpu, frame, cfg, W, H = make_scene()
    cfg4 = cfg.replace(primary_rays=4, max_bounces=2)
    backend = make_backend(gpu, cfg4)

    full = jax.jit(lambda g, f: render_wavefront(g, f, cfg4, 0, backend))
    timed("wavefront config-4 full", full, gpu, frame, iters=2)

    # 1 spp variants to split the cost:
    cfg1 = cfg.replace(primary_rays=1, max_bounces=2)
    one = jax.jit(lambda g, f: render_wavefront(g, f, cfg1, 0, backend))
    timed("wavefront 1spp 2bounce", one, gpu, frame, iters=2)
    cfg1b = cfg.replace(primary_rays=1, max_bounces=1)
    oneb = jax.jit(lambda g, f: render_wavefront(g, f, cfg1b, 0, backend))
    timed("wavefront 1spp 1bounce", oneb, gpu, frame, iters=2)
    cfg10 = cfg.replace(primary_rays=1, max_bounces=0)
    one0 = jax.jit(lambda g, f: render_wavefront(g, f, cfg10, 0, backend))
    timed("wavefront 1spp 0bounce", one0, gpu, frame, iters=2)


# ---------------------------------------------------------------------------
# 5. Occlusion lever probes
# ---------------------------------------------------------------------------

def occl_main():
    from realtimeraytracer_tpu.render import hier_backend as hb
    from realtimeraytracer_tpu.render import pallas_backend as pb
    from realtimeraytracer_tpu.ops.intersect import BIG_T

    gpu, frame, cfg, W, H = make_scene()
    (o, d, so, sdir, sh_lo, sh_hi, sun_d, act,
     bo_s, nd_s, b_lo, b_hi, _) = ray_populations(gpu, frame, cfg, W, H)

    def mk(common=None):
        @jax.jit
        def trace(gpu, o, d, lo, hi):
            rays, _, _ = pb._pack_rays(o, d, lo, hi)
            outf, _ = hb.trace_blocks_hier(gpu, cfg, rays, "occluded",
                                           common=common)
            return outf[:, 0, :]
        return trace

    timed("area occl v8 as-is", mk(), gpu, so, sdir, sh_lo, sh_hi)
    sun_lo = jnp.where(act, cfg.t_min, BIG_T)
    sun_hi = jnp.where(act, cfg.t_max, -BIG_T)
    timed("sun occl v8 common=dir", mk("dir"), gpu, so, sun_d, sun_lo, sun_hi)

    # sorted variant: octant+Morton sort of shadow segments, then v8
    from realtimeraytracer_tpu.render.megakernel import _shadow_sort_key

    @jax.jit
    def sorted_trace(gpu, so, sdir, lo, hi, act):
        key = _shadow_sort_key(so, sdir, act)
        order = jnp.argsort(key)
        rays, _, _ = pb._pack_rays(so[order], sdir[order], lo[order], hi[order])
        outf, _ = hb.trace_blocks_hier(gpu, cfg, rays, "occluded")
        occ = outf[:, 0, :].reshape(-1)[:so.shape[0]]
        return occ[jnp.argsort(order)]

    timed("area occl v8 sorted(+IO)", sorted_trace, gpu, so, sdir, sh_lo,
          sh_hi, act)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("vpu", "all"):
        vpu_peak()
    if which in ("cand", "all"):
        cand_main()
    if which in ("occl", "all"):
        occl_main()
    if which in ("wave", "all"):
        wave_main()
