"""Do incoherent (bounce) rays deserve Morton reordering before tracing?

Builds realistic bounce-1 rays (cosine-sampled from primary hits), then
times: closest trace as-is, jnp.argsort of a coherence key, and the trace
on sorted rays (+ stats).
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
from realtimeraytracer_tpu.ops.shading import cosine_hemisphere
from realtimeraytracer_tpu.render.backends import make_backend
from realtimeraytracer_tpu.render.surface import resolve_surface
from realtimeraytracer_tpu.ops.intersect import BIG_T

W, H = 1920, 1080
ITERS = int(os.environ.get("PROBE_ITERS", "4"))


def timed(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(ITERS)]
    jax.block_until_ready(outs)
    print(f"{name:42s} {(time.perf_counter()-t0)/ITERS*1e3:9.1f} ms",
          flush=True)
    return out


def main():
    cfg = RenderConfig(width=W, height=H)
    scene = scenes.procedural_mesh(100_000, sun=True)
    gpu = scene.compile()
    frame = scene.camera.viewport_frame(W, H)
    o, d = generate_rays(frame, W, H, sample_index=0, jitter=True)
    perm, _ = block_permutation(W, H)
    o, d = o[perm], d[perm]
    seed = jnp.arange(o.shape[0], dtype=jnp.uint32)

    @jax.jit
    def bounce_rays(g, o, d, seed):
        be = make_backend(g, cfg)
        hit = be.closest(o, d, cfg.t_min, cfg.t_max, common="origin")
        surf = resolve_surface(g, hit, o, d)
        nd = cosine_hemisphere(surf.normal, rng.uniform(seed),
                               rng.uniform(seed + jnp.uint32(9)))
        live = surf.valid
        return (surf.position + surf.normal * cfg.shadow_origin_offset,
                nd, live)

    o2, d2, live = bounce_rays(gpu, o, d, seed)
    jax.block_until_ready((o2, d2, live))
    t_lo = jnp.where(live, cfg.t_min, BIG_T)
    t_hi = jnp.where(live, cfg.t_max, -BIG_T)

    @jax.jit
    def trace(g, o, d, t_lo, t_hi):
        be = make_backend(g, cfg)
        return be.closest(o, d, t_lo, t_hi).t

    @jax.jit
    def coherence_key(o, d, live):
        lo = jnp.min(jnp.where(live[:, None], o, 1e9), axis=0)
        hi = jnp.max(jnp.where(live[:, None], o, -1e9), axis=0)
        ext = jnp.maximum(hi - lo, 1e-6)
        q = jnp.clip((o - lo) / ext * 31.0, 0, 31).astype(jnp.uint32)
        # 3-bit direction octant in the high bits, then 15-bit 3D Morton.
        oct_ = ((d[:, 0] > 0).astype(jnp.uint32)
                + 2 * (d[:, 1] > 0).astype(jnp.uint32)
                + 4 * (d[:, 2] > 0).astype(jnp.uint32))

        def spread(v):
            v = (v | (v << 8)) & jnp.uint32(0x0100FF)
            v = (v | (v << 4)) & jnp.uint32(0x010C30C3)
            v = (v | (v << 2)) & jnp.uint32(0x09249249)
            return v

        m = (spread(q[:, 0]) << 2) | (spread(q[:, 1]) << 1) | spread(q[:, 2])
        key = (oct_ << 28) | (m & jnp.uint32(0x0FFFFFFF))
        # Dead lanes sort to the end (empty intervals retire instantly).
        return jnp.where(live, key, jnp.uint32(0xFFFFFFFF))

    @jax.jit
    def argsort_key(o, d, live):
        return jnp.argsort(coherence_key(o, d, live))

    @jax.jit
    def trace_sorted(g, o, d, t_lo, t_hi, live):
        order = jnp.argsort(coherence_key(o, d, live))
        t = trace(g, o[order], d[order], t_lo[order], t_hi[order])
        inv = jnp.argsort(order)
        return t[inv]

    timed("bounce closest unsorted", trace, gpu, o2, d2, t_lo, t_hi)
    timed("argsort key only", argsort_key, o2, d2, live)
    timed("bounce closest sorted (incl sort)", trace_sorted,
          gpu, o2, d2, t_lo, t_hi, live)


if __name__ == "__main__":
    main()
