"""Does Morton-reordering megakernel shadow rays cut the occlusion cost?

PERF.md: the 6 area-light occlusion traces are ~200 ms each (~72% of the
frame with the sun trace).  Tile-level traversal pays the UNION of each
128-ray tile's shadow shaft; a tile mixing near and far surfaces has a fat
shaft.  This probe builds the REAL megakernel shadow segments (light-tri 0,
sample 0) and times backend.occluded on them:

  asis      — block pixel order (what the megakernel does today)
  sortkey   — the jnp.argsort of the coherence key alone
  sorted    — occluded on pre-sorted rays (pure trace delta)
  sorted+io — permute origins/dirs/t + trace + unpermute occ (swap-in cost)

Key variants: origin Morton, origin Morton + dir octant, depth-major.
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
from realtimeraytracer_tpu.render.wavefront import _coherence_key

W, H = 1920, 1080
ITERS = int(os.environ.get("PROBE_ITERS", "6"))


def timed(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(ITERS)]
    jax.block_until_ready(outs)
    print(f"{name:44s} {(time.perf_counter()-t0)/ITERS*1e3:9.1f} ms",
          flush=True)
    return out


def morton_key(o, live, depth_bits=0, depth=None, use_oct=False, d=None):
    lo = jnp.min(jnp.where(live[:, None], o, 1e9), axis=0)
    hi = jnp.max(jnp.where(live[:, None], o, -1e9), axis=0)
    ext = jnp.maximum(hi - lo, 1e-6)
    q = jnp.clip((o - lo) / ext * 31.0, 0, 31).astype(jnp.uint32)

    def spread(v):
        v = (v | (v << 8)) & jnp.uint32(0x0100FF)
        v = (v | (v << 4)) & jnp.uint32(0x010C30C3)
        v = (v | (v << 2)) & jnp.uint32(0x09249249)
        return v

    key = (spread(q[:, 0]) << 2) | (spread(q[:, 1]) << 1) | spread(q[:, 2])
    if use_oct:
        oct_ = ((d[:, 0] > 0).astype(jnp.uint32)
                + 2 * (d[:, 1] > 0).astype(jnp.uint32)
                + 4 * (d[:, 2] > 0).astype(jnp.uint32))
        key = (oct_ << 28) | (key & jnp.uint32(0x0FFFFFFF))
    if depth_bits:
        dlo = jnp.min(jnp.where(live, depth, 1e9))
        dhi = jnp.max(jnp.where(live, depth, -1e9))
        dq = jnp.clip((depth - dlo) / jnp.maximum(dhi - dlo, 1e-6)
                      * (2 ** depth_bits - 1), 0, 2 ** depth_bits - 1
                      ).astype(jnp.uint32)
        key = (dq << (32 - depth_bits)) | (key >> depth_bits)
    return jnp.where(live, key, jnp.uint32(0xFFFFFFFF))


def main():
    cfg = RenderConfig(width=W, height=H)
    scene = scenes.procedural_mesh(100_000)
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
        p = surf.position
        n = surf.normal
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
        return so, sdir, t_lo, t_hi, surf.valid, hit.t

    so, sdir, t_lo, t_hi, valid, depth = build_segments(gpu, frame)
    live_frac = float(valid.mean())
    print(f"live fraction: {live_frac:.3f}")

    occ_fn = jax.jit(lambda g, o, d, lo, hi: be.occluded(o, d, lo, hi))
    base = timed("occluded as-is (block order)", occ_fn, gpu, so, sdir, t_lo, t_hi)

    variants = {
        "morton(origin)": morton_key(so, valid),
        "morton+octant": morton_key(so, valid, use_oct=True, d=sdir),
        "depth4|morton": morton_key(so, valid, depth_bits=4, depth=depth),
    }
    for name, key in variants.items():
        key = jax.block_until_ready(key)
        order = jnp.argsort(key)
        so_s, sd_s = so[order], sdir[order]
        lo_s, hi_s = t_lo[order], t_hi[order]
        jax.block_until_ready((so_s, sd_s, lo_s, hi_s))
        out = timed(f"occluded sorted [{name}]", occ_fn, gpu, so_s, sd_s, lo_s, hi_s)

        @jax.jit
        def full(g, o, d, lo, hi, k):
            ordr = jnp.argsort(k)
            occ = be.occluded(o[ordr], d[ordr], lo[ordr], hi[ordr])
            return occ[jnp.argsort(ordr)]

        out2 = timed(f"occluded sorted+io [{name}]", full, gpu, so, sdir,
                     t_lo, t_hi, key)
        ref = occ_fn(gpu, so, sdir, t_lo, t_hi)
        assert bool(jnp.array_equal(ref, out2)), f"mismatch for {name}"
    print("all sorted variants bit-identical to as-is")


if __name__ == "__main__":
    main()
