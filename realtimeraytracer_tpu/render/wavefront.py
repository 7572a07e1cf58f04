"""Wavefront multi-bounce path tracer.

SURVEY.md §7 PR4: "restructure to wavefront (ray SoA -> intersect -> shade
-> continue) for multi-bounce".  The reference's pipeline allows recursion
depth 4 (ray_tracing_pipeline.cppm:144) and its legacy hit shader
(shaders/phong.rchit:255-288, unused by the final pipeline) implements
GGX importance-sampled recursive reflection; this module is that capability
done the TPU way: a fixed ladder of bounce iterations over a flat ray-state
SoA {origin, dir, throughput, radiance, alive} with masked lanes instead of
recursion, next-event estimation at every vertex (one area-light sample +
the sun), and GGX/cosine BSDF sampling for the continuation ray.

All lanes advance in lock-step each bounce; dead lanes carry zero
throughput (ray compaction is a later perf optimization — on TPU the
masked-lane cost is pure VPU math, no divergence penalty).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from realtimeraytracer_tpu.config import RenderConfig
from realtimeraytracer_tpu.ops import rng
from realtimeraytracer_tpu.ops.shading import (
    PI,
    base_color_split,
    cook_torrance_specular,
    cosine_hemisphere,
    lambert_diffuse,
    sample_ggx,
)
from realtimeraytracer_tpu.ops.texture import sample_equirect
from realtimeraytracer_tpu.ops.tonemap import srgb_to_linear
from realtimeraytracer_tpu.ops.vecmath import dot, normalize
from realtimeraytracer_tpu.render.backends import TraceBackend, make_backend
from realtimeraytracer_tpu.render.surface import resolve_surface
from realtimeraytracer_tpu.scene.gpu_scene import GPUScene


class PathState(NamedTuple):
    origins: jnp.ndarray      # (R, 3)
    dirs: jnp.ndarray         # (R, 3)
    throughput: jnp.ndarray   # (R, 3)
    radiance: jnp.ndarray     # (R, 3)
    alive: jnp.ndarray        # (R,) bool


def _coherence_key(o, d, live):
    """Sort key for bounce-ray reordering: direction octant (high bits) then
    a 15-bit 3D Morton code of the origin.

    Secondary bounces scatter in all directions, and the tile-based
    traversal pays the UNION of each 128-ray tile's frustum — measured
    3.2x slower than sorted tiles at 1080p/100k (PERF.md).  The argsort of
    2M keys costs ~13 ms; dead lanes sort to the end (their empty
    t-intervals retire instantly and they stop polluting live tiles)."""
    lo = jnp.min(jnp.where(live[:, None], o, 1e9), axis=0)
    hi = jnp.max(jnp.where(live[:, None], o, -1e9), axis=0)
    ext = jnp.maximum(hi - lo, 1e-6)
    q = jnp.clip((o - lo) / ext * 31.0, 0, 31).astype(jnp.uint32)
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
    return jnp.where(live, key, jnp.uint32(0xFFFFFFFF))


def _sample_one_light(gpu: GPUScene, cfg: RenderConfig, backend: TraceBackend,
                      p, n, view, albedo, rough, metal, seed, live=None):
    """Next-event estimation: one uniform sample on one uniformly-chosen
    light triangle (+ the directional sun).

    live: per-ray mask of lanes whose contribution will be used; dead
    lanes get empty shadow-segment intervals so the traversal retires
    them instead of tracing garbage rays from sanitized zero positions
    (the same ~40%-of-trace-cost waste measured in the megakernel)."""
    from realtimeraytracer_tpu.ops.intersect import BIG_T

    R = p.shape[0]
    if live is None:
        live = jnp.ones((R,), bool)
    lt = gpu.lt_v0.shape[0]
    lam = lambert_diffuse(albedo, metal)
    _, f0 = base_color_split(albedo, metal)

    # Pick a light triangle per ray.
    li = (rng.hash_u32(seed + jnp.uint32(7777)) % jnp.uint32(lt)).astype(jnp.int32)
    p0, p1, p2 = gpu.lt_v0[li], gpu.lt_v1[li], gpu.lt_v2[li]
    lcol = gpu.lt_color[li]
    lint = gpu.lt_intensity[li][:, None]
    valid_l = gpu.lt_valid[li]
    two = gpu.lt_two_sided[li]

    r1 = rng.uniform(seed + jnp.uint32(31))
    r2 = rng.uniform(seed + jnp.uint32(131))
    over = r1 + r2 > 1.0
    r1 = jnp.where(over, 1.0 - r1, r1)
    r2 = jnp.where(over, 1.0 - r2, r2)
    lpos = p0 + r1[:, None] * (p1 - p0) + r2[:, None] * (p2 - p0)

    nl = jnp.cross(p2 - p1, p0 - p1)
    area = jnp.sqrt(jnp.maximum(dot(nl, nl), 1e-20)) * 0.5
    nlu = normalize(nl)
    front = dot(nlu, p - p0) >= 0.0
    active = valid_l & (two | front)

    delta = lpos - p
    dist = jnp.sqrt(jnp.maximum(dot(delta, delta), 1e-20))
    ldir = delta / dist[:, None]
    so = p + n * cfg.shadow_origin_offset
    occ = backend.occluded(
        so, ldir,
        jnp.where(live, cfg.t_min, BIG_T),
        jnp.where(live, dist - cfg.shadow_ray_margin, -BIG_T))

    ndotl = jnp.maximum(dot(n, ldir), 0.0)
    cos_on_light = jnp.abs(dot(nlu, -ldir))
    # Solid-angle conversion of the area pdf (1 / (area * num_tris)).
    pdf_sa = (dist * dist) / jnp.maximum(area * lt * cos_on_light, 1e-8)
    spec = cook_torrance_specular(view, ldir, n, rough, f0,
                                  min_ndotv=1e-3, min_ndotl=1e-3)
    brdf = spec + lam
    radiance = lcol * lint * cfg.sampled_gain
    contrib = brdf * radiance * (ndotl / jnp.maximum(pdf_sa, 1e-8))[:, None]
    contrib = jnp.where((active & ~occ & (ndotl > 0))[:, None], contrib, 0.0)

    # Sun (delta light).
    sun_nl = dot(n, gpu.sun_direction[None, :])
    sun_occ = backend.occluded(
        so, jnp.broadcast_to(gpu.sun_direction, (R, 3)),
        jnp.where(live, cfg.t_min, BIG_T),
        jnp.where(live, cfg.t_max, -BIG_T), common="dir")
    sun_spec = cook_torrance_specular(
        view, jnp.broadcast_to(gpu.sun_direction, (R, 3)), n, rough, f0,
        min_ndotv=1e-3, min_ndotl=1e-3)
    sun_c = (sun_spec + lam) * gpu.sun_color[None, :] * gpu.sun_intensity \
        * cfg.sun_gain * jnp.maximum(sun_nl, 0.0)[:, None]
    contrib = contrib + jnp.where(
        ((sun_nl > 0) & ~sun_occ)[:, None] & (gpu.sun_intensity > 0), sun_c, 0.0)
    return contrib


def trace_paths(
    gpu: GPUScene,
    cfg: RenderConfig,
    origins: jnp.ndarray,
    dirs: jnp.ndarray,
    pixel_seed: jnp.ndarray,
    backend: TraceBackend | None = None,
    sample_index: int = 0,
) -> jnp.ndarray:
    """Trace one spp of full paths; returns per-ray linear radiance (R, 3)."""
    if backend is None:
        backend = make_backend(gpu, cfg)
    R = origins.shape[0]
    state = PathState(
        origins=origins, dirs=dirs,
        throughput=jnp.ones_like(origins),
        radiance=jnp.zeros_like(origins),
        alive=jnp.ones_like(origins[:, 0], bool),
    )

    from realtimeraytracer_tpu.ops.intersect import BIG_T

    # Logical-pixel tracking for bounce reordering: the whole path state
    # (INCLUDING its RNG seed) rides with the ray, so reordering changes
    # nothing but tile composition — results are identical per ray.
    pix = jnp.arange(R, dtype=jnp.int32)
    seeds = pixel_seed

    # v8's per-ray cull helps most on incoherent rays, but bounce batches
    # are SO incoherent that Morton reordering still pays even there
    # (sorted v8: 1392 ms vs v7 2311 ms at 1080p/100k) — keep sorting
    # regardless of backend.perray_cull.
    for bounce in range(cfg.max_bounces + 1):
        if cfg.sort_bounces and bounce >= 1:
            order = jnp.argsort(
                _coherence_key(state.origins, state.dirs, state.alive))
            state = PathState(*(x[order] for x in state))
            pix = pix[order]
            seeds = seeds[order]
        bseed = (seeds + jnp.uint32(bounce * 9176)
                 + jnp.uint32(sample_index * 15485863))
        # Dead lanes get empty t intervals: their (sanitized-zero origin)
        # rays would otherwise trace real segments through the scene.
        # Bounce 0 keeps the pinhole common-origin hint.
        hit = backend.closest(
            state.origins, state.dirs,
            jnp.where(state.alive, cfg.t_min, BIG_T),
            jnp.where(state.alive, cfg.t_max, -BIG_T),
            common="origin" if bounce == 0 else None)
        surf = resolve_surface(gpu, hit, state.origins, state.dirs)

        env = srgb_to_linear(sample_equirect(gpu.hdri, state.dirs)) * gpu.env_color
        emit = (
            jnp.where(surf.missed[:, None], env, 0.0)
            + jnp.where(surf.hit_light[:, None], surf.light_color, 0.0)
        )
        state = state._replace(
            radiance=state.radiance
            + jnp.where(state.alive[:, None], state.throughput * emit, 0.0)
        )
        still = state.alive & surf.valid
        if bounce == cfg.max_bounces:
            break

        view = -state.dirs
        nee = _sample_one_light(
            gpu, cfg, backend, surf.position, surf.normal, view,
            surf.albedo, surf.roughness, surf.metallic, bseed, live=still)
        state = state._replace(
            radiance=state.radiance
            + jnp.where(still[:, None], state.throughput * nee, 0.0)
        )

        # Continuation: specular (GGX) vs diffuse (cosine) lobe selection.
        _, f0 = base_color_split(surf.albedo, surf.metallic)
        p_spec = jnp.clip(
            surf.metallic + (1.0 - surf.roughness) * 0.5, 0.05, 0.95)
        u_lobe = rng.uniform(bseed + jnp.uint32(555))
        r1 = rng.uniform(bseed + jnp.uint32(667))
        r2 = rng.uniform(bseed + jnp.uint32(787))
        d_spec = sample_ggx(surf.normal, view, jnp.maximum(surf.roughness, 0.03),
                            r1, r2)
        d_diff = cosine_hemisphere(surf.normal, r1, r2)
        choose_spec = u_lobe < p_spec
        new_dir = normalize(jnp.where(choose_spec[:, None], d_spec, d_diff))
        ndotl = dot(surf.normal, new_dir)
        going_up = ndotl > 1e-4

        # Cheap throughput model (matches the reference's legacy recursive
        # shader in spirit, phong.rchit:255-288: tint by F0 on specular
        # bounces, albedo on diffuse).
        weight = jnp.where(
            choose_spec[:, None],
            f0 / jnp.maximum(p_spec, 1e-3)[:, None],
            surf.albedo * (1.0 - surf.metallic[:, None])
            / jnp.maximum(1.0 - p_spec, 1e-3)[:, None],
        )
        state = PathState(
            origins=surf.position + surf.normal * cfg.shadow_origin_offset,
            dirs=new_dir,
            throughput=state.throughput * jnp.where(still[:, None], weight, 1.0),
            radiance=state.radiance,
            alive=still & going_up,
        )
    if cfg.sort_bounces and cfg.max_bounces >= 1:
        return state.radiance[jnp.argsort(pix)]
    return state.radiance


def render_wavefront(gpu: GPUScene, frame, cfg: RenderConfig,
                     frame_index: int | jnp.ndarray = 0,
                     backend: TraceBackend | None = None) -> jnp.ndarray:
    """Multi-bounce render -> tonemapped (H, W, 3)."""
    from realtimeraytracer_tpu.ops.camera_rays import generate_rays
    from realtimeraytracer_tpu.ops.tonemap import tonemap

    if backend is None:
        backend = make_backend(gpu, cfg)
    h, w = cfg.height, cfg.width
    py = jnp.arange(h, dtype=jnp.uint32)[:, None]
    px = jnp.arange(w, dtype=jnp.uint32)[None, :]
    pixel_seed = (px * jnp.uint32(733) + py * jnp.uint32(1933)
                  + jnp.uint32(frame_index)).reshape(-1)
    acc = jnp.zeros((h * w, 3), jnp.float32)
    for s in range(cfg.primary_rays):
        o, d = generate_rays(frame, w, h, sample_index=s, jitter=cfg.jitter)
        acc = acc + trace_paths(gpu, cfg, o, d, pixel_seed, backend, s)
    img = tonemap(acc / cfg.primary_rays, cfg.tonemap, cfg.gamma)
    return img.reshape(h, w, 3)
