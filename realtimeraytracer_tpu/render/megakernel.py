"""The fused single-pass renderer ("megakernel" wavefront of width R).

This is the TPU re-design of the reference's master ray-generation shader
(shaders/raygen.rgen:71-364): per pixel it traces jittered primary rays and
produces THREE radiance estimates — (a) analytic direct light via LTC,
(b) stochastic unshadowed, (c) stochastic shadowed — plus a normal/position
G-buffer, which the pipeline layer then denoises and ratio-combines
(Heitz-style "analytic illumination x stochastic shadow ratio").

Where the GPU runs one SIMT thread per pixel, here the *whole image* is one
ray batch flowing through vectorized ops: closest-hit, surface resolution,
a lax.scan over light triangles (each step shades all R rays against one
light triangle: stochastic samples + shadow casts + analytic LTC), then the
directional sun.  No per-ray control flow — masks everywhere — so XLA can
fuse the entire shade into large VPU kernels.

Deliberate deviations from the reference (documented, all strictly better):
  * float32 accumulation end-to-end (ref stores rgba8 between passes);
  * no BGR channel swap (presentation artifact, raygen.rgen:355-357);
  * shadow-sample seeds are decorrelated per light triangle and per spp
    (the ref reuses identical seeds across all of them, raygen.rgen:213);
  * each light triangle's stochastic estimate is an independent mean over
    shadow samples (the ref accidentally re-divides earlier triangles'
    accumulator by NUM_SHADOW_RAYS again per triangle, raygen.rgen:269-271).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from realtimeraytracer_tpu.config import RenderConfig
from realtimeraytracer_tpu.ops import rng
from realtimeraytracer_tpu.ops.intersect import BIG_T
from realtimeraytracer_tpu.ops.camera_rays import ViewportFrame, generate_rays
from realtimeraytracer_tpu.ops.ltc import fetch_ltc_params, ltc_evaluate
from realtimeraytracer_tpu.ops.shading import (
    base_color_split,
    cook_torrance_specular,
    lambert_diffuse,
)
from realtimeraytracer_tpu.ops.texture import sample_equirect
from realtimeraytracer_tpu.ops.tonemap import srgb_to_linear, tonemap
from realtimeraytracer_tpu.ops.vecmath import cross, dot, normalize
from realtimeraytracer_tpu.render.backends import TraceBackend, make_backend
from realtimeraytracer_tpu.render.surface import resolve_surface
from realtimeraytracer_tpu.scene.gpu_scene import GPUScene


def _shadow_sort_key(origin, to_light, active):
    """Shadow-ray coherence key: direction-to-light octant (high 3 bits)
    then a 3D Morton code of the shadow origin.

    Tile traversal pays the UNION of each 128-ray tile's shadow shaft;
    block-pixel-order tiles mix near/far surfaces and opposite-side
    directions, so their shafts are fat.  On-chip A/B at 1080p/100k:
    occlusion traces on octant+Morton-sorted rays cost 83 ms vs 217 ms
    as-is (scripts/shadow_sort_probe.py; origin-Morton alone is 209 ms —
    the octant split is what tightens the shafts).  Inactive lanes sort to
    the end where their empty t-intervals retire whole tiles at once."""
    lo = jnp.min(jnp.where(active[:, None], origin, 1e9), axis=0)
    hi = jnp.max(jnp.where(active[:, None], origin, -1e9), axis=0)
    ext = jnp.maximum(hi - lo, 1e-6)
    q = jnp.clip((origin - lo) / ext * 31.0, 0, 31).astype(jnp.uint32)

    def spread(v):
        v = (v | (v << 8)) & jnp.uint32(0x0100FF)
        v = (v | (v << 4)) & jnp.uint32(0x010C30C3)
        v = (v | (v << 2)) & jnp.uint32(0x09249249)
        return v

    m = (spread(q[:, 0]) << 2) | (spread(q[:, 1]) << 1) | spread(q[:, 2])
    oct_ = ((to_light[:, 0] > 0).astype(jnp.uint32)
            + 2 * (to_light[:, 1] > 0).astype(jnp.uint32)
            + 4 * (to_light[:, 2] > 0).astype(jnp.uint32))
    key = (oct_ << 28) | (m & jnp.uint32(0x0FFFFFFF))
    return jnp.where(active, key, jnp.uint32(0xFFFFFFFF))


class SampleRadiance(NamedTuple):
    """Per-ray output of one primary-sample shade (raygen's accumulators)."""

    analytic: jnp.ndarray    # (R, 3)
    shadowed: jnp.ndarray    # (R, 3)
    unshadowed: jnp.ndarray  # (R, 3)
    normal: jnp.ndarray      # (R, 3) — zero on miss/light hits
    position: jnp.ndarray    # (R, 3)


def shade_sample(
    gpu: GPUScene,
    cfg: RenderConfig,
    origins: jnp.ndarray,
    dirs: jnp.ndarray,
    pixel_seed: jnp.ndarray,   # (R,) uint32: px*733 + py*1933 + frame
    backend: TraceBackend,
    sample_index: int = 0,
    lod_scale=None,
    hint_state: dict | None = None,
) -> SampleRadiance:
    R = origins.shape[0]
    # common="origin": generate_rays primaries all share the pinhole camera
    # position, which lets the pallas kernel collapse the origin-dot
    # families to per-triangle rows (~10% at 1080p); other backends ignore
    # the hint.  Callers feeding NON-pinhole rays into shade_sample must
    # not exist (the megakernel is the primary-ray shader by contract).
    hit = backend.closest(origins, dirs, cfg.t_min, cfg.t_max,
                          common="origin")
    surf = resolve_surface(
        gpu, hit, origins, dirs,
        lod_scale=lod_scale if cfg.mip_textures else None,
        aniso_taps=cfg.aniso_taps)

    # --- miss: equirect HDRI environment (miss.rmiss:21-26) --------------
    env = srgb_to_linear(sample_equirect(gpu.hdri, dirs)) * gpu.env_color
    base = (
        jnp.where(surf.missed[:, None], env, 0.0)
        + jnp.where(surf.hit_light[:, None], surf.light_color, 0.0)
    )

    # --- surface shading set-up (raygen.rgen:124-157) --------------------
    p = surf.position
    n = surf.normal
    view = normalize(origins - p)
    m_diffuse, m_specular = base_color_split(surf.albedo, surf.metallic)
    ndotv = jnp.clip(dot(n, view), 0.0, 1.0)
    minv, t2 = fetch_ltc_params(gpu.ltc1, gpu.ltc2, surf.roughness, ndotv,
                                fast=cfg.fast_lut)
    fresnel = (
        m_specular * t2[..., 0:1] + (1.0 - m_specular) * t2[..., 1:2]
    )  # (R, 3) — raygen.rgen:280-281
    shadow_origin = p + n * cfg.shadow_origin_offset
    lam = lambert_diffuse(surf.albedo, surf.metallic)  # (R, 3)

    num_s = cfg.shadow_rays

    # Shared light-shading geometry helpers: used by BOTH the per-light
    # shade step and the batched-occlusion prepass below, so the two are
    # structurally identical ops (XLA CSEs the duplicate computations).
    def light_geom(p0, p1, p2):
        nl = cross(p2 - p1, p0 - p1)
        area = jnp.sqrt(jnp.maximum(dot(nl, nl), 0.0)) * 0.5
        inv_pdf = area * cfg.light_pdf_scale          # 1/pdf, pdf=1/(a*0.7)
        return normalize(nl), inv_pdf

    def light_active(nlu, p0, ltwo, lvalid):
        front = dot(nlu[None, :], p - p0[None, :]) >= 0.0          # (R,)
        return (lvalid & (ltwo | front)) & surf.valid              # (R,)

    def light_samples(p0, p1, p2, ps, seeds, lt_idx):
        """num_s uniform triangle samples -> [(dist, dir)]; the
        reference's barycentric sampling (raygen.rgen:213-219)."""
        samp = []
        for s in range(num_s):
            seed = (
                seeds
                + jnp.uint32(s)
                + lt_idx.astype(jnp.uint32) * jnp.uint32(7919)
                + jnp.uint32(sample_index * 15485863)
            )
            r1 = rng.uniform(seed)
            r2 = rng.uniform(seed + jnp.uint32(100))
            over = r1 + r2 > 1.0
            r1 = jnp.where(over, 1.0 - r1, r1)
            r2 = jnp.where(over, 1.0 - r2, r2)
            lpos = (
                p0[None, :]
                + r1[:, None] * (p1 - p0)[None, :]
                + r2[:, None] * (p2 - p0)[None, :]
            )                                                      # (R, 3)
            delta = lpos - ps
            dist = jnp.sqrt(jnp.maximum(jnp.sum(delta * delta, -1), 1e-20))
            samp.append((dist, delta / dist[..., None]))
        return samp

    # --- per-light-triangle loop (raygen.rgen:164-285), scanned ----------
    def light_tri_step(carry, lt, occ_override=None, hint_key=None):
        analytic_a, shadowed_a, unshadowed_a = carry
        (p0, p1, p2, lcolor, lintensity, ltwo, lvalid, lt_idx) = lt

        nlu, inv_pdf = light_geom(p0, p1, p2)
        active = light_active(nlu, p0, ltwo, lvalid)               # (R,)
        active_f = active.astype(jnp.float32)[:, None]

        # Shadow-ray reordering (see _shadow_sort_key): ONE argsort per
        # light triangle, ONE wide-row pack gather in, ONE gather out —
        # then all num_s samples trace AND shade in sorted order.  The
        # per-ray RNG seed rides with the ray (bitcast into the packed
        # row) so results are bit-identical to the unsorted path.
        # Per-ray-culling backends (hier/hybrid) are immune to tile shaft
        # fatness — sorting buys nothing and the permutes cost ~30 ms per
        # light (PERF.md r3), so skip.
        use_sort = (cfg.sort_shadows and R >= cfg.sort_shadows_min_rays
                    and not backend.perray_cull)
        if use_sort:
            centroid = (p0 + p1 + p2) * (1.0 / 3.0)
            key = _shadow_sort_key(shadow_origin, centroid[None, :] - p,
                                   active)
            order = jnp.argsort(key)
            inv_order = jnp.argsort(order)
            packed = jnp.concatenate([
                p, n, view, lam, m_specular,
                surf.roughness[:, None],
                jax.lax.bitcast_convert_type(pixel_seed, jnp.float32)[:, None],
                active.astype(jnp.float32)[:, None],
            ], axis=1)[order]                                      # (R, 18)
            ps, ns, views = packed[:, 0:3], packed[:, 3:6], packed[:, 6:9]
            lams, m_specs = packed[:, 9:12], packed[:, 12:15]
            roughs = packed[:, 15]
            seeds = jax.lax.bitcast_convert_type(packed[:, 16], jnp.uint32)
            actives = packed[:, 17] > 0.5
            sos = ps + ns * cfg.shadow_origin_offset
        else:
            ps, ns, views, lams = p, n, view, lam
            m_specs, roughs = m_specular, surf.roughness
            seeds, actives, sos = pixel_seed, active, shadow_origin

        # Stochastic samples: python-unrolled over S so every tensor stays
        # (R, 3) / (R,).  (R, S, 3) shapes pad BOTH minor dims on TPU
        # (1->8, 3->128 = up to 340x layout blow-up in the loop body).
        # Sample geometry is precomputed so occlusion can resolve ahead of
        # the shading math: either injected by the frame-wide batched
        # trace (occ_override) or by a backend's fused multi-segment query
        # (backend.occluded_multi).
        samp = light_samples(p0, p1, p2, ps, seeds, lt_idx)

        occ_pre = occ_override
        if occ_pre is None and backend.occluded_multi is not None and num_s > 1:
            t_lo = jnp.where(actives, cfg.t_min, BIG_T)
            occ_pre = backend.occluded_multi(
                sos, [sd for _, sd in samp], t_lo,
                [jnp.where(actives, dist - cfg.shadow_ray_margin, -BIG_T)
                 for dist, _ in samp])

        shadowed_sum = jnp.zeros_like(ps)
        unshadowed_sum = jnp.zeros_like(ps)
        for s in range(num_s):
            dist, sdir = samp[s]

            # Forward shadow segments (surface -> light, margin at the
            # light end), exactly the reference's terminateOnFirstHit rays
            # (raygen.rgen:226-241).  On-chip A/B at 1080p/100k: forward
            # correct-segment traces cost ~2.6x LESS than the equivalent
            # light-end-origin parameterization (the surface-adjacent
            # segment end is unavoidable; ragged light-side ORIGINS
            # additionally inflate every tile's cull box).  INACTIVE lanes
            # (miss/light hits, back side of a one-sided light — their
            # contribution is zeroed below either way) get an empty
            # [BIG, -BIG) interval so the traversal retires them at once
            # instead of tracing garbage segments through the scene
            # (measured ~40% of the trace cost at 2/3 hit fraction).
            if occ_pre is not None:
                occ = occ_pre[s]
            else:
                span = dist - cfg.shadow_ray_margin
                t_lo = jnp.where(actives, cfg.t_min, BIG_T)
                t_hi = jnp.where(actives, span, -BIG_T)
                # Shadow-hint chaining (hier_backend r5): a light's
                # stochastic samples share per-tile dominant occluders
                # (measured 93% top-2 coverage, lossless across samples),
                # so each trace warm-starts from the previous one's hint
                # blocks.  Chains across primary samples too (the dict
                # threads through render_components' sample loop).
                # Sorted-path rays are light-local permutations, which
                # only per-light chaining would match — but hinted
                # backends are per-ray-culling, which skip the sort.
                use_hints = (hint_state is not None and hint_key is not None
                             and backend.occluded_hinted is not None
                             and not use_sort)
                if use_hints:
                    occ, new_h = backend.occluded_hinted(
                        sos, sdir, t_lo, t_hi,
                        hints=hint_state.get(hint_key))
                    hint_state[hint_key] = new_h
                else:
                    occ = backend.occluded(sos, sdir, t_lo, t_hi)
            lit = jnp.where(occ, 0.0, 1.0)[:, None]

            ndotl = jnp.maximum(jnp.sum(ns * sdir, -1), 0.1)       # (R,)
            spec = cook_torrance_specular(
                views, sdir, ns, roughs, m_specs
            )                                                      # (R, 3)
            brdf = spec + lams
            atten = 1.0 / jnp.maximum(dist * dist, 1e-20)
            radiance = (
                lcolor[None, :]
                * lintensity
                * (ndotl * atten)[:, None]
                * cfg.sampled_gain
            )
            contrib = brdf * radiance * inv_pdf
            shadowed_sum = shadowed_sum + lit * contrib
            unshadowed_sum = unshadowed_sum + contrib
            # None = auto: fence exactly when the alpha ladder is active
            # (render_pipeline resolves alpha_test=None before this).
            if (cfg.serialize_shadow_samples
                    if cfg.serialize_shadow_samples is not None
                    else bool(cfg.alpha_test)):
                # Memory fence between stochastic samples: the alpha
                # re-trace ladder holds ~7 closest traces' worth of
                # (Ts, 8, 128) buffers per occlusion query, and XLA's
                # scheduler happily overlaps QUERIES until the composed
                # frame exhausts HBM at reference scale (r5: the 120k-tri
                # instanced flagship OOM'd at 1080p).  The barrier bounds
                # the live set to one query per step; semantics unchanged.
                shadowed_sum, unshadowed_sum = jax.lax.optimization_barrier(
                    (shadowed_sum, unshadowed_sum))
        if use_sort:
            both = jnp.concatenate(
                [shadowed_sum, unshadowed_sum], axis=1)[inv_order]
            shadowed_sum, unshadowed_sum = both[:, 0:3], both[:, 3:6]
        shadowed_s = shadowed_sum * (1.0 / max(num_s, 1))
        unshadowed_s = unshadowed_sum * (1.0 / max(num_s, 1))

        # Analytic LTC (raygen.rgen:277-283); None = identity Minv (diffuse).
        two_b = jnp.broadcast_to(ltwo, (R,))
        diffuse = ltc_evaluate(n, view, p, None, p0, p1, p2, nlu, two_b,
                               gpu.ltc2, fast=cfg.fast_lut)
        specular = ltc_evaluate(n, view, p, minv, p0, p1, p2, nlu, two_b,
                                gpu.ltc2, fast=cfg.fast_lut)
        analytic_c = (
            lcolor[None, :]
            * lintensity
            * (specular[:, None] * fresnel + m_diffuse * diffuse[:, None])
            * cfg.analytic_gain
        )

        return (
            analytic_a + analytic_c * active_f,
            shadowed_a + shadowed_s * active_f,
            unshadowed_a + unshadowed_s * active_f,
        ), None

    # Carry derived from ray arrays: keeps the varying-axis type consistent
    # under shard_map (VMA rules for scan carries).
    zeros = jnp.zeros_like(origins)
    lt_count = gpu.lt_v0.shape[0]
    lts = (
        gpu.lt_v0, gpu.lt_v1, gpu.lt_v2,
        gpu.lt_color, gpu.lt_intensity, gpu.lt_two_sided, gpu.lt_valid,
        jnp.arange(lt_count, dtype=jnp.int32),
    )
    if lt_count <= 8:
        # Unrolled: scan/while bodies pin (R,3) temps into padded layouts
        # on TPU (observed 40x HBM expansion inside the loop body at 1080p).
        #
        # Batched occlusion (cfg.batch_occlusion): all lt_count*num_s
        # area-shadow segments concatenated into ONE occluded() launch —
        # identical per-tile traversal work (R is a multiple of the 128-ray
        # tile, so segments stay tile-aligned) but the XLA dispatch, ray
        # packing, and kernel spin-up are paid once.  Measured 730 ->
        # 585 ms for 6 segments at 1080p/100k on v8, bit-identical
        # (scripts/batch_occl_probe.py).  Per-ray-culling backends only:
        # tile-hull backends need the per-light octant+Morton sort, which
        # cross-light concatenation would defeat.
        occ_overrides = [None] * lt_count
        if (cfg.batch_occlusion and backend.perray_cull and num_s >= 1
                and lt_count * num_s > 1
                and R >= cfg.batch_occlusion_min_rays):
            seg_dir, seg_lo, seg_hi = [], [], []
            for i in range(lt_count):
                (p0, p1, p2, _, _, ltwo, lvalid, lt_idx) = tuple(
                    x[i] for x in lts)
                nlu, _ = light_geom(p0, p1, p2)
                active = light_active(nlu, p0, ltwo, lvalid)
                for dist, sdir in light_samples(p0, p1, p2, p, pixel_seed,
                                                lt_idx):
                    seg_dir.append(sdir)
                    seg_lo.append(jnp.where(active, cfg.t_min, BIG_T))
                    seg_hi.append(jnp.where(
                        active, dist - cfg.shadow_ray_margin, -BIG_T))
            nseg = len(seg_dir)
            occ_cat = backend.occluded(
                jnp.concatenate([shadow_origin] * nseg),
                jnp.concatenate(seg_dir),
                jnp.concatenate(seg_lo), jnp.concatenate(seg_hi))
            occ_overrides = [
                [occ_cat[(i * num_s + s) * R:(i * num_s + s + 1) * R]
                 for s in range(num_s)]
                for i in range(lt_count)]
        carry = (zeros, zeros, zeros)
        for i in range(lt_count):
            carry, _ = light_tri_step(carry, tuple(x[i] for x in lts),
                                      occ_override=occ_overrides[i],
                                      hint_key=("lt", i))
        analytic, shadowed, unshadowed = carry
    else:
        if cfg.batch_occlusion:
            from realtimeraytracer_tpu.utils import log

            # ADVICE r3: the batched-occlusion prepass exists only on the
            # unrolled small-light-count path; say so instead of silently
            # ignoring the flag.
            log.warn("batch_occlusion is ignored for scenes with more "
                     "than 8 light triangles (lax.scan path); shadow "
                     "segments trace per light as usual")
        (analytic, shadowed, unshadowed), _ = jax.lax.scan(
            light_tri_step, (zeros, zeros, zeros), lts
        )

    # --- directional sun (raygen.rgen:288-338) ---------------------------
    sun_ndotl_raw = dot(n, gpu.sun_direction[None, :])
    sun_active = surf.valid & (sun_ndotl_raw > 0.0) & (gpu.sun_intensity > 0.0)
    # Interval mask uses sun_active, not just surf.valid: lanes facing away
    # from the sun have their contribution zeroed below either way, so give
    # them empty segments and let the traversal retire them instantly.
    sun_args = (
        shadow_origin, jnp.broadcast_to(gpu.sun_direction, (R, 3)),
        jnp.where(sun_active, cfg.t_min, BIG_T),
        jnp.where(sun_active, cfg.t_max, -BIG_T),
    )
    if hint_state is not None and backend.occluded_hinted is not None:
        # Chains across primary samples (the sun direction is fixed; only
        # the sub-pixel shadow origins move between samples).
        sun_occ, sun_h = backend.occluded_hinted(
            *sun_args, hints=hint_state.get("sun"), common="dir")
        hint_state["sun"] = sun_h
    else:
        sun_occ = backend.occluded(*sun_args, common="dir")
    sun_lit = jnp.where(sun_occ, 0.0, 1.0)[:, None]
    sun_ndotl = jnp.maximum(sun_ndotl_raw, 1e-4)
    # Parity quirk: the ref clamps NdotV from *below* at 5.0 (raygen.rgen:322),
    # making the sun's specular lobe ~1/20 scale. Kept for behavioral parity.
    sun_spec = cook_torrance_specular(
        view, jnp.broadcast_to(gpu.sun_direction, (R, 3)), n,
        surf.roughness, m_specular, min_ndotv=5.0, min_ndotl=1e-4,
    )
    sun_brdf = sun_spec + lam
    sun_l = gpu.sun_color[None, :] * gpu.sun_intensity * sun_ndotl[:, None] * cfg.sun_gain
    sun_af = sun_active.astype(jnp.float32)[:, None]
    analytic = analytic + sun_brdf * sun_l * sun_af
    shadowed = shadowed + sun_lit * sun_brdf * sun_l * sun_af
    unshadowed = unshadowed + sun_brdf * sun_l * sun_af

    g_mask = surf.valid.astype(jnp.float32)[:, None]
    return SampleRadiance(
        analytic=analytic + base,
        shadowed=shadowed + base,
        unshadowed=unshadowed + base,
        normal=n * g_mask,
        position=p * g_mask,
    )


class RenderComponents(NamedTuple):
    """Tonemapped per-pixel component images (H, W, 3) + G-buffer."""

    analytic: jnp.ndarray
    shadowed: jnp.ndarray
    unshadowed: jnp.ndarray
    normal: jnp.ndarray
    position: jnp.ndarray


def render_components(
    gpu: GPUScene,
    frame: ViewportFrame,
    cfg: RenderConfig,
    frame_index: int | jnp.ndarray = 0,
    backend: TraceBackend | None = None,
) -> RenderComponents:
    """Trace primary_rays jittered samples per pixel and average — the body
    of raygen.rgen main (:71-364), minus the denoise/combine passes."""
    if backend is None:
        backend = make_backend(gpu, cfg)
    h, w = cfg.height, cfg.width
    R = h * w
    py = jnp.arange(h, dtype=jnp.uint32)[:, None]
    px = jnp.arange(w, dtype=jnp.uint32)[None, :]
    pixel_seed = (
        px * jnp.uint32(733) + py * jnp.uint32(1933) + jnp.uint32(frame_index)
    ).reshape(-1)

    # Feed backends coherent 2-D pixel blocks (see block_permutation);
    # results are un-permuted before the image reshape.
    if cfg.ray_order == "block":
        from realtimeraytracer_tpu.ops.camera_rays import block_permutation

        perm, inv_perm = block_permutation(w, h)
        pixel_seed = pixel_seed[perm]
    else:
        perm = inv_perm = None

    # Pixel angular footprint for mip LOD: world pixel step on the viewport
    # plane over the center ray's distance to that plane.
    if cfg.mip_textures:
        center = (frame.top_left + (w * 0.5) * frame.h_delta
                  + (h * 0.5) * frame.v_delta - frame.position)
        lod_scale = (jnp.linalg.norm(frame.h_delta)
                     / jnp.maximum(jnp.linalg.norm(center), 1e-6))
    else:
        lod_scale = None

    acc = None
    # Shadow-hint chain (see shade_sample): per-light + sun hint tensors
    # thread through the unrolled sample loop, so every occlusion trace
    # after the first warm-starts from its predecessor's occluders.
    hint_state = {} if backend.occluded_hinted is not None else None
    for s in range(cfg.primary_rays):
        o, d = generate_rays(frame, w, h, sample_index=s, jitter=cfg.jitter)
        if perm is not None:
            o, d = o[perm], d[perm]
        out = shade_sample(gpu, cfg, o, d, pixel_seed, backend,
                           sample_index=s, lod_scale=lod_scale,
                           hint_state=hint_state)
        acc = out if acc is None else SampleRadiance(*(a + b for a, b in zip(acc, out)))
    if inv_perm is not None:
        acc = SampleRadiance(*(x[inv_perm] for x in acc))

    inv = 1.0 / cfg.primary_rays
    tm = lambda x: tonemap(x * inv, cfg.tonemap, cfg.gamma)
    img = lambda x: x.reshape(h, w, 3)
    return RenderComponents(
        analytic=img(tm(acc.analytic)),
        shadowed=img(tm(acc.shadowed)),
        unshadowed=img(tm(acc.unshadowed)),
        normal=img(normalize(acc.normal * inv)),
        position=img(acc.position * inv),
    )


def render(scene, cfg: RenderConfig | None = None, frame_index: int = 0) -> jnp.ndarray:
    """Convenience one-call render: Scene (or GPUScene+frame) -> (H, W, 3).

    Full pipeline semantics (trace -> denoise -> ratio combine) live in
    render.pipeline; this returns that final image.
    """
    from realtimeraytracer_tpu.render.pipeline import render_pipeline

    return render_pipeline(scene, cfg, frame_index=frame_index)
