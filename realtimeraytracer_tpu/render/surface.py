"""Surface resolution: HitRecord -> interpolated shading attributes.

The vectorized analogue of the closest-hit shader
(shaders/closesthit.rchit): light-hit detection by object id
(< num_lights — ordering parity with tlas.cppm:77-82), barycentric
interpolation of position/normal/uv (:71-77), constant-or-texture material
fetch with sRGB->linear color decode and roughness = 1 - specular
(:79-106).  Sphere prim ids (>= num_tris) resolve analytically:
normal = (p - center)/radius, spherical uv.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from realtimeraytracer_tpu.ops.intersect import HitRecord, ray_triangle
from realtimeraytracer_tpu.ops.texture import sample_atlas
from realtimeraytracer_tpu.ops.tonemap import srgb_to_linear
from realtimeraytracer_tpu.ops.vecmath import normalize
from realtimeraytracer_tpu.scene.gpu_scene import GPUScene


class Surface(NamedTuple):
    """Per-ray shading inputs (all leading dim R)."""

    valid: jnp.ndarray      # bool — true surface hit (not miss, not light)
    hit_light: jnp.ndarray  # bool
    missed: jnp.ndarray     # bool
    position: jnp.ndarray   # (R, 3)
    normal: jnp.ndarray     # (R, 3) unit
    uv: jnp.ndarray         # (R, 2)
    albedo: jnp.ndarray     # (R, 3) linear
    roughness: jnp.ndarray  # (R,)
    metallic: jnp.ndarray   # (R,)
    light_color: jnp.ndarray  # (R, 3) emissive color where hit_light
    obj_id: jnp.ndarray     # (R,)


def resolve_surface(gpu: GPUScene, hit: HitRecord,
                    origins: jnp.ndarray, dirs: jnp.ndarray,
                    lod_scale: float | None = None,
                    aniso_taps: int = 1) -> Surface:
    """lod_scale: per-unit-distance pixel footprint (world units per pixel
    at distance 1 along the ray).  When given AND the scene carries a mip
    chain, texture fetches go through the trilinear mip path
    (cfg.mip_textures; image_sampler.cppm:11-51 parity).  None = exact
    base-level bilinear (the golden-test contract vs the CPU reference)."""
    num_tris = gpu.faces.shape[0]
    num_spheres = gpu.sph_center.shape[0]

    missed = hit.prim_id < 0
    is_tri = (hit.prim_id >= 0) & (hit.prim_id < num_tris)

    # --- triangle attributes ----------------------------------------------
    # TPU gathers cost ~10-40 ms per 2M rays regardless of row width, so
    # all per-face data is packed into ONE wide row and fetched with a
    # single gather.  The row is assembled in-graph from gpu.vertices /
    # normals / uvs (F-sized gathers — 20x cheaper than R-sized ones), so
    # gradients still flow to the scene arrays.
    tid = jnp.clip(hit.prim_id, 0, max(num_tris - 1, 0))
    f0, f1, f2 = gpu.faces[:, 0], gpu.faces[:, 1], gpu.faces[:, 2]
    face_row = jnp.concatenate(
        [
            gpu.vertices[f0], gpu.vertices[f1], gpu.vertices[f2],
            gpu.normals[f0], gpu.normals[f1], gpu.normals[f2],
            gpu.uvs[f0], gpu.uvs[f1], gpu.uvs[f2],
            gpu.face_obj[:, None].astype(jnp.float32),
        ],
        axis=1,
    )                                        # (F, 25)
    g = face_row[tid]                        # (R, 25) — the one big gather
    v0, v1, v2 = g[..., 0:3], g[..., 3:6], g[..., 6:9]

    # --- shared-geometry instances: pools are MESH-SPACE; apply the
    # per-ray instance transform (tlas.cppm:60-67 parity; the traversal
    # returned hit.inst).  One (I, 21) row gather carries [fwd R|t |
    # inv R] — points by fwd, normals by inv^T (correct under non-uniform
    # scale). -------------------------------------------------------------
    inst_tr = None
    if gpu.instanced:
        n_inst = gpu.inst_fwd.shape[0]
        inst_ids = hit.inst if hit.inst is not None else jnp.zeros_like(tid)
        iid = jnp.clip(inst_ids, 0, n_inst - 1)
        trow = jnp.concatenate([gpu.inst_fwd, gpu.inst_inv[:, :9]], axis=1)
        inst_tr = trow[iid]                  # (R, 21)

        def _xf_pt(p):
            t = inst_tr
            return jnp.stack([
                t[:, 0] * p[:, 0] + t[:, 1] * p[:, 1] + t[:, 2] * p[:, 2]
                + t[:, 9],
                t[:, 3] * p[:, 0] + t[:, 4] * p[:, 1] + t[:, 5] * p[:, 2]
                + t[:, 10],
                t[:, 6] * p[:, 0] + t[:, 7] * p[:, 1] + t[:, 8] * p[:, 2]
                + t[:, 11],
            ], axis=-1)

        v0, v1, v2 = _xf_pt(v0), _xf_pt(v1), _xf_pt(v2)
    # Recompute (u, v) differentiably from the SELECTED triangle: the
    # discrete hit choice stays non-differentiable (straight-through), but
    # barycentrics/positions carry exact gradients to gpu.vertices even when
    # the traversal backend intersected constant BVH copies (SURVEY.md §7:
    # "backward must reuse forward hit records ... differentiate only the
    # continuous quantities").
    rt_t, rt_u, rt_v, rt_ok = ray_triangle(origins, dirs, v0, v1, v2)
    hit_u = jnp.where(rt_ok, rt_u, hit.u)
    hit_v = jnp.where(rt_ok, rt_v, hit.v)
    w0 = (1.0 - hit_u - hit_v)[..., None]
    w1 = hit_u[..., None]
    w2 = hit_v[..., None]
    tri_pos = v0 * w0 + v1 * w1 + v2 * w2
    nrm_raw = g[..., 9:12] * w0 + g[..., 12:15] * w1 + g[..., 15:18] * w2
    if inst_tr is not None:
        # normal' = inv^T n (inverse-transpose; inv rows at cols 12..21)
        iv = inst_tr[:, 12:21]
        nrm_raw = jnp.stack([
            iv[:, 0] * nrm_raw[:, 0] + iv[:, 3] * nrm_raw[:, 1]
            + iv[:, 6] * nrm_raw[:, 2],
            iv[:, 1] * nrm_raw[:, 0] + iv[:, 4] * nrm_raw[:, 1]
            + iv[:, 7] * nrm_raw[:, 2],
            iv[:, 2] * nrm_raw[:, 0] + iv[:, 5] * nrm_raw[:, 1]
            + iv[:, 8] * nrm_raw[:, 2],
        ], axis=-1)
    tri_nrm = normalize(nrm_raw)
    tri_uv = (
        g[..., 18:20] * w0 + g[..., 20:22] * w1 + g[..., 22:24] * w2)
    if gpu.instanced:
        # per-instance material row (the reference's per-instance
        # ObjectInfo) instead of the per-face channel.
        tri_obj = gpu.inst_obj[iid]
    else:
        tri_obj = g[..., 24].astype(jnp.int32)   # exact for < 2^24 objects

    # --- sphere attributes ------------------------------------------------
    if num_spheres:
        sid = jnp.clip(hit.prim_id - num_tris, 0, num_spheres - 1)
        sph_c = gpu.sph_center[sid]
        sph_p = origins + hit.t[..., None] * dirs
        sph_n = normalize(sph_p - sph_c)
        su = jnp.arctan2(sph_n[..., 2], sph_n[..., 0]) / 6.28318530718 + 0.5
        sv = jnp.arccos(jnp.clip(sph_n[..., 1], -1.0, 1.0)) / 3.14159265359
        sph_uv = jnp.stack([su, sv], axis=-1)
        sph_obj = gpu.sph_obj[sid]
        position = jnp.where(is_tri[..., None], tri_pos, sph_p)
        normal = jnp.where(is_tri[..., None], tri_nrm, sph_n)
        uv = jnp.where(is_tri[..., None], tri_uv, sph_uv)
        obj = jnp.where(is_tri, tri_obj, sph_obj)
    else:
        position, normal, uv, obj = tri_pos, tri_nrm, tri_uv, tri_obj

    obj = jnp.where(missed, 0, obj)

    # --- material fetch (closesthit.rchit:79-106) ------------------------
    # Same one-wide-gather discipline: the object table is packed to a
    # (O, 10) row and fetched once (flags/texture ids ride as exact small
    # floats).
    mat_row = jnp.concatenate(
        [
            gpu.obj_color,
            gpu.obj_specular[:, None], gpu.obj_metallic[:, None],
            gpu.obj_is_light[:, None].astype(jnp.float32),
            gpu.obj_tex.astype(jnp.float32),
        ],
        axis=1,
    )                                                   # (O, 10)
    m = mat_row[obj]                                    # (R, 10)
    color = m[..., 0:3]
    # Emitters use the raw material color, not texture overrides: the
    # reference's light path returns lightColor straight from the light
    # table (closesthit.rchit:46-50), never a sampled texel.
    emit_color = m[..., 0:3]
    spec = m[..., 3]
    metal = m[..., 4]
    hit_light = (~missed) & (m[..., 5] > 0)
    tex = m[..., 6:10].astype(jnp.int32)
    valid = (~missed) & (~hit_light)

    # Sanitize non-hits: a missed ray's sphere-path position is
    # origin + BIG_T*dir (overflow fodder that would leak NaNs through the
    # masked shading math below). Zero them.
    position = jnp.where(valid[..., None], position, 0.0)
    normal = jnp.where(valid[..., None], normal, 0.0)

    if gpu.tex_atlas.shape[0] > 0:
        use_mip = (lod_scale is not None and gpu.tex_mip_atlas is not None
                   and gpu.tex_mip_atlas.shape[0] > 0
                   and gpu.face_uv_density is not None)
        if use_mip:
            from realtimeraytracer_tpu.ops.texture import (
                sample_atlas_aniso, sample_atlas_mip)

            mip_packed = gpu.tex_mip_atlas_packed

            # Footprint LOD: pixel footprint in world units at the hit
            # (t * lod_scale); the grazing-angle stretch 1/cos is the
            # footprint's MAJOR axis.  Isotropic mode (aniso_taps=1)
            # blurs to the major extent (the r3 behavior); anisotropic
            # mode keeps the MINOR-axis lod and covers the major axis
            # with taps along its uv direction (image_sampler.cppm
            # maxAnisotropy parity, VERDICT r3 missing #4).
            cosang = jnp.clip(jnp.abs(jnp.sum(normal * dirs, -1)), 0.08, 1.0)
            aniso = aniso_taps > 1 and not gpu.instanced
            fp_minor = hit.t * lod_scale
            fp_world = fp_minor / cosang
            if aniso:
                # Clamp the anisotropy ratio to the tap count: each tap
                # carries a minor-footprint-sized trilinear sample, so
                # `taps` of them can only tile taps x minor of major
                # extent — below that the minor LOD aliases along-track
                # (the standard maxAnisotropy clamp).
                fp_minor = jnp.maximum(fp_minor, fp_world / aniso_taps)
            density = gpu.face_uv_density[tid] * is_tri.astype(jnp.float32)
            fp_uv = (fp_minor if aniso else fp_world) * density
            s = gpu.tex_mip_atlas.shape[2]
            num_levels = max(1, s.bit_length())

            if aniso:
                # Major-axis direction: the view direction projected into
                # the surface, mapped to uv space through the triangle's
                # edge->uv linear map (Gram solve on the real edges).
                e1 = v1 - v0
                e2 = v2 - v0
                duv1 = g[..., 20:22] - g[..., 18:20]
                duv2 = g[..., 22:24] - g[..., 18:20]
                m_w = dirs - normal * jnp.sum(dirs * normal, -1,
                                              keepdims=True)
                m_w = m_w / jnp.maximum(
                    jnp.linalg.norm(m_w, axis=-1, keepdims=True), 1e-8)
                g11 = jnp.sum(e1 * e1, -1)
                g12 = jnp.sum(e1 * e2, -1)
                g22 = jnp.sum(e2 * e2, -1)
                det = jnp.maximum(g11 * g22 - g12 * g12, 1e-12)
                b1 = jnp.sum(m_w * e1, -1)
                b2 = jnp.sum(m_w * e2, -1)
                a = (g22 * b1 - g12 * b2) / det
                b = (g11 * b2 - g12 * b1) / det
                uv_dir = a[..., None] * duv1 + b[..., None] * duv2
                # Half major-axis extent in uv: (major - minor)/2 keeps
                # the union of taps' minor-lod footprints covering the
                # stretched pixel footprint without overshooting it.
                half_w = 0.5 * jnp.maximum(fp_world - fp_minor, 0.0)
                duv_half = uv_dir * half_w[..., None]
                duv_half = jnp.where(is_tri[..., None], duv_half, 0.0)

            def fetch(channel):
                dims = gpu.tex_size[jnp.clip(tex[..., channel], 0, None)]
                texels = fp_uv * jnp.sqrt(
                    (dims[..., 0] * dims[..., 1]).astype(jnp.float32))
                lod = jnp.log2(jnp.maximum(texels, 1.0))
                if aniso:
                    return sample_atlas_aniso(
                        gpu.tex_mip_atlas, gpu.tex_size, num_levels,
                        tex[..., channel], uv[..., 0], uv[..., 1], lod,
                        duv_half, aniso_taps, packed=mip_packed)
                return sample_atlas_mip(gpu.tex_mip_atlas, gpu.tex_size,
                                        num_levels, tex[..., channel],
                                        uv[..., 0], uv[..., 1], lod,
                                        packed=mip_packed)

            texel = fetch(0)
            spec_texel = fetch(1)[..., 0]
            metal_texel = fetch(2)[..., 0]
        else:
            # Texture overrides only where a map index is >= 0.  The
            # packed-neighborhood atlas makes each fetch ONE gather
            # (bit-identical to sample_atlas); legacy GPUScene pytrees
            # without the packed twin take the 4-gather path.
            if gpu.tex_atlas_packed is not None \
                    and gpu.tex_atlas_packed.shape[0] > 0:
                from realtimeraytracer_tpu.ops.texture import (
                    sample_atlas_packed)

                fetch1 = lambda ch: sample_atlas_packed(
                    gpu.tex_atlas_packed, gpu.tex_size, tex[..., ch],
                    uv[..., 0], uv[..., 1])
            else:
                fetch1 = lambda ch: sample_atlas(
                    gpu.tex_atlas, gpu.tex_size, tex[..., ch],
                    uv[..., 0], uv[..., 1])
            texel = fetch1(0)
            spec_texel = fetch1(1)[..., 0]
            metal_texel = fetch1(2)[..., 0]
        color = jnp.where((tex[..., 0] >= 0)[..., None], texel[..., :3], color)
        spec = jnp.where(tex[..., 1] >= 0, spec_texel, spec)
        metal = jnp.where(tex[..., 2] >= 0, metal_texel, metal)

    albedo = srgb_to_linear(color)
    roughness = 1.0 - spec

    return Surface(
        valid=valid, hit_light=hit_light, missed=missed,
        position=position, normal=normal, uv=uv,
        albedo=albedo, roughness=roughness, metallic=metal,
        light_color=emit_color, obj_id=obj,
    )
