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
                    origins: jnp.ndarray, dirs: jnp.ndarray) -> Surface:
    num_tris = gpu.faces.shape[0]
    num_spheres = gpu.sph_center.shape[0]

    missed = hit.prim_id < 0
    is_tri = (hit.prim_id >= 0) & (hit.prim_id < num_tris)

    # --- triangle attributes (gather with clamped ids; masked later) -----
    tid = jnp.clip(hit.prim_id, 0, max(num_tris - 1, 0))
    f = gpu.faces[tid]                       # (R, 3)
    # Recompute (u, v) differentiably from the SELECTED triangle: the
    # discrete hit choice stays non-differentiable (straight-through), but
    # barycentrics/positions carry exact gradients to gpu.vertices even when
    # the traversal backend intersected constant BVH copies (SURVEY.md §7:
    # "backward must reuse forward hit records ... differentiate only the
    # continuous quantities").
    rt_t, rt_u, rt_v, rt_ok = ray_triangle(
        origins, dirs, gpu.vertices[f[..., 0]], gpu.vertices[f[..., 1]],
        gpu.vertices[f[..., 2]],
    )
    hit_u = jnp.where(rt_ok, rt_u, hit.u)
    hit_v = jnp.where(rt_ok, rt_v, hit.v)
    w0 = (1.0 - hit_u - hit_v)[..., None]
    w1 = hit_u[..., None]
    w2 = hit_v[..., None]
    tri_pos = (
        gpu.vertices[f[..., 0]] * w0
        + gpu.vertices[f[..., 1]] * w1
        + gpu.vertices[f[..., 2]] * w2
    )
    tri_nrm = normalize(
        gpu.normals[f[..., 0]] * w0
        + gpu.normals[f[..., 1]] * w1
        + gpu.normals[f[..., 2]] * w2
    )
    tri_uv = (
        gpu.uvs[f[..., 0]] * w0 + gpu.uvs[f[..., 1]] * w1 + gpu.uvs[f[..., 2]] * w2
    )
    tri_obj = gpu.face_obj[tid]

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
    hit_light = (~missed) & (gpu.obj_is_light[obj] > 0)
    valid = (~missed) & (~hit_light)

    # Sanitize non-hits: a missed ray's sphere-path position is
    # origin + BIG_T*dir (overflow fodder that would leak NaNs through the
    # masked shading math below). Zero them.
    position = jnp.where(valid[..., None], position, 0.0)
    normal = jnp.where(valid[..., None], normal, 0.0)

    # --- material fetch (closesthit.rchit:79-106) ------------------------
    tex = gpu.obj_tex[obj]                              # (R, 4)
    color = gpu.obj_color[obj]
    spec = gpu.obj_specular[obj]
    metal = gpu.obj_metallic[obj]

    has_any_tex = int(gpu.tex_atlas.shape[0]) > 1 or True
    # Texture overrides only where a map index is >= 0.
    texel = sample_atlas(gpu.tex_atlas, gpu.tex_size, tex[..., 0],
                         uv[..., 0], uv[..., 1])
    color = jnp.where((tex[..., 0] >= 0)[..., None], texel[..., :3], color)
    spec_texel = sample_atlas(gpu.tex_atlas, gpu.tex_size, tex[..., 1],
                              uv[..., 0], uv[..., 1])[..., 0]
    spec = jnp.where(tex[..., 1] >= 0, spec_texel, spec)
    metal_texel = sample_atlas(gpu.tex_atlas, gpu.tex_size, tex[..., 2],
                               uv[..., 0], uv[..., 1])[..., 0]
    metal = jnp.where(tex[..., 2] >= 0, metal_texel, metal)

    albedo = srgb_to_linear(color)
    roughness = 1.0 - spec

    light_color = gpu.obj_color[obj]

    return Surface(
        valid=valid, hit_light=hit_light, missed=missed,
        position=position, normal=normal, uv=uv,
        albedo=albedo, roughness=roughness, metallic=metal,
        light_color=light_color, obj_id=obj,
    )
