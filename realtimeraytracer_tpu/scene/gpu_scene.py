"""GPUScene: the compiled, device-resident, differentiable scene pytree.

TPU-native replacement for the reference's whole GPU-scene apparatus —
vertex/index device buffers + ObjectInfo/LightInfo SSBOs + TLAS instance
table (app/setup/create_scene.cppm:39-215, app/setup/geometry_builder.cppm:
50-212, vulkan/raytracing/tlas.cppm:44-149).  Instead of descriptor sets and
acceleration-structure handles, the scene is one flat NamedTuple of jnp
arrays: a pytree that can be passed through jit, sharded, and differentiated
(grads flow to vertices, material constants, and light parameters).

Conventions carried over from the reference:
  * lights-first ordering — light geometry occupies the first object slots,
    so emissive hits are detected by object id < num_lights
    (tlas.cppm:77-82, closesthit.rchit:46-50);
  * transforms are baked to world space at compile (the TLAS equivalent);
  * per-object material constants with optional texture indices
    (raycommon.glsl:29-51).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class GPUScene(NamedTuple):
    # --- triangle soup (world space; light triangles first) -------------
    vertices: jnp.ndarray     # (V, 3) f32
    normals: jnp.ndarray      # (V, 3) f32
    uvs: jnp.ndarray          # (V, 2) f32
    faces: jnp.ndarray        # (F, 3) i32
    face_obj: jnp.ndarray     # (F,)  i32 — object-table row per face

    # --- object table (lights first, then meshes, then spheres) ---------
    obj_color: jnp.ndarray    # (O, 3) f32 (linear)
    obj_specular: jnp.ndarray # (O,) f32 — roughness = 1 - specular
    obj_metallic: jnp.ndarray # (O,) f32
    obj_is_light: jnp.ndarray # (O,) i32
    obj_tex: jnp.ndarray      # (O, 4) i32 — color/spec/metal/opacity, -1=const

    # --- analytic spheres ------------------------------------------------
    sph_center: jnp.ndarray   # (S, 3) f32
    sph_radius: jnp.ndarray   # (S,) f32
    sph_obj: jnp.ndarray      # (S,) i32

    # --- light triangle table (world space, for sampling + LTC) ---------
    lt_v0: jnp.ndarray        # (LT, 3) f32
    lt_v1: jnp.ndarray
    lt_v2: jnp.ndarray
    lt_color: jnp.ndarray     # (LT, 3) f32
    lt_intensity: jnp.ndarray # (LT,) f32
    lt_two_sided: jnp.ndarray # (LT,) bool
    lt_valid: jnp.ndarray     # (LT,) bool

    # --- sun (raygen.rgen:288-292, promoted to scene data) --------------
    sun_direction: jnp.ndarray  # (3,) f32, normalized, toward the light
    sun_color: jnp.ndarray      # (3,) f32
    sun_intensity: jnp.ndarray  # () f32

    # --- environment ------------------------------------------------------
    hdri: jnp.ndarray         # (He, We, 3) f32, sRGB-ENCODED (the sampler
                              # applies miss.rmiss:26 ToLinear); (1,1,3) if none
    env_color: jnp.ndarray    # (3,) f32 multiplier on the HDRI sample

    # --- LTC lookup tables (64x64x4) -------------------------------------
    ltc1: jnp.ndarray
    ltc2: jnp.ndarray

    # --- texture atlas ----------------------------------------------------
    tex_atlas: jnp.ndarray    # (T, S, S, 4) f32, padded square stack
    tex_size: jnp.ndarray     # (T, 2) i32 actual (h, w) per texture

    # --- LBVH (ops/bvh.py; single-node dummies when not built) -----------
    bvh_node_min: jnp.ndarray   # (N, 3) f32
    bvh_node_max: jnp.ndarray   # (N, 3) f32
    bvh_node_skip: jnp.ndarray  # (N,) i32
    bvh_node_first: jnp.ndarray # (N,) i32
    bvh_node_count: jnp.ndarray # (N,) i32
    bvh_tri_v0: jnp.ndarray     # (T, 3) f32 Morton-sorted
    bvh_tri_v1: jnp.ndarray
    bvh_tri_v2: jnp.ndarray
    bvh_tri_id: jnp.ndarray     # (T,) i32 sorted -> original triangle id

    # --- precompiled traversal-kernel panels (render/pallas_backend.py;
    # scene-static, built once at compile so the per-frame trace doesn't
    # pay the ~20 ms panel packing) --------------------------------------
    pallas_panels: jnp.ndarray | None = None   # (C, PROWS, 128) f32
    pallas_cl_min: jnp.ndarray | None = None   # (C, 3) f32
    pallas_cl_max: jnp.ndarray | None = None   # (C, 3) f32

    # --- instance-transform support (ops/refit.py; TLAS::updateTransform/
    # refit parity, tlas.cppm:151-207): per-vertex / per-light-tri object
    # ids so a (O, 4, 4) transform table can be applied fully in-graph,
    # plus per-BVH-node sorted-triangle subtree ranges for the device-side
    # AABB refit. ---------------------------------------------------------
    vert_obj: jnp.ndarray | None = None        # (V,) i32
    lt_obj: jnp.ndarray | None = None          # (LT,) i32
    bvh_node_tri_start: jnp.ndarray | None = None  # (N,) i32
    bvh_node_tri_end: jnp.ndarray | None = None    # (N,) i32

    # --- mip chain of the texture atlas (ops/texture.build_mip_atlas_np;
    # trilinear path used when cfg.mip_textures; image_sampler.cppm:11-51
    # parity) + per-face sqrt(uv_area/world_area) for LOD selection. ------
    tex_mip_atlas: jnp.ndarray | None = None   # (T, 2S, S, 4) f32
    face_uv_density: jnp.ndarray | None = None # (F,) f32
    # packed-neighborhood twins (ops/texture.pack_*_neighbors_np): each
    # texel carries its 2x2 bilinear footprint with true-extent wrap, so
    # every atlas fetch is ONE gather instead of four (r4).
    tex_atlas_packed: jnp.ndarray | None = None      # (T, S, S, 16) f32
    tex_mip_atlas_packed: jnp.ndarray | None = None  # (T, 2S, S, 16) f32
    # opaque/alpha split of the traversal panels (r4, alpha scenes only):
    # occlusion phase 1 runs the RAW kernel on the opaque subset (exact
    # for opaque geometry); only lanes it leaves unresolved enter the
    # alpha re-trace ladder, against the alpha-mapped subset alone
    # (render/alpha.py).  alpha_tri_id maps subset-local sorted-tri ids
    # back to global sorted ids.
    # SAH-repacked v9 panels (ops/repack.py, r5): the same sorted order
    # with DP-chosen subcluster cut points and degenerate pad lanes —
    # tighter 32-tri cull boxes for the quarter kernel (measured -19% on
    # 1080p/100k primaries).  q_group_off maps repacked slot ids back to
    # sorted ids in-kernel (sorted = slot - off[slot // 32]), so output
    # ids stay in sorted space and v8/v7 panels stay pad-free.
    q_panels: jnp.ndarray | None = None        # (Cq, PROWS, 128) f32
    q_cl_min: jnp.ndarray | None = None        # (Cq*4, 3) f32
    q_cl_max: jnp.ndarray | None = None        # (Cq*4, 3) f32
    q_group_off: jnp.ndarray | None = None     # (Cq*4,) i32
    # Conservative per-triangle barycentric alpha masks (ops/alpha_mask.py,
    # r5), aligned with pallas_panels / q_panels slots; consulted by the
    # traversal kernels' accept test when cfg.alpha_test is on, so
    # definitely-transparent hits (foliage-card margins) never terminate a
    # trace and the re-trace ladder only fires on boundary texels.
    pallas_amask: jnp.ndarray | None = None    # (C, 2, 128) i32
    q_amask: jnp.ndarray | None = None         # (Cq, 2, 128) i32
    pallas_panels_opq: jnp.ndarray | None = None
    pallas_cl_min_opq: jnp.ndarray | None = None
    pallas_cl_max_opq: jnp.ndarray | None = None
    pallas_panels_alp: jnp.ndarray | None = None
    pallas_cl_min_alp: jnp.ndarray | None = None
    pallas_cl_max_alp: jnp.ndarray | None = None
    alpha_tri_id: jnp.ndarray | None = None          # (A,) i32

    # --- shared-geometry instancing (one BLAS-analogue per unique mesh,
    # instanced N x with per-instance transforms + object rows — parity
    # with geometry_builder.cppm:178-198 + tlas.cppm:60-67).  When these
    # are set (scene compiled with instances), `vertices/normals/faces`
    # are MESH-SPACE pools shared by all instances; traversal runs in
    # mesh space per instance (render/hier_backend.py) and the surface
    # resolver applies the per-instance transform (render/surface.py). ---
    inst_inv: jnp.ndarray | None = None      # (I, 12) f32 world->mesh [R|t]
    inst_fwd: jnp.ndarray | None = None      # (I, 12) f32 mesh->world [R|t]
    inst_obj: jnp.ndarray | None = None      # (I,) i32 object-table row
    pair_panel: jnp.ndarray | None = None    # (PP, 8, 128) f32 world AABBs
                                             # per (instance, super) pair
    pair_tab: jnp.ndarray | None = None      # (PPx128, 4) i32 rows
                                             # [inst, blk_panel, block_base, valid]
    blk_panel: jnp.ndarray | None = None     # (NSUP, 8, 128) f32 mesh-space
                                             # block AABBs per super
    pair_mesh_aabb: jnp.ndarray | None = None  # (PPx128, 6) f32 mesh-space
                                               # super AABB per pair (refit)

    @property
    def instanced(self) -> bool:
        return self.inst_inv is not None

    @property
    def has_bvh(self) -> bool:
        return self.bvh_node_min.shape[0] > 1

    @property
    def num_tris(self) -> int:
        return self.faces.shape[0]

    @property
    def num_light_tris(self) -> int:
        return self.lt_v0.shape[0]

    @property
    def num_spheres(self) -> int:
        return self.sph_center.shape[0]
