"""Scene container and scene compilation (host scene -> GPUScene).

TPU-native analogue of the reference's scene-compilation layer
(app/setup/create_scene.cppm:29-215 + geometry_builder.cppm:29-212): collect
lights then objects into one global vertex/index pool (lights first — the
ordering carries semantic weight, tlas.cppm:77-82), bake transforms, build
the object/light tables, pack textures, and attach the LTC LUTs.  The output
is a GPUScene pytree of jnp arrays rather than Vulkan buffers + descriptor
sets.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Sequence

import jax.numpy as jnp
import numpy as np

from realtimeraytracer_tpu.scene.camera import Camera
from realtimeraytracer_tpu.scene.geometry import MeshInstance, Sphere, TriangleMesh
from realtimeraytracer_tpu.scene.gpu_scene import GPUScene
from realtimeraytracer_tpu.scene.lights import AreaLight, DirectionalLight
from realtimeraytracer_tpu.scene.materials import Material
from realtimeraytracer_tpu.utils import log

_ASSET_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "assets")

_LTC_CACHE: dict[str, np.ndarray] = {}


def load_ltc_tables() -> tuple[np.ndarray, np.ndarray]:
    """The two 64x64x4 LTC LUTs (see scripts/extract_ltc_luts.py; uploaded
    as textures 0/1 by the reference at create_scene.cppm:162-214)."""
    if "ltc1" not in _LTC_CACHE:
        _LTC_CACHE["ltc1"] = np.load(os.path.join(_ASSET_DIR, "ltc_1.npy"))
        _LTC_CACHE["ltc2"] = np.load(os.path.join(_ASSET_DIR, "ltc_2.npy"))
    return _LTC_CACHE["ltc1"], _LTC_CACHE["ltc2"]


def _transform_points(mat: np.ndarray, pts: np.ndarray) -> np.ndarray:
    return pts @ mat[:3, :3].T + mat[:3, 3]


def _transform_normals(mat: np.ndarray, nrm: np.ndarray) -> np.ndarray:
    nmat = np.linalg.inv(mat[:3, :3]).T
    out = nrm @ nmat.T
    n = np.linalg.norm(out, axis=1, keepdims=True)
    return out / np.maximum(n, 1e-20)


@dataclasses.dataclass
class Scene:
    """A host-side scene: camera + objects + lights + environment."""

    camera: Camera = dataclasses.field(default_factory=Camera)
    meshes: list[TriangleMesh] = dataclasses.field(default_factory=list)
    instances: list[MeshInstance] = dataclasses.field(default_factory=list)
    spheres: list[Sphere] = dataclasses.field(default_factory=list)
    area_lights: list[AreaLight] = dataclasses.field(default_factory=list)
    sun: DirectionalLight | None = None
    hdri: np.ndarray | None = None          # (H, W, 3) linear float
    env_color: tuple[float, float, float] = (0.0, 0.0, 0.0)
    textures: list[np.ndarray] = dataclasses.field(default_factory=list)

    # -- building ----------------------------------------------------------
    def add(self, *items) -> "Scene":
        for it in items:
            if isinstance(it, MeshInstance):
                self.instances.append(it)
            elif isinstance(it, TriangleMesh):
                self.meshes.append(it)
            elif isinstance(it, Sphere):
                self.spheres.append(it)
            elif isinstance(it, AreaLight):
                self.area_lights.append(it)
            elif isinstance(it, DirectionalLight):
                self.sun = it
            else:
                raise TypeError(f"cannot add {type(it)} to Scene")
        return self

    def add_instances(self, mesh: TriangleMesh, transforms) -> "Scene":
        """Instance one shared mesh at each (4, 4) transform
        (geometry_builder.cppm:178-198 / tlas.cppm:60-67 parity)."""
        for t in transforms:
            self.instances.append(
                MeshInstance(mesh=mesh,
                             transform=np.asarray(t, np.float32)))
        return self

    def add_texture(self, image: np.ndarray) -> int:
        """Register a texture (H, W, C) float [0,1]; returns its index."""
        img = np.asarray(image, np.float32)
        if img.ndim == 2:
            img = img[..., None]
        if img.shape[-1] == 1:
            img = np.repeat(img, 4, axis=-1)
        elif img.shape[-1] == 3:
            img = np.concatenate([img, np.ones_like(img[..., :1])], axis=-1)
        self.textures.append(img)
        return len(self.textures) - 1

    # -- compilation -------------------------------------------------------
    def compile(self, bvh_leaf_size: int = 4,
                bvh_threshold: int = 64,
                bake_instances: bool = False) -> GPUScene:
        """Compile to a GPUScene. Builds the LBVH when the soup exceeds
        bvh_threshold triangles (brute force wins below that).

        Scenes holding MeshInstance objects compile to the SHARED-geometry
        form (one traversal-panel set per unique mesh, per-instance
        transforms — geometry_builder.cppm:178-198 + tlas.cppm:60-67
        parity) traced by render/hier_backend.py.  bake_instances=True
        instead expands every instance into a world-space copy and runs
        the classic path (the golden-test oracle for the instanced form,
        at N x memory).
        """
        if self.instances and not bake_instances:
            return self._compile_instanced()
        if self.instances and bake_instances:
            import copy as _copy

            baked = _copy.copy(self)
            baked.meshes = list(self.meshes)
            baked.instances = []
            for inst in self.instances:
                m = inst.mesh
                baked.meshes.append(TriangleMesh(
                    vertices=m.vertices, faces=m.faces, normals=m.normals,
                    uvs=m.uvs, material=inst.material or m.material,
                    transform=np.asarray(inst.transform, np.float32)
                    @ m.transform,
                    name=inst.name or m.name))
            return baked.compile(bvh_leaf_size, bvh_threshold)
        verts, norms, uvs, faces, face_obj, vert_obj = [], [], [], [], [], []
        obj_rows: list[tuple] = []
        lt_v0, lt_v1, lt_v2, lt_col, lt_int, lt_two, lt_obj = \
            [], [], [], [], [], [], []

        vtx_base = 0

        def push_mesh(mesh: TriangleMesh, obj_id: int, xform: np.ndarray):
            nonlocal vtx_base
            v = _transform_points(xform, mesh.vertices)
            n = _transform_normals(xform, mesh.normals)
            verts.append(v.astype(np.float32))
            norms.append(n.astype(np.float32))
            uvs.append(mesh.uvs.astype(np.float32))
            faces.append(mesh.faces.astype(np.int32) + vtx_base)
            face_obj.append(np.full(len(mesh.faces), obj_id, np.int32))
            vert_obj.append(np.full(len(v), obj_id, np.int32))
            vtx_base += len(v)
            return v

        def _tex_id(ref) -> int:
            if ref is None:
                return -1
            if isinstance(ref, int):
                return ref
            raise ValueError(
                f"texture path {ref!r} not resolved — register with add_texture "
                "or load via scene.obj_loader.load_obj_scene")

        def mat_row(mat: Material, is_light: int, color=None):
            c = color if color is not None else mat.color
            return (
                np.asarray(c, np.float32),
                np.float32(mat.specular),
                np.float32(mat.metallic),
                np.int32(is_light),
                np.array(
                    [_tex_id(mat.color_map), _tex_id(mat.specular_map),
                     _tex_id(mat.metallic_map), _tex_id(mat.opacity_map)],
                    np.int32,
                ),
            )

        # Lights first (ordering parity: tlas.cppm:77-82).
        for li, light in enumerate(self.area_lights):
            obj_id = len(obj_rows)
            obj_rows.append(mat_row(Material(), is_light=1, color=light.color))
            v = push_mesh(light.mesh, obj_id, light.transform @ light.mesh.transform)
            f = light.mesh.faces
            lt_v0.append(v[f[:, 0]]); lt_v1.append(v[f[:, 1]]); lt_v2.append(v[f[:, 2]])
            lt_col.append(np.tile(np.asarray(light.color, np.float32), (len(f), 1)))
            lt_int.append(np.full(len(f), light.intensity, np.float32))
            lt_two.append(np.full(len(f), bool(light.two_sided)))
            lt_obj.append(np.full(len(f), obj_id, np.int32))

        for mesh in self.meshes:
            obj_id = len(obj_rows)
            obj_rows.append(mat_row(mesh.material, is_light=0))
            push_mesh(mesh, obj_id, mesh.transform)

        sph_center, sph_radius, sph_obj = [], [], []
        for sph in self.spheres:
            obj_id = len(obj_rows)
            obj_rows.append(mat_row(sph.material, is_light=0))
            c = _transform_points(sph.transform, np.asarray([sph.center], np.float32))[0]
            sph_center.append(c)
            sph_radius.append(np.float32(sph.radius))
            sph_obj.append(np.int32(obj_id))

        def cat(parts, empty_shape, dtype=np.float32):
            if parts:
                return np.concatenate(parts).astype(dtype)
            return np.zeros(empty_shape, dtype)

        vertices = cat(verts, (0, 3))
        normals = cat(norms, (0, 3))
        uv_arr = cat(uvs, (0, 2))
        faces_arr = cat(faces, (0, 3), np.int32)
        face_obj_arr = cat(face_obj, (0,), np.int32)
        vert_obj_arr = cat(vert_obj, (0,), np.int32)

        if len(faces_arr) == 0:
            # Sphere-only / empty scenes: pad one degenerate triangle so no
            # downstream gather sees a zero-extent soup (it can never hit —
            # its Moller-Trumbore determinant is 0).
            vertices = np.zeros((3, 3), np.float32)
            normals = np.tile(np.array([[0, 0, 1]], np.float32), (3, 1))
            uv_arr = np.zeros((3, 2), np.float32)
            faces_arr = np.array([[0, 1, 2]], np.int32)
            face_obj_arr = np.zeros(1, np.int32)
            vert_obj_arr = np.zeros(3, np.int32)

        if obj_rows:
            oc = np.stack([r[0] for r in obj_rows])
            osp = np.stack([r[1] for r in obj_rows])
            om = np.stack([r[2] for r in obj_rows])
            ol = np.stack([r[3] for r in obj_rows])
            ot = np.stack([r[4] for r in obj_rows])
        else:
            oc = np.zeros((1, 3), np.float32); osp = np.zeros(1, np.float32)
            om = np.zeros(1, np.float32); ol = np.zeros(1, np.int32)
            ot = -np.ones((1, 4), np.int32)

        n_lt = sum(len(x) for x in lt_v0)
        if n_lt:
            ltv0 = cat(lt_v0, (0, 3)); ltv1 = cat(lt_v1, (0, 3)); ltv2 = cat(lt_v2, (0, 3))
            ltc = cat(lt_col, (0, 3)); lti = cat(lt_int, (0,)); ltt = cat(lt_two, (0,), bool)
            lto = cat(lt_obj, (0,), np.int32)
            ltvld = np.ones(n_lt, bool)
        else:
            # One padded invalid entry keeps all shapes non-zero (vectorized
            # light loops then contribute exactly zero).
            ltv0 = ltv1 = ltv2 = np.zeros((1, 3), np.float32)
            ltc = np.zeros((1, 3), np.float32); lti = np.zeros(1, np.float32)
            ltt = np.zeros(1, bool); ltvld = np.zeros(1, bool)
            lto = np.zeros(1, np.int32)

        sun = self.sun
        sun_dir = (sun.normalized_direction() if sun
                   else np.zeros(3, np.float32))
        sun_col = np.asarray(sun.color if sun else (0, 0, 0), np.float32)
        sun_int = np.float32(sun.intensity if sun else 0.0)

        hdri = self.hdri
        if hdri is None:
            hdri = np.ones((1, 1, 3), np.float32)
        hdri = np.asarray(hdri, np.float32)

        ltc1, ltc2 = load_ltc_tables()

        atlas, tex_size = _pack_textures(self.textures)
        if len(self.textures):
            from realtimeraytracer_tpu.ops.texture import (
                build_mip_atlas_np, pack_atlas_neighbors_np,
                pack_mip_atlas_neighbors_np)

            mip_atlas, n_levels = build_mip_atlas_np(atlas, tex_size)
            atlas_packed = pack_atlas_neighbors_np(atlas, tex_size)
            mip_packed = pack_mip_atlas_neighbors_np(mip_atlas, tex_size,
                                                     n_levels)
        else:
            mip_atlas = np.zeros((0, 16, 8, 4), np.float32)
            atlas_packed = np.zeros((0, 8, 8, 16), np.float32)
            mip_packed = np.zeros((0, 16, 8, 16), np.float32)

        # LBVH over the world-space soup (BLAS+TLAS analogue, ops/bvh.py);
        # the native C++ builder (native/bvh_build.cpp) is tried first.
        if len(faces_arr) > bvh_threshold:
            from realtimeraytracer_tpu.ops.bvh import build_bvh
            from realtimeraytracer_tpu.utils.native import native_build_bvh

            tv0 = vertices[faces_arr[:, 0]]
            tv1 = vertices[faces_arr[:, 1]]
            tv2 = vertices[faces_arr[:, 2]]
            bvh = native_build_bvh(tv0, tv1, tv2, bvh_leaf_size)
            if bvh is None:
                bvh = build_bvh(tv0, tv1, tv2, leaf_size=bvh_leaf_size)
            # Permute the face table into BVH (Morton/SAH) order so the
            # traversal backends' sorted-id IS the face id — the per-ray
            # sorted->original gather (~40 ms per 2M-ray trace on a v5e)
            # disappears from every trace call.
            perm = np.asarray(bvh.tri_id, np.int64)
            faces_arr = faces_arr[perm]
            face_obj_arr = face_obj_arr[perm]
            bvh_fields = dict(
                bvh_node_min=bvh.node_min, bvh_node_max=bvh.node_max,
                bvh_node_skip=bvh.node_skip, bvh_node_first=bvh.node_first,
                bvh_node_count=bvh.node_count,
                bvh_tri_v0=bvh.tri_v0, bvh_tri_v1=bvh.tri_v1,
                bvh_tri_v2=bvh.tri_v2,
                bvh_tri_id=np.arange(len(perm), dtype=np.int32),
            )
            # Precompile the traversal kernel's coefficient panels (host
            # numpy, once) so per-frame traces skip the ~20 ms packing.
            from realtimeraytracer_tpu.render.pallas_backend import (
                pack_clusters_np)

            panels, p_lo, p_hi = pack_clusters_np(
                bvh.tri_v0, bvh.tri_v1, bvh.tri_v2)
            bvh_fields.update(pallas_panels=panels, pallas_cl_min=p_lo,
                              pallas_cl_max=p_hi)
            # SAH-repacked v9 twin (ops/repack.py): only for VMEM-resident
            # scenes — larger ones never route to the quarter kernel.
            from realtimeraytracer_tpu.render.pallas_backend import (
                RESIDENT_CB)

            q_slots = None
            if panels.shape[0] <= RESIDENT_CB:
                from realtimeraytracer_tpu.ops.repack import build_q_panels_np

                qp, q_lo, q_hi, q_off, q_slots = build_q_panels_np(
                    bvh.tri_v0, bvh.tri_v1, bvh.tri_v2)
                if qp.shape[0] <= RESIDENT_CB:
                    bvh_fields.update(q_panels=qp, q_cl_min=q_lo,
                                      q_cl_max=q_hi, q_group_off=q_off)
                else:
                    q_slots = None
            # Conservative barycentric alpha masks (ops/alpha_mask.py):
            # per-triangle 64-bit masks aligned to the traversal panels,
            # letting the kernels reject definitely-transparent hits
            # in-visit (opacity.rahit parity at visit granularity).
            face_tex = np.asarray(ot)[face_obj_arr, 3]
            if (face_tex >= 0).any():
                from realtimeraytracer_tpu.config import RenderConfig
                from realtimeraytracer_tpu.ops.alpha_mask import (
                    build_face_masks_np, pack_amask_np)

                fmasks = build_face_masks_np(
                    uv_arr[faces_arr[:, 0]], uv_arr[faces_arr[:, 1]],
                    uv_arr[faces_arr[:, 2]], face_tex, atlas[..., 0],
                    tex_size, RenderConfig.alpha_threshold)
                bvh_fields.update(pallas_amask=pack_amask_np(
                    fmasks, panels.shape[0]))
                if q_slots is not None:
                    bvh_fields.update(q_amask=pack_amask_np(
                        fmasks, qp.shape[0], q_slots))
            # Opaque/alpha panel split for the two-phase alpha-occlusion
            # path (render/alpha.py): built only when BOTH subsets are
            # non-empty (otherwise the classic ladder stands).
            amask = np.asarray(ot)[face_obj_arr, 3] >= 0
            if bool(amask.any()) and bool((~amask).any()):
                o_p, o_lo, o_hi = pack_clusters_np(
                    bvh.tri_v0[~amask], bvh.tri_v1[~amask],
                    bvh.tri_v2[~amask])
                a_p, a_lo, a_hi = pack_clusters_np(
                    bvh.tri_v0[amask], bvh.tri_v1[amask],
                    bvh.tri_v2[amask])
                bvh_fields.update(
                    pallas_panels_opq=o_p, pallas_cl_min_opq=o_lo,
                    pallas_cl_max_opq=o_hi,
                    pallas_panels_alp=a_p, pallas_cl_min_alp=a_lo,
                    pallas_cl_max_alp=a_hi,
                    alpha_tri_id=np.nonzero(amask)[0].astype(np.int32))
            # Subtree sorted-triangle ranges per node for the in-graph
            # AABB refit (ops/refit.py).
            from realtimeraytracer_tpu.ops.refit import subtree_ranges

            ns, ne = subtree_ranges(bvh.node_first, bvh.node_count,
                                    bvh.node_skip)
            bvh_fields.update(bvh_node_tri_start=ns, bvh_node_tri_end=ne)
        else:
            z3 = np.zeros((1, 3), np.float32)
            z1 = np.zeros(1, np.int32)
            bvh_fields = dict(
                bvh_node_min=z3, bvh_node_max=z3, bvh_node_skip=z1,
                bvh_node_first=z1, bvh_node_count=z1,
                bvh_tri_v0=z3, bvh_tri_v1=z3, bvh_tri_v2=z3, bvh_tri_id=z1,
            )

        # Per-face sqrt(uv_area / world_area): the texture-LOD density used
        # by the mip path (computed AFTER the BVH face permutation so the
        # index matches prim ids).
        fv0 = vertices[faces_arr[:, 0]]
        fv1 = vertices[faces_arr[:, 1]]
        fv2 = vertices[faces_arr[:, 2]]
        world_a2 = np.linalg.norm(np.cross(fv1 - fv0, fv2 - fv0), axis=1)
        fu0 = uv_arr[faces_arr[:, 0]]
        fu1 = uv_arr[faces_arr[:, 1]]
        fu2 = uv_arr[faces_arr[:, 2]]
        e1uv, e2uv = fu1 - fu0, fu2 - fu0
        uv_a2 = np.abs(e1uv[:, 0] * e2uv[:, 1] - e1uv[:, 1] * e2uv[:, 0])
        uv_density = np.sqrt(uv_a2 / np.maximum(world_a2, 1e-20)).astype(
            np.float32)

        log.debug(
            "scene compiled: {} tris, {} verts, {} objects, {} light tris, {} spheres",
            len(faces_arr), len(vertices), len(obj_rows), n_lt, len(sph_center),
        )

        j = jnp.asarray
        return GPUScene(
            vertices=j(vertices), normals=j(normals), uvs=j(uv_arr),
            faces=j(faces_arr), face_obj=j(face_obj_arr),
            obj_color=j(oc), obj_specular=j(osp), obj_metallic=j(om),
            obj_is_light=j(ol), obj_tex=j(ot),
            sph_center=j(np.stack(sph_center) if sph_center
                         else np.zeros((0, 3), np.float32)),
            sph_radius=j(np.asarray(sph_radius, np.float32)),
            sph_obj=j(np.asarray(sph_obj, np.int32)),
            lt_v0=j(ltv0), lt_v1=j(ltv1), lt_v2=j(ltv2),
            lt_color=j(ltc), lt_intensity=j(lti), lt_two_sided=j(ltt),
            lt_valid=j(ltvld), lt_obj=j(lto), vert_obj=j(vert_obj_arr),
            sun_direction=j(sun_dir), sun_color=j(sun_col), sun_intensity=j(sun_int),
            hdri=j(hdri), env_color=j(np.asarray(self.env_color, np.float32)),
            ltc1=j(ltc1), ltc2=j(ltc2),
            tex_atlas=j(atlas), tex_size=j(tex_size),
            tex_mip_atlas=j(mip_atlas), face_uv_density=j(uv_density),
            tex_atlas_packed=j(atlas_packed),
            tex_mip_atlas_packed=j(mip_packed),
            **{k: j(v) for k, v in bvh_fields.items()},
        )



    def _compile_instanced(self) -> GPUScene:
        """Shared-geometry compile: one traversal-panel set per UNIQUE mesh
        (BLAS analogue), a per-instance transform/object table, and
        world-space (instance, supercluster) AABB pages for the v8
        kernel's top level (render/hier_backend.py).  N instances of one
        mesh cost ~1x mesh memory — geometry_builder.cppm:178-198 +
        tlas.cppm:60-67 parity.

        Pools (vertices/normals/uvs/faces) are MESH-SPACE; the global
        sorted-prim id maps 1:1 to padded face rows (each mesh's faces
        are Morton-sorted then padded to a 128-triangle block multiple),
        so backends and the surface resolver index without per-mesh
        offset tables.
        """
        from realtimeraytracer_tpu.ops.bvh import build_bvh
        from realtimeraytracer_tpu.render.hier_backend import SPAGES, SUP
        from realtimeraytracer_tpu.render.pallas_backend import (
            CB, pack_clusters_np)
        from realtimeraytracer_tpu.utils.native import native_build_bvh

        def _tex_id(ref) -> int:
            if ref is None:
                return -1
            if isinstance(ref, int):
                return ref
            raise ValueError(
                f"texture path {ref!r} not resolved — register with "
                "add_texture or load via scene.obj_loader.load_obj_scene")

        def mat_row(mat: Material, is_light: int, color=None):
            c = color if color is not None else mat.color
            return (
                np.asarray(c, np.float32),
                np.float32(mat.specular),
                np.float32(mat.metallic),
                np.int32(is_light),
                np.array(
                    [_tex_id(mat.color_map), _tex_id(mat.specular_map),
                     _tex_id(mat.metallic_map), _tex_id(mat.opacity_map)],
                    np.int32,
                ),
            )

        obj_rows: list[tuple] = []
        mesh_entries: list[tuple] = []   # (verts, norms, uvs, faces) mesh space
        inst_list: list[tuple] = []      # (mesh_index, 4x4 fwd, obj_id)
        lt_v0, lt_v1, lt_v2, lt_col, lt_int, lt_two, lt_obj = \
            [], [], [], [], [], [], []

        # Lights first (ordering parity, tlas.cppm:77-82): each light quad
        # is its own world-space "unique mesh" with an identity instance.
        for light in self.area_lights:
            obj_id = len(obj_rows)
            obj_rows.append(mat_row(Material(), is_light=1, color=light.color))
            xform = light.transform @ light.mesh.transform
            v = _transform_points(xform, light.mesh.vertices).astype(np.float32)
            n = _transform_normals(xform, light.mesh.normals).astype(np.float32)
            f = light.mesh.faces.astype(np.int32)
            mesh_entries.append((v, n, light.mesh.uvs.astype(np.float32), f))
            inst_list.append((len(mesh_entries) - 1,
                              np.eye(4, dtype=np.float32), obj_id))
            lt_v0.append(v[f[:, 0]]); lt_v1.append(v[f[:, 1]]); lt_v2.append(v[f[:, 2]])
            lt_col.append(np.tile(np.asarray(light.color, np.float32), (len(f), 1)))
            lt_int.append(np.full(len(f), light.intensity, np.float32))
            lt_two.append(np.full(len(f), bool(light.two_sided)))
            lt_obj.append(np.full(len(f), obj_id, np.int32))

        # Unique object meshes (dedup by object identity), then instances.
        uniq: dict[int, int] = {}

        def mesh_index(mesh: TriangleMesh) -> int:
            key = id(mesh)
            if key not in uniq:
                uniq[key] = len(mesh_entries)
                mesh_entries.append((
                    np.asarray(mesh.vertices, np.float32),
                    np.asarray(mesh.normals, np.float32),
                    np.asarray(mesh.uvs, np.float32),
                    np.asarray(mesh.faces, np.int32)))
            return uniq[key]

        placements = [(m, m.material, np.asarray(m.transform, np.float32))
                      for m in self.meshes]
        placements += [
            (i.mesh, i.material or i.mesh.material,
             np.asarray(i.transform, np.float32)
             @ np.asarray(i.mesh.transform, np.float32))
            for i in self.instances]
        for mesh, mat, xform in placements:
            obj_id = len(obj_rows)
            obj_rows.append(mat_row(mat, is_light=0))
            inst_list.append((mesh_index(mesh), xform, obj_id))

        sph_center, sph_radius, sph_obj = [], [], []
        for sph in self.spheres:
            obj_id = len(obj_rows)
            obj_rows.append(mat_row(sph.material, is_light=0))
            c = _transform_points(sph.transform,
                                  np.asarray([sph.center], np.float32))[0]
            sph_center.append(c)
            sph_radius.append(np.float32(sph.radius))
            sph_obj.append(np.int32(obj_id))

        # ---- per-unique-mesh pools (mesh space, Morton-sorted) ----------
        verts_p, norms_p, uvs_p, faces_p, dens_p = [], [], [], [], []
        coeff_l, clmin_l, clmax_l, blk_rows = [], [], [], []
        mesh_block_base: list[int] = []
        mesh_sup_base: list[int] = []
        mesh_sup_aabbs: list[np.ndarray] = []   # (nsup_m, 2, 3) per mesh
        vtx_base = 0
        blk_base = 0
        sup_base = 0
        for v, n, uv, f in mesh_entries:
            tv0, tv1, tv2 = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
            if len(f) > CB:
                bvh = native_build_bvh(tv0, tv1, tv2, 4)
                if bvh is None:
                    bvh = build_bvh(tv0, tv1, tv2, leaf_size=4)
                perm = np.asarray(bvh.tri_id, np.int64)
            else:
                perm = np.arange(len(f))
            fs = f[perm]
            coeff, clmin, clmax = pack_clusters_np(
                tv0[perm], tv1[perm], tv2[perm])
            nb = coeff.shape[0]
            coeff_l.append(coeff); clmin_l.append(clmin); clmax_l.append(clmax)

            fpad = nb * CB - len(fs)
            faces_p.append(np.concatenate(
                [fs + vtx_base, np.zeros((fpad, 3), np.int32)]))
            verts_p.append(v); norms_p.append(n); uvs_p.append(uv)
            # mesh-space uv density (mip LOD; instance scale approximated
            # as 1 — documented in PARITY.md)
            w2 = np.linalg.norm(np.cross(tv1[perm] - tv0[perm],
                                         tv2[perm] - tv0[perm]), axis=1)
            u0, u1, u2 = uv[fs[:, 0]], uv[fs[:, 1]], uv[fs[:, 2]]
            e1uv, e2uv = u1 - u0, u2 - u0
            uva = np.abs(e1uv[:, 0] * e2uv[:, 1] - e1uv[:, 1] * e2uv[:, 0])
            dens = np.sqrt(uva / np.maximum(w2, 1e-20)).astype(np.float32)
            dens_p.append(np.concatenate([dens, np.zeros(fpad, np.float32)]))

            bmin = clmin.reshape(nb, 4, 3).min(axis=1)
            bmax = clmax.reshape(nb, 4, 3).max(axis=1)
            nsup = -(-nb // SUP)
            saabbs = np.zeros((nsup, 2, 3), np.float32)
            for k in range(nsup):
                lo, hi = k * SUP, min((k + 1) * SUP, nb)
                row = np.zeros((8, 128), np.float32)
                row[0:3, :] = 3.0e38
                row[3:6, :] = -3.0e38
                row[0:3, : hi - lo] = bmin[lo:hi].T
                row[3:6, : hi - lo] = bmax[lo:hi].T
                blk_rows.append(row)
                saabbs[k, 0] = bmin[lo:hi].min(axis=0)
                saabbs[k, 1] = bmax[lo:hi].max(axis=0)
            mesh_sup_aabbs.append(saabbs)
            mesh_block_base.append(blk_base)
            mesh_sup_base.append(sup_base)
            vtx_base += len(v)
            blk_base += nb
            sup_base += nsup

        vertices = np.concatenate(verts_p).astype(np.float32)
        normals = np.concatenate(norms_p).astype(np.float32)
        uv_arr = np.concatenate(uvs_p).astype(np.float32)
        faces_arr = np.concatenate(faces_p).astype(np.int32)
        uv_density = np.concatenate(dens_p).astype(np.float32)
        coeff = np.concatenate(coeff_l)
        cl_min = np.concatenate(clmin_l)
        cl_max = np.concatenate(clmax_l)
        blk_panel = np.stack(blk_rows)               # (NSUP, 8, 128)

        # ---- instances + (instance, super) pairs ------------------------
        n_inst = len(inst_list)
        inst_fwd = np.zeros((n_inst, 12), np.float32)
        inst_inv = np.zeros((n_inst, 12), np.float32)
        inst_obj = np.zeros((n_inst,), np.int32)
        pair_rows = []                               # (inst, blk_panel, bbase)
        pair_aabb = []                               # (2, 3) world
        for i, (mi, xf, obj_id) in enumerate(inst_list):
            inst_fwd[i, :9] = xf[:3, :3].reshape(-1)
            inst_fwd[i, 9:] = xf[:3, 3]
            inv = np.linalg.inv(xf)
            inst_inv[i, :9] = inv[:3, :3].reshape(-1)
            inst_inv[i, 9:] = inv[:3, 3]
            inst_obj[i] = obj_id
            for k in range(mesh_sup_aabbs[mi].shape[0]):
                lo, hi = mesh_sup_aabbs[mi][k]
                corners = np.array(
                    [[x, y, z] for x in (lo[0], hi[0])
                     for y in (lo[1], hi[1]) for z in (lo[2], hi[2])],
                    np.float32)
                wc = _transform_points(xf, corners)
                # block-base in BLOCK units: the kernel's cid =
                # bbase + lane indexes coefficient panels directly.
                pair_rows.append((i, mesh_sup_base[mi] + k,
                                  mesh_block_base[mi] + k * SUP))
                pair_aabb.append((wc.min(axis=0), wc.max(axis=0)))
        n_pairs = len(pair_rows)
        if n_pairs > SPAGES * 128:
            raise ValueError(
                f"{n_pairs} (instance, supercluster) pairs exceed the "
                f"kernel's {SPAGES * 128} limit — split the scene or "
                "raise hier_backend.SPAGES")
        pp = max(1, -(-n_pairs // 128))
        pair_panel = np.zeros((pp, 8, 128), np.float32)
        pair_panel[:, 0:3, :] = 3.0e38
        pair_panel[:, 3:6, :] = -3.0e38
        pair_tab = np.zeros((pp * 128, 4), np.int32)
        pair_mesh_aabb = np.zeros((pp * 128, 6), np.float32)
        pair_mesh_aabb[:, 0:3] = 3.0e38
        pair_mesh_aabb[:, 3:6] = -3.0e38
        for p, ((i, bp, bb), (lo, hi)) in enumerate(zip(pair_rows, pair_aabb)):
            pair_panel[p // 128, 0:3, p % 128] = lo
            pair_panel[p // 128, 3:6, p % 128] = hi
            pair_tab[p] = (i, bp, bb, 1)
            mi = inst_list[i][0]
            k = bp - mesh_sup_base[mi]
            pair_mesh_aabb[p, 0:3] = mesh_sup_aabbs[mi][k, 0]
            pair_mesh_aabb[p, 3:6] = mesh_sup_aabbs[mi][k, 1]

        # ---- the rest mirrors the baked path -----------------------------
        n_lt = sum(len(x) for x in lt_v0)

        def cat(parts, empty_shape, dtype=np.float32):
            if parts:
                return np.concatenate(parts).astype(dtype)
            return np.zeros(empty_shape, dtype)

        if n_lt:
            ltv0 = cat(lt_v0, (0, 3)); ltv1 = cat(lt_v1, (0, 3))
            ltv2 = cat(lt_v2, (0, 3))
            ltc_ = cat(lt_col, (0, 3)); lti = cat(lt_int, (0,))
            ltt = cat(lt_two, (0,), bool)
            lto = cat(lt_obj, (0,), np.int32)
            ltvld = np.ones(n_lt, bool)
        else:
            ltv0 = ltv1 = ltv2 = np.zeros((1, 3), np.float32)
            ltc_ = np.zeros((1, 3), np.float32); lti = np.zeros(1, np.float32)
            ltt = np.zeros(1, bool); ltvld = np.zeros(1, bool)
            lto = np.zeros(1, np.int32)

        oc = np.stack([r[0] for r in obj_rows])
        osp = np.stack([r[1] for r in obj_rows])
        om = np.stack([r[2] for r in obj_rows])
        ol = np.stack([r[3] for r in obj_rows])
        ot = np.stack([r[4] for r in obj_rows])

        sun = self.sun
        sun_dir = (sun.normalized_direction() if sun
                   else np.zeros(3, np.float32))
        sun_col = np.asarray(sun.color if sun else (0, 0, 0), np.float32)
        sun_int = np.float32(sun.intensity if sun else 0.0)

        hdri = self.hdri
        if hdri is None:
            hdri = np.ones((1, 1, 3), np.float32)
        hdri = np.asarray(hdri, np.float32)
        ltc1, ltc2 = load_ltc_tables()
        atlas, tex_size = _pack_textures(self.textures)
        if len(self.textures):
            from realtimeraytracer_tpu.ops.texture import (
                build_mip_atlas_np, pack_atlas_neighbors_np,
                pack_mip_atlas_neighbors_np)

            mip_atlas, n_levels = build_mip_atlas_np(atlas, tex_size)
            atlas_packed = pack_atlas_neighbors_np(atlas, tex_size)
            mip_packed = pack_mip_atlas_neighbors_np(mip_atlas, tex_size,
                                                     n_levels)
        else:
            mip_atlas = np.zeros((0, 16, 8, 4), np.float32)
            atlas_packed = np.zeros((0, 8, 8, 16), np.float32)
            mip_packed = np.zeros((0, 16, 8, 16), np.float32)

        # Conservative alpha masks over the mesh pools (ops/alpha_mask.py).
        # A pool face's opacity texture is its INSTANCES' material's; when
        # instances of one mesh disagree (distinct opacity maps), the mask
        # must hold for all of them — conservatively all-ones (tex -2).
        pool_amask = None
        if len(self.textures) and any(
                int(ot[obj_id, 3]) >= 0 for _, _, obj_id in inst_list):
            from realtimeraytracer_tpu.config import RenderConfig
            from realtimeraytracer_tpu.ops.alpha_mask import (
                build_face_masks_np, pack_amask_np)

            per_mesh = [set() for _ in mesh_entries]
            for mi, _, obj_id in inst_list:
                per_mesh[mi].add(int(ot[obj_id, 3]))
            face_tex_parts = []
            for m, c in enumerate(coeff_l):
                texs = {t for t in per_mesh[m] if t >= 0}
                if not per_mesh[m] or not texs:
                    t_choice = -1                  # no opacity: all-ones
                elif len(texs) == 1 and all(t >= 0 for t in per_mesh[m]):
                    t_choice = texs.pop()
                else:
                    t_choice = -2                  # mixed: all-ones
                face_tex_parts.append(
                    np.full(c.shape[0] * CB, t_choice, np.int32))
            face_tex_pool = np.concatenate(face_tex_parts)
            fmasks = build_face_masks_np(
                uv_arr[faces_arr[:, 0]], uv_arr[faces_arr[:, 1]],
                uv_arr[faces_arr[:, 2]], face_tex_pool, atlas[..., 0],
                tex_size, RenderConfig.alpha_threshold)
            pool_amask = pack_amask_np(fmasks, coeff.shape[0])

        z3 = np.zeros((1, 3), np.float32)
        z1 = np.zeros(1, np.int32)
        log.debug(
            "instanced scene compiled: {} unique meshes, {} instances, "
            "{} pairs, {} blocks, {} light tris",
            len(mesh_entries), n_inst, n_pairs, coeff.shape[0], n_lt)

        j = jnp.asarray
        return GPUScene(
            vertices=j(vertices), normals=j(normals), uvs=j(uv_arr),
            faces=j(faces_arr),
            face_obj=j(np.zeros(len(faces_arr), np.int32)),
            obj_color=j(oc), obj_specular=j(osp), obj_metallic=j(om),
            obj_is_light=j(ol), obj_tex=j(ot),
            sph_center=j(np.stack(sph_center) if sph_center
                         else np.zeros((0, 3), np.float32)),
            sph_radius=j(np.asarray(sph_radius, np.float32)),
            sph_obj=j(np.asarray(sph_obj, np.int32)),
            lt_v0=j(ltv0), lt_v1=j(ltv1), lt_v2=j(ltv2),
            lt_color=j(ltc_), lt_intensity=j(lti), lt_two_sided=j(ltt),
            lt_valid=j(ltvld), lt_obj=j(lto),
            vert_obj=j(np.zeros(len(vertices), np.int32)),
            sun_direction=j(sun_dir), sun_color=j(sun_col),
            sun_intensity=j(sun_int),
            hdri=j(hdri), env_color=j(np.asarray(self.env_color, np.float32)),
            ltc1=j(ltc1), ltc2=j(ltc2),
            tex_atlas=j(atlas), tex_size=j(tex_size),
            tex_mip_atlas=j(mip_atlas), face_uv_density=j(uv_density),
            tex_atlas_packed=j(atlas_packed),
            tex_mip_atlas_packed=j(mip_packed),
            bvh_node_min=j(z3), bvh_node_max=j(z3), bvh_node_skip=j(z1),
            bvh_node_first=j(z1), bvh_node_count=j(z1),
            bvh_tri_v0=j(z3), bvh_tri_v1=j(z3), bvh_tri_v2=j(z3),
            bvh_tri_id=j(z1),
            pallas_panels=j(coeff), pallas_cl_min=j(cl_min),
            pallas_cl_max=j(cl_max),
            pallas_amask=(j(pool_amask) if pool_amask is not None else None),
            inst_inv=j(inst_inv), inst_fwd=j(inst_fwd), inst_obj=j(inst_obj),
            pair_panel=j(pair_panel), pair_tab=j(pair_tab),
            blk_panel=j(blk_panel), pair_mesh_aabb=j(pair_mesh_aabb),
        )


def _pack_textures(textures: Sequence[np.ndarray]) -> tuple[np.ndarray, np.ndarray]:
    """Pack variable-size textures into one padded (T, S, S, 4) stack.

    The atlas equivalent of the reference's sampler2D array with
    runtime-sized descriptor indexing (raygen.rgen:28, device feature
    descriptorIndexing at device.cppm:176-192).  S = max dimension rounded
    up to a multiple of 8; per-texture true sizes ride along for wrap math.
    """
    if not textures:
        # Zero-texture sentinel: shape[0] == 0 lets consumers skip texture
        # sampling STATICALLY (atlas gathers cost ~10 ms each per 2M rays
        # on TPU even when every texture id is -1).
        return np.zeros((0, 8, 8, 4), np.float32), np.zeros((0, 2), np.int32)
    s = max(max(t.shape[0], t.shape[1]) for t in textures)
    s = max(8, -(-s // 8) * 8)
    atlas = np.zeros((len(textures), s, s, 4), np.float32)
    sizes = np.zeros((len(textures), 2), np.int32)
    for i, t in enumerate(textures):
        h, w = t.shape[:2]
        atlas[i, :h, :w, : t.shape[2]] = t
        sizes[i] = (h, w)
    return atlas, sizes
