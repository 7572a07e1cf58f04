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
from realtimeraytracer_tpu.scene.geometry import Sphere, TriangleMesh
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
    spheres: list[Sphere] = dataclasses.field(default_factory=list)
    area_lights: list[AreaLight] = dataclasses.field(default_factory=list)
    sun: DirectionalLight | None = None
    hdri: np.ndarray | None = None          # (H, W, 3) linear float
    env_color: tuple[float, float, float] = (0.0, 0.0, 0.0)
    textures: list[np.ndarray] = dataclasses.field(default_factory=list)

    # -- building ----------------------------------------------------------
    def add(self, *items) -> "Scene":
        for it in items:
            if isinstance(it, TriangleMesh):
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
                bvh_threshold: int = 64) -> GPUScene:
        """Compile to a GPUScene. Builds the LBVH when the soup exceeds
        bvh_threshold triangles (brute force wins below that)."""
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
            from realtimeraytracer_tpu.ops.texture import build_mip_atlas_np

            mip_atlas, _ = build_mip_atlas_np(atlas, tex_size)
        else:
            mip_atlas = np.zeros((0, 16, 8, 4), np.float32)

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
            **{k: j(v) for k, v in bvh_fields.items()},
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
