"""Instance transforms + device-side BVH refit — fully in-graph.

TPU-native equivalent of the reference's two-level instancing: BLAS per
mesh + TLAS instances with per-instance 3x4 transforms and
TLAS::updateTransform / refit (vulkan/raytracing/tlas.cppm:60-67,151-207;
geometry_builder.cppm:178-198).  Scene compilation bakes transforms into a
world-space soup (scene/scene.py) — the fast static path.  This module adds
the dynamic path: a per-OBJECT (O, 4, 4) delta-transform table applied to
the compiled scene entirely under jit, so object animation never triggers a
host rebuild:

  * vertices / normals via per-vertex object ids (gpu.vert_obj);
  * the BVH-ordered triangle soup via gpu.face_obj (already permuted);
  * light triangles via gpu.lt_obj; sphere centers via gpu.sph_obj
    (radius scales by |det R|^(1/3) — document: non-uniform sphere
    scaling is approximated by the volume-preserving uniform factor);
  * BVH node AABBs refit exactly with a sparse-table range-min/max query
    over each node's contiguous sorted-triangle subtree range
    (gpu.bvh_node_tri_start/end — topology is kept, boxes stay exact
    bounds, so traversal remains CORRECT for any motion; only traversal
    *quality* degrades when objects move far from their build positions,
    exactly like hardware refit);
  * the pallas traversal kernel's coefficient panels + subcluster AABBs
    re-packed in-graph (render/pallas_backend.pack_clusters).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from realtimeraytracer_tpu.ops.intersect import BIG_T
from realtimeraytracer_tpu.scene.gpu_scene import GPUScene


def subtree_ranges(node_first: np.ndarray, node_count: np.ndarray,
                   node_skip: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-node [start, end) sorted-triangle subtree range (host, once).

    Every node of the DFS pre-order skip-link BVH covers a CONTIGUOUS range
    of the Morton-sorted triangles; leaves carry (first, count), internal
    nodes are the union of their two children (reverse sweep — children
    follow parents in pre-order, mirroring ops/bvh.refit_numpy)."""
    n = len(node_first)
    start = np.zeros(n, np.int32)
    end = np.zeros(n, np.int32)
    for i in range(n - 1, -1, -1):
        if node_count[i] > 0:
            start[i] = node_first[i]
            end[i] = node_first[i] + node_count[i]
        else:
            left = i + 1
            right = node_skip[left]
            start[i] = start[left]
            end[i] = end[right]
    return start, end


def _range_reduce(values: jnp.ndarray, start: jnp.ndarray, end: jnp.ndarray,
                  op) -> jnp.ndarray:
    """Range-min/max query via a sparse table (binary lifting).

    values (T, 3); start/end (N,) with 1 <= end - start <= T.  Builds
    ceil(log2 T)+1 strided-reduction levels (tiny sequential passes), then
    answers every query with TWO gathers: the classic overlapping
    power-of-two blocks [s, s+2^k) and [e-2^k, e)."""
    t = values.shape[0]
    levels = [values]
    k, span = 0, 1
    while span < t:
        prev = levels[-1]
        shifted = jnp.concatenate([prev[span:], prev[-span:]], axis=0)
        levels.append(op(prev, shifted))
        span *= 2
        k += 1
    table = jnp.stack(levels)                    # (K+1, T, 3)
    length = jnp.maximum(end - start, 1)
    # floor(log2(length)) exactly for integer lengths (the +0.5 keeps exact
    # powers of two from rounding down one level too far in f32).
    ks = jnp.log2(length.astype(jnp.float32) + 0.5).astype(jnp.int32)
    lo = table[ks, start]
    hi = table[ks, jnp.maximum(end - (1 << ks), 0)]
    return op(lo, hi)


def refit_nodes(gpu: GPUScene, tv0, tv1, tv2):
    """Exact node AABBs for moved (BVH-ordered) triangles, in-graph."""
    tri_min = jnp.minimum(jnp.minimum(tv0, tv1), tv2)
    tri_max = jnp.maximum(jnp.maximum(tv0, tv1), tv2)
    node_min = _range_reduce(tri_min, gpu.bvh_node_tri_start,
                             gpu.bvh_node_tri_end, jnp.minimum)
    node_max = _range_reduce(tri_max, gpu.bvh_node_tri_start,
                             gpu.bvh_node_tri_end, jnp.maximum)
    return node_min, node_max


def apply_transforms(gpu: GPUScene, obj_mats: jnp.ndarray) -> GPUScene:
    """Apply a per-object (O, 4, 4) transform table to a compiled scene.

    Pure function of jnp arrays — jit it, scan it, differentiate through
    it.  Transforms compose on top of whatever was baked at compile
    (identity rows = static objects)."""
    if gpu.vert_obj is None:
        raise ValueError("scene was compiled without instance-transform "
                         "tables; recompile with this version")
    obj_mats = jnp.asarray(obj_mats, jnp.float32)
    rot = obj_mats[:, :3, :3]                    # (O, 3, 3)
    trn = obj_mats[:, :3, 3]                     # (O, 3)
    # Normal matrix: inverse-transpose of the linear part.
    nrm_mat = jnp.transpose(jnp.linalg.inv(rot), (0, 2, 1))

    def xf_points(pts, obj_ids):
        m = rot[obj_ids]                         # (P, 3, 3)
        return jnp.einsum("pij,pj->pi", m, pts) + trn[obj_ids]

    def xf_normals(nrm, obj_ids):
        out = jnp.einsum("pij,pj->pi", nrm_mat[obj_ids], nrm)
        n = jnp.linalg.norm(out, axis=-1, keepdims=True)
        return out / jnp.maximum(n, 1e-20)

    vertices = xf_points(gpu.vertices, gpu.vert_obj)
    normals = xf_normals(gpu.normals, gpu.vert_obj)

    updates = dict(vertices=vertices, normals=normals)

    if gpu.num_light_tris and gpu.lt_obj is not None:
        updates.update(
            lt_v0=xf_points(gpu.lt_v0, gpu.lt_obj),
            lt_v1=xf_points(gpu.lt_v1, gpu.lt_obj),
            lt_v2=xf_points(gpu.lt_v2, gpu.lt_obj),
        )
    if gpu.num_spheres:
        scale = jnp.abs(jnp.linalg.det(rot)) ** (1.0 / 3.0)
        updates.update(
            sph_center=xf_points(gpu.sph_center, gpu.sph_obj),
            sph_radius=gpu.sph_radius * scale[gpu.sph_obj],
        )

    if gpu.has_bvh:
        fo = gpu.face_obj                        # already BVH-ordered
        tv0 = xf_points(gpu.bvh_tri_v0, fo)
        tv1 = xf_points(gpu.bvh_tri_v1, fo)
        tv2 = xf_points(gpu.bvh_tri_v2, fo)
        updates.update(bvh_tri_v0=tv0, bvh_tri_v1=tv1, bvh_tri_v2=tv2)
        if gpu.bvh_node_tri_start is not None:
            node_min, node_max = refit_nodes(gpu, tv0, tv1, tv2)
            updates.update(bvh_node_min=node_min, bvh_node_max=node_max)
        out = gpu._replace(**updates)
        # Re-derive the traversal kernel's resident panels + subcluster
        # boxes from the moved soup (in-graph twin of the compile-time
        # precompute).
        if gpu.pallas_panels is not None:
            from realtimeraytracer_tpu.render.pallas_backend import (
                pack_clusters)

            panels, lo, hi = pack_clusters(out)
            out = out._replace(pallas_panels=panels, pallas_cl_min=lo,
                               pallas_cl_max=hi)
        if gpu.q_panels is not None:
            # The SAH-repacked v9 panels (ops/repack.py) are a host-side
            # precompute over the OLD geometry; drop them so the quarter
            # kernel falls back to the freshly repacked shared panels.
            out = out._replace(q_panels=None, q_cl_min=None, q_cl_max=None,
                               q_group_off=None)
        return out
    return gpu._replace(**updates)


def identity_transforms(gpu: GPUScene) -> jnp.ndarray:
    """(O, 4, 4) identity table sized to the scene's object count."""
    o = gpu.obj_color.shape[0]
    return jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (o, 4, 4))


def translate(mat_table: jnp.ndarray, obj_id: int, offset) -> jnp.ndarray:
    """Functional helper: return the table with obj_id translated."""
    offset = jnp.asarray(offset, jnp.float32)
    return mat_table.at[obj_id, :3, 3].add(offset)


def apply_instance_transforms(gpu: GPUScene,
                              transforms: jnp.ndarray) -> GPUScene:
    """Move instances of a SHARED-geometry scene, fully in-graph.

    transforms: (I, 4, 4) mesh->world matrices (same instance order as
    compile).  Because instancing keeps geometry in mesh space, animation
    touches only the tiny per-instance tables: forward/inverse rows and
    the (instance, super) world AABBs — no vertex transform, no panel
    re-pack, no BVH refit.  This is the TLAS::updateTransform/refit
    capability (tlas.cppm:151-207) at its natural cost.

    Light/sphere geometry is not instance-driven here; use
    apply_transforms on baked scenes to animate those.
    """
    if not gpu.instanced:
        raise ValueError("apply_instance_transforms needs an instanced "
                         "scene (compile with MeshInstance objects)")
    t = jnp.asarray(transforms, jnp.float32)
    fwd = jnp.concatenate(
        [t[:, :3, :3].reshape(-1, 9), t[:, :3, 3]], axis=1)
    inv_m = jnp.linalg.inv(t)
    inv = jnp.concatenate(
        [inv_m[:, :3, :3].reshape(-1, 9), inv_m[:, :3, 3]], axis=1)

    # World AABB per pair: transform the 8 mesh-space corners.
    pm = gpu.pair_mesh_aabb                       # (P, 6)
    pinst = gpu.pair_tab[:, 0]
    pt = t[jnp.clip(pinst, 0, t.shape[0] - 1)]    # (P, 4, 4)
    corners = jnp.stack([
        jnp.stack([pm[:, 3 * (i & 1)], pm[:, 1 + 3 * ((i >> 1) & 1)],
                   pm[:, 2 + 3 * ((i >> 2) & 1)]], axis=-1)
        for i in range(8)
    ], axis=1)                                    # (P, 8, 3)
    wc = jnp.einsum("pij,pcj->pci", pt[:, :3, :3], corners) + pt[:, None, :3, 3]
    valid = (gpu.pair_tab[:, 3] == 1)[:, None]
    lo = jnp.where(valid, wc.min(axis=1), BIG_T)
    hi = jnp.where(valid, wc.max(axis=1), -BIG_T)
    pp = gpu.pair_panel.shape[0]
    panel = jnp.concatenate([
        lo.reshape(pp, 128, 3).transpose(0, 2, 1),
        hi.reshape(pp, 128, 3).transpose(0, 2, 1),
        jnp.zeros((pp, 2, 128), jnp.float32),
    ], axis=1)
    return gpu._replace(inst_fwd=fwd, inst_inv=inv, pair_panel=panel)
