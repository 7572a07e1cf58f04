"""LBVH build invariants + traversal equivalence with brute force.

SURVEY.md §4: LBVH invariants as unit tests; the BVH backend must agree
with the exact all-pairs intersector on closest hits and occlusion.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from realtimeraytracer_tpu.config import RenderConfig
from realtimeraytracer_tpu.ops import intersect
from realtimeraytracer_tpu.ops.bvh import build_bvh, refit_numpy, validate_bvh


def _random_soup(n, seed=0, spread=4.0):
    r = np.random.default_rng(seed)
    base = r.uniform(-spread, spread, (n, 1, 3))
    tris = base + r.normal(0, 0.3, (n, 3, 3))
    return tris[:, 0].astype(np.float32), tris[:, 1].astype(np.float32), tris[:, 2].astype(np.float32)


def _random_rays(n, seed=1, spread=6.0):
    r = np.random.default_rng(seed)
    o = r.uniform(-spread, spread, (n, 3)).astype(np.float32)
    d = r.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return o, d


class TestBuild:
    @pytest.mark.parametrize("n,leaf", [(1, 4), (5, 4), (333, 4), (1000, 8)])
    def test_invariants(self, n, leaf):
        v0, v1, v2 = _random_soup(n)
        bvh = build_bvh(v0, v1, v2, leaf_size=leaf)
        validate_bvh(bvh)
        assert (bvh.node_count <= leaf).all()
        # Root box bounds everything.
        np.testing.assert_array_less(bvh.node_min[0] - 1e-5,
                                     np.minimum(v0, np.minimum(v1, v2)).min(0) + 1e-5)

    def test_refit_tracks_moved_vertices(self):
        v0, v1, v2 = _random_soup(128)
        bvh = build_bvh(v0, v1, v2)
        moved = refit_numpy(bvh, v0 + 5.0, v1 + 5.0, v2 + 5.0)
        validate_bvh(moved)
        np.testing.assert_allclose(moved.node_min[0], bvh.node_min[0] + 5.0,
                                   rtol=1e-5)


class TestTraversalVsBruteForce:
    def _gpu_with_bvh(self, n_tris, seed=0):
        """Minimal GPUScene stand-in for the traversal functions."""
        from realtimeraytracer_tpu.scene.scene import Scene
        from realtimeraytracer_tpu.scene.geometry import TriangleMesh

        v0, v1, v2 = _random_soup(n_tris, seed)
        verts = np.concatenate([v0, v1, v2])
        faces = np.arange(3 * n_tris, dtype=np.int32).reshape(3, n_tris).T
        scene = Scene()
        scene.add(TriangleMesh(vertices=verts, faces=faces))
        return scene.compile(bvh_threshold=0)

    def test_wide_closest_matches_brute(self):
        gpu = self._gpu_with_bvh(700, seed=11)
        o, d = _random_rays(512, seed=12)
        cfg = RenderConfig(cluster_size=64, wide_tile=64, max_cluster_visits=32)
        from realtimeraytracer_tpu.render.wide_backend import wide_closest

        got = wide_closest(gpu, cfg, jnp.asarray(o), jnp.asarray(d), 1e-3, 1e4)
        want = intersect.intersect_tris_bruteforce(
            jnp.asarray(o), jnp.asarray(d), gpu.vertices, gpu.faces, 1e-3, 1e4)
        hit_w = np.asarray(want.prim_id >= 0)
        hit_g = np.asarray(got.prim_id >= 0)
        # Baldwin-Weber vs Moller-Trumbore edge epsilons: allow a tiny
        # disagreement fraction, distances must match where both hit.
        assert (hit_w != hit_g).mean() < 5e-3
        both = hit_w & hit_g
        np.testing.assert_allclose(np.asarray(got.t)[both],
                                   np.asarray(want.t)[both], rtol=1e-3)

    def test_wide_occluded_matches_brute(self):
        gpu = self._gpu_with_bvh(500, seed=13)
        o, d = _random_rays(500, seed=14)
        cfg = RenderConfig(cluster_size=64, wide_tile=64, max_cluster_visits=32)
        from realtimeraytracer_tpu.render.wide_backend import wide_occluded

        tmax = jnp.full((500,), 3.0)
        got = wide_occluded(gpu, cfg, jnp.asarray(o), jnp.asarray(d), 1e-3, tmax)
        want = intersect.occluded_tris_bruteforce(
            jnp.asarray(o), jnp.asarray(d), gpu.vertices, gpu.faces, 1e-3, tmax)
        assert (np.asarray(got) != np.asarray(want)).mean() < 5e-3

