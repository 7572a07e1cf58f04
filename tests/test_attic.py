"""Attic backends: lane (skip-link) traversal equality vs brute force.

The lane traversal is retired from the production registry
(render/attic/) but remains the only consumer of ops/bvh's skip links
and the diagnostics cap-detection reference — keep its exactness
coverage alive here.
"""

import jax.numpy as jnp
import numpy as np

from realtimeraytracer_tpu import RenderConfig
from realtimeraytracer_tpu.ops import intersect
from tests.test_bvh import TestTraversalVsBruteForce, _random_rays


class TestLaneTraversal:
    _gpu_with_bvh = TestTraversalVsBruteForce._gpu_with_bvh

    def test_closest_matches(self):
        gpu = self._gpu_with_bvh(500)
        o, d = _random_rays(512)
        cfg = RenderConfig(max_traversal_steps=4096)
        from realtimeraytracer_tpu.render.attic.bvh_backend import traverse_closest

        got = traverse_closest(gpu, cfg, jnp.asarray(o), jnp.asarray(d), 1e-3, 1e4)
        want = intersect.intersect_tris_bruteforce(
            jnp.asarray(o), jnp.asarray(d), gpu.vertices, gpu.faces, 1e-3, 1e4)
        np.testing.assert_array_equal(np.asarray(got.prim_id >= 0),
                                      np.asarray(want.prim_id >= 0))
        hit = np.asarray(want.prim_id >= 0)
        np.testing.assert_allclose(np.asarray(got.t)[hit],
                                   np.asarray(want.t)[hit], rtol=1e-4)
        # Same triangle except exact-tie cases.
        same = (np.asarray(got.prim_id) == np.asarray(want.prim_id))
        assert same[hit].mean() > 0.999


    def test_occluded_matches(self):
        gpu = self._gpu_with_bvh(300, seed=3)
        o, d = _random_rays(512, seed=4)
        cfg = RenderConfig(max_traversal_steps=4096)
        from realtimeraytracer_tpu.render.attic.bvh_backend import traverse_occluded

        tmax = jnp.full((512,), 3.0)
        got = traverse_occluded(gpu, cfg, jnp.asarray(o), jnp.asarray(d), 1e-3, tmax)
        want = intersect.occluded_tris_bruteforce(
            jnp.asarray(o), jnp.asarray(d), gpu.vertices, gpu.faces, 1e-3, tmax)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
