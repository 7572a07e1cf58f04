"""Reference-shaped flagship scene (scenes.foliage_field, r5).

The reference ships the Bistro exterior — multi-100k tris, dozens of
textures, dense alpha foliage, instancing (application.cppm:226-250).
foliage_field composes the same asset classes at the same scale; these
tests pin the structure and golden the instanced traversal+alpha path
against the baked-copy oracle (cross-kernel: instanced v8-hier vs baked
wide, two independent traversal implementations).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from realtimeraytracer_tpu import scenes
from realtimeraytracer_tpu.config import RenderConfig
from realtimeraytracer_tpu.render.backends import make_backend


class TestStructure:
    def test_reference_scale_composition(self):
        s = scenes.foliage_field()
        assert s.effective_tris >= 100_000
        # Every asset class in one scene: textures incl. an opacity map,
        # instancing, HDRI, 2 area lights, sun.
        assert len(s.textures) >= 5
        assert any(m.material.opacity_map is not None
                   for m in [i.mesh for i in s.instances])
        assert len(s.instances) > 500
        assert s.hdri is not None
        assert len(s.area_lights) == 2 and s.sun is not None

    def test_pools_stay_resident(self):
        s = scenes.foliage_field()
        gpu = s.compile()
        assert gpu.instanced
        # The whole point of instancing: >=100k effective tris from a
        # VMEM-resident unique-mesh pool (BLAS sharing, tlas.cppm:60-67).
        assert gpu.faces.shape[0] <= 16_384
        assert gpu.pallas_panels.shape[0] <= 1024
        assert gpu.pallas_amask is not None    # alpha masks built


class TestGoldenVsBaked:
    """Instanced hier traversal + alpha ladder == baked-copy wide backend
    (independent kernels) on closest AND occlusion, exact."""

    @pytest.fixture(scope="class")
    def scenepair(self):
        s = scenes.foliage_field(target_tris=8_000)
        cfg = RenderConfig(alpha_test=True, backend="hier")
        gpu = s.compile()
        gpu_b = s.compile(bake_instances=True)
        be_i = make_backend(gpu, cfg)
        be_b = make_backend(gpu_b, cfg.replace(backend="wide"))
        return be_i, be_b

    def _rays(self, r=128):
        rng = np.random.default_rng(5)
        o = np.stack([rng.uniform(-20, 20, r), rng.uniform(6, 12, r),
                      np.full(r, 24.0)], 1).astype(np.float32)
        tgt = np.stack([rng.uniform(-20, 20, r), np.zeros(r),
                        rng.uniform(-20, 20, r)], 1).astype(np.float32)
        d = tgt - o
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        return jnp.asarray(o), jnp.asarray(d.astype(np.float32))

    def test_closest_matches(self, scenepair):
        be_i, be_b = scenepair
        o, d = self._rays()
        hi = be_i.closest(o, d, 1e-3, 1e4)
        hb = be_b.closest(o, d, 1e-3, 1e4)
        ti, tb = np.asarray(hi.t), np.asarray(hb.t)
        # t to kernel-quantization tolerance (the hier kernel rounds the
        # packed t down by <= t * 2^-16).
        ok = np.abs(ti - tb) <= np.maximum(1e-3, tb * 1e-4)
        assert ok.all(), f"{(~ok).sum()} rays disagree"

    def test_occlusion_matches(self, scenepair):
        be_i, be_b = scenepair
        o, d = self._rays()
        oi = np.asarray(be_i.occluded(o, d, 1e-3, 30.0))
        ob = np.asarray(be_b.occluded(o, d, 1e-3, 30.0))
        np.testing.assert_array_equal(oi, ob)

    def test_beyond_1024_pairs(self):
        """L1 ids past 1024 (r5 regression: 10-bit SMASK silently
        corrupted pair ids >= 1024 once SPAGES grew).  Full-scale scene
        (2.7k pairs), a handful of rays through the far id range."""
        from realtimeraytracer_tpu.render.hier_backend import SMASK

        s = scenes.foliage_field()
        gpu = s.compile()
        assert gpu.pair_tab.shape[0] > 1024 <= SMASK
        cfg = RenderConfig(alpha_test=False, backend="hier")
        be_i = make_backend(gpu, cfg)
        # Oracle: baked BRUTE force — exact at any scale (the wide
        # backend's max_cluster_visits clip is not trustworthy at 120k).
        be_b = make_backend(s.compile(bake_instances=True),
                            cfg.replace(backend="brute"))
        o, d = self._rays(r=64)
        hi = be_i.closest(o, d, 1e-3, 1e4)
        hb = be_b.closest(o, d, 1e-3, 1e4)
        ti, tb = np.asarray(hi.t), np.asarray(hb.t)
        ok = np.abs(ti - tb) <= np.maximum(1e-3, tb * 1e-4)
        assert ok.all(), f"{(~ok).sum()} rays disagree"
