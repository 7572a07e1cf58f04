"""Golden-image integration tests: JAX pipeline vs the NumPy CPU reference.

SURVEY.md §4 / BASELINE.json: rendered-image allclose vs a CPU reference
implementation on the config ladder (sphere+plane, Cornell box).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realtimeraytracer_tpu import RenderConfig, render
from realtimeraytracer_tpu.cpu_ref.renderer import render_reference
from realtimeraytracer_tpu import scenes


def _compare(scene, cfg, atol=2e-3, frac=2e-3):
    got = np.asarray(render(scene, cfg))
    want = render_reference(scene, cfg)
    assert got.shape == want.shape
    err = np.abs(got - want)
    # allclose in bulk; allow a tiny fraction of pixels to disagree more
    # (hit-order ties on shared edges resolve differently across argmins).
    bad = (err > atol).mean()
    assert bad <= frac, f"{bad:.4%} of texels differ by more than {atol}"
    assert err.mean() < atol


class TestSpherePlane:
    def test_config1_sphere_plane(self):
        cfg = RenderConfig(
            width=96, height=64, primary_rays=1, jitter=False,
            shadow_rays=1, denoise_iterations=0, use_bvh=False,
            shadow_ray_margin=0.01,
        )
        _compare(scenes.sphere_plane(), cfg)

    def test_deterministic(self):
        cfg = RenderConfig(width=48, height=32, primary_rays=1, jitter=False,
                           shadow_rays=1, denoise_iterations=0, use_bvh=False)
        a = np.asarray(render(scenes.sphere_plane(), cfg))
        b = np.asarray(render(scenes.sphere_plane(), cfg))
        np.testing.assert_array_equal(a, b)


class TestEdgeScenes:
    def test_sphere_only_scene(self):
        """Triangle-free scene (probe-found regression): must not crash."""
        from realtimeraytracer_tpu.scene.scene import Scene
        from realtimeraytracer_tpu.scene.geometry import Sphere

        s = Scene()
        s.add(Sphere())
        cfg = RenderConfig(width=16, height=16, primary_rays=1, jitter=False,
                           shadow_rays=1, denoise_iterations=0, use_bvh=False)
        img = np.asarray(render(s, cfg))
        assert np.isfinite(img).all()


class TestCornellBox:
    def test_config2_cornell(self):
        cfg = RenderConfig(
            width=64, height=64, primary_rays=1, jitter=False,
            shadow_rays=2, denoise_iterations=0, use_bvh=False,
            shadow_ray_margin=0.02,
        )
        _compare(scenes.cornell_box(), cfg)

    def test_config2_cornell_denoised(self):
        cfg = RenderConfig(
            width=48, height=48, primary_rays=2, jitter=True,
            shadow_rays=2, denoise_iterations=2, use_bvh=False,
            shadow_ray_margin=0.02,
        )
        _compare(scenes.cornell_box(), cfg, atol=4e-3, frac=5e-3)

    def test_image_content_sane(self):
        cfg = RenderConfig(width=64, height=64, primary_rays=1, jitter=False,
                           shadow_rays=1, denoise_iterations=0, use_bvh=False,
                           shadow_ray_margin=0.02)
        img = np.asarray(render(scenes.cornell_box(), cfg))
        assert np.isfinite(img).all()
        assert img.max() > 0.05, "image should not be black"
        # left wall red-ish vs right wall green-ish
        left = img[32, 4]
        right = img[32, 60]
        assert left[0] > left[1]
        assert right[1] > right[0]
