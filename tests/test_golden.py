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


def _write_procedural_obj(path, num_tris=10_000, seed=3):
    """Emit a deterministic ~10k-tri OBJ file (exercises the OBJ loader
    route of BASELINE config 3 without shipping a fixture blob)."""
    rng = np.random.default_rng(seed)
    n_blobs = max(1, num_tris // 64)
    centers = rng.uniform([-6, 0.3, -6], [6, 2.5, 6], (n_blobs, 3))
    base = centers[rng.integers(0, n_blobs, num_tris)]
    scale = rng.uniform(0.05, 0.3, (num_tris, 1, 1))
    tris = base[:, None, :] + rng.normal(0, 1, (num_tris, 3, 3)) * scale
    verts = tris.reshape(-1, 3)
    lines = ["o rocks"]
    lines += [f"v {x:.6f} {y:.6f} {z:.6f}" for x, y, z in verts]
    lines += [f"f {3*i+1} {3*i+2} {3*i+3}" for i in range(num_tris)]
    path.write_text("\n".join(lines) + "\n")


class TestConfig3ObjLbvhLut:
    def test_config3_obj_bvh_lut_golden(self, tmp_path):
        """BASELINE config 3: 10k-tri OBJ scene -> LBVH (wide backend) +
        LUT tonemap, vs the CPU reference at reduced resolution."""
        from realtimeraytracer_tpu.scene.obj_loader import load_obj
        from realtimeraytracer_tpu.scene.scene import Scene
        from realtimeraytracer_tpu.scene.camera import Camera
        from realtimeraytracer_tpu.scene.lights import AreaLight
        from realtimeraytracer_tpu.scene.materials import Material

        obj_path = tmp_path / "rocks.obj"
        _write_procedural_obj(obj_path, num_tris=10_000)
        mesh = load_obj(str(obj_path),
                        material=Material(color=(0.55, 0.5, 0.45),
                                          specular=0.3, metallic=0.05))
        assert mesh.faces.shape[0] == 10_000
        scene = Scene(camera=Camera(position=(0.0, 3.5, 12.0),
                                    look_at=(0.0, 1.0, 0.0),
                                    fov_y_degrees=55.0))
        scene.add(mesh)
        light = AreaLight(color=(1.0, 0.95, 0.9), intensity=6.0)
        light.rotate("x", 90.0).scale(4.0).move(0.0, 7.0, 0.0)
        scene.add(light)

        cfg = RenderConfig(width=96, height=54, primary_rays=1, jitter=False,
                           shadow_rays=1, denoise_iterations=0,
                           use_bvh=True, backend="wide", tonemap="lut",
                           shadow_ray_margin=0.1)
        _compare(scene, cfg, atol=2e-3, frac=4e-3)


class TestConfig4Wavefront:
    def test_config4_wavefront_multibounce_golden(self):
        """BASELINE config 4 semantics golden: multi-bounce wavefront path
        tracer vs its NumPy twin (same RNG -> stochastically exact), at
        reduced scale through the BVH (wide) backend."""
        from realtimeraytracer_tpu.cpu_ref.renderer import (
            render_wavefront_reference)
        from realtimeraytracer_tpu.render.wavefront import render_wavefront

        scene = scenes.procedural_mesh(1_500, sun=True)
        cfg = RenderConfig(width=64, height=40, primary_rays=2, jitter=False,
                           shadow_rays=1, max_bounces=2,
                           denoise_iterations=0, use_bvh=True,
                           backend="wide", shadow_ray_margin=0.1)
        gpu = scene.compile()
        frame = scene.camera.viewport_frame(cfg.width, cfg.height)
        got = np.asarray(render_wavefront(gpu, frame, cfg))
        want = render_wavefront_reference(scene, cfg)
        assert got.shape == want.shape
        err = np.abs(got - want)
        bad = (err > 2e-3).mean()
        assert bad <= 6e-3, f"{bad:.4%} of texels differ by more than 2e-3"
        assert err.mean() < 2e-3

    def test_config4_cornell_wavefront_golden(self):
        """Same oracle on the Cornell box (interreflection-heavy)."""
        from realtimeraytracer_tpu.cpu_ref.renderer import (
            render_wavefront_reference)
        from realtimeraytracer_tpu.render.wavefront import render_wavefront

        scene = scenes.cornell_box()
        cfg = RenderConfig(width=48, height=48, primary_rays=1, jitter=False,
                           shadow_rays=1, max_bounces=2,
                           denoise_iterations=0, use_bvh=False,
                           shadow_ray_margin=0.02)
        gpu = scene.compile()
        frame = scene.camera.viewport_frame(cfg.width, cfg.height)
        got = np.asarray(render_wavefront(gpu, frame, cfg))
        want = render_wavefront_reference(scene, cfg)
        err = np.abs(got - want)
        bad = (err > 2e-3).mean()
        assert bad <= 6e-3, f"{bad:.4%} of texels differ by more than 2e-3"
        assert err.mean() < 2e-3
