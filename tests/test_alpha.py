"""Alpha-tested transparency (any-hit parity, opacity.rahit)."""

import jax.numpy as jnp
import numpy as np
import pytest

from realtimeraytracer_tpu import RenderConfig, render
from realtimeraytracer_tpu.cpu_ref.renderer import render_reference
from realtimeraytracer_tpu.scene.geometry import Material, TriangleMesh
from realtimeraytracer_tpu.scene.lights import DirectionalLight
from realtimeraytracer_tpu.scene.scene import Scene


def _alpha_scene():
    """Red wall behind a blue quad whose LEFT half is transparent."""
    scene = Scene()
    wall = TriangleMesh(
        vertices=np.array([[-2, -2, -2], [2, -2, -2], [2, 2, -2], [-2, 2, -2]],
                          np.float32),
        faces=np.array([[0, 1, 2], [0, 2, 3]], np.int32),
        material=Material(color=(0.9, 0.1, 0.1)))
    # 2x16 half-transparent opacity map: u<0.5 -> alpha 0, u>=0.5 -> alpha 1.
    amap = np.zeros((16, 16), np.float32)
    amap[:, 8:] = 1.0
    scene_tex = scene.add_texture(amap)
    front = TriangleMesh(
        vertices=np.array([[-2, -2, 0], [2, -2, 0], [2, 2, 0], [-2, 2, 0]],
                          np.float32),
        faces=np.array([[0, 1, 2], [0, 2, 3]], np.int32),
        uvs=np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32),
        material=Material(color=(0.1, 0.1, 0.9), opacity_map=scene_tex))
    scene.add(wall, front,
              DirectionalLight(direction=(0.0, 0.3, 1.0), color=(1, 1, 1),
                               intensity=0.5))
    scene.camera.position = (0, 0, 5)
    scene.camera.look_at = (0, 0, 0)
    scene.camera.__post_init__()
    return scene


CFG = RenderConfig(width=32, height=32, primary_rays=1, jitter=False,
                   shadow_rays=1, denoise_iterations=0, use_bvh=False,
                   alpha_test=True)


class TestAlpha:
    def test_transparent_half_shows_wall(self):
        img = np.asarray(render(_alpha_scene(), CFG))
        assert np.isfinite(img).all()
        left = img[16, 10]   # transparent region -> red wall
        right = img[16, 22]  # opaque region -> blue quad
        assert left[0] > left[2], f"left should be red-ish, got {left}"
        assert right[2] > right[0], f"right should be blue-ish, got {right}"

    def test_matches_cpu_reference(self):
        scene = _alpha_scene()
        got = np.asarray(render(scene, CFG))
        want = render_reference(scene, CFG)
        err = np.abs(got - want)
        assert (err > 2e-3).mean() < 5e-3
        assert err.mean() < 2e-3

    def test_alpha_off_hides_wall(self):
        cfg = CFG.replace(alpha_test=False)
        img = np.asarray(render(_alpha_scene(), cfg))
        left = img[16, 10]
        assert left[2] >= left[0], f"alpha off: left should be blue-ish, got {left}"
