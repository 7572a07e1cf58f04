"""Application layer, camera interaction, wavefront, and checkpointing."""

import math

import numpy as np
import pytest

from realtimeraytracer_tpu import RenderConfig, scenes
from realtimeraytracer_tpu.scene.camera import Camera


class TestCameraInteraction:
    def test_mouse_look_clamps_pitch(self):
        cam = Camera(position=(0, 0, 0), look_at=(1, 0, 0))
        cam.process_mouse(0.0, 10000.0)
        assert cam.pitch == pytest.approx(89.0)
        cam.process_mouse(0.0, -100000.0)
        assert cam.pitch == pytest.approx(-89.0)

    def test_move_forward_follows_view(self):
        cam = Camera(position=(0, 0, 0), look_at=(0, 0, -1))
        cam.move(forward=1.0, dt=1.0)
        p = np.asarray(cam.position)
        assert p[2] < -5  # moved along -z at CAM_SPEED-ish rate
        assert abs(p[0]) < 1e-6

    def test_rotate_y_spins_yaw(self):
        cam = Camera(position=(0, 0, 0), look_at=(1, 0, 0))
        y0 = cam.yaw
        cam.rotate_y(90.0)
        assert cam.yaw == pytest.approx(y0 + 90.0)

    def test_viewport_frame_matches_fov(self):
        cam = Camera(position=(0, 0, 0), look_at=(0, 0, -1), fov_y_degrees=90)
        fr = cam.viewport_frame(100, 100)
        # |v_delta| * height == 2*tan(45) at unit focal distance.
        v_len = float(np.linalg.norm(np.asarray(fr.v_delta))) * 100
        assert v_len == pytest.approx(2.0 * math.tan(math.radians(45)), rel=1e-5)


class TestApplication:
    def test_frame_loop_runs(self):
        from realtimeraytracer_tpu.app.application import Application

        cfg = RenderConfig(primary_rays=1, shadow_rays=1, denoise_iterations=0,
                           shadow_ray_margin=0.02, use_bvh=False)
        app = Application("t", 32, 32, config=cfg, scene=scenes.cornell_box())
        app.toggle_spin()
        frames = list(app.frames(2))
        assert frames[0].shape == (32, 32, 3)
        assert np.isfinite(frames[0]).all()
        # Spin moved the camera -> frames differ.
        assert not np.array_equal(frames[0], frames[1])

    def test_scripted_input_moves_camera(self):
        from realtimeraytracer_tpu.app.application import Application

        app = Application("t", 16, 16, scene=scenes.sphere_plane())
        p0 = np.asarray(app.scene.camera.position)
        app.process_input(forward=1.0, mouse_dx=5.0)
        assert not np.allclose(np.asarray(app.scene.camera.position), p0)


class TestWavefront:
    def test_multibounce_renders(self):
        import jax

        from realtimeraytracer_tpu.render.wavefront import render_wavefront

        scene = scenes.cornell_box()
        cfg = RenderConfig(width=24, height=24, primary_rays=1, jitter=False,
                           shadow_rays=1, max_bounces=2, use_bvh=False,
                           shadow_ray_margin=0.02)
        gpu = scene.compile()
        frame = scene.camera.viewport_frame(cfg.width, cfg.height)
        img = np.asarray(jax.jit(
            lambda g, f: render_wavefront(g, f, cfg))(gpu, frame))
        assert img.shape == (24, 24, 3)
        assert np.isfinite(img).all()
        assert img.mean() > 0.01

    def test_more_bounces_not_darker(self):
        import jax

        from realtimeraytracer_tpu.render.wavefront import render_wavefront

        scene = scenes.cornell_box()
        gpu = scene.compile()
        means = []
        for bounces in (0, 2):
            cfg = RenderConfig(width=16, height=16, primary_rays=1,
                               jitter=False, shadow_rays=1,
                               max_bounces=bounces, use_bvh=False,
                               shadow_ray_margin=0.02, tonemap="none")
            frame = scene.camera.viewport_frame(cfg.width, cfg.height)
            img = np.asarray(jax.jit(
                lambda g, f, c=cfg: render_wavefront(g, f, c))(gpu, frame))
            means.append(img.mean())
        assert means[1] >= means[0] * 0.99  # indirect light only adds energy


class TestCheckpoint:
    def test_save_restore_roundtrip(self, tmp_path):
        import jax.numpy as jnp
        import optax

        from realtimeraytracer_tpu.diff.checkpoint import (
            latest_step, restore_checkpoint, save_checkpoint)
        from realtimeraytracer_tpu.diff.optimize import TrainState

        params = {"obj_color": jnp.ones((3, 3)) * 0.5}
        opt = optax.adam(1e-2)
        state = TrainState(params, opt.init(params))
        save_checkpoint(str(tmp_path), state, step=7)
        assert latest_step(str(tmp_path)) == 7
        restored = restore_checkpoint(str(tmp_path), state, step=7)
        np.testing.assert_allclose(np.asarray(restored.params["obj_color"]),
                                   0.5)
