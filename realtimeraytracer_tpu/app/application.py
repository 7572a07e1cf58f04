"""Application: scene setup + the frame loop, headless.

TPU-native analogue of the reference application layer
(src/app/application.cppm:50-502 + src/main.cpp): construct with a title
and resolution, point it at a Scene, then run() a frame loop.  Where the
reference pumps GLFW events and presents to a swapchain, this renders
frames to arrays/PNGs (SURVEY.md §1 maps swapchain/present to headless
output) and drives the camera with scripted controllers (the analogue of
WASD/mouse input and the 'T' auto-spin toggle, window.cppm:68-133).

Unlike the reference's frame loop — which calls device.waitIdle() between
every pass (application.cppm:353,396,437) — frames here are single jitted
XLA programs and consecutive frames pipeline naturally through JAX's async
dispatch: frame N+1's host work overlaps frame N's device work.
"""

from __future__ import annotations

import time
from typing import Callable, Iterator

import jax
import jax.numpy as jnp
import numpy as np

from realtimeraytracer_tpu.config import RenderConfig
from realtimeraytracer_tpu.render.pipeline import render_pipeline_gpu
from realtimeraytracer_tpu.scene.scene import Scene
from realtimeraytracer_tpu.utils import log


class Application:
    """Owns the scene, camera, compiled render function and frame counter."""

    # Reference interaction constants (application.cppm:497-501).
    CAM_SPEED = 10.5
    MOUSE_SENSITIVITY = 0.5
    NUM_DENOISING_ITERATIONS = 4
    DENOISING_STRENGTH = 1

    def __init__(self, title: str = "Real Time RayTracer",
                 width: int = 1920, height: int = 1080,
                 config: RenderConfig | None = None,
                 scene: Scene | None = None):
        self.title = title
        # Interactive default: the one-gather LTC fetch (cfg.fast_lut) —
        # ~1e-3 from exact bilinear, far below real-time perceptibility.
        self.config = (config or RenderConfig(fast_lut=True)).replace(
            width=width, height=height)
        if scene is None:
            from realtimeraytracer_tpu import scenes

            scene = scenes.cornell_box()
        self.scene = scene
        self.frame_index = 0
        self._gpu = None
        self._render = None
        self._spin = False
        log.info("{}: {}x{} ({} device(s))", title, width, height,
                 len(jax.devices()))

    # -- setup -------------------------------------------------------------
    def compile_scene(self) -> None:
        """Scene -> GPUScene + jitted pipeline (the analogue of the
        one-time setup block in Application::run, application.cppm:99-330)."""
        t0 = time.perf_counter()
        self._gpu = self.scene.compile(bvh_leaf_size=self.config.bvh_leaf_size)
        cfg = self.config
        self._render = jax.jit(
            lambda g, f, i: render_pipeline_gpu(g, f, cfg, i)
        )
        log.info("scene compiled in {:.2f}s: {} tris",
                 time.perf_counter() - t0, self._gpu.faces.shape[0])

    # -- interaction (scripted input) -------------------------------------
    def toggle_spin(self) -> None:
        """The 'T' auto-spin toggle (window.cppm:99-104)."""
        self._spin = not self._spin

    def process_input(self, forward=0.0, strafe=0.0, mouse_dx=0.0,
                      mouse_dy=0.0, dt=1.0 / 60.0) -> None:
        cam = self.scene.camera
        if mouse_dx or mouse_dy:
            cam.process_mouse(mouse_dx, mouse_dy, self.MOUSE_SENSITIVITY)
        if forward or strafe:
            cam.move(forward=forward, strafe=strafe, dt=dt)

    # -- frame loop --------------------------------------------------------
    def render_frame(self) -> jnp.ndarray:
        if self._render is None:
            self.compile_scene()
        if self._spin:
            self.scene.camera.rotate_y(0.5)
        frame = self.scene.camera.viewport_frame(self.config.width, self.config.height)
        img = self._render(self._gpu, frame, jnp.uint32(self.frame_index))
        self.frame_index += 1
        return img

    def run(self, num_frames: int = 16,
            controller: Callable[["Application", int], None] | None = None,
            on_frame: Callable[[int, np.ndarray], None] | None = None) -> float:
        """Run the frame loop; returns average FPS.

        controller(app, i) plays the role of glfwPollEvents+processInput;
        on_frame(i, image) plays the role of present.
        """
        if self._render is None:
            self.compile_scene()
        # Warm-up/compile frame (excluded from timing).
        self.render_frame().block_until_ready()
        t0 = time.perf_counter()
        last = None
        for i in range(num_frames):
            if controller is not None:
                controller(self, i)
            img = self.render_frame()
            if on_frame is not None:
                on_frame(i, np.asarray(img))
            last = img
        last.block_until_ready()
        dt = time.perf_counter() - t0
        fps = num_frames / dt
        log.info("{} frames in {:.2f}s = {:.1f} fps", num_frames, dt, fps)
        return fps

    def frames(self, n: int) -> Iterator[np.ndarray]:
        for _ in range(n):
            yield np.asarray(self.render_frame())
