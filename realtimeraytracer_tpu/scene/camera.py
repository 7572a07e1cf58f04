"""Fly camera with a pinhole viewport frame.

Parity with the reference camera (scene/camera.cppm):
  * yaw/pitch angles derived from an initial look-at (:84-86),
  * viewport frame {position, top-left corner, per-pixel deltas} computed
    from vertical fov + pixel dims (:98-134),
  * mouse-look with +-89 deg pitch clamp (:136-148), WASD-style moves and
    the auto-spin rotate_y used by the window layer (window.cppm:68-133).

The host class is plain NumPy; ``viewport_frame`` returns the device-side
frame (the analogue of GPUCameraData uploaded to the camera UBO).
"""

from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp
import numpy as np

from realtimeraytracer_tpu.ops.camera_rays import ViewportFrame


@dataclasses.dataclass
class Camera:
    position: tuple[float, float, float] = (0.0, 0.0, 0.0)
    look_at: tuple[float, float, float] = (0.0, 0.0, -1.0)
    up: tuple[float, float, float] = (0.0, 1.0, 0.0)
    fov_y_degrees: float = 60.0

    # Interaction constants (application.cppm:497-501).
    move_speed: float = 10.5
    mouse_sensitivity: float = 0.5

    def __post_init__(self):
        d = np.asarray(self.look_at, np.float64) - np.asarray(self.position, np.float64)
        n = np.linalg.norm(d)
        d = d / (n if n > 0 else 1.0)
        self.pitch = math.degrees(math.asin(float(np.clip(d[1], -1.0, 1.0))))
        self.yaw = math.degrees(math.atan2(float(d[2]), float(d[0])))

    # -- interaction ------------------------------------------------------
    @property
    def forward(self) -> np.ndarray:
        yr, pr = math.radians(self.yaw), math.radians(self.pitch)
        return np.array(
            [math.cos(pr) * math.cos(yr), math.sin(pr), math.cos(pr) * math.sin(yr)],
            np.float64,
        )

    @property
    def right(self) -> np.ndarray:
        w = -self.forward
        u = np.cross(np.asarray(self.up, np.float64), w)
        return u / np.linalg.norm(u)

    def process_mouse(self, dx: float, dy: float, sensitivity: float = 0.1) -> None:
        """Mouse-look: yaw += dx*s, pitch += dy*s, clamp +-89 (camera.cppm:136-148)."""
        self.yaw += dx * sensitivity
        self.pitch = float(np.clip(self.pitch + dy * sensitivity, -89.0, 89.0))

    def move(self, forward: float = 0.0, strafe: float = 0.0, dt: float = 1.0 / 60.0) -> None:
        """WASD-style planar movement (window.cppm:68-110)."""
        p = np.asarray(self.position, np.float64)
        p = p + self.forward * (forward * self.move_speed * dt)
        p = p + self.right * (strafe * self.move_speed * dt)
        self.position = tuple(p.tolist())

    def rotate_y(self, degrees: float) -> None:
        """Auto-spin toggle path (window.cppm:99-104, camera.cppm:149-154)."""
        self.yaw += degrees

    # -- device frame -----------------------------------------------------
    def viewport_frame(self, width: int, height: int) -> ViewportFrame:
        """Compute the pinhole viewport frame at unit focal distance.

        Derivation matches camera.cppm:98-134: an orthonormal (u, v, w)
        basis from forward/up, half extents from tan(fov/2) and aspect,
        top-left corner one unit along -w, deltas scaled per pixel with v
        negated so +y steps go down the image.
        """
        aspect = width / height
        half_h = math.tan(math.radians(self.fov_y_degrees) * 0.5)
        half_w = aspect * half_h

        fwd = self.forward
        w = -fwd
        u = np.cross(np.asarray(self.up, np.float64), w)
        u /= np.linalg.norm(u)
        v = np.cross(w, u)

        pos = np.asarray(self.position, np.float64)
        h_delta = (2.0 * half_w / width) * u
        v_delta = -(2.0 * half_h / height) * v
        top_left = pos - half_w * u + half_h * v - w
        f32 = lambda x: jnp.asarray(np.asarray(x, np.float32))
        return ViewportFrame(
            position=f32(pos), top_left=f32(top_left),
            h_delta=f32(h_delta), v_delta=f32(v_delta),
        )

    def viewport_frame_np(self, width: int, height: int):
        """NumPy copy of the frame for the CPU reference renderer."""
        fr = self.viewport_frame(width, height)
        return tuple(np.asarray(x) for x in fr)
