"""Image output helpers (PNG/NPY) — the headless stand-in for the swapchain.

The reference presents frames to a GLFW window (swapchain copy + presentKHR,
application.cppm:436-478); SURVEY.md §1 maps that to headless PNG/array
output for the TPU framework.
"""

from __future__ import annotations

import numpy as np


def to_uint8(image: np.ndarray) -> np.ndarray:
    """Clamp a float [0,1] image to uint8."""
    return (np.clip(np.asarray(image), 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)


def write_png(path: str, image) -> None:
    from PIL import Image

    Image.fromarray(to_uint8(image)).save(path)


def write_npy(path: str, image) -> None:
    np.save(path, np.asarray(image))
