"""Primary-ray generation from a pinhole viewport frame.

Capability parity with the reference's camera ray setup: the camera exposes a
viewport frame {position, top-left corner, per-pixel horizontal/vertical
deltas} (scene/camera.cppm:98-134) and the ray-gen shader forms
``dir = normalize(topLeft + (px+jx-0.5)*hDelta + (py+jy-0.5)*vDelta - pos)``
(shaders/raygen.rgen:86-92).  Here the whole image's rays are produced as one
vectorized op: broadcasted iota pixel grids, counter-based jitter, all f32.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from realtimeraytracer_tpu.ops import rng
from realtimeraytracer_tpu.ops.vecmath import normalize


class ViewportFrame(NamedTuple):
    """Device-side camera frame (the analogue of GPUCameraData)."""

    position: jnp.ndarray       # (3,)
    top_left: jnp.ndarray       # (3,) world pos of pixel (0,0) center's corner
    h_delta: jnp.ndarray        # (3,) world step per pixel in +x (right)
    v_delta: jnp.ndarray        # (3,) world step per pixel in +y (down)


def block_permutation(width: int, height: int, block_w: int = 16,
                      block_h: int = 8):
    """Permutation turning raster-order rays into (block_h x block_w)-tile
    order, plus its inverse.

    Coherent 2-D pixel blocks give ray tiles tight direction cones, which
    the wide backend's frustum culling and any packet scheme feed on; a
    raster row strip is a long thin cone instead.  Static per resolution
    (host NumPy, embedded as constants).
    """
    import numpy as np

    py, px = np.mgrid[0:height, 0:width]
    blocks_x = -(-width // block_w)
    block_id = (py // block_h) * blocks_x + (px // block_w)
    within = (py % block_h) * block_w + (px % block_w)
    key = block_id.astype(np.int64) * (block_w * block_h) + within
    perm = np.argsort(key.reshape(-1), kind="stable").astype(np.int32)
    inv = np.argsort(perm, kind="stable").astype(np.int32)
    return jnp.asarray(perm), jnp.asarray(inv)


def pixel_grid(width: int, height: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Integer pixel coordinate grids px, py of shape (height, width)."""
    py = jnp.broadcast_to(jnp.arange(height, dtype=jnp.int32)[:, None], (height, width))
    px = jnp.broadcast_to(jnp.arange(width, dtype=jnp.int32)[None, :], (height, width))
    return px, py


def generate_rays(
    frame: ViewportFrame,
    width: int,
    height: int,
    sample_index: int | jnp.ndarray = 0,
    jitter: bool = True,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Generate one sample's worth of primary rays for the full image.

    Returns (origins, directions), each (height*width, 3) float32.  Jitter
    reproduces the reference's per-pixel counter hash (raygen.rgen:84:
    seeds ``pixel + i`` and ``pixel + i*322``); with jitter=False rays go
    through pixel centers (offset 0.5 cancels the -0.5 in the viewport
    equation), which is what the deterministic golden tests use.
    """
    px, py = pixel_grid(width, height)
    s = jnp.uint32(sample_index)
    if jitter:
        # Seed from the flat pixel id so every pixel decorrelates.
        base = (py.astype(jnp.uint32) * jnp.uint32(width) + px.astype(jnp.uint32))
        jx = rng.uniform(base + s)
        jy = rng.uniform(base + s * jnp.uint32(322) + jnp.uint32(7919))
    else:
        jx = jnp.float32(0.5)
        jy = jnp.float32(0.5)
    ox = px.astype(jnp.float32) + jx - 0.5
    oy = py.astype(jnp.float32) + jy - 0.5

    world = (
        frame.top_left[None, None, :]
        + ox[..., None] * frame.h_delta[None, None, :]
        + oy[..., None] * frame.v_delta[None, None, :]
    )
    dirs = normalize(world - frame.position[None, None, :])
    origins = jnp.broadcast_to(frame.position, (height, width, 3))
    return origins.reshape(-1, 3), dirs.reshape(-1, 3)
