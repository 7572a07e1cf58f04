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

import jax
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


def generate_ray_blocks(
    frame: ViewportFrame,
    width: int,
    height: int,
    sample_index: int | jnp.ndarray = 0,
    jitter: bool = True,
    t_min: float = 1e-3,
    t_max: float = 1e4,
    block_w: int = 16,
    block_h: int = 8,
) -> jnp.ndarray:
    """Primary rays directly in the traversal kernel's packed tile layout.

    Returns (Ts, 8, 128) float32 blocks — rows [o.xyz | d.xyz | t_min |
    t_max] — where each tile is one (block_h x block_w) pixel block, so
    tiles have tight direction cones for frustum culling.  Everything is
    pixel-block iota math: no (R, 3) intermediates (whose 3-wide lane dim
    pads 3 -> 128 on TPU) and no permutation gather.  Jitter matches
    generate_rays (same per-pixel counter hash).  Out-of-image lanes (when
    width/height don't divide the block size) get t_min=+BIG, t_max=-BIG
    so traversal retires them immediately.
    """
    lanes = block_w * block_h
    assert lanes == 128, "tile layout is fixed at 128 lanes"
    bx = -(-width // block_w)
    by = -(-height // block_h)
    ts = bx * by

    # px/py via multi-axis iotas over (by, bx, block_h, block_w), NOT
    # tid%/tid// — integer div/mod on 2M-lane tensors costs ~3 ms on the
    # v5e VPU (measured r5; it alone was ~7% of the headline frame) while
    # the 4-D iota form is pure adds.  The reshape to (ts, lanes) is a
    # contiguous row-major collapse (free).
    g4 = (by, bx, block_h, block_w)
    px = (jax.lax.broadcasted_iota(jnp.int32, g4, 1) * block_w
          + jax.lax.broadcasted_iota(jnp.int32, g4, 3)).reshape(ts, lanes)
    py = (jax.lax.broadcasted_iota(jnp.int32, g4, 0) * block_h
          + jax.lax.broadcasted_iota(jnp.int32, g4, 2)).reshape(ts, lanes)
    valid = (px < width) & (py < height)

    s = jnp.uint32(sample_index)
    if jitter:
        base = py.astype(jnp.uint32) * jnp.uint32(width) + px.astype(jnp.uint32)
        jx = rng.uniform(base + s)
        jy = rng.uniform(base + s * jnp.uint32(322) + jnp.uint32(7919))
    else:
        jx = jnp.float32(0.5)
        jy = jnp.float32(0.5)
    ox = px.astype(jnp.float32) + jx - 0.5
    oy = py.astype(jnp.float32) + jy - 0.5

    d = [
        frame.top_left[a] + ox * frame.h_delta[a] + oy * frame.v_delta[a]
        - frame.position[a]
        for a in range(3)
    ]
    inv_n = jax.lax.rsqrt(d[0] * d[0] + d[1] * d[1] + d[2] * d[2])
    big = jnp.float32(3.0e38)
    return jnp.stack(
        [
            jnp.broadcast_to(frame.position[0], (ts, lanes)),
            jnp.broadcast_to(frame.position[1], (ts, lanes)),
            jnp.broadcast_to(frame.position[2], (ts, lanes)),
            d[0] * inv_n, d[1] * inv_n, d[2] * inv_n,
            jnp.where(valid, jnp.float32(t_min), big),
            jnp.where(valid, jnp.float32(t_max), -big),
        ],
        axis=1,
    )


def blocks_to_image_scatter(width: int, height: int, block_w: int = 16,
                            block_h: int = 8):
    """Static (Ts*128,) -> raster flat index for unpacking blocked outputs.

    image_flat = blocked_flat[scatter] where scatter[y*width + x] is the
    blocked position of pixel (x, y).  Host NumPy, embedded as constants.
    """
    import numpy as np

    bx = -(-width // block_w)
    py, px = np.mgrid[0:height, 0:width]
    tid = (py // block_h) * bx + (px // block_w)
    lane = (py % block_h) * block_w + (px % block_w)
    return jnp.asarray((tid * (block_w * block_h) + lane).reshape(-1))


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
