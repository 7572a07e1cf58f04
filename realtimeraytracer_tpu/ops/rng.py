"""Counter-based RNG for ray jitter and light sampling.

The reference uses a PCG-style integer hash (raycommon.glsl:22-27) seeded from
pixel coordinates and the frame counter (raygen.rgen:84, :213-215).  We keep
the same construction — a stateless counter-based hash — because it is exactly
what a TPU wants: no sequential state, pure elementwise uint32 math on the
VPU, identical results on CPU/TPU and in the NumPy reference renderer.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def hash_u32(seed: jnp.ndarray) -> jnp.ndarray:
    """PCG output-permutation hash of a uint32 counter -> uint32."""
    state = seed.astype(jnp.uint32) * jnp.uint32(747796405) + jnp.uint32(2891336453)
    word = ((state >> ((state >> jnp.uint32(28)) + jnp.uint32(4))) ^ state) * jnp.uint32(277803737)
    return (word >> jnp.uint32(22)) ^ word


def uniform(seed: jnp.ndarray) -> jnp.ndarray:
    """Hash a uint32 counter to a float32 uniform in [0, 1)."""
    return hash_u32(seed).astype(jnp.float32) * jnp.float32(1.0 / 4294967296.0)


def hash_u32_np(seed: np.ndarray) -> np.ndarray:
    """NumPy mirror of hash_u32 (for the CPU reference renderer)."""
    seed = np.asarray(seed, np.uint64)
    M = np.uint64(0xFFFFFFFF)
    state = (seed * np.uint64(747796405) + np.uint64(2891336453)) & M
    shift = ((state >> np.uint64(28)) + np.uint64(4)) & M
    word = (((state >> shift) ^ state) * np.uint64(277803737)) & M
    return (((word >> np.uint64(22)) ^ word) & M).astype(np.uint32)


def uniform_np(seed: np.ndarray) -> np.ndarray:
    return hash_u32_np(seed).astype(np.float32) / np.float32(4294967296.0)
