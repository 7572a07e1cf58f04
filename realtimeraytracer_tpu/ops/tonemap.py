"""Tone mapping: ACES filmic + sRGB gamma, analytic and LUT-based.

Parity: the reference applies Narkowicz's ACES filmic curve then a 1/2.2
gamma per channel at the end of ray generation (shaders/raygen.rgen:51-59
ACESFilm, :49 ToSRGB, applied :345-352).  BASELINE.json additionally asks for
a LUT-based tonemap path (config 3), provided here as a precomputed 1D LUT
with linear interpolation — a single vectorized gather on TPU.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def aces_film(x: jnp.ndarray) -> jnp.ndarray:
    """Narkowicz ACES filmic curve, clamped to [0, 1]."""
    a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    return jnp.clip((x * (a * x + b)) / (x * (c * x + d) + e), 0.0, 1.0)


def linear_to_srgb(x: jnp.ndarray, gamma: float = 2.2) -> jnp.ndarray:
    """Simple power-law gamma (the reference uses pow(1/2.2), not the
    piecewise sRGB EOTF — raygen.rgen:45-49).

    Double-where guard: pow(x, 1/2.2) has an INFINITE derivative at x=0
    (every black pixel), which NaN-poisons full-pipeline gradients
    (diff/optimize.pipeline_loss).  The guard is forward-identical —
    x > 0 takes the same pow; x <= 0 returns the same 0.0 — but the
    untaken branch's infinity can no longer leak into the VJP."""
    safe = jnp.where(x > 0.0, x, 1.0)
    return jnp.where(x > 0.0, jnp.power(safe, 1.0 / gamma), 0.0)


def srgb_to_linear(x: jnp.ndarray, gamma: float = 2.2) -> jnp.ndarray:
    """Inverse of linear_to_srgb (miss.rmiss:14 ToLinear, closesthit.rchit:104)."""
    return jnp.power(jnp.maximum(x, 0.0), gamma)


def build_tonemap_lut(size: int = 1024, max_input: float = 8.0,
                      gamma: float = 2.2) -> np.ndarray:
    """Precompute ACES+gamma as a 1D LUT over [0, max_input]."""
    x = np.linspace(0.0, max_input, size, dtype=np.float32)
    a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    y = np.clip((x * (a * x + b)) / (x * (c * x + d) + e), 0.0, 1.0)
    return np.power(y, 1.0 / gamma).astype(np.float32)


def apply_tonemap_lut(x: jnp.ndarray, lut: jnp.ndarray,
                      max_input: float = 8.0) -> jnp.ndarray:
    """Linearly-interpolated 1D LUT lookup (vectorized gather)."""
    n = lut.shape[0]
    pos = jnp.clip(x, 0.0, max_input) * ((n - 1) / max_input)
    i0 = jnp.clip(pos.astype(jnp.int32), 0, n - 2)
    frac = pos - i0.astype(jnp.float32)
    return lut[i0] * (1.0 - frac) + lut[i0 + 1] * frac


def tonemap(x: jnp.ndarray, mode: str = "aces", gamma: float = 2.2,
            lut: jnp.ndarray | None = None) -> jnp.ndarray:
    """Dispatch on RenderConfig.tonemap."""
    if mode == "aces":
        return linear_to_srgb(aces_film(x), gamma)
    if mode == "lut":
        if lut is None:
            lut = jnp.asarray(build_tonemap_lut(gamma=gamma))
        return apply_tonemap_lut(x, lut)
    if mode == "none":
        return x
    raise ValueError(f"unknown tonemap mode {mode!r}")
