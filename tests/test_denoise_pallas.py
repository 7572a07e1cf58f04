"""Fused Pallas A-Trous denoiser == the XLA stencil to a few f32 ulp
(same math, but FMA contraction differs between the two compilation
contexts).  ops/denoise_pallas.py."""

import numpy as np
import jax.numpy as jnp

from realtimeraytracer_tpu.ops.denoise import atrous_denoise
from realtimeraytracer_tpu.ops.denoise_pallas import atrous_denoise_pair


def _data(h, w, seed=0):
    r = np.random.default_rng(seed)
    return (jnp.asarray(r.random((h, w, 3)).astype(np.float32)),
            jnp.asarray(r.random((h, w, 3)).astype(np.float32)),
            jnp.asarray(r.random((h, w, 3)).astype(np.float32)),
            jnp.asarray((r.random((h, w, 3)) * 10).astype(np.float32)))


class TestPallasDenoiser:
    def test_bit_equal_to_xla(self):
        s, u, n, p = _data(50, 70)
        sp, up = atrous_denoise_pair(s, u, n, p, 3, 1.0, 0.001, 0.001)
        sx = atrous_denoise(s, n, p, 3, 1.0, 0.001, 0.001)
        ux = atrous_denoise(u, n, p, 3, 1.0, 0.001, 0.001)
        np.testing.assert_allclose(np.asarray(sp), np.asarray(sx),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(up), np.asarray(ux),
                                   rtol=1e-5, atol=1e-6)

    def test_non_tile_multiple_height(self):
        """H not divisible by the row tile: pad rows must not leak in
        (the position pad zeroes their weights, the OOB-skip contract)."""
        s, u, n, p = _data(45, 64, seed=3)
        sp, up = atrous_denoise_pair(s, u, n, p, 2, 1.0, 0.3, 0.5)
        sx = atrous_denoise(s, n, p, 2, 1.0, 0.3, 0.5)
        ux = atrous_denoise(u, n, p, 2, 1.0, 0.3, 0.5)
        np.testing.assert_allclose(np.asarray(sp), np.asarray(sx),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(up), np.asarray(ux),
                                   rtol=1e-5, atol=1e-6)

    def test_four_iterations_default_phis(self):
        s, u, n, p = _data(40, 48, seed=5)
        sp, up = atrous_denoise_pair(s, u, n, p, 4)
        sx = atrous_denoise(s, n, p, 4)
        ux = atrous_denoise(u, n, p, 4)
        np.testing.assert_allclose(np.asarray(sp), np.asarray(sx),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(up), np.asarray(ux),
                                   rtol=1e-5, atol=1e-6)
