"""On-hardware numerics checks for the Mosaic traversal kernel.

The CPU suite exercises the pallas kernel in INTERPRET mode (exact f32
semantics); these tests only run on a real TPU and compare the compiled
kernel against the wide (XLA) backend — catching bf16 truncation, layout
or DMA bugs that interpret mode cannot see (ADVICE r1).

Run: JAX_PLATFORMS=<tpu backend> python -m pytest tests/test_tpu_native.py
(skipped automatically elsewhere).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="compiled-kernel numerics test needs a real TPU")


def _setup(ntris=10_000, w=256, h=144):
    from realtimeraytracer_tpu import RenderConfig, scenes
    from realtimeraytracer_tpu.ops.camera_rays import generate_rays

    cfg = RenderConfig(width=w, height=h, primary_rays=1, jitter=False,
                       shadow_rays=1, denoise_iterations=0)
    scene = scenes.procedural_mesh(ntris, sun=True)
    gpu = scene.compile(bvh_leaf_size=cfg.bvh_leaf_size)
    frame = scene.camera.viewport_frame(w, h)
    o, d = generate_rays(frame, w, h, jitter=False)
    return cfg, gpu, o, d


class TestCompiledKernelNumerics:
    def test_closest_matches_wide_backend(self):
        from realtimeraytracer_tpu.render.pallas_backend import make_pallas_backend
        from realtimeraytracer_tpu.render.wide_backend import make_wide_backend

        cfg, gpu, o, d = _setup()
        hp = jax.jit(lambda g, o, d: make_pallas_backend(g, cfg).closest(
            o, d, cfg.t_min, cfg.t_max))(gpu, o, d)
        hw = jax.jit(lambda g, o, d: make_wide_backend(g, cfg).closest(
            o, d, cfg.t_min, cfg.t_max))(gpu, o, d)
        pid_p = np.asarray(hp.prim_id)
        pid_w = np.asarray(hw.prim_id)
        # Hit-id agreement (ties on shared edges may differ): >= 99.9%.
        agree = (pid_p == pid_w).mean()
        assert agree >= 0.999, f"prim agreement {agree:.5f}"
        both = (pid_p >= 0) & (pid_w >= 0)
        # t agreement where both hit: the kernel quantizes t down by
        # <= 2^-16 relative (packed t|lane keys).
        tp = np.asarray(hp.t)[both]
        tw = np.asarray(hw.t)[both]
        np.testing.assert_allclose(tp, tw, rtol=3e-4)

    def test_occluded_matches_wide_backend(self):
        from realtimeraytracer_tpu.render.pallas_backend import make_pallas_backend
        from realtimeraytracer_tpu.render.wide_backend import make_wide_backend

        cfg, gpu, o, d = _setup()
        t_max = jnp.full((o.shape[0],), 30.0, jnp.float32)
        op = jax.jit(lambda g, o, d: make_pallas_backend(g, cfg).occluded(
            o, d, cfg.t_min, t_max))(gpu, o, d)
        ow = jax.jit(lambda g, o, d: make_wide_backend(g, cfg).occluded(
            o, d, cfg.t_min, t_max))(gpu, o, d)
        agree = (np.asarray(op) == np.asarray(ow)).mean()
        assert agree >= 0.999, f"occlusion agreement {agree:.5f}"

    def test_compiled_render_matches_cpu_reference(self):
        """Small full-frame render on the REAL kernel vs the NumPy oracle —
        the top-of-ladder check interpret mode can't give."""
        from realtimeraytracer_tpu import render, scenes
        from realtimeraytracer_tpu.config import RenderConfig
        from realtimeraytracer_tpu.cpu_ref.renderer import render_reference

        cfg = RenderConfig(width=96, height=54, primary_rays=1, jitter=False,
                           shadow_rays=1, denoise_iterations=0,
                           shadow_ray_margin=0.1)
        scene = scenes.procedural_mesh(2_000, sun=True)
        got = np.asarray(render(scene, cfg))
        want = render_reference(scene, cfg)
        err = np.abs(got - want)
        bad = (err > 2e-3).mean()
        assert bad <= 6e-3, f"{bad:.4%} texels differ by > 2e-3"
        assert err.mean() < 2e-3
