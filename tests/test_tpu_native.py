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


def _exact_wide_cfg(cfg):
    """wide as an EXACTNESS reference: lift the ordered-visit safety cap
    to the cluster count (the default 64 clips busy shadow tiles at
    1080p-scale workloads and silently misses hits — r4 probe 110)."""
    return cfg.replace(max_cluster_visits=10 ** 6)


class TestCompiledHierKernel:
    """Compiled v8 (per-ray hierarchy) vs the uncapped wide XLA twin —
    the production occlusion + incoherent-closest path had no direct
    compiled-kernel test (VERDICT r3 weak #4)."""

    def test_v8_closest_matches_wide(self):
        from realtimeraytracer_tpu.render.hier_backend import make_hier_backend
        from realtimeraytracer_tpu.render.wide_backend import make_wide_backend

        cfg, gpu, o, d = _setup()
        # Incoherent-ish rays: scatter directions per ray (the v8 class).
        r = np.random.default_rng(0)
        d2 = jnp.asarray(np.float32(
            r.normal(size=d.shape) + 0.3 * np.asarray(d)))
        d2 = d2 / jnp.linalg.norm(d2, axis=-1, keepdims=True)
        cw = _exact_wide_cfg(cfg)
        hh = jax.jit(lambda g, o, d: make_hier_backend(g, cfg).closest(
            o, d, cfg.t_min, cfg.t_max))(gpu, o, d2)
        hw = jax.jit(lambda g, o, d: make_wide_backend(g, cw).closest(
            o, d, cfg.t_min, cfg.t_max))(gpu, o, d2)
        agree = (np.asarray(hh.prim_id) == np.asarray(hw.prim_id)).mean()
        assert agree >= 0.999, f"prim agreement {agree:.5f}"
        both = (np.asarray(hh.prim_id) >= 0) & (np.asarray(hw.prim_id) >= 0)
        np.testing.assert_allclose(np.asarray(hh.t)[both],
                                   np.asarray(hw.t)[both], rtol=3e-4)

    def test_v8_occluded_matches_wide(self):
        from realtimeraytracer_tpu.render.hier_backend import make_hier_backend
        from realtimeraytracer_tpu.render.wide_backend import make_wide_backend
        from realtimeraytracer_tpu.ops.intersect import BIG_T

        cfg, gpu, o, d = _setup()
        R = o.shape[0]
        # Shadow-like segments incl. EMPTY intervals on every 3rd lane
        # (the masked-invalid-lane contract).
        act = (jnp.arange(R) % 3) != 0
        t_lo = jnp.where(act, cfg.t_min, BIG_T)
        t_hi = jnp.where(act, 30.0, -BIG_T)
        cw = _exact_wide_cfg(cfg)
        oh = jax.jit(lambda g, o, d: make_hier_backend(g, cfg).occluded(
            o, d, t_lo, t_hi))(gpu, o, d)
        ow = jax.jit(lambda g, o, d: make_wide_backend(g, cw).occluded(
            o, d, t_lo, t_hi))(gpu, o, d)
        assert bool(jnp.array_equal(oh, ow)), "v8 occlusion != exact wide"
        assert not bool(oh[~act].any()), "empty-interval lanes must miss"

    def test_v9_quarter_matches_wide(self):
        from realtimeraytracer_tpu.render.quarter_backend import (
            make_quarter_backend)
        from realtimeraytracer_tpu.render.wide_backend import make_wide_backend

        cfg, gpu, o, d = _setup()
        cw = _exact_wide_cfg(cfg)
        hq = jax.jit(lambda g, o, d: make_quarter_backend(g, cfg).closest(
            o, d, cfg.t_min, cfg.t_max, common="origin"))(gpu, o, d)
        hw = jax.jit(lambda g, o, d: make_wide_backend(g, cw).closest(
            o, d, cfg.t_min, cfg.t_max))(gpu, o, d)
        agree = (np.asarray(hq.prim_id) == np.asarray(hw.prim_id)).mean()
        assert agree >= 0.999, f"prim agreement {agree:.5f}"

    def test_occluded_multi_matches_per_sample(self):
        from realtimeraytracer_tpu.render.hier_backend import (
            hier_occluded, hier_occluded_multi)

        cfg, gpu, o, d = _setup()
        R = o.shape[0]
        r = np.random.default_rng(1)
        dirs_s = []
        his = []
        for s in range(3):
            dd = jnp.asarray(np.float32(r.normal(size=(R, 3))))
            dd = dd / jnp.linalg.norm(dd, axis=-1, keepdims=True)
            dirs_s.append(dd)
            his.append(jnp.full((R,), 20.0 + 3 * s, jnp.float32))
        t_lo = jnp.full((R,), cfg.t_min, jnp.float32)
        multi = jax.jit(lambda g, o: hier_occluded_multi(
            g, cfg, o, dirs_s, t_lo, his))(gpu, o)
        for s in range(3):
            single = jax.jit(lambda g, o, dd=dirs_s[s], hi=his[s]:
                             hier_occluded(g, cfg, o, dd, t_lo, hi))(gpu, o)
            assert bool(jnp.array_equal(multi[s], single)), f"sample {s}"


class TestCompiledInstancing:
    def test_instanced_matches_baked(self):
        """Compiled (instance, super)-level trace vs the flattened bake."""
        from realtimeraytracer_tpu import render
        from realtimeraytracer_tpu.config import RenderConfig
        from tests.test_instancing import _blob, _scene

        cfg = RenderConfig(width=96, height=64, primary_rays=1, jitter=False,
                           shadow_rays=1, denoise_iterations=0,
                           shadow_ray_margin=0.02)
        mesh = _blob(400)
        img_i = np.asarray(render(_scene(mesh, k=9), cfg))
        # Fresh scene object: compile(bake_instances=True) flattens.
        scene_b = _scene(mesh, k=9)
        gpu_b = scene_b.compile(bake_instances=True)
        from realtimeraytracer_tpu.render.pipeline import render_pipeline_gpu
        frame = scene_b.camera.viewport_frame(cfg.width, cfg.height)
        img_b = np.asarray(jax.jit(
            lambda g, f: render_pipeline_gpu(g, f, cfg, 0))(gpu_b, frame))
        err = np.abs(img_i - img_b)
        assert (err > 2e-3).mean() <= 6e-3, f"{(err > 2e-3).mean():.4%}"


class TestShardedPipelineOnDevice:
    def test_sharded_matches_unsharded(self):
        """render_pipeline_sharded over the real device mesh (shard_map x
        Pallas-denoiser composition) vs the single-program pipeline."""
        from realtimeraytracer_tpu import RenderConfig, scenes
        from realtimeraytracer_tpu.parallel.mesh import make_ray_mesh
        from realtimeraytracer_tpu.parallel.sharded import (
            render_pipeline_sharded)
        from realtimeraytracer_tpu.render.pipeline import render_pipeline_gpu

        cfg = RenderConfig(width=128, height=64, primary_rays=1,
                           jitter=False, shadow_rays=1,
                           denoise_iterations=4, shadow_ray_margin=0.1)
        scene = scenes.procedural_mesh(5_000, sun=True)
        gpu = scene.compile(bvh_leaf_size=cfg.bvh_leaf_size)
        frame = scene.camera.viewport_frame(cfg.width, cfg.height)
        mesh = make_ray_mesh()
        img_s = np.asarray(jax.jit(
            lambda g, f: render_pipeline_sharded(g, f, cfg, mesh, 0),
        )(gpu, frame))
        img_u = np.asarray(jax.jit(
            lambda g, f: render_pipeline_gpu(g, f, cfg, 0))(gpu, frame))
        np.testing.assert_allclose(img_s, img_u, atol=2e-5)


class TestGradOnDevice:
    def test_pipeline_grad_finite_on_tpu(self):
        """Gradients THROUGH the full pipeline on the real chip: the
        denoise dispatch must route AD traces to the XLA stencil (the
        r3 JVPTracer check never fired on current JAX — LinearizeTracer
        — so this exact composition was broken on hardware)."""
        from realtimeraytracer_tpu import RenderConfig, scenes
        from realtimeraytracer_tpu.diff.optimize import pipeline_loss

        cfg = RenderConfig(width=64, height=36, primary_rays=1,
                           jitter=False, shadow_rays=1,
                           denoise_iterations=2, shadow_ray_margin=0.1)
        scene = scenes.procedural_mesh(2_000, sun=True)
        gpu = scene.compile(bvh_leaf_size=cfg.bvh_leaf_size)
        frame = scene.camera.viewport_frame(cfg.width, cfg.height)
        target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)

        g = jax.jit(jax.grad(lambda c: pipeline_loss(
            {"obj_color": c}, gpu, cfg, frame, 0, target)))(gpu.obj_color)
        g = np.asarray(g)
        assert np.isfinite(g).all()
        assert np.abs(g).sum() > 0


class TestCompiledAlpha:
    def test_alpha_wrapper_compiled_matches_cpu(self):
        """Alpha-tested any-hit (re-trace ladder) on the compiled kernel
        vs the CPU oracle."""
        from realtimeraytracer_tpu import render
        from realtimeraytracer_tpu.config import RenderConfig
        from realtimeraytracer_tpu.cpu_ref.renderer import render_reference
        from tests.test_alpha import _alpha_scene

        cfg = RenderConfig(width=32, height=32, primary_rays=1, jitter=False,
                           shadow_rays=1, denoise_iterations=0,
                           alpha_test=True)   # use_bvh True: hier + alpha
        scene = _alpha_scene()
        got = np.asarray(render(scene, cfg))
        want = render_reference(scene, cfg.replace(use_bvh=False))
        err = np.abs(got - want)
        assert (err > 2e-3).mean() <= 6e-3, f"{(err > 2e-3).mean():.4%}"
