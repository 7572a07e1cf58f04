"""Sharding tests on the virtual 8-device CPU mesh.

SURVEY.md §4: mesh/sharding/psum tested via
xla_force_host_platform_device_count; the same shard_map path runs on 1
chip, N local devices and multi-host unchanged.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realtimeraytracer_tpu import RenderConfig, scenes
from realtimeraytracer_tpu.ops.camera_rays import generate_rays
from realtimeraytracer_tpu.parallel.mesh import make_ray_mesh
from realtimeraytracer_tpu.parallel.sharded import (
    render_components_sharded,
    render_pipeline_sharded,
)
from realtimeraytracer_tpu.render.backends import make_backend
from realtimeraytracer_tpu.render.megakernel import render_components
from realtimeraytracer_tpu.render.pipeline import render_pipeline_gpu

CFG = RenderConfig(width=32, height=32, primary_rays=1, shadow_rays=1,
                   denoise_iterations=1, jitter=False, use_bvh=False,
                   shadow_ray_margin=0.02)


def test_eight_virtual_devices_present():
    assert len(jax.devices()) >= 8


class TestShardedEquivalence:
    def test_sharded_matches_single_device(self):
        scene = scenes.cornell_box()
        gpu = scene.compile()
        frame = scene.camera.viewport_frame(CFG.width, CFG.height)
        mesh = make_ray_mesh(8)

        single = render_pipeline_gpu(gpu, frame, CFG)
        sharded = render_pipeline_sharded(gpu, frame, CFG, mesh)
        np.testing.assert_allclose(np.asarray(sharded), np.asarray(single),
                                   atol=1e-5)

    def test_sharded_under_jit(self):
        scene = scenes.sphere_plane()
        gpu = scene.compile()
        frame = scene.camera.viewport_frame(CFG.width, CFG.height)
        mesh = make_ray_mesh(8)
        fn = jax.jit(lambda g, f: render_pipeline_sharded(g, f, CFG, mesh))
        img = fn(gpu, frame)
        assert img.shape == (32, 32, 3)
        assert np.isfinite(np.asarray(img)).all()

    def test_sharded_wavefront_matches_single_device(self):
        """Multi-bounce wavefront step sharded over 8 devices == the
        single-device trace_paths bit-for-bit (paths are independent;
        per-shard coherence reorders are pure perf permutations)."""
        from realtimeraytracer_tpu.ops.camera_rays import generate_rays
        from realtimeraytracer_tpu.parallel.sharded import (
            wavefront_sample_sharded,
        )
        from realtimeraytracer_tpu.render.wavefront import trace_paths

        cfg = CFG.replace(max_bounces=2, denoise_iterations=0)
        scene = scenes.cornell_box()
        gpu = scene.compile()
        frame = scene.camera.viewport_frame(cfg.width, cfg.height)
        o, d = generate_rays(frame, cfg.width, cfg.height, jitter=False)
        seed = jnp.arange(o.shape[0], dtype=jnp.uint32)
        mesh = make_ray_mesh(8)

        single = trace_paths(gpu, cfg, o, d, seed)
        sharded = wavefront_sample_sharded(gpu, cfg, o, d, seed, mesh)
        np.testing.assert_allclose(np.asarray(sharded), np.asarray(single),
                                   atol=1e-5)


class TestShardedGradients:
    def test_psum_grads_match_single_device(self):
        import optax

        from realtimeraytracer_tpu.diff.optimize import (
            extract_params, make_train_step, TrainState)

        scene = scenes.cornell_box()
        gpu = scene.compile()
        frame = scene.camera.viewport_frame(CFG.width, CFG.height)
        o, d = generate_rays(frame, CFG.width, CFG.height, jitter=False)
        seed = jnp.arange(o.shape[0], dtype=jnp.uint32)
        backend = make_backend(gpu, CFG)
        from realtimeraytracer_tpu.render.megakernel import shade_sample

        target = shade_sample(gpu, CFG, o, d, seed, backend).analytic

        wrong = gpu._replace(obj_color=gpu.obj_color * 0.7)
        optimizer = optax.adam(1e-2)
        params = extract_params(wrong, ("obj_color",))

        results = []
        for n in (1, 8):
            mesh = make_ray_mesh(n)
            state = TrainState(params, optimizer.init(params))
            step = jax.jit(make_train_step(CFG, mesh, optimizer))
            st, loss = step(state, wrong, o, d, seed, target)
            results.append((np.asarray(st.params["obj_color"]), float(loss)))

        np.testing.assert_allclose(results[0][0], results[1][0], atol=1e-5)
        np.testing.assert_allclose(results[0][1], results[1][1], rtol=1e-5)


def test_graft_entry_dryrun():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[2] == 3
    ge.dryrun_multichip(8)


class TestWorkDivision:
    def test_sharded_work_divides_by_device_count(self):
        """BASELINE >=85% linear scaling, checked the hardware-independent
        way: XLA cost analysis of the sharded program must show per-device
        FLOPs ~ total/N (the virtual CPU mesh shares one socket, so
        wall-clock cannot scale; SCALING_r02.json records both)."""
        import benchmarks.scaling as sc

        from realtimeraytracer_tpu import RenderConfig, scenes

        cfg = RenderConfig(width=128, height=128, primary_rays=1,
                           shadow_rays=1, denoise_iterations=0,
                           shadow_ray_margin=0.05)
        scene = scenes.procedural_mesh(2_000)
        gpu = scene.compile(bvh_leaf_size=cfg.bvh_leaf_size)
        frame = scene.camera.viewport_frame(cfg.width, cfg.height)
        f1 = sc.per_device_flops(cfg, gpu, frame, 1)
        f8 = sc.per_device_flops(cfg, gpu, frame, 8)
        assert f1 > 0 and f8 > 0
        # report may be per-shard or global; normalize both ways
        per_dev8 = f8 if f8 < 0.6 * f1 else f8 / 8
        eff = f1 / (8 * per_dev8)
        assert eff >= 0.85, f"work-division efficiency {eff:.2%} < 85%"


class TestShardedDenoiser:
    def test_halo_exchanged_denoise_matches_unsharded(self):
        """Row-sharded A-Trous with per-iteration halo ppermute must equal
        the unsharded pipeline exactly — same per-pixel arithmetic, halo
        rows supplied by neighbors (VERDICT r3 next #7)."""
        import jax

        from realtimeraytracer_tpu import scenes
        from realtimeraytracer_tpu.parallel.sharded import (
            render_pipeline_sharded)
        from realtimeraytracer_tpu.render.pipeline import render_pipeline_gpu

        # 64 rows over 8 devices = 8 rows/device — exactly the
        # 2*iterations halo a single ring neighbor can supply.
        cfg = CFG.replace(denoise_iterations=4, width=64, height=64)
        scene = scenes.cornell_box()
        gpu = scene.compile()
        frame = scene.camera.viewport_frame(cfg.width, cfg.height)
        mesh = make_ray_mesh(8)
        img_s = np.asarray(jax.jit(
            lambda g, f: render_pipeline_sharded(g, f, cfg, mesh, 0))(
                gpu, frame))
        img_u = np.asarray(jax.jit(
            lambda g, f: render_pipeline_gpu(g, f, cfg, 0))(gpu, frame))
        np.testing.assert_allclose(img_s, img_u, atol=1e-6)

    def test_sharded_denoise_hlo_has_no_full_gather(self):
        """The compiled 8-device pipeline must contain collective ops only
        of halo size: ppermutes of (2*iters, W, 3) slabs, never an
        all-gather of the full image before denoising."""
        import jax

        from realtimeraytracer_tpu import scenes
        from realtimeraytracer_tpu.parallel.sharded import (
            render_pipeline_sharded)

        cfg = CFG.replace(denoise_iterations=4, width=64, height=64)
        scene = scenes.cornell_box()
        gpu = scene.compile()
        frame = scene.camera.viewport_frame(cfg.width, cfg.height)
        mesh = make_ray_mesh(8)
        hlo = jax.jit(
            lambda g, f: render_pipeline_sharded(g, f, cfg, mesh, 0)
        ).lower(gpu, frame).compile().as_text()
        assert "collective-permute" in hlo, "halo exchange missing"
        # No all-gather reconstructing the (H, W, 3) image mid-pipeline.
        for line in hlo.splitlines():
            if "all-gather" in line and "f32[64,64,3]" in line:
                raise AssertionError(f"full-image gather found: {line}")
