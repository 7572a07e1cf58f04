"""Gradient tests: autodiff vs finite differences (BASELINE: rtol 1e-4-ish;
f32 finite differences warrant a looser practical tolerance)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realtimeraytracer_tpu import RenderConfig, scenes
from realtimeraytracer_tpu.diff.optimize import apply_params, radiance_loss
from realtimeraytracer_tpu.ops.camera_rays import generate_rays


def _setup(scene, cfg):
    gpu = scene.compile()
    frame = scene.camera.viewport_frame(cfg.width, cfg.height)
    o, d = generate_rays(frame, cfg.width, cfg.height, jitter=False)
    seed = jnp.arange(o.shape[0], dtype=jnp.uint32)
    return gpu, o, d, seed


CFG = RenderConfig(width=24, height=24, primary_rays=1, shadow_rays=1,
                   denoise_iterations=0, jitter=False, use_bvh=False,
                   shadow_ray_margin=0.02)


class TestGradients:
    def test_albedo_grad_matches_fd(self):
        gpu, o, d, seed = _setup(scenes.cornell_box(), CFG)
        target = jnp.zeros((o.shape[0], 3), jnp.float32)

        def loss(color):
            return radiance_loss({"obj_color": color}, gpu, CFG, o, d, seed, target)

        g = jax.grad(loss)(gpu.obj_color)
        g = np.asarray(g)
        # Finite differences on a few entries.
        rng = np.random.default_rng(0)
        base = np.asarray(gpu.obj_color)
        f0 = float(loss(gpu.obj_color))
        checked = 0
        for _ in range(6):
            i = rng.integers(0, base.shape[0])
            j = rng.integers(0, 3)
            eps = 1e-3
            pert = base.copy()
            pert[i, j] += eps
            f1 = float(loss(jnp.asarray(pert)))
            fd = (f1 - f0) / eps
            if abs(fd) < 1e-6 and abs(g[i, j]) < 1e-6:
                continue
            np.testing.assert_allclose(g[i, j], fd, rtol=0.05, atol=1e-5)
            checked += 1
        assert checked >= 2

    def test_light_intensity_grad(self):
        gpu, o, d, seed = _setup(scenes.cornell_box(), CFG)
        target = jnp.zeros((o.shape[0], 3), jnp.float32)

        def loss(inten):
            return radiance_loss({"lt_intensity": inten}, gpu, CFG, o, d, seed, target)

        g = np.asarray(jax.grad(loss)(gpu.lt_intensity))
        eps = 1e-3
        f0 = float(loss(gpu.lt_intensity))
        f1 = float(loss(gpu.lt_intensity + eps))
        fd = (f1 - f0) / (eps * 1)  # both entries perturbed -> sum of grads
        np.testing.assert_allclose(g.sum(), fd, rtol=0.05)

    def test_vertex_grad_flows(self):
        gpu, o, d, seed = _setup(scenes.sphere_plane(), CFG)
        target = jnp.full((o.shape[0], 3), 0.1, jnp.float32)

        def loss(verts):
            return radiance_loss({"vertices": verts}, gpu, CFG, o, d, seed, target)

        g = np.asarray(jax.grad(loss)(gpu.vertices))
        assert np.isfinite(g).all()
        assert np.abs(g).max() > 0.0

    def test_grad_finite_through_bvh_backend(self):
        # 500-tri scene forces the BVH path; grads must stay finite and
        # flow to materials through the straight-through hit recompute.
        cfg = CFG.replace(use_bvh=True)
        scene = scenes.procedural_mesh(500, sun=True)
        gpu = scene.compile(bvh_threshold=0)
        frame = scene.camera.viewport_frame(cfg.width, cfg.height)
        o, d = generate_rays(frame, cfg.width, cfg.height, jitter=False)
        seed = jnp.arange(o.shape[0], dtype=jnp.uint32)
        target = jnp.zeros((o.shape[0], 3), jnp.float32)

        g = jax.grad(
            lambda c: radiance_loss({"obj_color": c}, gpu, cfg, o, d, seed, target)
        )(gpu.obj_color)
        g = np.asarray(g)
        assert np.isfinite(g).all()
        assert np.abs(g).sum() > 0


class TestOptimization:
    def test_albedo_recovery_improves(self):
        """Tiny inverse-rendering smoke: loss decreases recovering albedo."""
        import optax

        from realtimeraytracer_tpu.diff.optimize import (
            TrainState, extract_params, make_train_step)
        from realtimeraytracer_tpu.parallel.mesh import make_ray_mesh
        from realtimeraytracer_tpu.render.backends import make_backend
        from realtimeraytracer_tpu.render.megakernel import shade_sample

        gpu, o, d, seed = _setup(scenes.cornell_box(), CFG)
        backend = make_backend(gpu, CFG)
        target = shade_sample(gpu, CFG, o, d, seed, backend).analytic

        # Perturb the albedo, then recover.
        wrong = gpu._replace(obj_color=gpu.obj_color * 0.5 + 0.2)
        mesh = make_ray_mesh(1)
        optimizer = optax.adam(5e-2)
        params = extract_params(wrong, ("obj_color",))
        state = TrainState(params, optimizer.init(params))
        step = jax.jit(make_train_step(CFG, mesh, optimizer))
        losses = []
        for _ in range(10):
            state, loss = step(state, wrong, o, d, seed, target)
            losses.append(float(loss))
        assert losses[-1] < losses[0] * 0.5
