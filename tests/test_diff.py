"""Gradient tests to BASELINE spec.

BASELINE.md asks gradient allclose "rtol 1e-4 vs CPU reference".  The whole
forward pass is float32 (TPU-native; SURVEY.md §7 numerics), so a finite-
difference oracle built from f32 loss evaluations carries ~1e-7|f|/h noise;
rtol 1e-4 is below that floor.  The oracle here is therefore
Richardson-extrapolated central differences (two step sizes, O(h^4)
truncation) with a smoothness gate — entries where the two central
estimates disagree (silhouette jumps, FD noise) are skipped, and the
remaining entries are asserted at **rtol 1e-3**, the f32-realistic bound
(VERDICT r1 item 4).  Backend-grad equivalence is asserted much tighter:
every traversal backend returns the same integer hit ids, and the surface
resolver recomputes all continuous quantities from the scene arrays, so
grads through brute / wide / pallas must agree to f32 roundoff.
"""

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


def richardson_check(loss_fn, base, entries, grad, h, rtol=1e-3,
                     min_checked=3):
    """Assert autodiff grad entries against Richardson-extrapolated central
    differences.  Returns how many entries passed the smoothness gate.

    Gate: the h and h/2 central estimates must agree to 0.5% — entries where
    they don't are non-smooth (discrete hit changes) or noise-dominated, and
    no FD oracle is valid there."""
    base = np.asarray(base, np.float64)
    checked = 0
    for idx in entries:
        def f(delta):
            pert = base.copy()
            pert[idx] += delta
            return float(loss_fn(jnp.asarray(pert, jnp.float32)))

        d_h = (f(h) - f(-h)) / (2.0 * h)
        d_h2 = (f(h / 2) - f(-h / 2)) / h
        dr = (4.0 * d_h2 - d_h) / 3.0
        if abs(d_h - d_h2) > max(5e-3 * abs(dr), 2e-6):
            continue
        if abs(dr) < 1e-6 and abs(float(grad[idx])) < 1e-6:
            checked += 1
            continue
        np.testing.assert_allclose(float(grad[idx]), dr, rtol=rtol, atol=2e-6,
                                   err_msg=f"entry {idx}")
        checked += 1
    assert checked >= min_checked, (
        f"only {checked} entries passed the smoothness gate")
    return checked


class TestGradients:
    def test_albedo_grad_richardson(self):
        gpu, o, d, seed = _setup(scenes.cornell_box(), CFG)
        target = jnp.zeros((o.shape[0], 3), jnp.float32)

        def loss(color):
            return radiance_loss({"obj_color": color}, gpu, CFG, o, d, seed,
                                 target)

        g = np.asarray(jax.grad(loss)(gpu.obj_color), np.float64)
        rng = np.random.default_rng(0)
        n_obj = gpu.obj_color.shape[0]
        entries = [(int(rng.integers(0, n_obj)), int(rng.integers(0, 3)))
                   for _ in range(10)]
        richardson_check(loss, gpu.obj_color, entries, g, h=4e-3,
                         rtol=1e-3, min_checked=4)

    def test_light_intensity_grad_richardson(self):
        gpu, o, d, seed = _setup(scenes.cornell_box(), CFG)
        target = jnp.zeros((o.shape[0], 3), jnp.float32)

        def loss(inten):
            return radiance_loss({"lt_intensity": inten}, gpu, CFG, o, d,
                                 seed, target)

        g = np.asarray(jax.grad(loss)(gpu.lt_intensity), np.float64)
        entries = [(i,) for i in range(gpu.lt_intensity.shape[0])]
        richardson_check(loss, gpu.lt_intensity, entries, g, h=2e-3,
                         rtol=1e-3, min_checked=1)

    def test_vertex_grad_values(self):
        """Vertex gradients VALUE-checked against the Richardson oracle (not
        just finite/nonzero): geometry grads flow through the differentiable
        surface recompute (render/surface.py)."""
        gpu, o, d, seed = _setup(scenes.sphere_plane(), CFG)
        target = jnp.full((o.shape[0], 3), 0.1, jnp.float32)

        def loss(verts):
            return radiance_loss({"vertices": verts}, gpu, CFG, o, d, seed,
                                 target)

        g = np.asarray(jax.grad(loss)(gpu.vertices), np.float64)
        assert np.isfinite(g).all()
        # Rank vertex coords by |grad| and FD-check the most influential
        # ones; the smoothness gate drops silhouette-jump entries where no
        # FD oracle exists (the discrete hit change is not differentiable).
        flat = np.argsort(-np.abs(g).ravel())[:12]
        entries = [tuple(np.unravel_index(i, g.shape)) for i in flat]
        richardson_check(loss, gpu.vertices, entries, g, h=2e-3,
                         rtol=1e-3, min_checked=3)

    @pytest.mark.parametrize("kind", ["wide", "pallas"])
    def test_backend_grad_equivalence(self, kind):
        """Grads through the BVH backends must match the brute backend's:
        all backends return identical hit ids and the continuous quantities
        are recomputed outside the backend, so agreement is f32-roundoff
        tight (far tighter than any FD oracle)."""
        scene = scenes.procedural_mesh(500, sun=True)
        gpu = scene.compile(bvh_threshold=0)
        cfg_b = CFG.replace(use_bvh=True, backend="brute", width=16, height=16)
        cfg_k = cfg_b.replace(backend=kind)
        frame = scene.camera.viewport_frame(cfg_b.width, cfg_b.height)
        o, d = generate_rays(frame, cfg_b.width, cfg_b.height, jitter=False)
        seed = jnp.arange(o.shape[0], dtype=jnp.uint32)
        target = jnp.zeros((o.shape[0], 3), jnp.float32)

        def grads(cfg):
            def loss(params):
                return radiance_loss(params, gpu, cfg, o, d, seed, target)

            return jax.grad(loss)({"obj_color": gpu.obj_color,
                                   "vertices": gpu.vertices})

        g_brute = grads(cfg_b)
        g_kind = grads(cfg_k)
        for name in ("obj_color", "vertices"):
            a = np.asarray(g_brute[name])
            b = np.asarray(g_kind[name])
            np.testing.assert_allclose(b, a, rtol=2e-5, atol=1e-7,
                                       err_msg=f"{kind} vs brute: {name}")
        assert np.abs(np.asarray(g_brute["obj_color"])).sum() > 0
        assert np.abs(np.asarray(g_brute["vertices"])).sum() > 0


class TestFullPipelineGradients:
    """Gradients through the COMPLETE pipeline — denoise + ratio combine
    included (VERDICT r2 weak #4) — at the same Richardson rigor."""

    def test_pipeline_albedo_grad_richardson(self):
        from realtimeraytracer_tpu.diff.optimize import pipeline_loss

        scene = scenes.cornell_box()
        cfg = CFG.replace(denoise_iterations=2)  # denoiser IN the graph
        gpu = scene.compile()
        frame = scene.camera.viewport_frame(cfg.width, cfg.height)
        target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)

        def loss(color):
            return pipeline_loss({"obj_color": color}, gpu, cfg, frame, 0,
                                 target)

        g = np.asarray(jax.grad(loss)(gpu.obj_color), np.float64)
        assert np.isfinite(g).all() and np.abs(g).sum() > 0
        rng = np.random.default_rng(1)
        n_obj = gpu.obj_color.shape[0]
        entries = [(int(rng.integers(0, n_obj)), int(rng.integers(0, 3)))
                   for _ in range(10)]
        # rtol 3e-3 (vs 1e-3 for the shallow analytic loss): the denoiser
        # adds ~30 exp/mul layers of f32 to every pixel's dependency chain,
        # so FD noise at the smoothness-gate threshold is ~2-3x larger.
        richardson_check(loss, gpu.obj_color, entries, g, h=4e-3,
                         rtol=3e-3, min_checked=3)

    def test_pipeline_light_grad_richardson(self):
        from realtimeraytracer_tpu.diff.optimize import pipeline_loss

        scene = scenes.cornell_box()
        cfg = CFG.replace(denoise_iterations=2)
        gpu = scene.compile()
        frame = scene.camera.viewport_frame(cfg.width, cfg.height)
        target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)

        def loss(inten):
            return pipeline_loss({"lt_intensity": inten}, gpu, cfg, frame, 0,
                                 target)

        g = np.asarray(jax.grad(loss)(gpu.lt_intensity), np.float64)
        entries = [(i,) for i in range(gpu.lt_intensity.shape[0])]
        richardson_check(loss, gpu.lt_intensity, entries, g, h=2e-3,
                         rtol=3e-3, min_checked=1)

    def test_wavefront_albedo_grad_richardson(self):
        """One gradient through the multi-bounce wavefront path tracer."""
        from realtimeraytracer_tpu.diff.optimize import wavefront_loss

        scene = scenes.cornell_box()
        cfg = CFG.replace(width=16, height=16, max_bounces=2,
                          sort_bounces=False)
        gpu = scene.compile()
        frame = scene.camera.viewport_frame(cfg.width, cfg.height)
        target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)

        def loss(color):
            return wavefront_loss({"obj_color": color}, gpu, cfg, frame, 0,
                                  target)

        g = np.asarray(jax.grad(loss)(gpu.obj_color), np.float64)
        assert np.isfinite(g).all() and np.abs(g).sum() > 0
        rng = np.random.default_rng(2)
        n_obj = gpu.obj_color.shape[0]
        entries = [(int(rng.integers(0, n_obj)), int(rng.integers(0, 3)))
                   for _ in range(8)]
        richardson_check(loss, gpu.obj_color, entries, g, h=4e-3,
                         rtol=1e-3, min_checked=2)

    def test_fit_full_pipeline_loss(self):
        """fit(loss='pipeline') recovers a perturbed albedo (the denoised
        frame is the training signal)."""
        from realtimeraytracer_tpu.diff.optimize import pipeline_loss
        from realtimeraytracer_tpu.diff.optimize import fit
        from realtimeraytracer_tpu.render.pipeline import render_pipeline_gpu

        scene = scenes.cornell_box()
        cfg = CFG.replace(width=16, height=16, denoise_iterations=1)
        gpu = scene.compile()
        frame = scene.camera.viewport_frame(cfg.width, cfg.height)
        target = render_pipeline_gpu(gpu, frame, cfg)
        wrong = gpu._replace(obj_color=gpu.obj_color * 0.4 + 0.3)
        start = float(pipeline_loss({"obj_color": wrong.obj_color}, wrong,
                                    cfg, frame, 0, target))
        _, losses = fit(wrong, cfg, target=target, frame=frame,
                        loss="pipeline", steps=12, learning_rate=5e-2)
        assert losses[-1] < start * 0.5


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


class TestDenoiseDispatchRobustness:
    """The Pallas-vs-XLA denoise dispatch must detect a JVP under ANY
    transform composition (VERDICT r3 weak #6): vmap-of-grad presents a
    BatchTracer WRAPPING a JVPTracer, which the old bare isinstance
    check missed."""

    def test_carries_jvp_under_transforms(self):
        from realtimeraytracer_tpu.render.pipeline import _carries_jvp

        seen = {}

        def probe(tag):
            def f(x):
                seen[tag] = _carries_jvp(x)
                return (x * x).sum()
            return f

        jax.jit(probe("jit"))(jnp.ones(4))
        jax.grad(probe("grad"))(jnp.ones(4))
        jax.vmap(jax.grad(probe("vmap_grad")))(jnp.ones((3, 4)))
        jax.jit(jax.vmap(jax.grad(probe("jit_vmap_grad"))))(jnp.ones((3, 4)))
        assert seen == {"jit": False, "grad": True, "vmap_grad": True,
                        "jit_vmap_grad": True}

    def test_vmap_of_grad_through_pipeline_loss(self):
        from realtimeraytracer_tpu.diff.optimize import pipeline_loss

        scene = scenes.cornell_box()
        cfg = CFG.replace(denoise_iterations=2)
        gpu = scene.compile()
        frame = scene.camera.viewport_frame(cfg.width, cfg.height)
        target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)

        def loss(inten):
            return pipeline_loss({"lt_intensity": inten}, gpu, cfg, frame, 0,
                                 target)

        # A batch of 3 light-intensity hypotheses, each differentiated —
        # the batched-inverse-rendering shape from the VERDICT.
        batch = jnp.stack([gpu.lt_intensity, gpu.lt_intensity * 1.1,
                           gpu.lt_intensity * 0.9])
        g = jax.vmap(jax.grad(loss))(batch)
        gb = np.asarray(g)
        assert np.isfinite(gb).all()
        g0 = np.asarray(jax.grad(loss)(gpu.lt_intensity))
        np.testing.assert_allclose(gb[0], g0, rtol=1e-5, atol=1e-7)
