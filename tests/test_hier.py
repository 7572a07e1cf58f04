"""v8 hierarchical traversal kernel vs brute force + v7 equivalence
(interpret mode on CPU).  render/hier_backend.py."""

import jax.numpy as jnp
import numpy as np
import pytest

from realtimeraytracer_tpu.config import RenderConfig
from realtimeraytracer_tpu.ops import intersect
from realtimeraytracer_tpu.scene.geometry import TriangleMesh
from realtimeraytracer_tpu.scene.scene import Scene


def _gpu(n, seed=0):
    r = np.random.default_rng(seed)
    base = r.uniform(-4, 4, (n, 1, 3))
    tris = (base + r.normal(0, 0.3, (n, 3, 3))).astype(np.float32)
    verts = tris.reshape(-1, 3)
    faces = np.arange(3 * n, dtype=np.int32).reshape(n, 3)
    s = Scene()
    s.add(TriangleMesh(vertices=verts, faces=faces))
    return s.compile(bvh_threshold=0)


def _rays(n, seed=1):
    r = np.random.default_rng(seed)
    o = r.uniform(-6, 6, (n, 3)).astype(np.float32)
    d = r.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


CFG = RenderConfig()


class TestHierKernel:
    def test_closest_exact_vs_brute(self):
        from realtimeraytracer_tpu.render.hier_backend import hier_closest

        gpu = _gpu(700)
        o, d = _rays(512)
        got = hier_closest(gpu, CFG, o, d, 1e-3, 1e4)
        want = intersect.intersect_tris_bruteforce(
            o, d, gpu.vertices, gpu.faces, 1e-3, 1e4)
        np.testing.assert_array_equal(np.asarray(got.prim_id >= 0),
                                      np.asarray(want.prim_id >= 0))
        hit = np.asarray(want.prim_id >= 0)
        np.testing.assert_array_equal(np.asarray(got.prim_id)[hit],
                                      np.asarray(want.prim_id)[hit])
        np.testing.assert_allclose(np.asarray(got.t)[hit],
                                   np.asarray(want.t)[hit], rtol=1e-3)

    def test_occluded_exact_vs_brute(self):
        from realtimeraytracer_tpu.render.hier_backend import hier_occluded

        gpu = _gpu(500, seed=3)
        o, d = _rays(300, seed=4)           # non-multiple of tile
        tmax = jnp.full((300,), 3.0)
        got = hier_occluded(gpu, CFG, o, d, 1e-3, tmax)
        want = intersect.occluded_tris_bruteforce(
            o, d, gpu.vertices, gpu.faces, 1e-3, tmax)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_multi_super_scene(self):
        """>16384 tris forces multiple superclusters through L1."""
        from realtimeraytracer_tpu.render.hier_backend import hier_closest

        gpu = _gpu(17000, seed=5)
        o, d = _rays(256, seed=6)
        got = hier_closest(gpu, CFG, o, d, 1e-3, 1e4)
        want = intersect.intersect_tris_bruteforce(
            o, d, gpu.vertices, gpu.faces, 1e-3, 1e4)
        np.testing.assert_array_equal(np.asarray(got.prim_id >= 0),
                                      np.asarray(want.prim_id >= 0))
        hit = np.asarray(want.prim_id >= 0)
        np.testing.assert_allclose(np.asarray(got.t)[hit],
                                   np.asarray(want.t)[hit], rtol=1e-3)

    @pytest.mark.parametrize("common", [None, "origin", "dir"])
    def test_matches_v7_kernel(self, common):
        """v8 must agree with v7 (which itself is brute-equal) under every
        collapsed-dot fast path."""
        from realtimeraytracer_tpu.render.hier_backend import hier_closest
        from realtimeraytracer_tpu.render.pallas_backend import pallas_closest

        gpu = _gpu(900, seed=7)
        o, d = _rays(256, seed=8)
        if common == "origin":
            o = jnp.broadcast_to(o[:1], o.shape)
        elif common == "dir":
            d = jnp.broadcast_to(d[:1], d.shape)
        got = hier_closest(gpu, CFG, o, d, 1e-3, 1e4, common=common)
        want = pallas_closest(gpu, CFG, o, d, 1e-3, 1e4, common=common)
        np.testing.assert_array_equal(np.asarray(got.prim_id),
                                      np.asarray(want.prim_id))
        np.testing.assert_array_equal(np.asarray(got.t), np.asarray(want.t))

    def test_render_through_hier_backend(self):
        """End-to-end shading over the v8 backend."""
        from realtimeraytracer_tpu import RenderConfig as RC, render, scenes

        cfg = RC(width=32, height=32, primary_rays=1, jitter=False,
                 shadow_rays=1, denoise_iterations=0, backend="hier")
        img = np.asarray(render(scenes.procedural_mesh(500, sun=True), cfg))
        cfg_b = cfg.replace(backend="brute", use_bvh=False)
        ref = np.asarray(render(scenes.procedural_mesh(500, sun=True), cfg_b))
        err = np.abs(img - ref)
        assert np.isfinite(img).all()
        assert (err > 2e-3).mean() < 5e-3


class TestMultiSegmentOcclusion:
    """Fused S-sample shadow query == per-sample occluded, exactly."""

    def test_multi_equals_singles(self):
        from realtimeraytracer_tpu.ops.intersect import BIG_T
        from realtimeraytracer_tpu.render.hier_backend import (
            hier_occluded,
            hier_occluded_multi,
        )

        gpu = _gpu(700)
        r = np.random.default_rng(9)
        R = 300
        o = jnp.asarray(r.uniform(-6, 6, (R, 3)).astype(np.float32))
        target = np.array([0.0, 8.0, 0.0], np.float32)
        dirs_s, this = [], []
        for _ in range(3):
            lp = target + r.normal(0, 0.5, (R, 3)).astype(np.float32)
            delta = lp - np.asarray(o)
            dist = np.linalg.norm(delta, axis=1)
            dirs_s.append(jnp.asarray(delta / dist[:, None]))
            this.append(jnp.asarray((dist - 0.5).astype(np.float32)))
        act = r.random(R) > 0.2                 # inactive-lane coverage
        tlo = jnp.asarray(np.where(act, 1e-3, BIG_T).astype(np.float32))
        this = [jnp.asarray(np.where(act, np.asarray(h), -BIG_T)
                            .astype(np.float32)) for h in this]
        multi = hier_occluded_multi(gpu, CFG, o, dirs_s, tlo, this)
        for s in range(3):
            single = hier_occluded(gpu, CFG, o, dirs_s[s], tlo, this[s])
            np.testing.assert_array_equal(np.asarray(multi[s]),
                                          np.asarray(single))

    def test_megakernel_uses_multi_and_matches(self):
        """Render with the fused path == render with it disabled."""
        from realtimeraytracer_tpu import RenderConfig as RC, scenes
        from realtimeraytracer_tpu.render.backends import make_backend
        from realtimeraytracer_tpu.render.megakernel import render_components
        from realtimeraytracer_tpu.ops.camera_rays import ViewportFrame

        scene = scenes.procedural_mesh(600, sun=True)
        gpu = scene.compile(bvh_threshold=0)
        cfg = RC(width=32, height=24, primary_rays=1, jitter=False,
                 shadow_rays=3, denoise_iterations=0, backend="hier",
                 shadow_ray_margin=0.05)
        frame = scene.camera.viewport_frame(cfg.width, cfg.height)
        from realtimeraytracer_tpu.render.hier_backend import (
            hier_occluded_multi)

        be = make_backend(gpu, cfg)
        fused = be._replace(occluded_multi=(
            lambda o, ds, lo, hs: hier_occluded_multi(gpu, cfg, o, ds, lo, hs)))
        a = render_components(gpu, frame, cfg, 0, fused)
        b = render_components(gpu, frame, cfg, 0, be)
        np.testing.assert_array_equal(np.asarray(a.shadowed),
                                      np.asarray(b.shadowed))
        np.testing.assert_array_equal(np.asarray(a.analytic),
                                      np.asarray(b.analytic))


class TestBatchedOcclusion:
    """Frame-wide batched shadow trace == per-segment traces, exactly.

    cfg.batch_occlusion concatenates all (light x sample) segments into
    one occluded() launch (render/megakernel.py unrolled driver); per-tile
    work is identical, so results must be bit-equal to the per-segment
    path on the same backend.
    """

    def test_batched_equals_separate(self):
        from realtimeraytracer_tpu import RenderConfig as RC, scenes
        from realtimeraytracer_tpu.render.backends import make_backend
        from realtimeraytracer_tpu.render.megakernel import render_components

        scene = scenes.procedural_mesh(600, sun=True)
        gpu = scene.compile(bvh_threshold=0)
        base = RC(width=32, height=24, primary_rays=1, jitter=False,
                  shadow_rays=3, denoise_iterations=0, backend="hier",
                  shadow_ray_margin=0.05)
        frame = scene.camera.viewport_frame(base.width, base.height)

        cfg_b = base.replace(batch_occlusion=True, batch_occlusion_min_rays=0)
        cfg_s = base.replace(batch_occlusion=False)
        a = render_components(gpu, frame, cfg_b, 0, make_backend(gpu, cfg_b))
        b = render_components(gpu, frame, cfg_s, 0, make_backend(gpu, cfg_s))
        np.testing.assert_array_equal(np.asarray(a.shadowed),
                                      np.asarray(b.shadowed))
        np.testing.assert_array_equal(np.asarray(a.unshadowed),
                                      np.asarray(b.unshadowed))
        np.testing.assert_array_equal(np.asarray(a.analytic),
                                      np.asarray(b.analytic))


class TestHintedOcclusion:
    """Cross-sample shadow-hint warm start (r5): exactness + chaining."""

    def test_hinted_equals_unhinted(self):
        from realtimeraytracer_tpu.render.hier_backend import (
            hier_occluded, hier_occluded_hinted)

        gpu = _gpu(900, seed=11)
        o, d = _rays(384, seed=12)
        tmax = jnp.full((384,), 4.0)
        want = hier_occluded(gpu, CFG, o, d, 1e-3, tmax)

        # cold (no hints), then chained, then adversarial garbage hints —
        # all must produce the identical mask.
        got0, h0 = hier_occluded_hinted(gpu, CFG, o, d, 1e-3, tmax)
        np.testing.assert_array_equal(np.asarray(got0), np.asarray(want))
        got1, h1 = hier_occluded_hinted(gpu, CFG, o, d, 1e-3, tmax,
                                        hints=h0)
        np.testing.assert_array_equal(np.asarray(got1), np.asarray(want))
        ts = h0.shape[0]
        bad = jnp.stack([jnp.full((ts,), 10_000, jnp.int32),
                         jnp.full((ts,), -1, jnp.int32)], axis=1)
        got2, _ = hier_occluded_hinted(gpu, CFG, o, d, 1e-3, tmax,
                                       hints=bad)
        np.testing.assert_array_equal(np.asarray(got2), np.asarray(want))

    def test_hints_identify_real_occluders(self):
        from realtimeraytracer_tpu.render.hier_backend import (
            hier_occluded_hinted)

        gpu = _gpu(600, seed=13)
        o, d = _rays(256, seed=14)
        tmax = jnp.full((256,), 5.0)
        occ, hints = hier_occluded_hinted(gpu, CFG, o, d, 1e-3, tmax)
        hints = np.asarray(hints)
        occ = np.asarray(occ).reshape(-1, 128)
        cb = gpu.pallas_panels.shape[0]
        for i in range(hints.shape[0]):
            if occ[i].any():
                assert 0 <= hints[i, 0] < cb
                assert 0 <= hints[i, 1] < cb
            else:
                assert (hints[i] == -1).all()

    def test_megakernel_hint_chain_matches(self):
        """Full shade_sample with a hint-chaining backend must equal the
        plain-occluded render bit for bit."""
        import jax

        from realtimeraytracer_tpu.ops.camera_rays import generate_rays
        from realtimeraytracer_tpu.render.hier_backend import (
            make_hier_backend)
        from realtimeraytracer_tpu.render.megakernel import shade_sample
        from realtimeraytracer_tpu.scene.lights import AreaLight

        r = np.random.default_rng(21)
        base = r.uniform(-3, 3, (800, 1, 3))
        tris = (base + r.normal(0, 0.25, (800, 3, 3))).astype(np.float32)
        s = Scene()
        s.add(TriangleMesh(vertices=tris.reshape(-1, 3),
                           faces=np.arange(2400,
                                           dtype=np.int32).reshape(800, 3)))
        light = AreaLight(intensity=40.0)
        light.rotate("x", 90.0).scale(2.0).move(0.0, 5.0, 0.0)
        s.add(light)
        gpu = s.compile(bvh_threshold=0)
        cfg = RenderConfig(width=64, height=32, shadow_rays=2)
        frame = s.camera.viewport_frame(cfg.width, cfg.height)
        o, d = generate_rays(frame, cfg.width, cfg.height, jitter=False)
        seeds = jnp.arange(o.shape[0], dtype=jnp.uint32)
        backend = make_hier_backend(gpu, cfg)
        assert backend.occluded_hinted is not None
        out_h = shade_sample(gpu, cfg, o, d, seeds, backend, hint_state={})
        out_p = shade_sample(gpu, cfg, o, d, seeds,
                             backend._replace(occluded_hinted=None))
        for a, b in zip(out_h, out_p):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
