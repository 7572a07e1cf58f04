"""Unit tests for the core ops against independent NumPy math.

SURVEY.md §4: per-kernel CPU/NumPy references (camera rays, Moller-Trumbore,
ray-sphere, LTC/GGX/BRDF math, tonemap) with allclose.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from realtimeraytracer_tpu.config import RenderConfig
from realtimeraytracer_tpu.ops import intersect, rng, tonemap
from realtimeraytracer_tpu.ops.camera_rays import generate_rays
from realtimeraytracer_tpu.ops.vecmath import normalize
from realtimeraytracer_tpu.scene.camera import Camera


class TestRng:
    def test_jax_matches_numpy(self):
        seeds = np.arange(1000, dtype=np.uint32)
        a = np.asarray(rng.uniform(jnp.asarray(seeds)))
        b = rng.uniform_np(seeds)
        np.testing.assert_array_equal(a, b)

    def test_uniform_range_and_spread(self):
        u = rng.uniform_np(np.arange(100000, dtype=np.uint32))
        assert (u >= 0).all() and (u < 1).all()
        assert abs(u.mean() - 0.5) < 0.01


class TestCameraRays:
    def test_center_ray_points_at_lookat(self):
        cam = Camera(position=(1.0, 2.0, 3.0), look_at=(0.0, 0.0, 0.0))
        fr = cam.viewport_frame(64, 64)
        o, d = generate_rays(fr, 64, 64, jitter=False)
        # Center of the image ~ the look direction.
        center = np.asarray(d.reshape(64, 64, 3))[32, 32]
        expect = -np.asarray([1.0, 2.0, 3.0])
        expect = expect / np.linalg.norm(expect)
        assert np.dot(center, expect) > 0.999

    def test_directions_unit_norm(self):
        cam = Camera(position=(0, 0, 5), look_at=(0, 0, 0), fov_y_degrees=70)
        fr = cam.viewport_frame(32, 16)
        _, d = generate_rays(fr, 32, 16, jitter=False)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(d), axis=-1), 1.0,
                                   rtol=1e-5)

    def test_fov_extent(self):
        cam = Camera(position=(0, 0, 0), look_at=(0, 0, -1), fov_y_degrees=90)
        fr = cam.viewport_frame(101, 101)
        _, d = generate_rays(fr, 101, 101, jitter=False)
        d = np.asarray(d.reshape(101, 101, 3))
        # Reference convention: pixel (0,0) center sits exactly at the
        # viewport corner (raygen.rgen:85-92 offsets by pixel+jitter-0.5),
        # so at fov 90 the top-middle ray has |y/z| = tan(45) = 1.
        top_mid = d[0, 50]
        assert abs(abs(top_mid[1] / top_mid[2]) - 1.0) < 1e-3


class TestIntersect:
    def test_ray_triangle_hit_miss(self):
        o = jnp.array([[0.0, 0.0, 1.0], [2.0, 2.0, 1.0]])
        d = jnp.array([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]])
        v0 = jnp.array([-1.0, -1.0, 0.0])
        v1 = jnp.array([1.0, -1.0, 0.0])
        v2 = jnp.array([0.0, 1.0, 0.0])
        t, u, v, ok = intersect.ray_triangle(o, d, v0, v1, v2)
        assert bool(ok[0]) and not bool(ok[1])
        np.testing.assert_allclose(float(t[0]), 1.0, rtol=1e-6)

    def test_barycentrics_reconstruct_point(self):
        key = np.random.default_rng(3)
        v0, v1, v2 = (key.normal(size=3).astype(np.float32) for _ in range(3))
        target = 0.2 * v0 + 0.5 * v1 + 0.3 * v2
        o = np.array([5.0, 5.0, 5.0], np.float32)
        d = (target - o) / np.linalg.norm(target - o)
        t, u, v, ok = intersect.ray_triangle(
            jnp.asarray(o)[None], jnp.asarray(d)[None],
            jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2))
        assert bool(ok[0])
        p = (1 - float(u[0]) - float(v[0])) * v0 + float(u[0]) * v1 + float(v[0]) * v2
        np.testing.assert_allclose(p, target, atol=1e-4)

    def test_ray_sphere(self):
        o = jnp.array([[0.0, 0.0, 5.0]])
        d = jnp.array([[0.0, 0.0, -1.0]])
        t, ok = intersect.ray_sphere(o, d, jnp.zeros(3), jnp.float32(1.0))
        assert bool(ok[0])
        np.testing.assert_allclose(float(t[0]), 4.0, rtol=1e-6)
        # inside the sphere -> far root
        t2, ok2 = intersect.ray_sphere(jnp.zeros((1, 3)), d, jnp.zeros(3),
                                       jnp.float32(1.0))
        np.testing.assert_allclose(float(t2[0]), 1.0, rtol=1e-6)

    def test_bruteforce_closest_picks_nearest(self):
        verts = jnp.array(
            [[-1, -1, 0], [1, -1, 0], [0, 1, 0],
             [-1, -1, -2], [1, -1, -2], [0, 1, -2]], jnp.float32)
        faces = jnp.array([[0, 1, 2], [3, 4, 5]], jnp.int32)
        o = jnp.array([[0.0, 0.0, 3.0]])
        d = jnp.array([[0.0, 0.0, -1.0]])
        hit = intersect.intersect_tris_bruteforce(o, d, verts, faces, 1e-3, 1e4)
        assert int(hit.prim_id[0]) == 0
        np.testing.assert_allclose(float(hit.t[0]), 3.0, rtol=1e-5)

    def test_occlusion_respects_tmax(self):
        verts = jnp.array([[-1, -1, 0], [1, -1, 0], [0, 1, 0]], jnp.float32)
        faces = jnp.array([[0, 1, 2]], jnp.int32)
        o = jnp.array([[0.0, 0.0, 3.0], [0.0, 0.0, 3.0]])
        d = jnp.array([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]])
        tmax = jnp.array([2.0, 4.0])  # occluder at t=3
        occ = intersect.occluded_tris_bruteforce(o, d, verts, faces, 1e-3, tmax)
        assert not bool(occ[0]) and bool(occ[1])


class TestTonemap:
    def test_aces_bounds(self):
        x = jnp.linspace(0, 20, 100)
        y = np.asarray(tonemap.aces_film(x))
        assert (y >= 0).all() and (y <= 1).all()
        assert y[-1] > 0.95

    def test_lut_matches_analytic(self):
        x = jnp.linspace(0, 7.5, 257)
        direct = np.asarray(tonemap.tonemap(x, "aces"))
        lut = np.asarray(tonemap.tonemap(x, "lut"))
        np.testing.assert_allclose(lut, direct, atol=2e-3)

    def test_srgb_roundtrip(self):
        x = jnp.linspace(0, 1, 64)
        y = tonemap.srgb_to_linear(tonemap.linear_to_srgb(x))
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)


class TestLtcLuts:
    def test_tables_load(self):
        from realtimeraytracer_tpu.scene.scene import load_ltc_tables

        t1, t2 = load_ltc_tables()
        assert t1.shape == (64, 64, 4) and t2.shape == (64, 64, 4)
        # Smooth-surface corner of LTC1 is the identity fit (a=1).
        np.testing.assert_allclose(t1[0, 0], [1, 0, 0, 2e-5], atol=1e-6)
