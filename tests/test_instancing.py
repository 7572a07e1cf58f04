"""Shared-geometry instancing (VERDICT r2 missing #3).

Parity: one BLAS per unique mesh, instanced N x with per-instance
transforms + object rows (geometry_builder.cppm:178-198, tlas.cppm:60-67).
Criteria from the verdict: N instances of one mesh compile to ~1x mesh
memory, render golden-equal to the baked-copy path, and animate via
ops/refit (here: apply_instance_transforms, fully in-graph).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from realtimeraytracer_tpu.config import RenderConfig
from realtimeraytracer_tpu.scene.camera import Camera
from realtimeraytracer_tpu.scene.geometry import (
    MeshInstance,
    TriangleMesh,
    make_grid_plane,
)
from realtimeraytracer_tpu.scene.lights import AreaLight
from realtimeraytracer_tpu.scene.materials import Material
from realtimeraytracer_tpu.scene.scene import Scene


def _blob(n=300, seed=0):
    r = np.random.default_rng(seed)
    base = r.uniform(-1, 1, (n, 1, 3))
    tris = (base + r.normal(0, 0.15, (n, 3, 3))).astype(np.float32)
    return TriangleMesh(
        vertices=tris.reshape(-1, 3),
        faces=np.arange(3 * n, dtype=np.int32).reshape(n, 3),
        material=Material(color=(0.6, 0.3, 0.2), specular=0.3))


def _transforms(k=9):
    ts = []
    for i in range(k):
        t = np.eye(4, dtype=np.float32)
        t[:3, 3] = ((i % 3) * 3 - 3, 1.0, (i // 3) * 3 - 3)
        if i % 2:
            t[:3, :3] *= 0.7           # scale coverage (inverse-transpose)
        ts.append(t)
    return ts


def _scene(mesh, k=9):
    s = Scene(camera=Camera(position=(0, 4, 10), look_at=(0, 0.5, 0),
                            fov_y_degrees=55))
    light = AreaLight(intensity=6.0)
    light.rotate("x", 90).scale(3.0).move(0, 6, 0)
    s.add(light, make_grid_plane(size=30.0))
    s.add_instances(mesh, _transforms(k))
    return s


CFG = RenderConfig(width=64, height=48, primary_rays=1, jitter=False,
                   shadow_rays=1, denoise_iterations=2,
                   shadow_ray_margin=0.02)


class TestInstancing:
    def test_memory_is_one_mesh(self):
        """N instances share ONE coefficient/panel set (~1x mesh memory)."""
        mesh = _blob(1000)
        one = _scene(mesh, k=1).compile()
        many = _scene(mesh, k=9).compile()
        assert many.pallas_panels.shape == one.pallas_panels.shape
        assert many.vertices.shape == one.vertices.shape
        baked = _scene(mesh, k=9).compile(bake_instances=True)
        assert baked.pallas_panels.shape[0] > 5 * many.pallas_panels.shape[0]

    def test_render_matches_baked(self):
        """Instanced render == baked-copy render to f32 roundoff."""
        from realtimeraytracer_tpu.render.megakernel import render_components
        from realtimeraytracer_tpu.render.pipeline import denoise_and_combine

        mesh = _blob()
        gpu_i = _scene(mesh).compile()
        gpu_b = _scene(mesh).compile(bake_instances=True)
        frame = _scene(mesh).camera.viewport_frame(CFG.width, CFG.height)
        cfg_i = CFG.replace(backend="hier")
        cfg_b = CFG.replace(backend="brute", use_bvh=False)
        img_i = np.asarray(denoise_and_combine(
            render_components(gpu_i, frame, cfg_i), cfg_i))
        img_b = np.asarray(denoise_and_combine(
            render_components(gpu_b, frame, cfg_b), cfg_b))
        np.testing.assert_allclose(img_i, img_b, atol=2e-5)

    def test_per_instance_materials(self):
        """Each instance can carry its own object row (per-instance
        ObjectInfo, object.cppm:18-196)."""
        from realtimeraytracer_tpu.render.backends import make_backend
        from realtimeraytracer_tpu.render.surface import resolve_surface
        from realtimeraytracer_tpu.ops.camera_rays import generate_rays

        mesh = _blob()
        s = Scene(camera=Camera(position=(0, 2, 8), look_at=(0, 0.5, 0)))
        t0 = np.eye(4, dtype=np.float32); t0[:3, 3] = (-2, 1, 0)
        t1 = np.eye(4, dtype=np.float32); t1[:3, 3] = (2, 1, 0)
        s.add(MeshInstance(mesh=mesh, transform=t0,
                           material=Material(color=(1.0, 0.0, 0.0))))
        s.add(MeshInstance(mesh=mesh, transform=t1,
                           material=Material(color=(0.0, 1.0, 0.0))))
        gpu = s.compile()
        cfg = CFG.replace(backend="hier")
        frame = s.camera.viewport_frame(cfg.width, cfg.height)
        o, d = generate_rays(frame, cfg.width, cfg.height, jitter=False)
        be = make_backend(gpu, cfg)
        hit = be.closest(o, d, cfg.t_min, cfg.t_max)
        surf = resolve_surface(gpu, hit, o, d)
        alb = np.asarray(surf.albedo)
        inst = np.asarray(hit.inst)
        valid = np.asarray(surf.valid)
        left = valid & (inst == 0)
        right = valid & (inst == 1)
        assert left.any() and right.any()
        assert (alb[left, 0] > alb[left, 1]).all()    # red instance
        assert (alb[right, 1] > alb[right, 0]).all()  # green instance

    def test_animate_via_instance_refit(self):
        """apply_instance_transforms moves instances in-graph; result
        matches a fresh compile at the new transforms."""
        from realtimeraytracer_tpu.ops.refit import apply_instance_transforms
        from realtimeraytracer_tpu.render.megakernel import render_components
        from realtimeraytracer_tpu.render.pipeline import denoise_and_combine

        mesh = _blob()
        gpu = _scene(mesh).compile()
        moved = [np.asarray(t, np.float32).copy() for t in _transforms(9)]
        for t in moved:
            t[:3, 3] += (0.5, 0.4, -0.3)
        n_fixed = gpu.inst_inv.shape[0] - 9        # light + plane identity
        all_t = np.concatenate([
            np.broadcast_to(np.eye(4, dtype=np.float32),
                            (n_fixed, 4, 4)).copy(),
            np.stack(moved)])

        refit = jax.jit(apply_instance_transforms)
        gpu2 = refit(gpu, jnp.asarray(all_t))

        # Oracle: fresh compile with the moved transforms.
        s = Scene(camera=Camera(position=(0, 4, 10), look_at=(0, 0.5, 0),
                                fov_y_degrees=55))
        light = AreaLight(intensity=6.0)
        light.rotate("x", 90).scale(3.0).move(0, 6, 0)
        s.add(light, make_grid_plane(size=30.0))
        s.add_instances(mesh, moved)
        gpu_ref = s.compile()

        cfg = CFG.replace(backend="hier")
        frame = s.camera.viewport_frame(cfg.width, cfg.height)
        a = np.asarray(denoise_and_combine(
            render_components(gpu2, frame, cfg), cfg))
        b = np.asarray(denoise_and_combine(
            render_components(gpu_ref, frame, cfg), cfg))
        np.testing.assert_allclose(a, b, atol=2e-5)

    def test_wrong_backend_raises(self):
        from realtimeraytracer_tpu.render.backends import make_backend

        gpu = _scene(_blob()).compile()
        with pytest.raises(ValueError, match="instanced"):
            make_backend(gpu, CFG.replace(backend="brute"))
