"""Mip-aware texture sampling (VERDICT r1 item 9; image_sampler.cppm
parity: the reference samples with a full mip chain + linear filtering)."""

import jax
import jax.numpy as jnp
import numpy as np

from realtimeraytracer_tpu import RenderConfig, scenes
from realtimeraytracer_tpu.ops.texture import (
    build_mip_atlas_np, sample_atlas, sample_atlas_mip)


def _checker(n=64):
    y, x = np.mgrid[0:n, 0:n]
    c = ((x // 4 + y // 4) % 2).astype(np.float32)
    return np.stack([c, 1 - c, c * 0.5, np.ones_like(c)], -1)


class TestMipAtlas:
    def test_chain_levels_are_box_filtered(self):
        tex = _checker(64)
        atlas = tex[None]
        sizes = np.array([[64, 64]], np.int32)
        mips, levels = build_mip_atlas_np(atlas, sizes)
        assert levels == 7
        # Level 1 lives at rows [64, 96): 2x2 means of level 0.
        l1 = mips[0, 64:96, :32]
        want = 0.25 * (tex[0::2, 0::2] + tex[1::2, 0::2]
                       + tex[0::2, 1::2] + tex[1::2, 1::2])
        np.testing.assert_allclose(l1, want, atol=1e-6)
        # Top level is the global mean.
        top_off = 128 - (128 >> 6)
        np.testing.assert_allclose(mips[0, top_off, 0], tex.reshape(-1, 4).mean(0),
                                   atol=1e-5)

    def test_lod0_matches_base_sampler(self):
        tex = _checker(64)
        atlas = jnp.asarray(tex[None])
        sizes = jnp.asarray([[64, 64]], jnp.int32)
        mips, levels = build_mip_atlas_np(np.asarray(atlas), np.asarray(sizes))
        mips = jnp.asarray(mips)
        rng = np.random.default_rng(0)
        u = jnp.asarray(rng.uniform(0, 1, 512).astype(np.float32))
        v = jnp.asarray(rng.uniform(0, 1, 512).astype(np.float32))
        tid = jnp.zeros(512, jnp.int32)
        base = sample_atlas(atlas, sizes, tid, u, v)
        got = sample_atlas_mip(mips, sizes, levels, tid, u, v,
                               jnp.zeros(512, jnp.float32))
        np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                                   atol=1e-6)

    def test_high_lod_converges_to_mean(self):
        tex = _checker(64)
        mips, levels = build_mip_atlas_np(tex[None],
                                          np.array([[64, 64]], np.int32))
        got = sample_atlas_mip(jnp.asarray(mips),
                               jnp.asarray([[64, 64]], jnp.int32), levels,
                               jnp.zeros(8, jnp.int32),
                               jnp.linspace(0.1, 0.9, 8),
                               jnp.linspace(0.1, 0.9, 8),
                               jnp.full(8, float(levels - 1)))
        mean = tex.reshape(-1, 4).mean(0)
        np.testing.assert_allclose(np.asarray(got),
                                   np.tile(mean, (8, 1)), atol=1e-5)

    def test_render_mip_reduces_minification_aliasing(self):
        """A high-frequency checkered ground seen at grazing distance:
        mip-filtered pixels far from the camera approach the checker mean,
        while level-0 sampling stays bimodal (aliasing).  Rendered through
        the full pipeline with cfg.mip_textures."""
        from realtimeraytracer_tpu.scene.scene import Scene
        from realtimeraytracer_tpu.scene.camera import Camera
        from realtimeraytracer_tpu.scene.materials import Material
        from realtimeraytracer_tpu.scene.geometry import make_grid_plane
        from realtimeraytracer_tpu.scene.lights import DirectionalLight
        from realtimeraytracer_tpu import render

        def build(tex=None):
            s = Scene(camera=Camera(position=(0.0, 0.6, 6.0),
                                    look_at=(0.0, 0.0, -20.0),
                                    fov_y_degrees=50.0))
            tex_id = s.add_texture(_checker(64) if tex is None else tex)
            plane = make_grid_plane(size=200.0, y=0.0,
                                    material=Material(color_map=tex_id))
            # Many uv repeats -> heavy minification far away.
            plane.uvs = plane.uvs * 400.0
            s.add(plane)
            s.add(DirectionalLight())
            s.env_color = (0.0, 0.0, 0.0)
            return s

        cfg = RenderConfig(width=64, height=48, primary_rays=1, jitter=False,
                           shadow_rays=0, denoise_iterations=0,
                           use_bvh=False, sun_gain=20.0, tonemap="none")
        sharp = np.asarray(render(build(), cfg))
        soft = np.asarray(render(build(), cfg.replace(mip_textures=True)))
        assert np.isfinite(soft).all()
        # The checker period is sub-pixel across the whole visible ground
        # (rows ~24+; above is sky): level-0 sampling is bimodal noise,
        # the mip path converges to the filtered mean.
        g_sharp = sharp[24:, :, 0]
        g_soft = soft[24:, :, 0]
        assert g_sharp.std() > 0.2, "scene should alias without mips"
        assert g_soft.std() < g_sharp.std() * 0.2, (
            f"mip std {g_soft.std():.4f} vs level-0 {g_sharp.std():.4f}")
        # Energy oracle: heavy minification of the checker must converge
        # to rendering a SOLID texture of the checker's mean color (whose
        # mip chain is itself) — the aliased image's mean is moire-biased
        # and is no oracle.
        solid = np.broadcast_to(_checker(64).reshape(-1, 4).mean(0),
                                (64, 64, 4)).copy()
        flat = np.asarray(render(build(solid), cfg.replace(mip_textures=True)))
        assert np.abs(soft[24:] - flat[24:]).mean() < 0.02


class TestAnisotropicFiltering:
    def test_grazing_plane_sharper_than_isotropic(self):
        """Anisotropic taps must beat isotropic trilinear against a
        supersampled ground truth on a grazing checkered plane
        (image_sampler.cppm maxAnisotropy parity, VERDICT r3 missing #4):
        the isotropic footprint is forced to the 1/cos MAJOR axis and
        over-blurs across the view direction."""
        from realtimeraytracer_tpu.scene.scene import Scene
        from realtimeraytracer_tpu.scene.camera import Camera
        from realtimeraytracer_tpu.scene.materials import Material
        from realtimeraytracer_tpu.scene.geometry import make_grid_plane
        from realtimeraytracer_tpu.scene.lights import DirectionalLight
        from realtimeraytracer_tpu import render

        def build():
            s = Scene(camera=Camera(position=(0.0, 0.5, 6.0),
                                    look_at=(0.0, 0.0, -14.0),
                                    fov_y_degrees=50.0))
            tex_id = s.add_texture(_checker(64))
            plane = make_grid_plane(size=120.0, y=0.0,
                                    material=Material(color_map=tex_id))
            plane.uvs = plane.uvs * 16.0
            s.add(plane)
            s.add(DirectionalLight())
            s.env_color = (0.0, 0.0, 0.0)
            return s

        W, H, SS = 64, 48, 6
        cfg = RenderConfig(width=W, height=H, primary_rays=1, jitter=False,
                           shadow_rays=0, denoise_iterations=0,
                           use_bvh=False, sun_gain=20.0, tonemap="none")
        # Ground truth: SS^2 supersampled level-0 render, box-downsampled.
        hi = np.asarray(render(build(), cfg.replace(width=W * SS,
                                                    height=H * SS)))
        gt = hi.reshape(H, SS, W, SS, 3).mean(axis=(1, 3))
        iso = np.asarray(render(build(), cfg.replace(mip_textures=True)))
        an4 = np.asarray(render(build(), cfg.replace(mip_textures=True,
                                                     aniso_taps=4)))
        # Mid-distance band: footprint is clearly anisotropic and the
        # supersampled truth is converged (measured: iso 0.106 vs aniso
        # 0.094 — ~12% closer to truth at equal alias level; the far
        # band also improves, the near band is a wash since its
        # footprints are barely anisotropic).
        band = slice(30, 40)
        err_iso = np.abs(iso[band] - gt[band]).mean()
        err_an4 = np.abs(an4[band] - gt[band]).mean()
        assert np.isfinite(an4).all()
        assert err_an4 < err_iso * 0.95, (
            f"aniso {err_an4:.5f} must beat isotropic {err_iso:.5f}")
