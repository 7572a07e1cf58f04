"""HDRI environment end-to-end (VERDICT r2 missing #4 / weak #3).

Pins the miss.rmiss:21-26 equirect u/v convention, the Radiance RGBE
decoder (stb_image-equivalent; imageio's .hdr path silently degrades to
uint8 here), the load_hdr orientation/encode contract, and the full
pipeline + CPU-oracle golden with a non-trivial sky.
"""

import numpy as np
import jax.numpy as jnp

from realtimeraytracer_tpu import RenderConfig, render, scenes
from realtimeraytracer_tpu.cpu_ref.renderer import render_reference
from realtimeraytracer_tpu.ops.texture import sample_equirect
from realtimeraytracer_tpu.scene.obj_loader import (
    decode_radiance_hdr,
    encode_radiance_hdr,
    load_hdr,
)


class TestEquirectConvention:
    """u = atan2(z,x)/2pi + 0.5, v = 1 - acos(y)/pi (miss.rmiss:21-26)."""

    def _map(self):
        # Distinct texel per (row, col) so lookups identify coordinates.
        h, w = 8, 16
        r = np.arange(h, dtype=np.float32)[:, None] * np.ones((1, w))
        c = np.arange(w, dtype=np.float32)[None, :] * np.ones((h, 1))
        return jnp.asarray(np.stack([r, c, np.zeros_like(r)], -1))

    def test_up_samples_top_row(self):
        # Exactly v=1 would wrap-lerp rows h-1 and 0 (repeat addressing on
        # BOTH axes — the reference sampler's eRepeat does the same at the
        # poles, image_sampler.cppm:11-51), so aim at the top row's texel
        # CENTER: v=(h-0.5)/h -> y=cos(pi(1-v)).
        m = self._map()
        h = m.shape[0]
        y = np.cos(np.pi * (1.0 - (h - 0.5) / h))
        d = np.array([[np.sqrt(1 - y * y), y, 0.0]], np.float32)
        out = sample_equirect(m, jnp.asarray(d))
        # sky (up) is stored at the END row: load_hdr flips on load.
        assert abs(float(out[0, 0]) - (h - 1)) < 1e-4

    def test_down_samples_bottom_row(self):
        m = self._map()
        h = m.shape[0]
        y = np.cos(np.pi * (1.0 - 0.5 / h))
        d = np.array([[np.sqrt(1 - y * y), y, 0.0]], np.float32)
        out = sample_equirect(m, jnp.asarray(d))
        assert abs(float(out[0, 0])) < 1e-4

    def test_plus_x_is_u_half(self):
        m = self._map()
        out = sample_equirect(m, jnp.array([[1.0, 0.0, 0.0]]))
        # u = 0.5 -> column w/2 (half-texel convention: exact center
        # (0.5*16 - 0.5 = 7.5) lerps cols 7 and 8 equally).
        assert abs(float(out[0, 1]) - 7.5) < 1e-4
        # v = 0.5 -> row center
        assert abs(float(out[0, 0]) - 3.5) < 1e-4

    def test_plus_z_is_u_three_quarters(self):
        m = self._map()
        out = sample_equirect(m, jnp.array([[0.0, 0.0, 1.0]]))
        assert abs(float(out[0, 1]) - (0.75 * 16 - 0.5)) < 1e-4

    def test_minus_x_wraps_seam(self):
        m = self._map()
        out = sample_equirect(m, jnp.array([[-1.0, 0.0, 0.0]]))
        # u = 1.0 (atan2(0,-1)=pi): wrap-lerps columns 15 and 0 equally.
        assert abs(float(out[0, 1]) - 7.5) < 1e-4


class TestRadianceDecoder:
    def test_flat_roundtrip(self):
        rng = np.random.default_rng(7)
        rgb = (rng.random((5, 9, 3)).astype(np.float32) * 4.0).astype(np.float32)
        dec = decode_radiance_hdr(encode_radiance_hdr(rgb))
        assert dec.shape == rgb.shape
        # RGBE has ~8 bits of mantissa per component, scaled by the max.
        err = np.abs(dec - rgb) / np.maximum(rgb.max(-1, keepdims=True), 1e-6)
        assert err.max() < 1.0 / 128.0

    def test_rle_scanlines(self):
        """Hand-built new-style RLE file: runs + literals per component."""
        h, w = 2, 8
        ref = np.zeros((h, w, 4), np.uint8)
        body = b""
        rng = np.random.default_rng(3)
        for y in range(h):
            body += bytes([2, 2, w >> 8, w & 0xFF])
            for c in range(4):
                vals = rng.integers(1, 255, w, dtype=np.uint8)
                vals[2:6] = vals[2]                    # make a run
                ref[y, :, c] = vals
                # encode: 2 literals, run of 4, 2 literals
                body += bytes([2]) + vals[:2].tobytes()
                body += bytes([128 + 4, vals[2]])
                body += bytes([2]) + vals[6:].tobytes()
        data = (b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n"
                + f"-Y {h} +X {w}\n".encode() + body)
        dec = decode_radiance_hdr(data)
        e = ref[..., 3].astype(np.int32)
        want = ref[..., :3].astype(np.float32) * np.ldexp(
            1.0, e - 136).astype(np.float32)[..., None]
        np.testing.assert_allclose(dec, want, rtol=1e-6)

    def test_old_style_repeat(self):
        h, w = 1, 4
        px = bytes([100, 50, 25, 128])                 # one real pixel
        rep = bytes([1, 1, 1, 3])                      # repeat it 3x
        data = (b"#?RADIANCE\n\n" + f"-Y {h} +X {w}\n".encode() + px + rep)
        dec = decode_radiance_hdr(data)
        assert dec.shape == (1, 4, 3)
        np.testing.assert_allclose(dec[0, 1:], np.broadcast_to(dec[0, 0], (3, 3)))

    def test_plus_y_orientation_flips(self):
        h, w = 2, 4
        rows = np.zeros((h, w, 4), np.uint8)
        rows[0, :, :3] = 200
        rows[0, :, 3] = 128
        rows[1, :, 3] = 0                              # black row
        base = f"+Y {h} +X {w}\n".encode()
        data = b"#?RADIANCE\n\n" + base + rows.tobytes()
        dec = decode_radiance_hdr(data)
        # +Y = bottom-up file: first scanline is the BOTTOM -> ends on top.
        assert dec[0].max() == 0.0 and dec[1].max() > 0.0

    def test_load_hdr_orientation_and_encode(self, tmp_path):
        """Authored TOP row (sky) must come back at v=1 (+y direction)."""
        h, w = 4, 8
        rgb = np.zeros((h, w, 3), np.float32)
        rgb[0] = [0.0, 0.0, 1.0]                       # authored top: blue sky
        rgb[-1] = [1.0, 0.0, 0.0]                      # authored bottom: red
        p = tmp_path / "sky.hdr"
        p.write_bytes(encode_radiance_hdr(rgb))
        loaded = load_hdr(str(p))                      # tone-encoded
        yt = np.cos(np.pi * (1.0 - (h - 0.5) / h))     # top-row texel center
        yb = np.cos(np.pi * (1.0 - 0.5 / h))
        up = sample_equirect(jnp.asarray(loaded), jnp.array(
            [[np.sqrt(1 - yt * yt), yt, 0.0]], np.float32))
        down = sample_equirect(jnp.asarray(loaded), jnp.array(
            [[np.sqrt(1 - yb * yb), yb, 0.0]], np.float32))
        assert float(up[0, 2]) > 0.9 and float(up[0, 0]) < 1e-3
        assert float(down[0, 0]) > 0.9 and float(down[0, 2]) < 1e-3
        # tone_encode applies stb's hdr->ldr pow(1/2.2) (PARITY.md).
        raw = load_hdr(str(p), tone_encode=False)
        np.testing.assert_allclose(
            loaded, np.clip(raw, 0, 1) ** (1 / 2.2), rtol=2e-3, atol=1e-4)


class TestHdriGolden:
    def test_sky_scene_golden_vs_oracle(self):
        """Full pipeline with a non-trivial HDRI vs the CPU oracle
        (oracle env path: cpu_ref/renderer.py:379)."""
        scene = scenes.sky_sphere()
        cfg = RenderConfig(width=96, height=64, primary_rays=1, jitter=False,
                           shadow_rays=1, denoise_iterations=2, use_bvh=False,
                           shadow_ray_margin=0.01)
        got = np.asarray(render(scene, cfg))
        want = render_reference(scene, cfg)
        err = np.abs(got - want)
        assert (err > 2e-3).mean() <= 2e-3
        assert err.mean() < 2e-3

    def test_sky_visible_in_misses(self):
        """The env term must actually light the frame (r2: every test scene
        had env_color=0 so the miss path was identically zero)."""
        scene = scenes.sky_sphere()
        cfg = RenderConfig(width=64, height=48, primary_rays=1, jitter=False,
                           shadow_rays=1, denoise_iterations=0, use_bvh=False)
        img = np.asarray(render(scene, cfg))
        dark = scenes.sphere_plane()
        img0 = np.asarray(render(dark, cfg))
        # Top rows are sky: bright with the HDRI, black without.
        assert img[:8].mean() > 0.2
        assert img0[:8].mean() < 1e-3
