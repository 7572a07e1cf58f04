"""v9 quarter-composited closest kernel vs v7 equivalence (interpret
mode on CPU).  render/quarter_backend.py.

The v9 contract: t is BIT-IDENTICAL to v7 (both reduce the same packed
(t | lane) keys over the same conservative candidate set); prim ids may
legitimately differ only where two triangles tie at the same truncated t
(visit-order-dependent in every kernel generation).
"""

import jax.numpy as jnp
import numpy as np

from realtimeraytracer_tpu import scenes
from realtimeraytracer_tpu.config import RenderConfig

CFG = RenderConfig()


def _gpu(n):
    return scenes.procedural_mesh(n).compile()


def _rand_rays(r, R, origin_span=6.0):
    o = jnp.asarray(r.uniform(-origin_span, origin_span, (R, 3))
                    .astype(np.float32))
    d = jnp.asarray(r.normal(size=(R, 3)).astype(np.float32))
    return o, d / jnp.linalg.norm(d, axis=1, keepdims=True)


class TestQuarterClosest:
    def test_matches_v7_incoherent(self):
        from realtimeraytracer_tpu.render.pallas_backend import pallas_closest
        from realtimeraytracer_tpu.render.quarter_backend import (
            quarter_closest,
        )

        gpu = _gpu(3000)
        o, d = _rand_rays(np.random.default_rng(1), 640)
        a = pallas_closest(gpu, CFG, o, d, 1e-3, 1e4)
        b = quarter_closest(gpu, CFG, o, d, 1e-3, 1e4)
        np.testing.assert_array_equal(np.asarray(a.t), np.asarray(b.t))
        np.testing.assert_array_equal(np.asarray(a.prim_id),
                                      np.asarray(b.prim_id))

    def test_matches_v7_common_origin_and_dir(self):
        from realtimeraytracer_tpu.render.pallas_backend import pallas_closest
        from realtimeraytracer_tpu.render.quarter_backend import (
            quarter_closest,
        )

        gpu = _gpu(2000)
        r = np.random.default_rng(2)
        o, d = _rand_rays(r, 512)
        for common, oo, dd in [
            ("origin", jnp.broadcast_to(o[:1], o.shape), d),
            ("dir", o, jnp.broadcast_to(d[:1], d.shape)),
        ]:
            a = pallas_closest(gpu, CFG, oo, dd, 1e-3, 1e4, common=common)
            b = quarter_closest(gpu, CFG, oo, dd, 1e-3, 1e4, common=common)
            np.testing.assert_array_equal(np.asarray(a.t), np.asarray(b.t))

    def test_tiny_scene_few_blocks(self):
        """cb < NQ streams: most quarter pages are INVALID from the start."""
        from realtimeraytracer_tpu.render.pallas_backend import pallas_closest
        from realtimeraytracer_tpu.render.quarter_backend import (
            quarter_closest,
        )

        gpu = _gpu(60)           # one coefficient block
        o, d = _rand_rays(np.random.default_rng(3), 256)
        a = pallas_closest(gpu, CFG, o, d, 1e-3, 1e4)
        b = quarter_closest(gpu, CFG, o, d, 1e-3, 1e4)
        np.testing.assert_array_equal(np.asarray(a.t), np.asarray(b.t))
        np.testing.assert_array_equal(np.asarray(a.prim_id),
                                      np.asarray(b.prim_id))

    def test_matches_brute_hits(self):
        """End-to-end sanity vs the exact all-pairs oracle."""
        from realtimeraytracer_tpu.render.backends import (
            make_bruteforce_backend,
        )
        from realtimeraytracer_tpu.render.quarter_backend import (
            quarter_closest,
        )

        gpu = _gpu(900)
        o, d = _rand_rays(np.random.default_rng(4), 384)
        want = make_bruteforce_backend(gpu, CFG).closest(o, d, 1e-3, 1e4)
        got = quarter_closest(gpu, CFG, o, d, 1e-3, 1e4)
        # v9 truncates t's low 7 mantissa bits (the packed-lane trade);
        # compare at that precision and require identical hit/miss sets.
        np.testing.assert_array_equal(np.asarray(got.prim_id >= 0),
                                      np.asarray(want.prim_id >= 0))
        hit = np.asarray(want.prim_id >= 0)
        np.testing.assert_allclose(np.asarray(got.t)[hit],
                                   np.asarray(want.t)[hit], rtol=2e-5)

    def test_render_through_quarter_backend(self):
        """Full shading over backend='quarter'."""
        from realtimeraytracer_tpu import RenderConfig as RC, render

        cfg = RC(width=32, height=32, primary_rays=1, jitter=False,
                 shadow_rays=1, denoise_iterations=0, backend="quarter")
        img = np.asarray(render(scenes.procedural_mesh(500, sun=True), cfg))
        cfg_b = cfg.replace(backend="brute", use_bvh=False)
        ref = np.asarray(render(scenes.procedural_mesh(500, sun=True), cfg_b))
        err = np.abs(img - ref)
        assert np.isfinite(img).all()
        assert (err > 2e-3).mean() < 5e-3
