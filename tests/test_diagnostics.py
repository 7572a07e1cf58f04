"""Traversal-cap saturation detection (VERDICT r1 item 8).

The caps (max_cluster_visits, max_traversal_steps) silently drop hits when
exceeded; these tests deliberately starve them and assert the runtime
counters report it — and that healthy configs report zero.
"""

import jax
import jax.numpy as jnp
import numpy as np

from realtimeraytracer_tpu import RenderConfig, scenes
from realtimeraytracer_tpu.ops.camera_rays import generate_rays
from realtimeraytracer_tpu.render.diagnostics import diagnose_traversal


def _rays(scene, cfg):
    gpu = scene.compile(bvh_threshold=0)
    frame = scene.camera.viewport_frame(cfg.width, cfg.height)
    o, d = generate_rays(frame, cfg.width, cfg.height, jitter=False)
    return gpu, o, d


CFG = RenderConfig(width=24, height=24, primary_rays=1, shadow_rays=1,
                   denoise_iterations=0, jitter=False)


class TestCapSaturation:
    def test_wide_starved_cap_detected(self):
        gpu, o, d = _rays(scenes.procedural_mesh(2_000), CFG)
        starved = CFG.replace(max_cluster_visits=1, cluster_size=64)
        _, stats = jax.jit(
            lambda g, o, d: diagnose_traversal(g, starved, o, d,
                                               CFG.t_min, CFG.t_max,
                                               "closest", "wide")
        )(gpu, o, d)
        assert int(stats["cap_clipped"]) > 0

    def test_wide_healthy_cap_clean(self):
        gpu, o, d = _rays(scenes.procedural_mesh(2_000), CFG)
        _, stats = jax.jit(
            lambda g, o, d: diagnose_traversal(g, CFG, o, d, CFG.t_min,
                                               CFG.t_max, "closest", "wide")
        )(gpu, o, d)
        assert int(stats["cap_clipped"]) == 0

    def test_lane_starved_cap_detected(self):
        gpu, o, d = _rays(scenes.procedural_mesh(2_000), CFG)
        starved = CFG.replace(max_traversal_steps=3)
        _, stats = jax.jit(
            lambda g, o, d: diagnose_traversal(g, starved, o, d, CFG.t_min,
                                               CFG.t_max, "closest", "lane")
        )(gpu, o, d)
        assert int(stats["cap_clipped"]) > 0

    def test_lane_occluded_starved_detected(self):
        gpu, o, d = _rays(scenes.procedural_mesh(2_000), CFG)
        starved = CFG.replace(max_traversal_steps=2)
        _, stats = jax.jit(
            lambda g, o, d: diagnose_traversal(g, starved, o, d, CFG.t_min,
                                               jnp.full((o.shape[0],), 1e4),
                                               "occluded", "lane")
        )(gpu, o, d)
        assert int(stats["cap_clipped"]) > 0

    def test_debug_traversal_render_runs(self, capfd):
        """cfg.debug_traversal wires the warning into the real pipeline and
        prints when starved."""
        from realtimeraytracer_tpu import render

        scene = scenes.procedural_mesh(2_000)
        cfg = CFG.replace(width=16, height=16, debug_traversal=True,
                          backend="wide", max_cluster_visits=1,
                          cluster_size=64, use_bvh=True)
        img = np.asarray(render(scene, cfg))
        assert np.isfinite(img).all()
        jax.effects_barrier()
        out = capfd.readouterr()
        assert "traversal cap saturated" in out.out + out.err

    def test_debug_traversal_healthy_silent(self, capfd):
        from realtimeraytracer_tpu import render

        scene = scenes.procedural_mesh(2_000)
        cfg = CFG.replace(width=16, height=16, debug_traversal=True,
                          backend="wide", use_bvh=True)
        img = np.asarray(render(scene, cfg))
        assert np.isfinite(img).all()
        jax.effects_barrier()
        out = capfd.readouterr()
        assert "traversal cap saturated" not in out.out + out.err
