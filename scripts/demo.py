"""Demo CLI: render the example scene ladder / run the app frame loop /
inverse-rendering optimization.

Usage:
  python scripts/demo.py render [cornell|sphere|mesh10k|mesh100k|sky|instanced] out.png
  python scripts/demo.py wavefront cornell out.png     # multi-bounce
  python scripts/demo.py app                            # timed frame loop
  python scripts/demo.py fit                            # albedo recovery
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import realtimeraytracer_tpu as rt
from realtimeraytracer_tpu import scenes
from realtimeraytracer_tpu.utils import log
from realtimeraytracer_tpu.utils.image_io import write_png

SCENES = {
    "cornell": lambda: (scenes.cornell_box(),
                        rt.RenderConfig(width=512, height=512, primary_rays=2,
                                        shadow_rays=3, shadow_ray_margin=0.02)),
    "sphere": lambda: (scenes.sphere_plane(),
                       rt.RenderConfig(width=512, height=384, primary_rays=2,
                                       shadow_rays=1, shadow_ray_margin=0.01)),
    "mesh10k": lambda: (scenes.procedural_mesh(10_000),
                        rt.RenderConfig(width=960, height=540, primary_rays=2,
                                        shadow_rays=2, tonemap="lut")),
    "mesh100k": lambda: (scenes.procedural_mesh(100_000),
                         rt.RenderConfig(width=1920, height=1080, primary_rays=2,
                                         shadow_rays=2)),
    # Flagship textured-PBR scene: OBJ+MTL with color/specular/metallic/
    # opacity maps, alpha-cutout foliage, HDRI sky, 2 area lights + sun
    # (create_scene.cppm:75-136, application.cppm:226-250 parity).
    "textured": lambda: (scenes.textured_obj(),
                         rt.RenderConfig(width=1920, height=1080,
                                         primary_rays=2, shadow_rays=3,
                                         shadow_ray_margin=0.05,
                                         mip_textures=True)),
    # HDRI sky on primary-ray miss (miss.rmiss parity).
    "sky": lambda: (scenes.sky_sphere(),
                    rt.RenderConfig(width=960, height=540, primary_rays=2,
                                    shadow_rays=1, shadow_ray_margin=0.01)),
    # 100 shared-geometry instances of one 10k-tri mesh (1M effective
    # tris at one mesh's memory; v8 hier kernel).
    "instanced": lambda: (_instanced_scene(),
                          rt.RenderConfig(width=960, height=540,
                                          primary_rays=2, shadow_rays=2,
                                          backend="hier")),
}


def _instanced_scene():
    import numpy as np

    from realtimeraytracer_tpu.scene.camera import Camera
    from realtimeraytracer_tpu.scene.geometry import (
        TriangleMesh, make_grid_plane)
    from realtimeraytracer_tpu.scene.lights import AreaLight
    from realtimeraytracer_tpu.scene.materials import Material
    from realtimeraytracer_tpu.scene.scene import Scene

    r = np.random.default_rng(0)
    n = 10_000
    base = r.uniform(-1, 1, (n, 1, 3))
    tris = (base + r.normal(0, 0.1, (n, 3, 3))).astype(np.float32)
    blob = TriangleMesh(
        vertices=tris.reshape(-1, 3),
        faces=np.arange(3 * n, dtype=np.int32).reshape(n, 3),
        material=Material(color=(0.6, 0.3, 0.2), specular=0.3))
    s = Scene(camera=Camera(position=(0, 8, 25), look_at=(0, 0.5, 0),
                            fov_y_degrees=55))
    light = AreaLight(intensity=6.0)
    light.rotate("x", 90).scale(4.0).move(0, 10, 0)
    s.add(light, make_grid_plane(size=60.0))
    ts = []
    for i in range(100):
        t = np.eye(4, dtype=np.float32)
        t[:3, 3] = ((i % 10) * 4 - 18, 1.0, (i // 10) * 4 - 18)
        ts.append(t)
    s.add_instances(blob, ts)
    return s


def cmd_render(name: str, out: str) -> None:
    scene, cfg = SCENES[name]()
    img = np.asarray(rt.render(scene, cfg))
    write_png(out, img)
    log.info("wrote {} ({}x{}, mean {:.4f})", out, cfg.width, cfg.height,
             float(img.mean()))


def cmd_wavefront(name: str, out: str) -> None:
    import jax

    from realtimeraytracer_tpu.render.wavefront import render_wavefront

    scene, cfg = SCENES[name]()
    cfg = cfg.replace(max_bounces=2)
    gpu = scene.compile(bvh_leaf_size=cfg.bvh_leaf_size)
    frame = scene.camera.viewport_frame(cfg.width, cfg.height)
    img = np.asarray(jax.jit(
        lambda g, f: render_wavefront(g, f, cfg))(gpu, frame))
    write_png(out, img)
    log.info("wrote {} (wavefront, {} bounces)", out, cfg.max_bounces)


def cmd_app() -> None:
    from realtimeraytracer_tpu.app.application import Application

    app = Application("Real Time RayTracer", 512, 512,
                      config=rt.RenderConfig(primary_rays=1, shadow_rays=2,
                                             denoise_iterations=2,
                                             shadow_ray_margin=0.02),
                      scene=scenes.cornell_box())
    app.toggle_spin()
    fps = app.run(num_frames=8)
    log.info("frame loop done: {:.2f} fps", fps)


def cmd_fit() -> None:
    import jax.numpy as jnp

    from realtimeraytracer_tpu.diff.optimize import fit
    from realtimeraytracer_tpu.ops.camera_rays import generate_rays
    from realtimeraytracer_tpu.render.backends import make_backend
    from realtimeraytracer_tpu.render.megakernel import shade_sample

    scene = scenes.cornell_box()
    cfg = rt.RenderConfig(width=48, height=48, primary_rays=1, jitter=False,
                          shadow_rays=1, denoise_iterations=0, use_bvh=False,
                          shadow_ray_margin=0.02)
    gpu = scene.compile()
    frame = scene.camera.viewport_frame(cfg.width, cfg.height)
    o, d = generate_rays(frame, cfg.width, cfg.height, jitter=False)
    seed = jnp.arange(o.shape[0], dtype=jnp.uint32)
    target = shade_sample(gpu, cfg, o, d, seed, make_backend(gpu, cfg)).analytic

    wrong = gpu._replace(obj_color=gpu.obj_color * 0.4 + 0.3)
    params, losses = fit(wrong, cfg, o, d, seed, target,
                         param_names=("obj_color",), steps=50)
    log.info("fit: loss {:.5f} -> {:.6f}", losses[0], losses[-1])
    err = float(jnp.abs(params["obj_color"] - gpu.obj_color).mean())
    log.info("albedo mean abs error after recovery: {:.4f}", err)


def main() -> None:
    if len(sys.argv) < 2:
        print(__doc__)
        return
    cmd = sys.argv[1]
    if cmd == "render":
        cmd_render(sys.argv[2] if len(sys.argv) > 2 else "cornell",
                   sys.argv[3] if len(sys.argv) > 3 else "out.png")
    elif cmd == "wavefront":
        cmd_wavefront(sys.argv[2] if len(sys.argv) > 2 else "cornell",
                      sys.argv[3] if len(sys.argv) > 3 else "out.png")
    elif cmd == "app":
        cmd_app()
    elif cmd == "fit":
        cmd_fit()
    else:
        print(__doc__)


if __name__ == "__main__":
    main()
