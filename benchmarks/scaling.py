"""Multi-device scaling harness: rays/s at 1..N devices (BASELINE metric:
>= 85% linear scaling).

On a host without multiple real chips, run with the virtual CPU mesh:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python benchmarks/scaling.py
On a real multi-chip/multi-host slice, run as-is on every host
(jax.distributed initialization is handled by parallel.mesh).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

from realtimeraytracer_tpu import RenderConfig, scenes
from realtimeraytracer_tpu.parallel.mesh import initialize_multihost, make_ray_mesh
from realtimeraytracer_tpu.parallel.sharded import render_components_sharded


def measure(n_devices: int, cfg: RenderConfig, gpu, frame, iters: int = 3) -> float:
    mesh = make_ray_mesh(n_devices)
    fn = jax.jit(lambda g, f, i: render_components_sharded(g, f, cfg, mesh, i))
    jax.block_until_ready(fn(gpu, frame, jnp.uint32(0)))
    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(gpu, frame, jnp.uint32(i + 1)))
        times.append(time.perf_counter() - t0)
    med = sorted(times)[len(times) // 2]
    return cfg.num_pixels * cfg.primary_rays / med


def main() -> None:
    initialize_multihost()
    n_total = len(jax.devices())
    cfg = RenderConfig(width=512, height=512, primary_rays=1, shadow_rays=1,
                       denoise_iterations=0, shadow_ray_margin=0.05)
    scene = scenes.procedural_mesh(10_000)
    gpu = scene.compile(bvh_leaf_size=cfg.bvh_leaf_size)
    frame = scene.camera.viewport_frame(cfg.width, cfg.height)

    results = {}
    ladder = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_total]
    for n in ladder:
        results[n] = measure(n, cfg, gpu, frame)
        print(f"{n} device(s): {results[n]/1e6:.2f}M rays/s", flush=True)

    base = results[ladder[0]]
    out = {
        "metric": "multi_device_scaling_efficiency",
        "devices": ladder,
        "rays_per_sec": {str(k): v for k, v in results.items()},
        "efficiency": {
            str(n): results[n] / (base * n) for n in ladder
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
