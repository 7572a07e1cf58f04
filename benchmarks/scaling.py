"""Multi-device scaling harness (BASELINE metric: >= 85% linear rays/s).

Two measurements:

1. **Work division (hardware-independent, the CI-checkable one).**  XLA
   cost analysis of the sharded program at N devices: per-device FLOPs must
   shrink ~1/N (ray DP divides the trace/shade work; the only collectives
   are the final gather / grad psum).  Efficiency_N = flops_1 / (N *
   flops_N) >= 0.85 validates the sharding actually divides work instead of
   replicating it.

2. **Wall-clock rays/s** at 1..N devices.  Only meaningful on real
   multi-chip hardware; on a virtual CPU mesh
   (--xla_force_host_platform_device_count) all "devices" share the same
   physical cores, so wall-clock CANNOT scale and the numbers are recorded
   as informational with "virtual": true.

Run:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      PYTHONPATH=. python benchmarks/scaling.py
On a real slice, run as-is on every host (jax.distributed via
parallel.mesh.initialize_multihost).
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

from realtimeraytracer_tpu import RenderConfig, scenes
from realtimeraytracer_tpu.parallel.mesh import initialize_multihost, make_ray_mesh
from realtimeraytracer_tpu.parallel.sharded import render_components_sharded


def sharded_fn(cfg: RenderConfig, n_devices: int):
    mesh = make_ray_mesh(n_devices)
    return jax.jit(lambda g, f, i: render_components_sharded(g, f, cfg, mesh, i))


def per_device_flops(cfg: RenderConfig, gpu, frame, n_devices: int) -> float:
    """Total-program FLOPs from XLA cost analysis (the mesh divides the ray
    axis, so per-device work is total/N when sharding is correct)."""
    fn = sharded_fn(cfg, n_devices)
    compiled = fn.lower(gpu, frame, jnp.uint32(0)).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):  # older jax returns one dict per device program
        ca = ca[0]
    return float(ca.get("flops", 0.0))


def measure_wall(cfg: RenderConfig, gpu, frame, n_devices: int,
                 iters: int = 3) -> float:
    fn = sharded_fn(cfg, n_devices)
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
    virtual = jax.default_backend() == "cpu"
    cfg = RenderConfig(width=512, height=512, primary_rays=1, shadow_rays=1,
                       denoise_iterations=0, shadow_ray_margin=0.05)
    scene = scenes.procedural_mesh(10_000)
    gpu = scene.compile(bvh_leaf_size=cfg.bvh_leaf_size)
    frame = scene.camera.viewport_frame(cfg.width, cfg.height)

    ladder = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_total]

    flops = {n: per_device_flops(cfg, gpu, frame, n) for n in ladder}
    base_f = flops[ladder[0]]
    work_eff = {n: base_f / max(flops[n] * n / ladder[0], 1.0) * 1.0
                for n in ladder}
    # cost_analysis totals the whole (already-SPMD) program; with N devices
    # the per-device share is flops_N / N when XLA reports the global
    # program, or flops_N when it reports one shard.  Normalize by probing
    # which convention holds: if flops at N==base stays ~constant the report
    # is global (per-device = flops/N).
    report_is_global = len(ladder) > 1 and flops[ladder[-1]] > 0.6 * base_f
    eff = {}
    for n in ladder:
        per_dev = flops[n] / n if report_is_global else flops[n]
        eff[n] = (base_f / ladder[0]) / (per_dev * n) * 1.0 if per_dev else 0.0
    print(f"flops: { {n: f'{v:.3e}' for n, v in flops.items()} } "
          f"(global-report={report_is_global})", flush=True)

    walls = {}
    for n in ladder:
        walls[n] = measure_wall(cfg, gpu, frame, n)
        print(f"{n} device(s): {walls[n]/1e6:.3f}M rays/s "
              f"(work-eff {eff[n]:.2%})", flush=True)

    base_w = walls[ladder[0]]
    out = {
        "metric": "multi_device_scaling",
        "devices": ladder,
        "virtual_mesh": virtual,
        "work_division_efficiency": {str(n): eff[n] for n in ladder},
        "rays_per_sec_wall": {str(k): v for k, v in walls.items()},
        "wall_efficiency": {str(n): walls[n] / (base_w * n) for n in ladder},
        "note": ("virtual CPU mesh: all devices share one socket, so wall "
                 "efficiency is expected ~1/N; work_division_efficiency is "
                 "the meaningful sharding check" if virtual else
                 "real multi-chip run"),
    }
    print(json.dumps(out))
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
