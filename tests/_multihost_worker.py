"""Worker process for the 2-process jax.distributed CPU test.

Run as: python tests/_multihost_worker.py <process_id> <port>
Asserts a real multi-process bring-up through initialize_multihost
(parallel/mesh.py:32-47), a cross-process psum, and a sharded render whose
local shards match the single-process render — the SURVEY §2.4 multi-host
capability on CPU (the same code path a TPU pod would run).
"""

import os
import sys

pid = int(sys.argv[1])
port = sys.argv[2]

# 2 virtual devices per process -> 4 global devices across 2 processes.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)

from functools import partial

import jax

# The image's sitecustomize pins the axon TPU platform via jax.config, so
# the env var alone is too late (same dance as tests/conftest.py).
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from realtimeraytracer_tpu.parallel.mesh import (
    RAY_AXIS,
    initialize_multihost,
    make_ray_mesh,
)

initialize_multihost(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.process_index() == pid
assert len(jax.devices()) == 4, jax.devices()
assert len(jax.local_devices()) == 2

mesh = make_ray_mesh()
sharding = NamedSharding(mesh, P(RAY_AXIS))

# --- cross-process psum -----------------------------------------------
g = np.arange(8.0, dtype=np.float32)
x = jax.make_array_from_callback((8,), sharding, lambda idx: g[idx])


@jax.jit
@partial(jax.shard_map, mesh=mesh, in_specs=P(RAY_AXIS), out_specs=P())
def total(v):
    return jax.lax.psum(jnp.sum(v), RAY_AXIS)


t = total(x)
np.testing.assert_allclose(np.asarray(t), g.sum())

# --- sharded render slice ---------------------------------------------
from realtimeraytracer_tpu import RenderConfig, scenes
from realtimeraytracer_tpu.ops.camera_rays import generate_rays
from realtimeraytracer_tpu.parallel.sharded import sharded_shade
from realtimeraytracer_tpu.render.backends import make_backend
from realtimeraytracer_tpu.render.megakernel import shade_sample

cfg = RenderConfig(width=16, height=16, primary_rays=1, jitter=False,
                   shadow_rays=1, denoise_iterations=0, use_bvh=False,
                   shadow_ray_margin=0.02)
scene = scenes.cornell_box()
gpu = scene.compile()
frame = scene.camera.viewport_frame(cfg.width, cfg.height)
o, d = generate_rays(frame, cfg.width, cfg.height, jitter=False)
seed = jnp.arange(o.shape[0], dtype=jnp.uint32)

o_np, d_np, seed_np = np.asarray(o), np.asarray(d), np.asarray(seed)
os_ = jax.make_array_from_callback(o_np.shape, sharding, lambda i: o_np[i])
ds_ = jax.make_array_from_callback(d_np.shape, sharding, lambda i: d_np[i])
ss_ = jax.make_array_from_callback(seed_np.shape, sharding,
                                   lambda i: seed_np[i])

out = sharded_shade(gpu, cfg, os_, ds_, ss_, mesh)
want = shade_sample(gpu, cfg, o, d, seed, make_backend(gpu, cfg))

# Each process checks ITS addressable shards against the local oracle.
n_checked = 0
for shard in out.analytic.addressable_shards:
    sl = shard.index[0]
    np.testing.assert_allclose(np.asarray(shard.data),
                               np.asarray(want.analytic[sl]),
                               rtol=1e-5, atol=1e-6)
    n_checked += 1
assert n_checked == 2, n_checked

print(f"WORKER {pid} OK", flush=True)
