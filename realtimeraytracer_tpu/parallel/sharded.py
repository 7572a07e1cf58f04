"""shard_map'ed rendering: the whole-frame ray batch split across the mesh.

Each device shades a contiguous slab of rays against the replicated scene
(render/megakernel.shade_sample is already a pure function over flat ray
batches, so sharding its leading axis is the entire story).  The final
image gather and the gradient all-reduce are the only collectives, and XLA
inserts them from the sharding specs (scaling-book recipe: pick a mesh,
annotate shardings, let XLA insert collectives).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from realtimeraytracer_tpu.config import RenderConfig
from realtimeraytracer_tpu.ops.camera_rays import ViewportFrame, generate_rays
from realtimeraytracer_tpu.ops.tonemap import tonemap
from realtimeraytracer_tpu.ops.vecmath import normalize
from realtimeraytracer_tpu.parallel.mesh import RAY_AXIS
from realtimeraytracer_tpu.render.backends import make_backend
from realtimeraytracer_tpu.render.megakernel import (
    RenderComponents,
    SampleRadiance,
    shade_sample,
)
from realtimeraytracer_tpu.scene.gpu_scene import GPUScene


def sharded_shade(
    gpu: GPUScene,
    cfg: RenderConfig,
    origins: jnp.ndarray,     # (R, 3), R divisible by mesh size
    dirs: jnp.ndarray,
    pixel_seed: jnp.ndarray,  # (R,)
    mesh: jax.sharding.Mesh,
    sample_index: int = 0,
) -> SampleRadiance:
    """One primary sample, rays sharded over the mesh, scene replicated."""

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(RAY_AXIS), P(RAY_AXIS), P(RAY_AXIS)),
        out_specs=P(RAY_AXIS),
        # The Mosaic trace kernels run INSIDE the sharded body on TPU;
        # pallas_call's out_shape carries no varying-mesh-axes (vma)
        # annotation, which the vma checker rejects.  The body is
        # collective-free (pure per-ray map, scene replicated), so the
        # check adds nothing here.
        check_vma=False,
    )
    def fn(g, o, d, seed):
        backend = make_backend(g, cfg)
        return shade_sample(g, cfg, o, d, seed, backend, sample_index=sample_index)

    return fn(gpu, origins, dirs, pixel_seed)


def render_components_sharded(
    gpu: GPUScene,
    frame: ViewportFrame,
    cfg: RenderConfig,
    mesh: jax.sharding.Mesh,
    frame_index: int | jnp.ndarray = 0,
) -> RenderComponents:
    """Mirror of render/megakernel.render_components with sharded shading.

    Requires width*height divisible by the mesh size (pad the resolution,
    not the rays — keeps the image reshape trivial).
    """
    h, w = cfg.height, cfg.width
    n_dev = mesh.devices.size
    if (h * w) % n_dev:
        raise ValueError(
            f"{h}x{w} rays not divisible by {n_dev} devices; pick a "
            "resolution that tiles over the mesh")

    py = jnp.arange(h, dtype=jnp.uint32)[:, None]
    px = jnp.arange(w, dtype=jnp.uint32)[None, :]
    pixel_seed = (
        px * jnp.uint32(733) + py * jnp.uint32(1933) + jnp.uint32(frame_index)
    ).reshape(-1)

    acc = None
    for s in range(cfg.primary_rays):
        o, d = generate_rays(frame, w, h, sample_index=s, jitter=cfg.jitter)
        out = sharded_shade(gpu, cfg, o, d, pixel_seed, mesh, sample_index=s)
        acc = out if acc is None else SampleRadiance(*(a + b for a, b in zip(acc, out)))

    inv = 1.0 / cfg.primary_rays
    tm = lambda x: tonemap(x * inv, cfg.tonemap, cfg.gamma)
    img = lambda x: x.reshape(h, w, 3)
    return RenderComponents(
        analytic=img(tm(acc.analytic)),
        shadowed=img(tm(acc.shadowed)),
        unshadowed=img(tm(acc.unshadowed)),
        normal=img(normalize(acc.normal * inv)),
        position=img(acc.position * inv),
    )


def render_pipeline_sharded(
    gpu: GPUScene,
    frame: ViewportFrame,
    cfg: RenderConfig,
    mesh: jax.sharding.Mesh,
    frame_index: int | jnp.ndarray = 0,
) -> jnp.ndarray:
    """Sharded trace + (replicated) denoise/combine -> final (H, W, 3)."""
    from realtimeraytracer_tpu.render.pipeline import denoise_and_combine

    comp = render_components_sharded(gpu, frame, cfg, mesh, frame_index)
    return denoise_and_combine(comp, cfg)
