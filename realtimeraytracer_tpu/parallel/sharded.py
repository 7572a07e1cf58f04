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


def wavefront_sample_sharded(
    gpu: GPUScene,
    cfg: RenderConfig,
    origins: jnp.ndarray,     # (R, 3), R divisible by mesh size
    dirs: jnp.ndarray,
    pixel_seed: jnp.ndarray,  # (R,)
    mesh: jax.sharding.Mesh,
    sample_index: int = 0,
) -> jnp.ndarray:
    """One multi-bounce wavefront sample (render/wavefront.trace_paths)
    with the path state sharded over the mesh, scene replicated.

    Each shard runs the full bounce loop on its own rays, including its
    own octant+Morton coherence reorder — the sort is a per-shard perf
    permutation, so device count never changes results (paths are
    independent; RNG seeds ride with the rays).  Returns (R, 3) linear
    radiance, ray-sharded."""
    from realtimeraytracer_tpu.render.wavefront import trace_paths

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(RAY_AXIS), P(RAY_AXIS), P(RAY_AXIS)),
        out_specs=P(RAY_AXIS),
        check_vma=False,   # same rationale as sharded_shade
    )
    def fn(g, o, d, seed):
        backend = make_backend(g, cfg)
        return trace_paths(g, cfg, o, d, seed, backend, sample_index)

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
    """Sharded trace + ROW-SHARDED denoise/combine -> final (H, W, 3).

    The denoiser runs INSIDE shard_map on each device's row slab with a
    2*iterations-row halo ppermute per A-Trous iteration
    (ops/denoise.atrous_denoise_sharded_rows) — the only collectives in
    the whole frame are those halo exchanges; there is NO full-image
    gather before denoising (VERDICT r3 next #7).  The image stays
    row-sharded end to end; rows must divide over the mesh.
    """
    from realtimeraytracer_tpu.ops.denoise import (
        atrous_denoise_sharded_rows, ratio_combine)

    comp = render_components_sharded(gpu, frame, cfg, mesh, frame_index)
    n_dev = mesh.devices.size
    if cfg.denoise_iterations == 0 or n_dev == 1:
        from realtimeraytracer_tpu.render.pipeline import denoise_and_combine

        return denoise_and_combine(comp, cfg)
    if cfg.height % n_dev or (cfg.height // n_dev) < 2 * cfg.denoise_iterations:
        raise ValueError(
            f"height {cfg.height} must divide over {n_dev} devices with "
            f">= {2 * cfg.denoise_iterations} rows per device (the halo "
            "comes from a single ring neighbor)")

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(RAY_AXIS), P(RAY_AXIS), P(RAY_AXIS), P(RAY_AXIS),
                  P(RAY_AXIS)),
        out_specs=P(RAY_AXIS),
        check_vma=False,
    )
    def fn(analytic, shadowed, unshadowed, normal, position):
        s = atrous_denoise_sharded_rows(
            shadowed, normal, position, RAY_AXIS,
            cfg.denoise_iterations, cfg.denoise_c_phi, cfg.denoise_n_phi,
            cfg.denoise_p_phi)
        u = atrous_denoise_sharded_rows(
            unshadowed, normal, position, RAY_AXIS,
            cfg.denoise_iterations, cfg.denoise_c_phi, cfg.denoise_n_phi,
            cfg.denoise_p_phi)
        return ratio_combine(analytic, s, u)

    return fn(comp.analytic, comp.shadowed, comp.unshadowed, comp.normal,
              comp.position)
