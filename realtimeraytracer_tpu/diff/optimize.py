"""Inverse rendering: differentiable loss + sharded gradient training step.

The capability the reference does NOT have (BASELINE.json north star): pixel
losses backprop through shading and intersection to material, light and
vertex parameters.  The discrete hit decision is straight-through (the
traversal's prim ids are integers; render/surface.py recomputes the
continuous hit quantities differentiably from scene arrays), so plain
jax.grad works end-to-end; the training step shards rays over the mesh and
all-reduces parameter gradients (psum inserted by the shard_map transpose).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P

from realtimeraytracer_tpu.config import RenderConfig
from realtimeraytracer_tpu.parallel.mesh import RAY_AXIS
from realtimeraytracer_tpu.render.backends import make_backend
from realtimeraytracer_tpu.render.megakernel import shade_sample
from realtimeraytracer_tpu.scene.gpu_scene import GPUScene

# GPUScene leaves that are legal optimization targets.
OPTIMIZABLE = (
    "obj_color", "obj_specular", "obj_metallic",
    "lt_color", "lt_intensity",
    "sun_color", "sun_intensity", "env_color",
    "vertices", "sph_center", "sph_radius",
)


def extract_params(gpu: GPUScene, names: tuple[str, ...]) -> dict:
    for n in names:
        if n not in OPTIMIZABLE:
            raise ValueError(f"{n} is not an optimizable GPUScene leaf")
    return {n: getattr(gpu, n) for n in names}


def apply_params(gpu: GPUScene, params: dict) -> GPUScene:
    return gpu._replace(**params)


def radiance_loss(params: dict, gpu: GPUScene, cfg: RenderConfig,
                  origins, dirs, pixel_seed, target) -> jnp.ndarray:
    """Mean squared error of the analytic radiance against a target.

    (The analytic LTC estimate is noise-free, so it is the natural training
    signal; the stochastic channels would add gradient variance.)
    """
    g = apply_params(gpu, params)
    backend = make_backend(g, cfg)
    rad = shade_sample(g, cfg, origins, dirs, pixel_seed, backend)
    err = rad.analytic - target
    return jnp.mean(err * err)


def pipeline_loss(params: dict, gpu: GPUScene, cfg: RenderConfig,
                  frame, frame_index, target) -> jnp.ndarray:
    """MSE of the FULL pipeline image (trace + A-Trous denoise x N + ratio
    combine, render/pipeline.py) against an (H, W, 3) target.

    Gradients flow through the denoiser's edge-stopping weights and the
    ratio combine as well as shading/intersection — BASELINE config 5 on
    the complete frame, not just the analytic channel."""
    from realtimeraytracer_tpu.render.megakernel import render_components
    from realtimeraytracer_tpu.render.pipeline import denoise_and_combine

    g = apply_params(gpu, params)
    backend = make_backend(g, cfg)
    comp = render_components(g, frame, cfg, frame_index, backend)
    img = denoise_and_combine(comp, cfg)
    err = img - target
    return jnp.mean(err * err)


def wavefront_loss(params: dict, gpu: GPUScene, cfg: RenderConfig,
                   frame, frame_index, target) -> jnp.ndarray:
    """MSE of the multi-bounce wavefront image (render/wavefront.py)
    against an (H, W, 3) target — gradients flow through the NEE + GGX
    path-tracing estimator (bounce directions/hit ids are detached; the
    continuous shading recompute is differentiable)."""
    from realtimeraytracer_tpu.render.wavefront import render_wavefront

    g = apply_params(gpu, params)
    backend = make_backend(g, cfg)
    img = render_wavefront(g, frame, cfg, frame_index, backend)
    err = img - target
    return jnp.mean(err * err)


class TrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState


def make_train_step(cfg: RenderConfig, mesh: jax.sharding.Mesh,
                    optimizer: optax.GradientTransformation):
    """Build the sharded gradient step: rays split over the mesh, scene and
    params replicated, gradients all-reduced by the shard_map transpose."""

    def sharded_loss(params, gpu, origins, dirs, pixel_seed, target):
        @partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P(), P(), P(RAY_AXIS), P(RAY_AXIS), P(RAY_AXIS), P(RAY_AXIS)),
            out_specs=P(),
            # Mosaic trace kernels inside the body carry no vma
            # annotations (see parallel/sharded.py sharded_shade).
            check_vma=False,
        )
        def fn(p, g, o, d, seed, t):
            local = radiance_loss(p, g, cfg, o, d, seed, t)
            # Mean of per-device means == global mean when shards are equal.
            return jax.lax.pmean(local, RAY_AXIS)

        return fn(params, gpu, origins, dirs, pixel_seed, target)

    def train_step(state: TrainState, gpu: GPUScene, origins, dirs,
                   pixel_seed, target):
        loss, grads = jax.value_and_grad(sharded_loss)(
            state.params, gpu, origins, dirs, pixel_seed, target
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state), loss

    return train_step


def fit(
    gpu: GPUScene,
    cfg: RenderConfig,
    origins=None, dirs=None, pixel_seed=None, target=None,
    param_names: tuple[str, ...] = ("obj_color",),
    mesh: jax.sharding.Mesh | None = None,
    learning_rate: float = 2e-2,
    steps: int = 100,
    loss: str = "radiance",
    frame=None,
    frame_index: int = 0,
):
    """Convenience inverse-rendering loop (BASELINE config 5 shape).

    loss="radiance": analytic-channel MSE on explicit rays, sharded over
    the ray mesh with psum'd gradients (the multi-chip path).
    loss="pipeline" / "wavefront": full-image MSE through the complete
    pipeline (denoise + ratio combine) or the multi-bounce path tracer;
    pass `frame` (camera ViewportFrame) and an (H, W, 3) `target`.  The
    A-Trous denoiser is a global image stencil, so these run as one
    logical device (shard inside via cfg.tile_rays, not across rows).
    """
    from realtimeraytracer_tpu.parallel.mesh import make_ray_mesh

    optimizer = optax.adam(learning_rate)
    params = extract_params(gpu, param_names)
    state = TrainState(params, optimizer.init(params))
    if loss == "radiance":
        mesh = mesh or make_ray_mesh()
        step = jax.jit(make_train_step(cfg, mesh, optimizer))

        def run(state):
            return step(state, gpu, origins, dirs, pixel_seed, target)
    else:
        loss_fn = {"pipeline": pipeline_loss, "wavefront": wavefront_loss}[loss]
        if frame is None:
            raise ValueError(f"loss={loss!r} requires frame=")

        @jax.jit
        def image_step(state: TrainState, gpu, frame, target):
            val, grads = jax.value_and_grad(loss_fn)(
                state.params, gpu, cfg, frame, frame_index, target)
            updates, opt_state = optimizer.update(
                grads, state.opt_state, state.params)
            return TrainState(
                optax.apply_updates(state.params, updates), opt_state), val

        def run(state):
            return image_step(state, gpu, frame, target)

    losses = []
    for _ in range(steps):
        state, val = run(state)
        losses.append(float(val))
    return state.params, losses
