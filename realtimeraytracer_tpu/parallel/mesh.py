"""Device mesh construction: data parallelism over rays/pixels.

SURVEY.md §2.4: the framework's one meaningful parallelism axis is DP over
rays — image tiles sharded P('rays') across every chip of every host, with
the scene (vertices, BVH, materials, lights, textures, LUTs) REPLICATED per
device.  There is no TP/PP/EP/sequence axis: no weight matrices and no
cross-ray communication until the final gather / gradient all-reduce.

The same code path runs on 1 chip, N local (or virtual CPU) devices, and
multi-host slices — only the mesh construction differs.
"""

from __future__ import annotations

import os

import numpy as np

import jax

RAY_AXIS = "rays"


def make_ray_mesh(n_devices: int | None = None,
                  devices: list | None = None) -> jax.sharding.Mesh:
    """A 1-D mesh over the ray axis using the first n_devices devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = n_devices or len(devices)
    if n > len(devices):
        raise ValueError(f"requested {n} devices, only {len(devices)} present")
    return jax.sharding.Mesh(np.array(devices[:n]), (RAY_AXIS,))


def initialize_multihost(**kwargs) -> None:
    """Multi-host bring-up (jax.distributed). No-op when single-process.

    The reference has no distributed capability at all (SURVEY.md §2.4);
    this is the green-field runtime hook: call before any jax op on every
    host of the slice, then build the mesh over jax.devices() (which then
    spans all hosts).
    """
    # Do NOT touch jax.process_count()/jax.devices() here: any backend
    # query initializes JAX single-process and makes the distributed init
    # below fail (found by tests/test_multihost.py — the r2 version did
    # exactly that and silently swallowed the resulting RuntimeError).
    from jax._src import distributed as _dist

    if _dist.global_state.client is not None:
        return  # already initialized
    if not kwargs and "JAX_COORDINATOR_ADDRESS" not in os.environ:
        # Nothing configures a coordinator: single-process run, skip quietly
        # (auto-detection would raise inside clusters we are not in).
        return
    jax.distributed.initialize(**kwargs)


def pad_to_multiple(n: int, m: int) -> int:
    return -(-n // m) * m
