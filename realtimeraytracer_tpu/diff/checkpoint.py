"""Checkpoint / resume for inverse-rendering optimization.

The reference serializes nothing (SURVEY.md §5.4); the new framework needs
checkpointing for the optimization loop only: optimizer state + parameters,
via orbax (multi-host safe) with a plain-npz fallback.
"""

from __future__ import annotations

import os

import jax
import numpy as np

from realtimeraytracer_tpu.utils import log


def save_checkpoint(path: str, state, step: int) -> None:
    """Save a TrainState pytree (params + opt state) at a step."""
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.abspath(f"{path}/step_{step}"),
                   jax.tree.map(np.asarray, state), force=True)
        ckptr.wait_until_finished()
        log.info("checkpoint saved: {}/step_{}", path, step)
    except Exception as e:  # pragma: no cover - environment dependent
        log.warn("orbax save failed ({}); using npz fallback", e)
        flat, treedef = jax.tree.flatten(state)
        os.makedirs(path, exist_ok=True)
        # Named keys: restore indexes leaves explicitly (leaf_{i}) instead
        # of trusting zip member order to match the flatten order.
        np.savez(f"{path}/step_{step}.npz",
                 **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(flat)})


def restore_checkpoint(path: str, like, step: int):
    """Restore a TrainState pytree with the structure of `like`.

    Falls back to the npz format only when no orbax checkpoint directory
    exists for the step; an orbax checkpoint that exists but fails to load
    re-raises (masking real corruption with a silent fallback hides bugs).
    """
    orbax_dir = os.path.abspath(f"{path}/step_{step}")
    npz_path = f"{path}/step_{step}.npz"
    if os.path.isdir(orbax_dir):
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(orbax_dir, jax.tree.map(np.asarray, like))
    data = np.load(npz_path)
    flat, treedef = jax.tree.flatten(like)
    if len(data.files) != len(flat):
        raise ValueError(
            f"checkpoint {npz_path} holds {len(data.files)} leaves; "
            f"restore target has {len(flat)}")
    restored = [data[f"leaf_{i}"] for i in range(len(flat))]
    return jax.tree.unflatten(treedef, restored)


def latest_step(path: str) -> int | None:
    if not os.path.isdir(path):
        return None
    steps = []
    for name in os.listdir(path):
        if name.startswith("step_"):
            steps.append(int(name.split("_")[1].split(".")[0]))
    return max(steps) if steps else None
