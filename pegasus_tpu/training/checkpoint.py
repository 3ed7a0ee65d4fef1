"""Training checkpoint/restore (capture/restore equivalent).

The reference serializes (model tensors, optimizer state, iteration) via
torch checkpoints (reference: src/gs/gaussian_model.py:71-103,
gs_training.py:23-24,46-47).  Here the whole TrainState is a pytree, so
checkpointing is one orbax call; a numpy fallback keeps the format
dependency-free.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import jax


def save_checkpoint(state, path) -> None:
    """Write a TrainState checkpoint (orbax if available, else npz)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path.resolve(), state, force=True)
        ckptr.wait_until_finished()
    except Exception:
        flat, treedef = jax.tree.flatten(state)
        np.savez_compressed(
            str(path) + ".npz",
            treedef=np.frombuffer(
                repr(treedef).encode(), dtype=np.uint8
            ),
            **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(flat)},
        )


def restore_checkpoint(state_template, path):
    """Restore into the shape of `state_template`."""
    path = Path(path)
    if path.exists() and path.is_dir():
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(path.resolve(), state_template)
    npz = Path(str(path) + ".npz")
    if npz.exists():
        data = np.load(npz)
        flat, treedef = jax.tree.flatten(state_template)
        restored = [
            jax.numpy.asarray(data[f"leaf_{i}"]) for i in range(len(flat))
        ]
        return jax.tree.unflatten(treedef, restored)
    raise FileNotFoundError(path)
