"""Checkpoint / resume.

The reference has no checkpointing (SURVEY §5); here the full Markov state is
an explicit PyTree (`EnvState` = board channels + timer + RNG key), so
save/restore is exact by construction: restoring a checkpoint reproduces the
exact future trajectory (threefry keys are part of the state).

Orbax is used when available (async, multi-host-safe); a numpy .npz fallback
covers minimal environments.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


def save_pytree(path: str, tree: Any) -> None:
    try:
        import orbax.checkpoint as ocp

        path = os.path.abspath(path)
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, tree, force=True)
        ckptr.wait_until_finished()
        return
    except ImportError:
        pass
    leaves, treedef = jax.tree.flatten(tree)
    np.savez(
        path if path.endswith(".npz") else path + ".npz",
        treedef=np.frombuffer(str(treedef).encode(), dtype=np.uint8),
        **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)},
    )


def restore_pytree(path: str, template: Any) -> Any:
    try:
        import orbax.checkpoint as ocp

        path = os.path.abspath(path)
        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(path, template)
    except ImportError:
        pass
    npz_path = path if path.endswith(".npz") else path + ".npz"
    data = np.load(npz_path)
    leaves, treedef = jax.tree.flatten(template)
    restored = [data[f"leaf_{i}"] for i in range(len(leaves))]
    return jax.tree.unflatten(treedef, restored)


def save_env_state(path: str, state) -> None:
    """Checkpoint a (possibly batched) EnvState."""
    save_pytree(path, state)


def restore_env_state(path: str, template):
    return restore_pytree(path, template)
