"""Checkpoint / resume for optimizer states.

The reference had no serialization API, but its design was
checkpoint-friendly (all state in language-side holders,
``stochqn/_optimizers.py:791-879``; documented mutable fields,
``include/stochqn.h:163-167``).  Here the whole optimizer state is a pytree
— including the ``section`` coroutine resume point — so a snapshot restores
mid-protocol exactly.

Two formats:
  * :func:`save_state` / :func:`load_state` — dependency-free ``.npz``
    (leaves keyed by tree path), portable and human-inspectable.
  * :func:`save_orbax` / :func:`load_orbax` — orbax-checkpoint, for
    multi-host / async checkpointing of sharded states.
"""
from __future__ import annotations

import numpy as np
import jax


def _flatten_with_paths(state):
    leaves_with_paths = jax.tree_util.tree_flatten_with_path(state)[0]
    out = {}
    for path, leaf in leaves_with_paths:
        key = "/".join(str(getattr(p, "name", getattr(p, "idx", p)))
                       for p in path)
        out[key] = np.asarray(leaf)
    return out


def save_state(path: str, state) -> None:
    """Write an optimizer state pytree to a ``.npz`` file."""
    np.savez(path, **_flatten_with_paths(state))


def load_state(path: str, template):
    """Load a state saved by :func:`save_state` into the structure (and
    shardings, via the template's leaves) of ``template``."""
    with np.load(path) as data:
        flat = dict(data)
    saved = _flatten_with_paths(template)
    if set(saved) != set(flat):
        missing = set(saved) ^ set(flat)
        raise ValueError(f"checkpoint structure mismatch: {sorted(missing)}")

    leaves_with_paths, treedef = jax.tree_util.tree_flatten_with_path(template)
    new_leaves = []
    for path, leaf in leaves_with_paths:
        key = "/".join(str(getattr(p, "name", getattr(p, "idx", p)))
                       for p in path)
        arr = flat[key]
        if arr.shape != np.shape(leaf):
            raise ValueError(
                f"checkpoint leaf {key!r} has shape {arr.shape}, "
                f"template has {np.shape(leaf)}")
        new_leaves.append(
            jax.device_put(arr.astype(np.asarray(leaf).dtype),
                           getattr(leaf, "sharding", None)))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def save_orbax(path: str, state) -> None:
    import orbax.checkpoint as ocp
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)


def load_orbax(path: str, template):
    import orbax.checkpoint as ocp
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, template)
