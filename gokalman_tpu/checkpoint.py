"""Checkpoint/resume for filter state.

The reference has no checkpointing (SURVEY.md §5: Reset() restores the
initial estimate and estimates persist only as CSV).  Here every filter
is a pytree of arrays, so checkpointing is plain orbax serialization of
the (model, state) pair — a filter can be stopped mid-stream on one
host and resumed bit-exactly on another (including the PRNG key for
AWGN streams, which the wall-clock-seeded reference could never replay,
noise.go:146).
"""

from __future__ import annotations

import os

import jax
import numpy as np


def save(path: str, pytree) -> None:
    """Serialize any filter pytree (model/state/estimates) to `path`."""
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.abspath(path), pytree, force=True)
        ckptr.wait_until_finished()
        return
    except Exception:
        # Fallback: numpy archive of the flattened pytree.
        leaves, treedef = jax.tree.flatten(pytree)
        np.savez(
            path if path.endswith(".npz") else path + ".npz",
            *[np.asarray(l) for l in leaves],
        )


def restore(path: str, template):
    """Restore a pytree saved by `save`, shaped like `template`."""
    npz = path if path.endswith(".npz") else path + ".npz"
    if os.path.exists(npz) and not os.path.isdir(path):
        data = np.load(npz)
        leaves = [data[k] for k in data.files]
        treedef = jax.tree.structure(template)
        t_leaves = jax.tree.leaves(template)
        import jax.numpy as jnp

        restored = [
            jnp.asarray(l, dtype=t.dtype) for l, t in zip(leaves, t_leaves)
        ]
        return jax.tree.unflatten(treedef, restored)
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), target=template)
