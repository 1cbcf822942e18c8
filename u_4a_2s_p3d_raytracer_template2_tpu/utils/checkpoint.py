"""Checkpoint / resume for progressive rendering state.

The reference's only checkpoint mechanism is the GLSL feedback texture
carrying the running mean + sample count (P3D_RT.glsl:345-365 — SURVEY.md §5
calls it 'a genuine in-band checkpoint'). Here the same state is an explicit
pytree (models/pathtracer.Accumulator: linear sum image, count) saved with
orbax when available, NumPy .npz otherwise.
"""
from __future__ import annotations

import os

import jax
import numpy as np


def save(path: str, state) -> None:
    """Save any pytree of arrays. Uses orbax if importable, else .npz."""
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.abspath(path), state, force=True)
        ckptr.wait_until_finished()
        return
    except Exception:
        pass
    leaves, treedef = jax.tree.flatten(state)
    np.savez(path if path.endswith(".npz") else path + ".npz",
             *[np.asarray(l) for l in leaves])


def restore(path: str, like):
    """Restore into the structure of ``like`` (a template pytree)."""
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(os.path.abspath(path), target=like)
    except Exception:
        pass
    npz = path if path.endswith(".npz") else path + ".npz"
    data = np.load(npz)
    leaves, treedef = jax.tree.flatten(like)
    restored = [jax.numpy.asarray(data[k]) for k in data.files]
    assert len(restored) == len(leaves)
    return jax.tree.unflatten(treedef, restored)
