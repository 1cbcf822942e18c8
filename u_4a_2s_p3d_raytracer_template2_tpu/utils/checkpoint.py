"""Checkpoint / resume for progressive rendering state.

The reference's only checkpoint mechanism is the GLSL feedback texture
carrying the running mean + sample count (P3D_RT.glsl:345-365 — SURVEY.md §5
calls it 'a genuine in-band checkpoint'). Here the same state is an explicit
pytree (models/pathtracer.Accumulator: linear sum image, count) saved with
orbax when available, NumPy .npz otherwise.

Failure policy: the orbax→npz fallback triggers ONLY on orbax being
unavailable (ImportError). A save/restore error against an actual checkpoint
(corrupt file, wrong tree structure) raises — a silently-wrong resume would
quietly blend unrelated accumulation state into the image.
"""
from __future__ import annotations

import os

import jax
import numpy as np


def _orbax():
    try:
        import orbax.checkpoint as ocp
        return ocp
    except ImportError:
        return None


def _is_orbax_ckpt(path: str) -> bool:
    """An orbax checkpoint is a directory; our npz fallback is a file."""
    return os.path.isdir(os.path.abspath(path))


def save(path: str, state) -> None:
    """Save any pytree of arrays. Uses orbax if importable, else .npz.
    Raises on write failure (no silent cross-format fallback)."""
    ocp = _orbax()
    if ocp is not None:
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.abspath(path), state, force=True)
        ckptr.wait_until_finished()
        return
    leaves, _ = jax.tree.flatten(state)
    np.savez(path if path.endswith(".npz") else path + ".npz",
             *[np.asarray(l) for l in leaves])


def restore(path: str, like):
    """Restore into the structure of ``like`` (a template pytree).
    Raises (with the checkpoint path in the message) on a corrupt or
    structure-mismatched checkpoint instead of falling through."""
    ocp = _orbax()
    if ocp is not None and _is_orbax_ckpt(path):
        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(os.path.abspath(path), target=like)
    npz = path if path.endswith(".npz") else path + ".npz"
    if not os.path.exists(npz):
        raise FileNotFoundError(
            f"no checkpoint at {path!r} (neither orbax dir nor {npz})")
    data = np.load(npz)
    leaves, treedef = jax.tree.flatten(like)
    if len(data.files) != len(leaves):
        raise ValueError(
            f"checkpoint {npz!r} has {len(data.files)} arrays but the "
            f"target pytree has {len(leaves)} leaves — wrong or corrupt "
            "checkpoint")
    # npz keys are arr_0..arr_N in save order = flatten order
    restored = []
    for i, (key, leaf) in enumerate(zip(data.files, leaves)):
        arr = data[key]
        want = np.shape(leaf)
        if tuple(arr.shape) != tuple(want):
            raise ValueError(
                f"checkpoint {npz!r} leaf {i} ({key}) has shape "
                f"{arr.shape}, target expects {want}")
        restored.append(jax.numpy.asarray(arr))
    return jax.tree.unflatten(treedef, restored)
