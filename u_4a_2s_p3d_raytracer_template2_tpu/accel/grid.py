"""Host-side uniform grid construction (reference: Grid::Build, grid.cpp:30-98).

Cell counts n = m·w·(N/V)^(1/3) + 1 with m = 2 (rayAccelerator.h:29); objects
inserted into every overlapped cell (grid.cpp:75-91). Ships as a dense padded
[ncells, max_per_cell] item table — regular gathers for the DDA walk instead
of the reference's vector-of-vectors.
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..core import constants as C
from ..core.types import GridArrays
from .bvh import object_bounds

M_FACTOR = 2.0  # rayAccelerator.h:29


def build_grid(params: np.ndarray, ptype: np.ndarray,
               use_native: bool = True) -> GridArrays:
    bmin, bmax = object_bounds(params, ptype)
    bounded = np.asarray(
        [(t in (C.SPHERE, C.TRIANGLE, C.AABOX)) for t in ptype]
    )
    ids = np.nonzero(bounded)[0].astype(np.int32)
    unbounded = np.nonzero(~bounded & (ptype != C.INVALID))[0].astype(np.int32)

    if len(ids) == 0:
        return GridArrays(
            bbox_min=jnp.zeros(3), bbox_max=jnp.ones(3),
            cell_items=jnp.full((1, 1), -1, jnp.int32),
            cell_count=jnp.zeros(1, jnp.int32),
            unbounded_ids=jnp.asarray(np.concatenate([unbounded,
                                                      [-1]]).astype(np.int32)),
            nx=1, ny=1, nz=1, max_per_cell=1,
        )

    if use_native:
        built = _build_grid_native(bmin[ids], bmax[ids], ids, unbounded)
        if built is not None:
            return built

    gmin = bmin[ids].min(axis=0) - C.EPSILON  # grid.cpp:49-50
    gmax = bmax[ids].max(axis=0) + C.EPSILON
    w = (gmax - gmin).astype(np.float64)
    nobj = len(ids)
    s = (nobj / max(w[0] * w[1] * w[2], 1e-12)) ** (1.0 / 3.0)
    nx = int(M_FACTOR * w[0] * s + 1)
    ny = int(M_FACTOR * w[1] * s + 1)
    nz = int(M_FACTOR * w[2] * s + 1)
    ncells = nx * ny * nz

    cells: list[list[int]] = [[] for _ in range(ncells)]
    for oid in ids:
        ob_min, ob_max = bmin[oid], bmax[oid]
        ixmin = int(np.clip((ob_min[0] - gmin[0]) * nx / w[0], 0, nx - 1))
        iymin = int(np.clip((ob_min[1] - gmin[1]) * ny / w[1], 0, ny - 1))
        izmin = int(np.clip((ob_min[2] - gmin[2]) * nz / w[2], 0, nz - 1))
        ixmax = int(np.clip((ob_max[0] - gmin[0]) * nx / w[0], 0, nx - 1))
        iymax = int(np.clip((ob_max[1] - gmin[1]) * ny / w[1], 0, ny - 1))
        izmax = int(np.clip((ob_max[2] - gmin[2]) * nz / w[2], 0, nz - 1))
        for iz in range(izmin, izmax + 1):
            for iy in range(iymin, iymax + 1):
                for ix in range(ixmin, ixmax + 1):
                    cells[ix + nx * iy + nx * ny * iz].append(int(oid))

    max_per_cell = max(1, max(len(c) for c in cells))
    # round up to a lane-friendly multiple
    max_per_cell = ((max_per_cell + 7) // 8) * 8
    items = np.full((ncells, max_per_cell), -1, np.int32)
    count = np.zeros(ncells, np.int32)
    for i, c in enumerate(cells):
        items[i, : len(c)] = c
        count[i] = len(c)

    pad_u = max(8, ((max(len(unbounded), 1) + 7) // 8) * 8)
    unb = np.full(pad_u, -1, np.int32)
    unb[: len(unbounded)] = unbounded

    return GridArrays(
        bbox_min=jnp.asarray(gmin.astype(np.float32)),
        bbox_max=jnp.asarray(gmax.astype(np.float32)),
        cell_items=jnp.asarray(items),
        cell_count=jnp.asarray(count),
        unbounded_ids=jnp.asarray(unb),
        nx=nx, ny=ny, nz=nz, max_per_cell=max_per_cell,
    )


def _build_grid_native(bmin, bmax, ids, unbounded):
    """C++ grid builder (native/src/accel_build.cpp); None if unavailable."""
    from .. import native

    lib = native.get_lib()
    if lib is None:
        return None
    import ctypes

    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int)
    n = len(ids)
    bminf = np.ascontiguousarray(bmin, np.float32)
    bmaxf = np.ascontiguousarray(bmax, np.float32)
    gmin = np.zeros(3, np.float32)
    gmax = np.zeros(3, np.float32)
    dims = np.zeros(3, np.int32)
    # phase 1: discover max_per_cell
    need = lib.rt_build_grid(
        bminf.ctypes.data_as(fp), bmaxf.ctypes.data_as(fp), n,
        ctypes.c_float(M_FACTOR), gmin.ctypes.data_as(fp),
        gmax.ctypes.data_as(fp), dims.ctypes.data_as(ip), 0, None, None)
    if need < 0:
        return None
    max_per_cell = max(1, ((need + 7) // 8) * 8)
    ncells = int(dims[0]) * int(dims[1]) * int(dims[2])
    items = np.zeros((ncells, max_per_cell), np.int32)
    counts = np.zeros(ncells, np.int32)
    rc = lib.rt_build_grid(
        bminf.ctypes.data_as(fp), bmaxf.ctypes.data_as(fp), n,
        ctypes.c_float(M_FACTOR), gmin.ctypes.data_as(fp),
        gmax.ctypes.data_as(fp), dims.ctypes.data_as(ip), max_per_cell,
        items.ctypes.data_as(ip), counts.ctypes.data_as(ip))
    if rc != 0:
        return None
    # local indices -> global object ids
    gids = np.asarray(ids, np.int32)
    items = np.where(items >= 0, gids[np.maximum(items, 0)], -1)

    pad_u = max(8, ((max(len(unbounded), 1) + 7) // 8) * 8)
    unb = np.full(pad_u, -1, np.int32)
    unb[: len(unbounded)] = unbounded
    return GridArrays(
        bbox_min=jnp.asarray(gmin),
        bbox_max=jnp.asarray(gmax),
        cell_items=jnp.asarray(items),
        cell_count=jnp.asarray(counts),
        unbounded_ids=jnp.asarray(unb),
        nx=int(dims[0]), ny=int(dims[1]), nz=int(dims[2]),
        max_per_cell=max_per_cell,
    )
