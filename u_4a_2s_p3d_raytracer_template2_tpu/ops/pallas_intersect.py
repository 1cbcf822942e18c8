"""Pallas TPU kernels: fused brute-force intersection + running-min reduce.

The XLA path (ops/intersect.py, ops/mxu_intersect.py) materializes [R, chunk]
hit-t maps between the matmul and the argmin. These kernels keep the whole
chunk loop in VMEM: the primitive tables stream through a fori loop against a
ray tile that never leaves the chip, and only the final (t, id) pair per ray
is written back — one [R]-sized store instead of [R, K] traffic.

Layout: rays ride the sublane axis (TILE_R per program), primitives the lane
axis (128 per chunk — one VPU/MXU lane block). Grid = ray tiles.

Both kernels reproduce the exact reference semantics of their XLA twins
(sphere: scene.cpp:149-172 smaller-positive-root; triangle: Baldwin-Weber
form of Möller-Trumbore with the |n·d| > EPSILON det cutoff and t > EPSILON,
scene.cpp:55-88) and are validated against them in interpret mode on CPU
(tests/test_pallas_kernels.py).

STATUS: compiled + validated in interpret mode; on-device execution through
the current remote-TPU tunnel dies with an opaque terminal-side
RESOURCE_EXHAUSTED regardless of tile/VMEM sizing (tried 1-D and (8,128)
output layouts, TILE_R 256/1024, inner subtiling, vmem_limit 14-100MB), so
they are not wired into the default path yet; the XLA/MXU path
(ops/mxu_intersect.py) is the production route. Revisit on a directly
attached chip.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import constants as C

TILE_R = 1024   # rays per program; outputs block as (8, 128)
SUB_R = 256     # rays per inner subtile — bounds live VMEM temps to [256,128]
LANE = 128      # primitives per inner step

_EPS = C.EPSILON


def _sphere_body(o, d, cs, kk, valid):
    """[TILE_R, LANE] hit t for one sphere chunk; BIG on miss."""
    oc = jnp.dot(o, cs.T, preferred_element_type=jnp.float32)
    dc = jnp.dot(d, cs.T, preferred_element_type=jnp.float32)
    a = jnp.sum(d * d, -1)[:, None]
    do = jnp.sum(d * o, -1)[:, None]
    oo = jnp.sum(o * o, -1)[:, None]
    b = 2.0 * (do - dc)
    cc = oo - 2.0 * oc + kk[None, :]
    delta = b * b - 4.0 * a * cc
    pos = delta > 0.0
    sq = jnp.where(pos, jnp.sqrt(jnp.where(pos, delta, 1.0)), 0.0)
    inv2a = 0.5 / a
    t0 = (-b - sq) * inv2a
    t1 = (-b + sq) * inv2a
    lo = jnp.minimum(t0, t1)
    hi = jnp.maximum(t0, t1)
    t = jnp.where(lo < 0.0, hi, lo)
    ok = (delta >= 0.0) & (t >= 0.0) & valid[None, :]
    return jnp.where(ok, t, C.BIG)


def _sphere_kernel(o_ref, d_ref, c_ref, k_ref, ids_ref, t_ref, id_ref):
    n_chunks = c_ref.shape[0]        # tables pre-chunked [n_chunks, LANE, ...]

    for sub in range(TILE_R // SUB_R):
        o = o_ref[sub * SUB_R:(sub + 1) * SUB_R, :]   # [SUB_R, 3]
        d = d_ref[sub * SUB_R:(sub + 1) * SUB_R, :]

        def body(ci, carry):
            t_best, id_best = carry
            cs = c_ref[ci]           # [LANE, 3]
            kk = k_ref[ci]           # [LANE]
            ids = ids_ref[ci]
            t = _sphere_body(o, d, cs, kk, ids >= 0)
            # gather-free reduce (Mosaic has no in-kernel gather): min over
            # lanes, then the smallest id among exact-min lanes — the
            # reference's first-in-order tie rule for an ascending id table.
            t_min = jnp.min(t, axis=-1)
            pid = jnp.min(
                jnp.where(t == t_min[:, None], ids[None, :],
                          jnp.int32(2**30)),
                axis=-1)
            better = t_min < t_best
            return (jnp.where(better, t_min, t_best),
                    jnp.where(better, pid, id_best))

        init = (jnp.full((SUB_R,), C.BIG, jnp.float32),
                jnp.full((SUB_R,), -1, jnp.int32))
        t_best, id_best = jax.lax.fori_loop(0, n_chunks, body, init)
        rows = SUB_R // LANE
        t_ref[sub * rows:(sub + 1) * rows, :] = t_best.reshape(rows, LANE)
        id_ref[sub * rows:(sub + 1) * rows, :] = id_best.reshape(rows, LANE)


def _tri_kernel(o_ref, d_ref, mo_ref, md_ref, ids_ref, t_ref, id_ref):
    n_chunks = mo_ref.shape[0]       # tables pre-chunked [n_chunks, ...]

    for sub in range(TILE_R // SUB_R):
        o = o_ref[sub * SUB_R:(sub + 1) * SUB_R, :]   # [SUB_R, 3]
        d = d_ref[sub * SUB_R:(sub + 1) * SUB_R, :]
        o4 = jnp.concatenate([o, jnp.ones((o.shape[0], 1), o.dtype)], -1)

        def body(ci, carry):
            t_best, id_best = carry
            mo = mo_ref[ci]          # [3*LANE, 4]
            md = md_ref[ci]          # [3*LANE, 3]
            ids = ids_ref[ci]        # [LANE]
            s_o = jnp.dot(o4, mo.T, preferred_element_type=jnp.float32)
            s_d = jnp.dot(d, md.T, preferred_element_type=jnp.float32)
            s_o = s_o.reshape(SUB_R, LANE, 3)
            s_d = s_d.reshape(SUB_R, LANE, 3)
            den = s_d[..., 0]
            ok = jnp.abs(den) > _EPS
            inv = 1.0 / jnp.where(ok, den, 1.0)
            t = -s_o[..., 0] * inv
            u = s_o[..., 1] + t * s_d[..., 1]
            v = s_o[..., 2] + t * s_d[..., 2]
            ok &= (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0)
            ok &= (t > _EPS) & (ids >= 0)[None, :]
            t = jnp.where(ok, t, C.BIG)
            t_min = jnp.min(t, axis=-1)
            pid = jnp.min(
                jnp.where(t == t_min[:, None], ids[None, :],
                          jnp.int32(2**30)),
                axis=-1)
            better = t_min < t_best
            return (jnp.where(better, t_min, t_best),
                    jnp.where(better, pid, id_best))

        init = (jnp.full((SUB_R,), C.BIG, jnp.float32),
                jnp.full((SUB_R,), -1, jnp.int32))
        t_best, id_best = jax.lax.fori_loop(0, n_chunks, body, init)
        rows = SUB_R // LANE
        t_ref[sub * rows:(sub + 1) * rows, :] = t_best.reshape(rows, LANE)
        id_ref[sub * rows:(sub + 1) * rows, :] = id_best.reshape(rows, LANE)


def _pad_rays(o, d):
    R = o.shape[0]
    pad = (-R) % TILE_R
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
        d = jnp.concatenate(
            [d, jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], d.dtype),
                                 (pad, 3))])
    return o, d, R


@functools.partial(jax.jit, static_argnames=("interpret",))
def sphere_closest(centers, k_const, ids, o, d, interpret: bool = False):
    """Fused sphere closest-hit: (t [R], id [R]). K must be a LANE multiple."""
    o, d, R = _pad_rays(o, d)
    n_tiles = o.shape[0] // TILE_R
    grid = (n_tiles,)
    t, pid = pl.pallas_call(
        _sphere_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_R, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_R, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TILE_R // LANE, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_R // LANE, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((o.shape[0] // LANE, LANE), jnp.float32),
            jax.ShapeDtypeStruct((o.shape[0] // LANE, LANE), jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=14 * 1024 * 1024),
        interpret=interpret,
    )(o, d, centers.reshape(-1, LANE, 3), k_const.reshape(-1, LANE),
      ids.reshape(-1, LANE))
    return t.reshape(-1)[:R], pid.reshape(-1)[:R]


@functools.partial(jax.jit, static_argnames=("interpret",))
def triangle_closest(mo, md, ids, o, d, interpret: bool = False):
    """Fused Baldwin-Weber triangle closest-hit: (t [R], id [R])."""
    o, d, R = _pad_rays(o, d)
    n_tiles = o.shape[0] // TILE_R
    t, pid = pl.pallas_call(
        _tri_kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((TILE_R, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_R, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TILE_R // LANE, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_R // LANE, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((o.shape[0] // LANE, LANE), jnp.float32),
            jax.ShapeDtypeStruct((o.shape[0] // LANE, LANE), jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=14 * 1024 * 1024),
        interpret=interpret,
    )(o, d, mo.reshape(-1, 3 * LANE, 4), md.reshape(-1, 3 * LANE, 3),
      ids.reshape(-1, LANE))
    return t.reshape(-1)[:R], pid.reshape(-1)[:R]
