"""Pallas TPU kernels: fused brute-force intersection + running-min reduce.

The XLA path (ops/intersect.py, ops/mxu_intersect.py) materializes [R, chunk]
hit-t maps in HBM between the intersection math and the argmin — at
balls_high scale (262k rays x 7.4k spheres) that is ~8 GB of round-trip
traffic per sweep. These kernels keep everything in VMEM: the primitive
table streams through a fori_loop 128 lanes at a time against a resident ray
tile, and only the final (t, position) pair per ray is written back — one
[R]-sized store instead of [R, K] traffic. Measured on v5e with a
chained-dependency protocol (see CLAUDE.md on benchmark dedup): sphere
133 ms vs 218 ms XLA per 262k x 7.4k sweep (1.6x); triangle 249 ms vs
716 ms XLA per 65k x 100k sweep (2.9x).

Why the VPU and not the MXU: the per-(ray, primitive) "matmuls" here have
contraction dimension 3-8, so an MXU formulation wastes >=94% of the systolic
array — and the MXU's native bf16 multiply is unusable anyway (one-pass
DEFAULT precision flips closest-hit winners on 40% of rays on a dense random
scene; interpret mode hides it because CPU matmuls are f32). A previous
matmul revision of this file needed Precision.HIGHEST (6-pass) to match the
XLA winners and the 6x multiply passes ate the entire win. The VPU is
natively f32: each dot term is 3
broadcast FMAs of a [TILE_R, 1] ray column against a [1, LANE] primitive
row, bit-comparable to the XLA formulas.

Winner tracking (Mosaic rejects int32 sublane broadcasts in loop bodies, so
everything stays f32): a per-lane-slot running (t, table position) pair is
elementwise-folded across chunks — strict <, so the earliest chunk wins ties,
matching the reference's first-in-scan-order rule (scene order = ascending
table position) — with ONE cross-lane reduce at the very end. The object-id
gather from the winning position happens in XLA outside the kernel.

Both kernels reproduce the exact reference semantics of their XLA twins
(sphere: scene.cpp:149-172 smaller-positive-root; triangle: Baldwin-Weber
form of Möller-Trumbore with the |n·d| > EPSILON det cutoff and t > EPSILON,
scene.cpp:55-88); validated against them in interpret mode on CPU
(tests/test_pallas_kernels.py) and against the XLA winners on device.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import constants as C

_EPS = C.EPSILON

TILE_R = 1024   # rays per program; output block (8, 128)
LANE = 128      # primitives per inner fori step

_NOPOS = float(2.0 ** 30)


def _finish(t_slot, pos_slot, t_ref, pos_ref):
    """Single cross-lane reduce + lowest-position tie-break, then store."""
    t_best = jnp.min(t_slot, axis=-1)
    pos_best = jnp.min(
        jnp.where(t_slot == t_best[:, None], pos_slot, _NOPOS), axis=-1)
    pos_best = jnp.where(t_best >= C.BIG, -1.0, pos_best)
    rows = t_ref.shape[0]
    t_ref[:] = t_best.reshape(rows, LANE)
    pos_ref[:] = pos_best.reshape(rows, LANE)


def _fold(t, ci, iota, carry):
    """Fold one [TILE_R, LANE] t map into the per-lane-slot running min."""
    t_slot, pos_slot = carry
    ppos = iota + float(LANE) * ci.astype(jnp.float32)
    better = t < t_slot
    return (jnp.where(better, t, t_slot),
            jnp.where(better, ppos, pos_slot))


def _sphere_kernel(om_ref, dm_ref, a_ref, t_ref, pos_ref):
    n_chunks = a_ref.shape[1] // LANE
    om = om_ref[:]                      # [TILE_R, 8]: [o, oo, 2do, 4a, -1/2a, 0]
    dm = dm_ref[:]                      # [TILE_R, 8]: [d, 0, ...]
    ox, oy, oz = om[:, 0:1], om[:, 1:2], om[:, 2:3]
    dx, dy, dz = dm[:, 0:1], dm[:, 1:2], dm[:, 2:3]
    oo = om[:, 3:4]
    do2 = om[:, 4:5]
    a4 = om[:, 5:6]
    minv2a = om[:, 6:7]
    iota = jax.lax.broadcasted_iota(
        jnp.int32, (TILE_R, LANE), 1).astype(jnp.float32)

    def body(ci, carry):
        sl = pl.ds(ci * LANE, LANE)
        cx = a_ref[0:1, sl]             # [1, LANE] — rows hold -2*center
        cy = a_ref[1:2, sl]
        cz = a_ref[2:3, sl]
        kk = a_ref[3:4, sl]
        oc2 = ox * cx + oy * cy + oz * cz      # [TILE_R, LANE] = -2 o.c
        dc2 = dx * cx + dy * cy + dz * cz      # = -2 d.c
        b = do2 + dc2                          # 2 d.(o - c)
        cc = (oo + kk) + oc2                   # (o-c).(o-c) - r^2, expanded
        delta = b * b - a4 * cc
        hit = delta > 0.0
        sq = jnp.sqrt(jnp.where(hit, delta, 1.0))
        # a > 0, minv2a = -1/(2a) < 0. The smaller root t0 = (b+sq)*minv2a
        # is negative iff b+sq > 0, in which case the reference takes the
        # larger root (b-sq)*minv2a — one select on the sq sign:
        s = jnp.where(b + sq > 0.0, -sq, sq)
        t = (b + s) * minv2a
        ok = hit & (t >= 0.0)
        # zero-padded table entries can never hit (delta = 4(do^2 - a*oo)
        # <= 0 by Cauchy-Schwarz), so no validity lane mask is needed
        t = jnp.where(ok, t, C.BIG)
        return _fold(t, ci, iota, carry)

    init = (jnp.full((TILE_R, LANE), C.BIG, jnp.float32),
            jnp.full((TILE_R, LANE), -1.0, jnp.float32))
    t_slot, pos_slot = jax.lax.fori_loop(0, n_chunks, body, init)
    _finish(t_slot, pos_slot, t_ref, pos_ref)


def _pad_rays(o, d):
    R = o.shape[0]
    pad = (-R) % TILE_R
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
        d = jnp.concatenate(
            [d, jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], d.dtype),
                                 (pad, 3))])
    return o, d, R


def _pad_prims(arrs, n, mult):
    pad = (-n) % mult
    if pad:
        arrs = [jnp.concatenate([a, jnp.zeros((pad,) + a.shape[1:], a.dtype)])
                for a in arrs]
    return arrs, n + pad


def _ray_lhs(o, d):
    """Pack per-ray columns + precomputed quadratic scalars: om/dm [R, 8]."""
    a = jnp.sum(d * d, -1, keepdims=True)
    do = jnp.sum(d * o, -1, keepdims=True)
    oo = jnp.sum(o * o, -1, keepdims=True)
    zero = jnp.zeros_like(a)
    om = jnp.concatenate([o, oo, 2.0 * do, 4.0 * a, -0.5 / a, zero], -1)
    dm = jnp.concatenate([d, zero, zero, zero, zero, zero], -1)
    return om, dm


def _gather_ids(ids, pos, R):
    pos = pos.reshape(-1)[:R].astype(jnp.int32)
    safe = jnp.maximum(pos, 0)
    return jnp.where(pos >= 0, ids[safe], -1)


_RAY_SPEC = pl.BlockSpec((TILE_R, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)

_OUT_SPECS = (
    pl.BlockSpec((TILE_R // LANE, LANE), lambda i: (i, 0),
                 memory_space=pltpu.VMEM),
    pl.BlockSpec((TILE_R // LANE, LANE), lambda i: (i, 0),
                 memory_space=pltpu.VMEM),
)


def _out_shape(n_rays):
    return (
        jax.ShapeDtypeStruct((n_rays // LANE, LANE), jnp.float32),
        jax.ShapeDtypeStruct((n_rays // LANE, LANE), jnp.float32),
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def sphere_closest(centers, k_const, ids, o, d, interpret: bool = False):
    """Fused sphere closest-hit: (t [R], id [R])."""
    o, d, R = _pad_rays(o, d)
    K = centers.shape[0]
    (centers, k_const), Kp = _pad_prims([centers, k_const], K, LANE)
    om, dm = _ray_lhs(o, d)
    # A = [8, Kp]: rows -2cx -2cy -2cz k, zero-padded to the f32 sublane
    # tile (the -2 is folded into the table so the kernel's dot terms land
    # directly on the quadratic's b and c contributions)
    A = jnp.concatenate([-2.0 * centers.T, k_const[None, :],
                         jnp.zeros((4, Kp), jnp.float32)], 0)
    t, pos = pl.pallas_call(
        _sphere_kernel,
        grid=(o.shape[0] // TILE_R,),
        in_specs=[_RAY_SPEC, _RAY_SPEC,
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=_OUT_SPECS,
        out_shape=_out_shape(o.shape[0]),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(om, dm, A)
    return t.reshape(-1)[:R], _gather_ids(ids, pos, R)


# ---------------------------------------------------------------------------
# triangle (Baldwin-Weber affine functionals, see ops/mxu_intersect.py)


def _tri_kernel(m_ref, o_ref, d_ref, t_ref, pos_ref):
    n_chunks = m_ref.shape[1] // LANE
    om = o_ref[:]                       # [TILE_R, 8] = [o, 0...]
    dm = d_ref[:]
    ox, oy, oz = om[:, 0:1], om[:, 1:2], om[:, 2:3]
    dx, dy, dz = dm[:, 0:1], dm[:, 1:2], dm[:, 2:3]
    iota = jax.lax.broadcasted_iota(
        jnp.int32, (TILE_R, LANE), 1).astype(jnp.float32)

    def body(ci, carry):
        sl = pl.ds(ci * LANE, LANE)

        def plane(r0):
            """Affine functional rows r0..r0+3 (x,y,z,w) applied to
            homogeneous o, and its linear part applied to d."""
            mx = m_ref[r0:r0 + 1, sl]
            my = m_ref[r0 + 1:r0 + 2, sl]
            mz = m_ref[r0 + 2:r0 + 3, sl]
            mw = m_ref[r0 + 3:r0 + 4, sl]
            so = ox * mx + oy * my + oz * mz + mw
            sd = dx * mx + dy * my + dz * mz
            return so, sd

        so_t, sd_t = plane(0)
        so_u, sd_u = plane(4)
        so_v, sd_v = plane(8)
        ok = jnp.abs(sd_t) > _EPS       # |det_MT| = |n.d| cutoff
        inv = 1.0 / jnp.where(ok, sd_t, 1.0)
        t = -so_t * inv
        u = so_u + t * sd_u
        v = so_v + t * sd_v
        ok &= (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0)
        ok &= t > _EPS
        # zero-padded rows: sd_t = 0 fails the cutoff, never hit
        t = jnp.where(ok, t, C.BIG)
        return _fold(t, ci, iota, carry)

    init = (jnp.full((TILE_R, LANE), C.BIG, jnp.float32),
            jnp.full((TILE_R, LANE), -1.0, jnp.float32))
    t_slot, pos_slot = jax.lax.fori_loop(0, n_chunks, body, init)
    _finish(t_slot, pos_slot, t_ref, pos_ref)


# ---------------------------------------------------------------------------
# fused small-scene kernel: triangles + spheres in ONE pallas_call
#
# Hypothesis was that for corpus-scale scenes (mount: 8 tris + 4 spheres)
# the per-type XLA sweeps waste HBM passes on tables that fit in two VMEM
# tiles. MEASURED on v5e (mount_low 512^2 depth-4 frame): the fused kernel
# REGRESSES the frame 1.6x (5.18 -> 3.19 Mrays/s headline) — at 12
# primitives the XLA sweeps fuse into the surrounding shading program, while
# a pallas_call is a fusion barrier plus fixed launch cost, paid 8x per
# frame (closest + shadow at each of 4 levels). So this kernel is NOT wired
# into closest_hit_brute; it stays validated (interpret-mode test) as the
# starting point for an intermediate-size (256-1024 prims) sweep if a
# workload shows up there. Positions index the concatenated
# [tri_pad | sphere_pad] table; triangles occupy lower positions, so the
# strict-< fold preserves the cross-type tie order of the XLA path
# (triangle before sphere, ops/intersect.closest_hit_brute).


def _tri_fold_body(m_ref, ray_cols, iota, base):
    ox, oy, oz, dx, dy, dz = ray_cols

    def body(ci, carry):
        sl = pl.ds(ci * LANE, LANE)

        def plane(r0):
            mx = m_ref[r0:r0 + 1, sl]
            my = m_ref[r0 + 1:r0 + 2, sl]
            mz = m_ref[r0 + 2:r0 + 3, sl]
            mw = m_ref[r0 + 3:r0 + 4, sl]
            so = ox * mx + oy * my + oz * mz + mw
            sd = dx * mx + dy * my + dz * mz
            return so, sd

        so_t, sd_t = plane(0)
        so_u, sd_u = plane(4)
        so_v, sd_v = plane(8)
        ok = jnp.abs(sd_t) > _EPS
        inv = 1.0 / jnp.where(ok, sd_t, 1.0)
        t = -so_t * inv
        u = so_u + t * sd_u
        v = so_v + t * sd_v
        ok &= (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0)
        ok &= t > _EPS
        t = jnp.where(ok, t, C.BIG)
        return _fold(t, ci + base / LANE, iota, carry)

    return body


def _sph_fold_body(a_ref, ray_cols, quad, iota, base):
    ox, oy, oz, dx, dy, dz = ray_cols
    oo, do2, a4, minv2a = quad

    def body(ci, carry):
        sl = pl.ds(ci * LANE, LANE)
        cx = a_ref[0:1, sl]
        cy = a_ref[1:2, sl]
        cz = a_ref[2:3, sl]
        kk = a_ref[3:4, sl]
        oc2 = ox * cx + oy * cy + oz * cz
        dc2 = dx * cx + dy * cy + dz * cz
        b = do2 + dc2
        cc = (oo + kk) + oc2
        delta = b * b - a4 * cc
        hit = delta > 0.0
        sq = jnp.sqrt(jnp.where(hit, delta, 1.0))
        s = jnp.where(b + sq > 0.0, -sq, sq)
        t = (b + s) * minv2a
        ok = hit & (t >= 0.0)
        t = jnp.where(ok, t, C.BIG)
        return _fold(t, ci + base / LANE, iota, carry)

    return body


def _make_small_kernel(n_tri_pad: int, n_sph_pad: int):
    def kernel(m_ref, a_ref, om_ref, dm_ref, t_ref, pos_ref):
        om = om_ref[:]
        dm = dm_ref[:]
        ray_cols = (om[:, 0:1], om[:, 1:2], om[:, 2:3],
                    dm[:, 0:1], dm[:, 1:2], dm[:, 2:3])
        quad = (om[:, 3:4], om[:, 4:5], om[:, 5:6], om[:, 6:7])
        iota = jax.lax.broadcasted_iota(
            jnp.int32, (TILE_R, LANE), 1).astype(jnp.float32)
        carry = (jnp.full((TILE_R, LANE), C.BIG, jnp.float32),
                 jnp.full((TILE_R, LANE), -1.0, jnp.float32))
        if n_tri_pad:
            carry = jax.lax.fori_loop(
                0, n_tri_pad // LANE,
                _tri_fold_body(m_ref, ray_cols, iota, 0.0), carry)
        if n_sph_pad:
            carry = jax.lax.fori_loop(
                0, n_sph_pad // LANE,
                _sph_fold_body(a_ref, ray_cols, quad, iota,
                               float(n_tri_pad)), carry)
        _finish(carry[0], carry[1], t_ref, pos_ref)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def small_scene_closest(mo, tri_ids, centers, k_const, sph_ids, o, d,
                        interpret: bool = False):
    """Fused triangle+sphere closest hit for small scenes: (t [R], id [R]).

    mo: [Kt, 3, 4] Baldwin-Weber functionals (may be empty), centers/k_const:
    sphere table (may be empty). Exact same per-type semantics as
    triangle_closest / sphere_closest; cross-type ties resolve triangle-first
    (the concatenated-table position order).
    """
    o, d, R = _pad_rays(o, d)
    om, dm = _ray_lhs(o, d)

    Kt = mo.reshape(-1, 3, 4).shape[0]
    Ks = centers.shape[0]
    (mo,), Kt_pad = _pad_prims([mo.reshape(-1, 3, 4)], Kt, LANE)
    (centers, k_const), Ks_pad = _pad_prims([centers, k_const], Ks, LANE)
    if Kt == 0:
        Kt_pad = 0
    if Ks == 0:
        Ks_pad = 0
    M = (jnp.concatenate([
        jnp.transpose(mo[:Kt_pad], (1, 2, 0)).reshape(12, Kt_pad),
        jnp.zeros((4, Kt_pad), jnp.float32)], 0)
        if Kt_pad else jnp.zeros((16, LANE), jnp.float32))
    A = (jnp.concatenate([
        -2.0 * centers[:Ks_pad].T, k_const[None, :Ks_pad],
        jnp.zeros((4, Ks_pad), jnp.float32)], 0)
        if Ks_pad else jnp.zeros((8, LANE), jnp.float32))

    t, pos = pl.pallas_call(
        _make_small_kernel(Kt_pad, Ks_pad),
        grid=(o.shape[0] // TILE_R,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  _RAY_SPEC, _RAY_SPEC],
        out_specs=_OUT_SPECS,
        out_shape=_out_shape(o.shape[0]),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(M, A, om, dm)
    # concatenated position -> global object id
    all_ids = jnp.concatenate([
        jnp.pad(tri_ids, (0, Kt_pad - Kt), constant_values=-1),
        jnp.pad(sph_ids, (0, Ks_pad - Ks), constant_values=-1),
    ]) if (Kt_pad and Ks_pad) else (
        jnp.pad(tri_ids, (0, Kt_pad - Kt), constant_values=-1) if Kt_pad
        else jnp.pad(sph_ids, (0, Ks_pad - Ks), constant_values=-1))
    return t.reshape(-1)[:R], _gather_ids(all_ids, pos, R)


# ---------------------------------------------------------------------------
# any-hit shadow kernels (bvh.cpp:348-416 / grid.cpp:313-361 capability):
# no winner tracking at all — fold a 0/1 occlusion map and early-exit the
# chunk loop once every resident ray is occluded. Shadow rays carry the
# unnormalized L with max_t=1.0 (t in units of |L|), so `t < max_t` is the
# reference's `distance < length` test.
#
# Ray validity rides in column 7 of the packed ray block (zero elsewhere):
# pad rays start pre-occluded so they never block the early exit.


def _make_sphere_any_kernel(max_t: float):
    def kernel(om_ref, dm_ref, a_ref, occ_ref):
        n_chunks = a_ref.shape[1] // LANE
        om = om_ref[:]
        dm = dm_ref[:]
        ox, oy, oz = om[:, 0:1], om[:, 1:2], om[:, 2:3]
        dx, dy, dz = dm[:, 0:1], dm[:, 1:2], dm[:, 2:3]
        oo = om[:, 3:4]
        do2 = om[:, 4:5]
        a4 = om[:, 5:6]
        minv2a = om[:, 6:7]
        valid = om[:, 7:8]

        def cond(state):
            ci, occ = state
            return (ci < n_chunks) & (jnp.min(jnp.max(occ, -1)) < 0.5)

        def body(state):
            ci, occ = state
            sl = pl.ds(ci * LANE, LANE)
            cx = a_ref[0:1, sl]
            cy = a_ref[1:2, sl]
            cz = a_ref[2:3, sl]
            kk = a_ref[3:4, sl]
            oc2 = ox * cx + oy * cy + oz * cz
            dc2 = dx * cx + dy * cy + dz * cz
            b = do2 + dc2
            cc = (oo + kk) + oc2
            delta = b * b - a4 * cc
            hit = delta > 0.0
            sq = jnp.sqrt(jnp.where(hit, delta, 1.0))
            s = jnp.where(b + sq > 0.0, -sq, sq)
            t = (b + s) * minv2a
            ok = hit & (t >= 0.0) & (t < max_t)
            return ci + 1, jnp.maximum(occ, jnp.where(ok, 1.0, 0.0))

        occ0 = jnp.broadcast_to(1.0 - valid, (TILE_R, LANE))
        _, occ = jax.lax.while_loop(cond, body, (jnp.int32(0), occ0))
        rows = occ_ref.shape[0]
        occ_ref[:] = jnp.max(occ, axis=-1).reshape(rows, LANE)

    return kernel


def _make_tri_any_kernel(max_t: float):
    def kernel(m_ref, o_ref, d_ref, occ_ref):
        n_chunks = m_ref.shape[1] // LANE
        om = o_ref[:]
        dm = d_ref[:]
        ox, oy, oz = om[:, 0:1], om[:, 1:2], om[:, 2:3]
        dx, dy, dz = dm[:, 0:1], dm[:, 1:2], dm[:, 2:3]
        valid = om[:, 7:8]

        def cond(state):
            ci, occ = state
            return (ci < n_chunks) & (jnp.min(jnp.max(occ, -1)) < 0.5)

        def body(state):
            ci, occ = state
            sl = pl.ds(ci * LANE, LANE)

            def plane(r0):
                mx = m_ref[r0:r0 + 1, sl]
                my = m_ref[r0 + 1:r0 + 2, sl]
                mz = m_ref[r0 + 2:r0 + 3, sl]
                mw = m_ref[r0 + 3:r0 + 4, sl]
                so = ox * mx + oy * my + oz * mz + mw
                sd = dx * mx + dy * my + dz * mz
                return so, sd

            so_t, sd_t = plane(0)
            so_u, sd_u = plane(4)
            so_v, sd_v = plane(8)
            ok = jnp.abs(sd_t) > _EPS
            inv = 1.0 / jnp.where(ok, sd_t, 1.0)
            t = -so_t * inv
            u = so_u + t * sd_u
            v = so_v + t * sd_v
            ok &= (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0)
            ok &= (t > _EPS) & (t < max_t)
            return ci + 1, jnp.maximum(occ, jnp.where(ok, 1.0, 0.0))

        occ0 = jnp.broadcast_to(1.0 - valid, (TILE_R, LANE))
        _, occ = jax.lax.while_loop(cond, body, (jnp.int32(0), occ0))
        rows = occ_ref.shape[0]
        occ_ref[:] = jnp.max(occ, axis=-1).reshape(rows, LANE)

    return kernel


_OCC_SPEC = pl.BlockSpec((TILE_R // LANE, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)


def _occ_shape(n_rays):
    return jax.ShapeDtypeStruct((n_rays // LANE, LANE), jnp.float32)


def _mark_valid(block, R):
    """Set column 7 = 1.0 on the first R (real) rows of a packed ray block."""
    real = (jnp.arange(block.shape[0]) < R).astype(block.dtype)
    return block.at[:, 7].set(real)


@functools.partial(jax.jit, static_argnames=("max_t", "interpret"))
def sphere_any_hit(centers, k_const, o, d, max_t: float,
                   interpret: bool = False):
    """Fused sphere any-hit: occluded [R] bool (∃ hit with t < max_t)."""
    o, d, R = _pad_rays(o, d)
    K = centers.shape[0]
    (centers, k_const), Kp = _pad_prims([centers, k_const], K, LANE)
    om, dm = _ray_lhs(o, d)
    om = _mark_valid(om, R)
    A = jnp.concatenate([-2.0 * centers.T, k_const[None, :],
                         jnp.zeros((4, Kp), jnp.float32)], 0)
    occ = pl.pallas_call(
        _make_sphere_any_kernel(float(max_t)),
        grid=(o.shape[0] // TILE_R,),
        in_specs=[_RAY_SPEC, _RAY_SPEC,
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=_OCC_SPEC,
        out_shape=_occ_shape(o.shape[0]),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(om, dm, A)
    return occ.reshape(-1)[:R] > 0.5


@functools.partial(jax.jit, static_argnames=("max_t", "interpret"))
def triangle_any_hit(mo, o, d, max_t: float, interpret: bool = False):
    """Fused Baldwin-Weber triangle any-hit: occluded [R] bool."""
    o, d, R = _pad_rays(o, d)
    mo = mo.reshape(-1, 3, 4)
    K = mo.shape[0]
    (mo,), Kp = _pad_prims([mo], K, LANE)
    M = jnp.concatenate([
        jnp.transpose(mo, (1, 2, 0)).reshape(12, Kp),
        jnp.zeros((4, Kp), jnp.float32),
    ], 0)
    zero5 = jnp.zeros((o.shape[0], 5), o.dtype)
    o8 = _mark_valid(jnp.concatenate([o, zero5], -1), R)
    d8 = jnp.concatenate([d, zero5], -1)
    occ = pl.pallas_call(
        _make_tri_any_kernel(float(max_t)),
        grid=(o.shape[0] // TILE_R,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  _RAY_SPEC, _RAY_SPEC],
        out_specs=_OCC_SPEC,
        out_shape=_occ_shape(o.shape[0]),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(M, o8, d8)
    return occ.reshape(-1)[:R] > 0.5


@functools.partial(jax.jit, static_argnames=("interpret",))
def triangle_closest(mo, md, ids, o, d, interpret: bool = False):
    """Fused Baldwin-Weber triangle closest-hit: (t [R], id [R]).

    mo: [K, 3, 4] affine functionals (rows: t-plane, u-plane, v-plane applied
    to homogeneous o), md: [K, 3, 3] (their linear parts, applied to d; equal
    to mo[:, :, :3] by construction) — the tables built by
    ops/mxu_intersect.triangle_functionals.
    """
    o, d, R = _pad_rays(o, d)
    mo = mo.reshape(-1, 3, 4)
    K = mo.shape[0]
    (mo,), Kp = _pad_prims([mo], K, LANE)
    del md  # identical to mo[:, :, :3]; the kernel reuses mo's rows
    # M = [16, Kp]: rows 0-3 t-plane (x,y,z,w), 4-7 u-plane, 8-11 v-plane,
    # 12-15 zero padding to the f32 sublane tile
    M = jnp.concatenate([
        jnp.transpose(mo, (1, 2, 0)).reshape(12, Kp),
        jnp.zeros((4, Kp), jnp.float32),
    ], 0)
    zero5 = jnp.zeros((o.shape[0], 5), o.dtype)
    o8 = jnp.concatenate([o, zero5], -1)
    d8 = jnp.concatenate([d, zero5], -1)
    t, pos = pl.pallas_call(
        _tri_kernel,
        grid=(o.shape[0] // TILE_R,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  _RAY_SPEC, _RAY_SPEC],
        out_specs=_OUT_SPECS,
        out_shape=_out_shape(o.shape[0]),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(M, o8, d8)
    return t.reshape(-1)[:R], _gather_ids(ids, pos, R)
