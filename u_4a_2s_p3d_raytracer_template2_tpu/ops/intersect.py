"""Vectorized ray/primitive intersection over the unified SoA table.

Reference semantics reproduced exactly (f32, EPSILON=1e-3):
  sphere  — quadratic, smaller positive root        (scene.cpp:149-172)
  triangle— Möller–Trumbore with det cutoff         (scene.cpp:55-88)
  plane   — denom cutoff, t>0                       (scene.cpp:119-142)
  aaBox   — slab test, entry-or-exit t              (scene.cpp:198-278)

The reference dispatches virtually per ``Object*``; here every test runs as a
dense [R, N] computation with a type select, so the VPU sees only large
regular elementwise work. Closest-hit reduces over primitive chunks inside a
``lax.scan`` to bound memory at [R, chunk].
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import constants as C
from ..core.types import Primitives, Rays, dot, normalize

_EPS = C.EPSILON


def _sphere_t(params, o, d):
    """[R,Nc] hit t for spheres; BIG on miss."""
    center = params[:, 0:3][None, :, :]      # [1,Nc,3]
    radius = params[:, 3][None, :]           # [1,Nc]
    L = o[:, None, :] - center               # [R,Nc,3]
    a = dot(d, d)[:, None]                   # [R,1]
    b = 2.0 * jnp.einsum("rc,rnc->rn", d, L)
    c = dot(L, L) - radius * radius
    delta = b * b - 4.0 * a * c
    # double-where: sqrt gradient is infinite at 0 (grazing rays)
    pos = delta > 0.0
    sq = jnp.where(pos, jnp.sqrt(jnp.where(pos, delta, 1.0)), 0.0)
    t0 = (-b - sq) / (2.0 * a)
    t1 = (-b + sq) / (2.0 * a)
    t0_, t1_ = jnp.minimum(t0, t1), jnp.maximum(t0, t1)
    t = jnp.where(t0_ < 0.0, t1_, t0_)
    ok = (delta >= 0.0) & (t >= 0.0)
    return jnp.where(ok, t, C.BIG)


def _triangle_t(params, o, d):
    v0 = params[:, 0:3][None, :, :]
    e1 = params[:, 3:6][None, :, :]
    e2 = params[:, 6:9][None, :, :]
    dv = d[:, None, :]
    h = jnp.cross(dv, e2)                    # [R,Nc,3]
    det = dot(e1 * jnp.ones_like(h), h)      # [R,Nc]
    ok = jnp.abs(det) > _EPS
    f = 1.0 / jnp.where(ok, det, 1.0)
    s = o[:, None, :] - v0
    u = f * dot(s, h)
    ok &= (u >= 0.0) & (u <= 1.0)
    q = jnp.cross(s, e1 * jnp.ones_like(s))
    v = f * dot(dv * jnp.ones_like(q), q)
    ok &= (v >= 0.0) & (u + v <= 1.0)
    t = f * dot(e2 * jnp.ones_like(q), q)
    ok &= t > _EPS
    return jnp.where(ok, t, C.BIG)


def _plane_t(params, o, d):
    pn = params[:, 0:3][None, :, :]
    dd = params[:, 3][None, :]
    denom = jnp.einsum("rc,xnc->rn", d, pn)
    ok = jnp.abs(denom) > _EPS
    num = jnp.einsum("rc,xnc->rn", o, pn) + dd
    t = -num / jnp.where(ok, denom, 1.0)
    ok &= t > 0.0
    return jnp.where(ok, t, C.BIG)


def _safe_inv(d):
    """1/d with zero components mapped to ±1e30 instead of inf: same slab
    semantics as the reference's IEEE-inf arithmetic (scene.cpp:203) but
    NaN-free (0·inf would otherwise poison both forward values and
    where-masked gradients)."""
    tiny = jnp.abs(d) < 1e-30
    sign = jnp.where(d < 0.0, -1.0, 1.0)
    return jnp.where(tiny, sign * 1e30, 1.0 / jnp.where(tiny, 1.0, d))


def _box_slabs(params, o, d):
    """Per-axis (tmin, tmax) slab values with the reference's sign swap
    (scene.cpp:203-232). Returns [R,Nc,3] each."""
    bmin = params[:, 0:3][None, :, :]
    bmax = params[:, 3:6][None, :, :]
    inv = _safe_inv(d)[:, None, :]
    lo = (bmin - o[:, None, :]) * inv
    hi = (bmax - o[:, None, :]) * inv
    pos = inv >= 0.0
    tmin = jnp.where(pos, lo, hi)
    tmax = jnp.where(pos, hi, lo)
    return tmin, tmax


def _box_t(params, o, d):
    tmin, tmax = _box_slabs(params, o, d)
    t_in = jnp.max(tmin, axis=-1)
    t_out = jnp.min(tmax, axis=-1)
    ok = (t_in < t_out) & (t_out > _EPS)
    t = jnp.where(t_in > _EPS, t_in, t_out)
    return jnp.where(ok, t, C.BIG)


def chunk_t(params, ptype, o, d, present=(True, True, True, True)):
    """Hit t for one primitive chunk: [R, Nc], BIG on miss/padding.

    ``present`` statically gates the (sphere, triangle, plane, box) formulas:
    a type the scene doesn't contain costs nothing (the full four-way select
    was ~10% of a mount-class frame)."""
    has_sph, has_tri, has_pl, has_box = present
    pt = ptype[None, :]
    t = jnp.full((o.shape[0], params.shape[0]), C.BIG, jnp.float32)
    if has_sph:
        t = jnp.where(pt == C.SPHERE, _sphere_t(params, o, d), t)
    if has_tri:
        t = jnp.where(pt == C.TRIANGLE, _triangle_t(params, o, d), t)
    if has_pl:
        t = jnp.where(pt == C.PLANE, _plane_t(params, o, d), t)
    if has_box:
        t = jnp.where(pt == C.AABOX, _box_t(params, o, d), t)
    return t


def _typed_min(fn, p, ids, o, d, chunk, carry):
    """Fold one type-grouped table into the running (t_best, id_best).

    Chunked with lax.scan to bound the [R, chunk] intermediate; within a
    chunk argmin takes the first (lowest-index) minimum, matching the
    reference's strict ``t < closest_t`` ascending scan.
    """
    K = p.shape[0]
    c = min(chunk, K)
    if K % c != 0:
        c = K
    n_chunks = K // c
    p = p.reshape(n_chunks, c, p.shape[-1])
    ids = ids.reshape(n_chunks, c)

    def body(car, inp):
        t_best, id_best = car
        pchunk, idchunk = inp
        t = fn(pchunk, o, d)                              # [R, c]
        t = jnp.where((idchunk >= 0)[None, :], t, C.BIG)  # mask padding
        # gather-free winner pick (argmin + take_along_axis + table gather
        # lower to slow per-row gathers on TPU): min, then lowest id among
        # exact-min lanes — the reference's first-in-ascending-scan tie rule
        t_min = jnp.min(t, axis=-1)
        pid = jnp.min(
            jnp.where(t == t_min[:, None], idchunk[None, :], jnp.int32(2**30)),
            axis=-1)
        better = t_min < t_best
        t_best = jnp.where(better, t_min, t_best)
        id_best = jnp.where(better, pid, id_best)
        return (t_best, id_best), None

    if n_chunks == 1:
        return body(carry, (p[0], ids[0]))[0]
    carry, _ = jax.lax.scan(body, carry, (p, ids))
    return carry


# ---------------------------------------------------------------------------
# Small-scene component form: fully-unrolled per-primitive tests as pure
# [R]-vector elementwise chains.
#
# The chunked [R, N] formulas above are correct at any N, but for small N
# they are the WRONG SHAPE for TPU: a [262144, 8] array tiles its minor
# dimension onto the 128 lanes (94% wasted), and every einsum/cross is a
# dot_general fusion barrier that materializes [R, N, 3] intermediates in
# HBM. XLA's cost model measured the depth-4 mount frame at 22 GB of HBM
# traffic because of this. Unrolling the primitive loop in Python instead
# gives one long elementwise chain over [R] vectors — XLA fuses it into a
# single pass whose HBM traffic is just rays in, (t, id) out, and every
# lane does useful work. Semantics are identical per type (same EPSILON
# cutoffs, same strict-< first-wins fold as the reference's ascending scan);
# the sphere quadratic uses the |c|²-r² re-association shared with the
# cluster/Pallas kernels.


def _cols3(a):
    return a[..., 0], a[..., 1], a[..., 2]


def _sphere_t_one(c, k, o_cols, d_cols, quad):
    """Per-ray sphere t in the reference's DIRECT (o−c) form
    (scene.cpp:149-172). The dense sweep/MXU/Pallas paths use the factored
    |o|²−2o·c+|c|²−r² expansion (it's what makes precomputed chunk tables
    and matmuls possible), which catastrophically cancels ~8 bits for
    origins far from small spheres (measured forensics:
    tools/device_validate.json sphere_closest.disagree_forensics). This
    per-ray path gathers the winner's params anyway, so it can afford the
    robust subtraction-first form — which is also exactly what the
    reference and tests/oracle.py compute. ``k``/``quad`` kept for
    signature compatibility (k unused; quad supplies a=|d|²)."""
    ox, oy, oz = o_cols
    dx, dy, dz = d_cols
    a, _do, _oo = quad
    lx = ox - c[0]
    ly = oy - c[1]
    lz = oz - c[2]
    b = 2.0 * (dx * lx + dy * ly + dz * lz)
    cc = lx * lx + ly * ly + lz * lz - c[3] * c[3]
    delta = b * b - 4.0 * a * cc
    pos = delta > 0.0
    sq = jnp.where(pos, jnp.sqrt(jnp.where(pos, delta, 1.0)), 0.0)
    t0 = (-b - sq) / (2.0 * a)
    t1 = (-b + sq) / (2.0 * a)
    lo = jnp.minimum(t0, t1)
    hi = jnp.maximum(t0, t1)
    t = jnp.where(lo < 0.0, hi, lo)
    ok = (delta >= 0.0) & (t >= 0.0)
    return jnp.where(ok, t, C.BIG)


def _triangle_t_one(p, o_cols, d_cols):
    ox, oy, oz = o_cols
    dx, dy, dz = d_cols
    v0x, v0y, v0z = p[0], p[1], p[2]
    e1x, e1y, e1z = p[3], p[4], p[5]
    e2x, e2y, e2z = p[6], p[7], p[8]
    hx = dy * e2z - dz * e2y
    hy = dz * e2x - dx * e2z
    hz = dx * e2y - dy * e2x
    det = e1x * hx + e1y * hy + e1z * hz
    ok = jnp.abs(det) > _EPS
    f = 1.0 / jnp.where(ok, det, 1.0)
    sx = ox - v0x
    sy = oy - v0y
    sz = oz - v0z
    u = f * (sx * hx + sy * hy + sz * hz)
    ok &= (u >= 0.0) & (u <= 1.0)
    qx = sy * e1z - sz * e1y
    qy = sz * e1x - sx * e1z
    qz = sx * e1y - sy * e1x
    v = f * (dx * qx + dy * qy + dz * qz)
    ok &= (v >= 0.0) & (u + v <= 1.0)
    t = f * (e2x * qx + e2y * qy + e2z * qz)
    ok &= t > _EPS
    return jnp.where(ok, t, C.BIG)


def _plane_t_one(p, o_cols, d_cols):
    ox, oy, oz = o_cols
    dx, dy, dz = d_cols
    denom = dx * p[0] + dy * p[1] + dz * p[2]
    ok = jnp.abs(denom) > _EPS
    t = -(ox * p[0] + oy * p[1] + oz * p[2] + p[3]) / jnp.where(ok, denom, 1.0)
    ok &= t > 0.0
    return jnp.where(ok, t, C.BIG)


def _box_t_one(p, o_cols, d_cols, inv_cols):
    t_in = jnp.float32(-C.BIG)
    t_out = jnp.float32(C.BIG)
    for ax in range(3):
        inv = inv_cols[ax]
        lo = (p[ax] - o_cols[ax]) * inv
        hi = (p[3 + ax] - o_cols[ax]) * inv
        pos = inv >= 0.0
        tmin = jnp.where(pos, lo, hi)
        tmax = jnp.where(pos, hi, lo)
        t_in = jnp.maximum(t_in, tmin)
        t_out = jnp.minimum(t_out, tmax)
    ok = (t_in < t_out) & (t_out > _EPS)
    t = jnp.where(t_in > _EPS, t_in, t_out)
    return jnp.where(ok, t, C.BIG)


# Above this per-type primitive count the unrolled graph gets large (compile
# time) and the MXU/Pallas paths take over.
SMALL_UNROLL_MAX = 48


def _small_sweeps(prims: Primitives, o, d, need_box_inv):
    """Yield (t [R], global_id scalar) per primitive, type-grouped in the
    cross-type tie order of the chunked path (tri, sphere, plane, box)."""
    o_cols = _cols3(o)
    d_cols = _cols3(d)
    dx, dy, dz = d_cols
    ox, oy, oz = o_cols
    quad = (dx * dx + dy * dy + dz * dz,
            dx * ox + dy * oy + dz * oz,
            ox * ox + oy * oy + oz * oz)
    inv_cols = _cols3(_safe_inv(d)) if need_box_inv else None
    out = []
    if prims.n_tri > 0:
        for i in range(prims.n_tri):
            out.append((_triangle_t_one(prims.tri_p[i], o_cols, d_cols),
                        prims.tri_ids[i]))
    if prims.n_sph > 0:
        for i in range(prims.n_sph):
            out.append((_sphere_t_one(prims.sph_p[i], prims.sph_k[i],
                                      o_cols, d_cols, quad),
                        prims.sph_ids[i]))
    if prims.n_pl > 0:
        for i in range(prims.n_pl):
            out.append((_plane_t_one(prims.pl_p[i], o_cols, d_cols),
                        prims.pl_ids[i]))
    if prims.n_box > 0:
        for i in range(prims.n_box):
            out.append((_box_t_one(prims.box_p[i], o_cols, d_cols, inv_cols),
                        prims.box_ids[i]))
    return out


def _small_closest(prims: Primitives, rays: Rays):
    o, d = rays.origin, rays.direction
    R = o.shape[0]
    t_best = jnp.full((R,), C.BIG, jnp.float32)
    id_best = jnp.full((R,), -1, jnp.int32)
    for t, gid in _small_sweeps(prims, o, d, prims.n_box > 0):
        better = t < t_best
        t_best = jnp.where(better, t, t_best)
        id_best = jnp.where(better, gid, id_best)
    return t_best, jnp.where(t_best >= C.BIG, -1, id_best)


def _small_any(prims: Primitives, rays: Rays, max_t):
    o, d = rays.origin, rays.direction
    occ = jnp.zeros((o.shape[0],), bool)
    for t, _ in _small_sweeps(prims, o, d, prims.n_box > 0):
        occ |= t < max_t
    return occ


def _small_total(prims: Primitives) -> int:
    return prims.n_tri + prims.n_sph + prims.n_pl + prims.n_box


# Pallas fused kernels (ops/pallas_intersect.py) beat the XLA/MXU chunked
# path once the [R, chunk] HBM round-trips dominate: measured on v5e at
# 262k rays x 7.4k spheres, 39 ms vs 95 ms per sweep. Below this primitive
# count the pallas_call fixed overhead isn't worth it. Module-level so tests
# can monkeypatch.
PALLAS_MIN = 1024
USE_PALLAS = True


def _use_pallas(K: int) -> bool:
    return (USE_PALLAS and K >= PALLAS_MIN
            and jax.default_backend() == "tpu")


def _fold_pair(carry, t, pid):
    """Fold one type's (t, id) into the running best; strict < keeps the
    earlier type on exact cross-type ties (same rule as _typed_min)."""
    t_best, id_best = carry
    better = t < t_best
    return (jnp.where(better, t, t_best), jnp.where(better, pid, id_best))


def closest_hit_brute(
    prims: Primitives, rays: Rays, chunk: int = 2048
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Brute-force closest hit (accel NONE path, main.cpp:542-553).

    Runs each intersection formula only over its own type-grouped table —
    dense VPU work with no type-select waste. Returns (t [R], obj_id [R]);
    obj_id == -1 on miss. Ties within a type resolve to the lowest object
    index; cross-type exact ties resolve by type order (tri, sphere, plane,
    box) rather than parse order — a measure-zero divergence from the
    reference's single ascending scan.

    The traversal result is discrete by design (the shading layer re-derives
    t differentiably from the gathered winner, see per_ray_t); the fused
    Pallas route makes that explicit with a stop_gradient around its inputs.
    """
    from . import mxu_intersect as mxu

    # Small scenes: fully-unrolled component form (see _small_sweeps) — one
    # fused elementwise pass, no [R, N] lane waste, no dot_general barriers.
    if 0 < _small_total(prims) <= SMALL_UNROLL_MAX:
        return _small_closest(prims, rays)

    # Below this primitive count the [R, 3/4]x[3/4, K] matmul doesn't fill
    # MXU lanes and the dense VPU formulas win (measured on v5e: mount's
    # 8-triangle table runs ~5% faster on the VPU path).
    MXU_MIN = 64

    o, d = rays.origin, rays.direction
    R = o.shape[0]
    carry = (jnp.full((R,), C.BIG, jnp.float32), jnp.full((R,), -1, jnp.int32))

    if prims.n_tri > 0:
        if _use_pallas(prims.tri_ids.shape[0]):
            from . import pallas_intersect as pk

            sg = jax.lax.stop_gradient
            t, pid = pk.triangle_closest(
                sg(prims.tri_mo), sg(prims.tri_md), prims.tri_ids,
                sg(o), sg(d))
            carry = _fold_pair(carry, t, pid)
        elif prims.tri_ids.shape[0] >= MXU_MIN:
            carry = _typed_min_tables(
                lambda mo, md, o_, d_: mxu.tri_t(mo, md, o_, d_),
                (prims.tri_mo.reshape(-1, 3, 4),
                 prims.tri_md.reshape(-1, 3, 3)),
                prims.tri_ids, o, d, chunk, carry, tri=True)
        else:
            carry = _typed_min(_triangle_t, prims.tri_p, prims.tri_ids, o, d,
                               chunk, carry)
    if prims.n_sph > 0:
        if _use_pallas(prims.sph_ids.shape[0]):
            from . import pallas_intersect as pk

            sg = jax.lax.stop_gradient
            t, pid = pk.sphere_closest(
                sg(prims.sph_p[:, 0:3]), sg(prims.sph_k), prims.sph_ids,
                sg(o), sg(d))
            carry = _fold_pair(carry, t, pid)
        elif prims.sph_ids.shape[0] >= MXU_MIN:
            carry = _typed_min_tables(
                lambda cs, ks, o_, d_: mxu.sphere_t(cs, ks, o_, d_),
                (prims.sph_p[:, 0:3], prims.sph_k),
                prims.sph_ids, o, d, chunk, carry)
        else:
            carry = _typed_min(_sphere_t, prims.sph_p, prims.sph_ids, o, d,
                               chunk, carry)
    if prims.n_pl > 0:
        carry = _typed_min(_plane_t, prims.pl_p, prims.pl_ids, o, d, chunk,
                           carry)
    if prims.n_box > 0:
        carry = _typed_min(_box_t, prims.box_p, prims.box_ids, o, d, chunk,
                           carry)
    t_best, id_best = carry
    id_best = jnp.where(t_best >= C.BIG, -1, id_best)
    return t_best, id_best


def _typed_min_tables(fn, tables, ids, o, d, chunk, carry, tri=False):
    """Like _typed_min but over a pair of per-type tables feeding an MXU
    kernel. ``tables`` rows chunk along the primitive axis."""
    a, b = tables
    K = ids.shape[0]
    c = min(chunk, K)
    if K % c != 0:
        c = K
    n_chunks = K // c
    a = a.reshape((n_chunks, c) + a.shape[1:])
    b = b.reshape((n_chunks, c) + b.shape[1:])
    ids_c = ids.reshape(n_chunks, c)

    def body(car, inp):
        t_best, id_best = car
        ac, bc, idchunk = inp
        if tri:
            t = fn(ac.reshape(-1, 4), bc.reshape(-1, 3), o, d)
        else:
            t = fn(ac, bc, o, d)
        t = jnp.where((idchunk >= 0)[None, :], t, C.BIG)
        # gather-free winner pick (see _typed_min)
        t_min = jnp.min(t, axis=-1)
        pid = jnp.min(
            jnp.where(t == t_min[:, None], idchunk[None, :], jnp.int32(2**30)),
            axis=-1)
        better = t_min < t_best
        t_best = jnp.where(better, t_min, t_best)
        id_best = jnp.where(better, pid, id_best)
        return (t_best, id_best), None

    if n_chunks == 1:
        return body(carry, (a[0], b[0], ids_c[0]))[0]
    carry, _ = jax.lax.scan(body, carry, (a, b, ids_c))
    return carry


def _typed_any(fn, p, ids, o, d, chunk, occ, max_t):
    """OR one type-grouped table's occlusion into the running mask — the
    winner-free counterpart of _typed_min (no id bookkeeping, no min fold)."""
    K = p.shape[0]
    c = min(chunk, K)
    if K % c != 0:
        c = K
    n_chunks = K // c
    p = p.reshape(n_chunks, c, p.shape[-1])
    ids = ids.reshape(n_chunks, c)

    def body(carry, inp):
        pchunk, idchunk = inp
        t = fn(pchunk, o, d)                              # [R, c]
        t = jnp.where((idchunk >= 0)[None, :], t, C.BIG)
        return carry | jnp.any(t < max_t, axis=-1), None

    if n_chunks == 1:
        return body(occ, (p[0], ids[0]))[0]
    occ, _ = jax.lax.scan(body, occ, (p, ids))
    return occ


def _typed_any_tables(fn, tables, ids, o, d, chunk, occ, max_t, tri=False):
    """_typed_any over a pair of per-type MXU tables (see _typed_min_tables)."""
    a, b = tables
    K = ids.shape[0]
    c = min(chunk, K)
    if K % c != 0:
        c = K
    n_chunks = K // c
    a = a.reshape((n_chunks, c) + a.shape[1:])
    b = b.reshape((n_chunks, c) + b.shape[1:])
    ids_c = ids.reshape(n_chunks, c)

    def body(carry, inp):
        ac, bc, idchunk = inp
        if tri:
            t = fn(ac.reshape(-1, 4), bc.reshape(-1, 3), o, d)
        else:
            t = fn(ac, bc, o, d)
        t = jnp.where((idchunk >= 0)[None, :], t, C.BIG)
        return carry | jnp.any(t < max_t, axis=-1), None

    if n_chunks == 1:
        return body(occ, (a[0], b[0], ids_c[0]))[0]
    occ, _ = jax.lax.scan(body, occ, (a, b, ids_c))
    return occ


def any_hit_brute(
    prims: Primitives, rays: Rays, max_t, chunk: int = 2048
) -> jnp.ndarray:
    """Shadow-ray occlusion test: any hit with t < max_t (main.cpp:481-509).

    Dedicated any-hit (the capability of bvh.cpp:348-416 / grid.cpp:313-361
    in brute form): unlike closest_hit_brute there is no winner to find, so
    the per-chunk min+id folds disappear and the large-table route uses
    early-exiting Pallas occlusion kernels (ops/pallas_intersect.py
    *_any_hit) that stop streaming primitives once every resident ray is
    occluded. Occlusion is exactly `min t < max_t`, so results are identical
    to the closest-hit-derived mask.

    Pass max_t = BIG for the reference's unbounded NONE-mode semantics
    (SURVEY.md quirk #6), or the light distance for the physical bound
    (callers pass unnormalized L with max_t=1.0).
    """
    from . import mxu_intersect as mxu

    if 0 < _small_total(prims) <= SMALL_UNROLL_MAX:
        return _small_any(prims, rays, max_t)

    MXU_MIN = 64
    o, d = rays.origin, rays.direction
    R = o.shape[0]
    occ = jnp.zeros((R,), bool)
    sg = jax.lax.stop_gradient  # occlusion is discrete; no gradient flows

    if prims.n_tri > 0:
        if _use_pallas(prims.tri_ids.shape[0]) and isinstance(max_t, float):
            from . import pallas_intersect as pk

            occ |= pk.triangle_any_hit(sg(prims.tri_mo), sg(o), sg(d), max_t)
        elif prims.tri_ids.shape[0] >= MXU_MIN:
            occ = _typed_any_tables(
                lambda mo, md, o_, d_: mxu.tri_t(mo, md, o_, d_),
                (prims.tri_mo.reshape(-1, 3, 4),
                 prims.tri_md.reshape(-1, 3, 3)),
                prims.tri_ids, o, d, chunk, occ, max_t, tri=True)
        else:
            occ = _typed_any(_triangle_t, prims.tri_p, prims.tri_ids, o, d,
                             chunk, occ, max_t)
    if prims.n_sph > 0:
        if _use_pallas(prims.sph_ids.shape[0]) and isinstance(max_t, float):
            from . import pallas_intersect as pk

            occ |= pk.sphere_any_hit(sg(prims.sph_p[:, 0:3]),
                                     sg(prims.sph_k), sg(o), sg(d), max_t)
        elif prims.sph_ids.shape[0] >= MXU_MIN:
            occ = _typed_any_tables(
                lambda cs, ks, o_, d_: mxu.sphere_t(cs, ks, o_, d_),
                (prims.sph_p[:, 0:3], prims.sph_k),
                prims.sph_ids, o, d, chunk, occ, max_t)
        else:
            occ = _typed_any(_sphere_t, prims.sph_p, prims.sph_ids, o, d,
                             chunk, occ, max_t)
    if prims.n_pl > 0:
        occ = _typed_any(_plane_t, prims.pl_p, prims.pl_ids, o, d, chunk,
                         occ, max_t)
    if prims.n_box > 0:
        occ = _typed_any(_box_t, prims.box_p, prims.box_ids, o, d, chunk,
                         occ, max_t)
    return occ


# ---------------------------------------------------------------------------
# Shade-time re-intersection of the chosen primitive (differentiable path).
#
# Traversal decisions (argmin / BVH walk) are discrete; gradients flow through
# a per-ray recomputation of t and the normal from the *gathered* winner
# primitive's parameters, which is exactly the custom-VJP split described in
# SURVEY.md §7 item 5.


# Row gathers (x[idx] over [N,k] tables) lower to per-row dynamic-slice loops
# on TPU — measured at ~7 ms per 262k-ray level on v5e, which dominated the
# whole mount frame. For small tables a one-hot contraction runs on the MXU
# instead: [R,N] @ [N,k] at HIGHEST precision (f32-accurate) is exact for a
# 0/1 left operand. Above this row count the matmul's O(R·N) work loses to
# the O(R) gather.
GATHER_DENSE_MAX = 512


def _onehot_rows(idx: jnp.ndarray, n: int) -> jnp.ndarray:
    """[R,n] f32 selection matrix; negative idx rows are all-zero."""
    return (idx[:, None] == jnp.arange(n, dtype=idx.dtype)[None, :]).astype(
        jnp.float32)


def _dense_select(onehot: jnp.ndarray, table: jnp.ndarray) -> jnp.ndarray:
    return jnp.matmul(onehot, table, precision=jax.lax.Precision.HIGHEST)


def gather_prims(prims: Primitives, obj_id: jnp.ndarray) -> tuple:
    N = prims.params.shape[0]
    if N <= GATHER_DENSE_MAX:
        oh = _onehot_rows(obj_id, N)
        params = _dense_select(oh, prims.params)
        both = _dense_select(
            oh,
            jnp.stack([prims.ptype.astype(jnp.float32),
                       prims.mat_id.astype(jnp.float32)], axis=-1))
        ptype = jnp.round(both[:, 0]).astype(jnp.int32)
        mat = jnp.round(both[:, 1]).astype(jnp.int32)
        ptype = jnp.where(obj_id < 0, C.INVALID, ptype)
        return params, ptype, mat
    safe = jnp.maximum(obj_id, 0)
    params = prims.params[safe]          # [R,12]
    ptype = jnp.where(obj_id < 0, C.INVALID, prims.ptype[safe])
    mat = prims.mat_id[safe]
    return params, ptype, mat


def per_ray_t(params, ptype, o, d, present=(True, True, True, True)):
    """t for each ray against its own gathered primitive params: [R].

    Component form over [R] columns (the previous vmapped-chunk version
    materialized [R,1,3] buffers per op — pure fusion-barrier waste)."""
    has_sph, has_tri, has_pl, has_box = present
    o_cols = _cols3(o)
    d_cols = _cols3(d)
    pc = [params[:, i] for i in range(12)]
    t = jnp.full(o.shape[:1], C.BIG, jnp.float32)
    if has_tri:
        t = jnp.where(ptype == C.TRIANGLE,
                      _triangle_t_one(pc, o_cols, d_cols), t)
    if has_sph:
        dx, dy, dz = d_cols
        ox, oy, oz = o_cols
        quad = (dx * dx + dy * dy + dz * dz,
                dx * ox + dy * oy + dz * oz,
                ox * ox + oy * oy + oz * oz)
        k = pc[0] * pc[0] + pc[1] * pc[1] + pc[2] * pc[2] - pc[3] * pc[3]
        t = jnp.where(ptype == C.SPHERE,
                      _sphere_t_one(pc, k, o_cols, d_cols, quad), t)
    if has_pl:
        t = jnp.where(ptype == C.PLANE, _plane_t_one(pc, o_cols, d_cols), t)
    if has_box:
        inv_cols = _cols3(_safe_inv(d))
        t = jnp.where(ptype == C.AABOX,
                      _box_t_one(pc, o_cols, d_cols, inv_cols), t)
    return t


def per_ray_normal(params, ptype, point, o, d,
                   present=(True, True, True, True)):
    """Geometric normal at ``point`` for each ray's gathered primitive.

    sphere: (p-c)/|p-c| (scene.cpp:174-178); triangle: stored flat normal
    (scene.cpp:46-49); plane: PN (scene.cpp:144-147); aaBox: entry/exit face
    normal recomputed from the slab test (scene.cpp:234-276) — the reference
    caches it in a mutable member; we recompute statelessly.

    ``present`` statically prunes absent types — the box slab/argmax/one_hot
    machinery alone was ~8 ms per 262k rays on v5e when evaluated for scenes
    with no boxes.
    """
    has_sph, has_tri, has_pl, has_box = present

    n = jnp.zeros_like(point)
    if has_tri:
        n = jnp.where((ptype == C.TRIANGLE)[:, None], params[:, 9:12], n)
    if has_sph:
        n_sph = normalize(point - params[:, 0:3])
        n = jnp.where((ptype == C.SPHERE)[:, None], n_sph, n)
    if has_pl:
        n = jnp.where((ptype == C.PLANE)[:, None], params[:, 0:3], n)
    if has_box:
        # per-ray slab test against each ray's own gathered box params
        inv = _safe_inv(d)                             # [R,3]
        lo = (params[:, 0:3] - o) * inv
        hi = (params[:, 3:6] - o) * inv
        pos = inv >= 0.0
        tmin = jnp.where(pos, lo, hi)
        tmax = jnp.where(pos, hi, lo)
        ax_in = jnp.argmax(tmin, axis=-1)
        ax_out = jnp.argmin(tmax, axis=-1)
        t_in = jnp.max(tmin, axis=-1)
        # reference sign convention: -1 if the slab t is negative else +1
        s_in = jnp.where(
            jnp.take_along_axis(tmin, ax_in[:, None], -1)[:, 0] < 0,
            -1.0, 1.0)
        s_out = jnp.where(
            jnp.take_along_axis(tmax, ax_out[:, None], -1)[:, 0] < 0,
            -1.0, 1.0)
        use_in = t_in > _EPS
        ax = jnp.where(use_in, ax_in, ax_out)
        sgn = jnp.where(use_in, s_in, s_out)
        n_box = jax.nn.one_hot(ax, 3, dtype=point.dtype) * sgn[:, None]
        n = jnp.where((ptype == C.AABOX)[:, None], n_box, n)
    return n
