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


def chunk_t(params, ptype, o, d):
    """Hit t for one primitive chunk: [R, Nc], BIG on miss/padding."""
    ts = _sphere_t(params, o, d)
    tt = _triangle_t(params, o, d)
    tp = _plane_t(params, o, d)
    tb = _box_t(params, o, d)
    pt = ptype[None, :]
    t = jnp.where(pt == C.SPHERE, ts, C.BIG)
    t = jnp.where(pt == C.TRIANGLE, tt, t)
    t = jnp.where(pt == C.PLANE, tp, t)
    t = jnp.where(pt == C.AABOX, tb, t)
    return t


def closest_hit_brute(
    prims: Primitives, rays: Rays, chunk: int = 1024
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Brute-force closest hit (accel NONE path, main.cpp:542-553).

    Returns (t [R], obj_id [R]); obj_id == -1 on miss. Ties resolve to the
    lowest object index, matching the reference's strict ``t < closest_t``
    ascending scan.
    """
    o, d = rays.origin, rays.direction
    N = prims.params.shape[0]
    chunk = min(chunk, N)
    if N % chunk != 0:
        chunk = N  # padded sizes are multiples of 8; fall back to one chunk
    n_chunks = N // chunk
    params = prims.params.reshape(n_chunks, chunk, 12)
    ptype = prims.ptype.reshape(n_chunks, chunk)

    R = o.shape[0]

    def body(carry, inp):
        t_best, id_best = carry
        pchunk, tchunk, base = inp
        t = chunk_t(pchunk, tchunk, o, d)              # [R, chunk]
        idx = jnp.argmin(t, axis=-1)                   # first min within chunk
        t_min = jnp.take_along_axis(t, idx[:, None], axis=-1)[:, 0]
        better = t_min < t_best
        t_best = jnp.where(better, t_min, t_best)
        id_best = jnp.where(better, base + idx.astype(jnp.int32), id_best)
        return (t_best, id_best), None

    init = (jnp.full((R,), C.BIG, jnp.float32), jnp.full((R,), -1, jnp.int32))
    bases = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
    (t_best, id_best), _ = jax.lax.scan(body, init, (params, ptype, bases))
    id_best = jnp.where(t_best >= C.BIG, -1, id_best)
    return t_best, id_best


def any_hit_brute(
    prims: Primitives, rays: Rays, max_t, chunk: int = 1024
) -> jnp.ndarray:
    """Shadow-ray occlusion test: any hit with t < max_t (main.cpp:481-509).

    Pass max_t = BIG for the reference's unbounded NONE-mode semantics
    (SURVEY.md quirk #6), or the light distance for the physical bound.
    """
    t, _ = closest_hit_brute(prims, rays, chunk=chunk)
    return t < max_t


# ---------------------------------------------------------------------------
# Shade-time re-intersection of the chosen primitive (differentiable path).
#
# Traversal decisions (argmin / BVH walk) are discrete; gradients flow through
# a per-ray recomputation of t and the normal from the *gathered* winner
# primitive's parameters, which is exactly the custom-VJP split described in
# SURVEY.md §7 item 5.


def gather_prims(prims: Primitives, obj_id: jnp.ndarray) -> tuple:
    safe = jnp.maximum(obj_id, 0)
    params = prims.params[safe]          # [R,12]
    ptype = jnp.where(obj_id < 0, C.INVALID, prims.ptype[safe])
    mat = prims.mat_id[safe]
    return params, ptype, mat


def per_ray_t(params, ptype, o, d):
    """t for each ray against its own primitive params: [R]."""
    R = o.shape[0]

    def one(p, pt, oo, dd):
        t = chunk_t(p[None, :], pt[None], oo[None, :], dd[None, :])
        return t[0, 0]

    return jax.vmap(one)(params, ptype, o, d)


def per_ray_normal(params, ptype, point, o, d):
    """Geometric normal at ``point`` for each ray's gathered primitive.

    sphere: (p-c)/|p-c| (scene.cpp:174-178); triangle: stored flat normal
    (scene.cpp:46-49); plane: PN (scene.cpp:144-147); aaBox: entry/exit face
    normal recomputed from the slab test (scene.cpp:234-276) — the reference
    caches it in a mutable member; we recompute statelessly.
    """
    n_sph = normalize(point - params[:, 0:3])
    n_tri = params[:, 9:12]
    n_pl = params[:, 0:3]

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
    s_in = jnp.where(jnp.take_along_axis(tmin, ax_in[:, None], -1)[:, 0] < 0, -1.0, 1.0)
    s_out = jnp.where(jnp.take_along_axis(tmax, ax_out[:, None], -1)[:, 0] < 0, -1.0, 1.0)
    use_in = t_in > _EPS
    ax = jnp.where(use_in, ax_in, ax_out)
    sgn = jnp.where(use_in, s_in, s_out)
    n_box = jax.nn.one_hot(ax, 3, dtype=point.dtype) * sgn[:, None]

    n = jnp.where((ptype == C.SPHERE)[:, None], n_sph, n_tri)
    n = jnp.where((ptype == C.PLANE)[:, None], n_pl, n)
    n = jnp.where((ptype == C.AABOX)[:, None], n_box, n)
    return n
