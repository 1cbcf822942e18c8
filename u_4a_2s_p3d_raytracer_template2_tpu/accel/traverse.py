"""Device-side accelerator traversal: stack-based BVH walk and 3D-DDA grid
walk as vmapped ``lax.while_loop`` programs over the flat arrays.

Reference semantics: BVH::Traverse (bvh.cpp:252-416) — ordered two-child
descent with a (node, t) stack pruned against the running closest t, child
entry distance forced to 0 when the origin is inside the child box
(bvh.cpp:292-293); Grid::Traverse (grid.cpp:101-361) — Amanatides–Woo DDA
with per-cell closest-hit acceptance against the current cell slab.

These are the correctness implementations (SURVEY.md §7 hard part a): pure
JAX control flow that compiles anywhere. The tile-coherent clustered tracer
in ``accel/clusters.py`` supersedes them on TPU for large scenes.

The reference's quirks #1/#4 (missing break ⇒ BVH mode re-scans brute-force;
``hit`` set on any leaf visit) make its shipped BVH mode behave exactly like
brute force — so matching brute-force results IS reference parity; these
traversals are the physically-correct versions.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import constants as C
from ..core.types import BvhArrays, GridArrays, Primitives, Rays
from ..ops.intersect import _safe_inv, chunk_t

STACK = 64


def _aabb_enter(bmin, bmax, o, inv_d):
    """AABB::intercepts (boundingBox.cpp:64-124): hit flag + entry t
    (exit t when t0<0)."""
    lo = (bmin - o) * inv_d
    hi = (bmax - o) * inv_d
    pos = inv_d >= 0.0
    tmin = jnp.where(pos, lo, hi)
    tmax = jnp.where(pos, hi, lo)
    t0 = jnp.max(tmin)
    t1 = jnp.min(tmax)
    hit = (t0 < t1) & (t1 > 0.0)
    t = jnp.where(t0 < 0.0, t1, t0)
    return hit, t


def _is_inside(bmin, bmax, p):
    """AABB::isInside (boundingBox.cpp:41-44), strict inequalities."""
    return jnp.all((p > bmin) & (p < bmax))


def _leaf_closest(prims: Primitives, order, start, count, o, d, max_count):
    """Intersect a leaf's object range; returns (t_best, id_best)."""

    def body(i, carry):
        t_best, id_best = carry
        in_range = i < count
        oid = order[jnp.minimum(start + i, order.shape[0] - 1)]
        oid = jnp.where(in_range, oid, -1)
        safe = jnp.maximum(oid, 0)
        params = prims.params[safe][None, :]
        ptype = jnp.where(oid >= 0, prims.ptype[safe], C.INVALID)[None]
        t = chunk_t(params, ptype, o[None, :], d[None, :])[0, 0]
        better = (t < t_best) & in_range
        return (jnp.where(better, t, t_best),
                jnp.where(better, oid, id_best))

    return jax.lax.fori_loop(0, max_count, body, (C.BIG, jnp.int32(-1)))


def _bvh_walk_single(bvh: BvhArrays, prims: Primitives, o, d, any_hit_max_t):
    """One ray's BVH walk. If any_hit_max_t >= 0: early-exit any-hit mode
    returning (t_first_hit_or_BIG, -1/0 flag encoded in id)."""
    inv_d = _safe_inv(d)
    max_leaf = 4  # leaves hold <= Threshold objects; small static bound

    root_hit, _ = _aabb_enter(bvh.bbox_min[0], bvh.bbox_max[0], o, inv_d)

    # state: cur node, stack ptr, stack arrays, best t/id, running flag
    def body(state):
        cur, sp, stack_node, stack_t, t_best, id_best, _ = state
        is_leaf = bvh.leaf[cur]

        # ---- leaf: test objects
        start = bvh.index[cur]
        count = jnp.where(is_leaf, bvh.n_objs[cur], 0)
        lt, lid = _leaf_closest(prims, bvh.order, start, count, o, d, max_leaf)
        better = lt < t_best
        t_best = jnp.where(better, lt, t_best)
        id_best = jnp.where(better, lid, id_best)

        # ---- internal: test children, descend nearest, push other
        li = bvh.index[cur]
        ri = li + 1
        lhit, ldist = _aabb_enter(bvh.bbox_min[li], bvh.bbox_max[li], o, inv_d)
        rhit, rdist = _aabb_enter(bvh.bbox_min[ri], bvh.bbox_max[ri], o, inv_d)
        ldist = jnp.where(_is_inside(bvh.bbox_min[li], bvh.bbox_max[li], o),
                          0.0, ldist)
        rdist = jnp.where(_is_inside(bvh.bbox_min[ri], bvh.bbox_max[ri], o),
                          0.0, rdist)
        lhit &= ldist <= t_best  # prune against current closest (bvh.cpp:296-300)
        rhit &= rdist <= t_best
        internal = ~is_leaf

        both = internal & lhit & rhit
        left_first = ldist < rdist
        near = jnp.where(left_first, li, ri)
        far = jnp.where(left_first, ri, li)
        far_t = jnp.where(left_first, rdist, ldist)

        one = internal & (lhit ^ rhit)
        only = jnp.where(lhit, li, ri)

        descend = both | one
        next_cur = jnp.where(both, near, jnp.where(one, only, cur))

        # push far child when both hit
        push = both
        stack_node = jnp.where(
            push, stack_node.at[sp].set(far), stack_node)
        stack_t = jnp.where(push, stack_t.at[sp].set(far_t), stack_t)
        sp = jnp.where(push, sp + 1, sp)

        # pop loop: find next stack entry closer than t_best
        def pop_cond(s):
            sp_, found, _ = s
            return (sp_ > 0) & ~found

        def pop_body(s):
            sp_, found, node = s
            sp_ = sp_ - 1
            ok = stack_t[sp_] < t_best
            return (sp_, ok, jnp.where(ok, stack_node[sp_], node))

        need_pop = ~descend
        sp2, found, popped = jax.lax.while_loop(
            pop_cond, pop_body, (jnp.where(need_pop, sp, 0), False,
                                 jnp.int32(0)))
        sp = jnp.where(need_pop, sp2, sp)
        next_cur = jnp.where(need_pop, popped, next_cur)
        alive = descend | (need_pop & found)

        # any-hit early exit
        if any_hit_max_t is not None:
            alive &= ~(t_best < any_hit_max_t)

        return (next_cur, sp, stack_node, stack_t, t_best, id_best, alive)

    def cond_fn(state):
        return state[6]

    init = (
        jnp.int32(0), jnp.int32(0),
        jnp.zeros(STACK, jnp.int32), jnp.zeros(STACK, jnp.float32),
        jnp.float32(C.BIG), jnp.int32(-1),
        root_hit,
    )
    cur, sp, sn, st, t_best, id_best, _ = jax.lax.while_loop(
        cond_fn, body, init)
    return t_best, id_best


def _unbounded_closest(prims: Primitives, ids, o, d):
    """Brute-force the (few) unbounded primitives — planes."""
    safe = jnp.maximum(ids, 0)
    params = prims.params[safe]
    ptype = jnp.where(ids >= 0, prims.ptype[safe], C.INVALID)
    t = chunk_t(params, ptype, o, d)  # [R, P]
    idx = jnp.argmin(t, axis=-1)
    t_min = jnp.take_along_axis(t, idx[:, None], -1)[:, 0]
    oid = jnp.where(t_min < C.BIG, ids[idx], -1)
    return t_min, oid


def bvh_closest_hit(bvh: BvhArrays, prims: Primitives, rays: Rays):
    walk = jax.vmap(
        lambda o, d: _bvh_walk_single(bvh, prims, o, d, None)
    )
    t_tree, id_tree = walk(rays.origin, rays.direction)
    t_unb, id_unb = _unbounded_closest(prims, bvh.unbounded_ids,
                                       rays.origin, rays.direction)
    use_unb = t_unb < t_tree
    t = jnp.where(use_unb, t_unb, t_tree)
    oid = jnp.where(use_unb, id_unb, id_tree)
    return t, jnp.where(t >= C.BIG, -1, oid)


def bvh_any_hit(bvh: BvhArrays, prims: Primitives, rays: Rays, max_t):
    """Early-exit shadow traversal (BVH::Traverse(Ray&), bvh.cpp:348-416):
    the walk stops as soon as its running min drops below ``max_t`` — no
    ordered descent needed, any occluder ends the ray. Unbounded primitives
    (planes) are tested alongside, as in every closest-hit path here."""
    walk = jax.vmap(
        lambda o, d: _bvh_walk_single(bvh, prims, o, d, max_t)
    )
    t_tree, _ = walk(rays.origin, rays.direction)
    occ = t_tree < max_t
    t_unb, _ = _unbounded_closest(prims, bvh.unbounded_ids,
                                  rays.origin, rays.direction)
    return occ | (t_unb < max_t)


# ---------------------------------------------------------------------------
# uniform grid DDA


def _grid_walk_single(grid: GridArrays, prims: Primitives, o, d):
    """Amanatides–Woo walk for one ray (grid.cpp:101-310). Returns (t, id)."""
    nx, ny, nz = grid.nx, grid.ny, grid.nz
    n_vec = jnp.array([nx, ny, nz], jnp.int32)
    n_f = n_vec.astype(jnp.float32)
    b0 = grid.bbox_min
    b1 = grid.bbox_max

    inv = _safe_inv(d)
    lo = (b0 - o) * inv
    hi = (b1 - o) * inv
    pos = inv >= 0.0
    tmin = jnp.where(pos, lo, hi)
    tmax = jnp.where(pos, hi, lo)
    t0 = jnp.max(tmin)
    t1 = jnp.min(tmax)
    misses_grid = (t0 > t1) | (t1 < 0.0)

    inside = jnp.all((o > b0) & (o < b1))
    entry = jnp.where(inside, o, o + d * t0)
    cell = jnp.clip(((entry - b0) * n_f / (b1 - b0)).astype(jnp.int32),
                    0, n_vec - 1)

    dt = (tmax - tmin) / n_f
    step = jnp.where(d > 0, 1, -1).astype(jnp.int32)
    stop = jnp.where(d > 0, n_vec, -1)
    t_next = jnp.where(
        d > 0,
        tmin + (cell + 1).astype(jnp.float32) * dt,
        tmin + (n_f - cell.astype(jnp.float32)) * dt,
    )
    t_next = jnp.where(d == 0.0, C.BIG, t_next)

    max_cell = grid.max_per_cell

    def cell_closest(cell_idx):
        items = grid.cell_items[cell_idx]                     # [max_per_cell]
        safe = jnp.maximum(items, 0)
        params = prims.params[safe]
        ptype = jnp.where(items >= 0, prims.ptype[safe], C.INVALID)
        t = chunk_t(params, ptype, o[None, :], d[None, :])[0]  # [max_per_cell]
        k = jnp.argmin(t)
        return t[k], jnp.where(t[k] < C.BIG, items[k], -1)

    def cond_fn(state):
        return state[4]

    def body(state):
        cell, t_next_, t_best, id_best, _ = state
        flat = cell[0] + nx * (cell[1] + ny * cell[2])
        ct, cid = cell_closest(flat)

        axis = jnp.argmin(t_next_)
        t_exit = t_next_[axis]
        accept = ct < t_exit  # accept only hits inside this cell's slab
        t_best = jnp.where(accept, ct, t_best)
        id_best = jnp.where(accept, cid, id_best)

        cell = cell.at[axis].add(step[axis])
        t_next_ = t_next_.at[axis].add(dt[axis])
        out = cell[axis] == stop[axis]
        alive = ~accept & ~out
        return (cell, t_next_, t_best, id_best, alive)

    init = (cell, t_next, jnp.float32(C.BIG), jnp.int32(-1),
            jnp.logical_not(misses_grid))
    _, _, t_best, id_best, _ = jax.lax.while_loop(cond_fn, body, init)
    return t_best, id_best


def grid_closest_hit(grid: GridArrays, prims: Primitives, rays: Rays):
    walk = jax.vmap(lambda o, d: _grid_walk_single(grid, prims, o, d))
    t_g, id_g = walk(rays.origin, rays.direction)
    t_unb, id_unb = _unbounded_closest(prims, grid.unbounded_ids,
                                       rays.origin, rays.direction)
    use_unb = t_unb < t_g
    t = jnp.where(use_unb, t_unb, t_g)
    oid = jnp.where(use_unb, id_unb, id_g)
    return t, jnp.where(t >= C.BIG, -1, oid)


def _grid_shadow_single(grid: GridArrays, prims: Primitives, o, d, max_t):
    """Shadow DDA for one ray (Grid::Traverse(Ray&), grid.cpp:313-361):
    walk cells, exit at the FIRST object hit with t < max_t. Unlike the
    closest-hit walk there is no cell-slab acceptance test — the reference
    accepts any `intercepts` with distance < |L| (grid.cpp:338-341), which is
    still exact (the hit lies on the ray regardless of which cell found it).
    Returns (occluded, init_failed) so the caller can apply the reference's
    'Init failure = in shadow' quirk (grid.cpp:326-328)."""
    nx, ny, nz = grid.nx, grid.ny, grid.nz
    n_vec = jnp.array([nx, ny, nz], jnp.int32)
    n_f = n_vec.astype(jnp.float32)
    b0 = grid.bbox_min
    b1 = grid.bbox_max

    inv = _safe_inv(d)
    lo = (b0 - o) * inv
    hi = (b1 - o) * inv
    pos = inv >= 0.0
    tmin = jnp.where(pos, lo, hi)
    tmax = jnp.where(pos, hi, lo)
    t0 = jnp.max(tmin)
    t1 = jnp.min(tmax)
    misses_grid = (t0 > t1) | (t1 < 0.0)

    inside = jnp.all((o > b0) & (o < b1))
    entry = jnp.where(inside, o, o + d * t0)
    cell = jnp.clip(((entry - b0) * n_f / (b1 - b0)).astype(jnp.int32),
                    0, n_vec - 1)

    dt = (tmax - tmin) / n_f
    step = jnp.where(d > 0, 1, -1).astype(jnp.int32)
    stop = jnp.where(d > 0, n_vec, -1)
    t_next = jnp.where(
        d > 0,
        tmin + (cell + 1).astype(jnp.float32) * dt,
        tmin + (n_f - cell.astype(jnp.float32)) * dt,
    )
    t_next = jnp.where(d == 0.0, C.BIG, t_next)

    def cell_occludes(cell_idx):
        items = grid.cell_items[cell_idx]
        safe = jnp.maximum(items, 0)
        params = prims.params[safe]
        ptype = jnp.where(items >= 0, prims.ptype[safe], C.INVALID)
        t = chunk_t(params, ptype, o[None, :], d[None, :])[0]
        return jnp.any(t < max_t)

    def cond_fn(state):
        return state[3]

    def body(state):
        cell, t_next_, occ, _ = state
        flat = cell[0] + nx * (cell[1] + ny * cell[2])
        occ = cell_occludes(flat)

        axis = jnp.argmin(t_next_)
        cell = cell.at[axis].add(step[axis])
        t_next_ = t_next_.at[axis].add(dt[axis])
        out = cell[axis] == stop[axis]
        alive = ~occ & ~out
        return (cell, t_next_, occ, alive)

    init = (cell, t_next, False, jnp.logical_not(misses_grid))
    _, _, occ, _ = jax.lax.while_loop(cond_fn, body, init)
    return occ, misses_grid


def grid_any_hit(grid: GridArrays, prims: Primitives, rays: Rays, max_t,
                 init_fail_occludes: bool = False):
    """Early-exit shadow DDA. ``init_fail_occludes=True`` reproduces the
    reference's grid.cpp:326-328 quirk: a ray whose grid-entry setup fails is
    treated as occluded (RenderConfig.reference_grid_shadow_initfail)."""
    walk = jax.vmap(lambda o, d: _grid_shadow_single(grid, prims, o, d, max_t))
    occ, init_fail = walk(rays.origin, rays.direction)
    if init_fail_occludes:
        occ = occ | init_fail
    t_unb, _ = _unbounded_closest(prims, grid.unbounded_ids,
                                  rays.origin, rays.direction)
    return occ | (t_unb < max_t)
