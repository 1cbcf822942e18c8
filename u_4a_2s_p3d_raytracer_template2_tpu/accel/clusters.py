"""Tile-coherent clustered tracing — the TPU-native acceleration structure.

A per-ray BVH walk (bvh.cpp:252-346) is pointer-chasing and divergence;
neither maps to TPU vector units. The TPU-native equivalent exploits ray
coherence instead:

  1. Primitives are grouped into fixed-size *clusters* (treelets) along the
     BVH build's spatially-sorted object order (bvh.cpp:55 — the reference
     already stores this order); each cluster carries a union AABB and an
     MXU-ready dense table (ops/mxu_intersect.py layout).
  2. Rays trace in tiles. Per tile, a cheap [tile, C] slab pass marks which
     cluster boxes any ray in the tile enters — a conservative per-tile
     worklist (coherent tiles touch few clusters).
  3. A ``while_loop`` sweeps worklist rounds: each round gathers the next W
     clusters per tile and runs batched [tile,4]x[4,3·cluster] MXU matmuls.
     The loop ends at the *maximum* worklist length over tiles, so coherent
     workloads do a small fraction of the brute-force work while incoherent
     ones degrade gracefully to it. Exact: a cluster a ray could hit is
     always in its tile's worklist.

This replaces the wavefront-BVH Pallas plan of SURVEY.md §7 item (a) with a
shape that keeps the FLOPs on the MXU and the control flow compiler-friendly.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..core import constants as C
from ..core.types import Primitives, Rays, pytree
from ..ops import mxu_intersect as mxu
from ..ops.intersect import _box_t, _plane_t, _safe_inv, _typed_min
from .bvh import object_bounds

CLUSTER = 128  # primitives per cluster; one MXU lane block


@pytree(meta=("n_tri_clusters", "n_sph_clusters"))
class ClusterTables:
    # triangles
    tri_mo: jnp.ndarray     # [Ct, 3*CLUSTER, 4]
    tri_md: jnp.ndarray     # [Ct, 3*CLUSTER, 3]
    tri_ids: jnp.ndarray    # [Ct, CLUSTER] global object ids, -1 pad
    tri_bmin: jnp.ndarray   # [Ct, 3]
    tri_bmax: jnp.ndarray   # [Ct, 3]
    # spheres
    sph_c: jnp.ndarray      # [Cs, CLUSTER, 3]
    sph_k: jnp.ndarray      # [Cs, CLUSTER]
    sph_ids: jnp.ndarray    # [Cs, CLUSTER]
    sph_bmin: jnp.ndarray   # [Cs, 3]
    sph_bmax: jnp.ndarray   # [Cs, 3]
    n_tri_clusters: int = 0
    n_sph_clusters: int = 0


def build_clusters(params: np.ndarray, ptype: np.ndarray,
                   sorted_order: np.ndarray) -> ClusterTables:
    """Group the BVH-sorted bounded objects into per-type clusters."""
    bmin, bmax = object_bounds(params, ptype)

    def per_type(code):
        ids = np.asarray(
            [i for i in sorted_order if i >= 0 and ptype[i] == code],
            np.int32)
        n = len(ids)
        nc = max(0, (n + CLUSTER - 1) // CLUSTER)
        pad = nc * CLUSTER
        out_ids = np.full((max(nc, 1), CLUSTER), -1, np.int32)
        if n:
            out_ids.reshape(-1)[:n] = ids
        cb_min = np.full((max(nc, 1), 3), 1e30, np.float32)
        cb_max = np.full((max(nc, 1), 3), -1e30, np.float32)
        for c in range(nc):
            sel = out_ids[c][out_ids[c] >= 0]
            if len(sel):
                cb_min[c] = bmin[sel].min(0)
                cb_max[c] = bmax[sel].max(0)
        return out_ids, cb_min, cb_max, nc

    tri_ids, tri_bmin, tri_bmax, nct = per_type(C.TRIANGLE)
    sph_ids, sph_bmin, sph_bmax, ncs = per_type(C.SPHERE)

    # dense MXU tables per cluster (zero rows never hit)
    def tri_tables(ids2d):
        from ..ops.mxu_intersect import triangle_functionals

        flat = ids2d.reshape(-1)
        p = np.zeros((flat.size, 12), np.float32)
        ok = flat >= 0
        p[ok] = params[flat[ok]]
        mo, md = triangle_functionals(p)
        ct = ids2d.shape[0]
        return (mo.reshape(ct, 3 * CLUSTER, 4),
                md.reshape(ct, 3 * CLUSTER, 3))

    def sph_tables(ids2d):
        flat = ids2d.reshape(-1)
        p = np.zeros((flat.size, 4), np.float32)
        ok = flat >= 0
        p[ok] = params[flat[ok], :4]
        c = p[:, 0:3]
        # padded rows: center 0, radius 0 -> k = 0; quadratic delta <= 0
        # except rays through the origin — mask by ids in the trace.
        k = (c * c).sum(-1) - p[:, 3] ** 2
        ct = ids2d.shape[0]
        return (c.reshape(ct, CLUSTER, 3).astype(np.float32),
                k.reshape(ct, CLUSTER).astype(np.float32))

    tri_mo, tri_md = tri_tables(tri_ids)
    sph_c, sph_k = sph_tables(sph_ids)

    return ClusterTables(
        tri_mo=jnp.asarray(tri_mo), tri_md=jnp.asarray(tri_md),
        tri_ids=jnp.asarray(tri_ids),
        tri_bmin=jnp.asarray(tri_bmin), tri_bmax=jnp.asarray(tri_bmax),
        sph_c=jnp.asarray(sph_c), sph_k=jnp.asarray(sph_k),
        sph_ids=jnp.asarray(sph_ids),
        sph_bmin=jnp.asarray(sph_bmin), sph_bmax=jnp.asarray(sph_bmax),
        n_tri_clusters=nct, n_sph_clusters=ncs,
    )


# ---------------------------------------------------------------------------
# tracing


def _cluster_slab(bmin, bmax, o, d):
    """[R, Cc] conservative hit mask + entry t for cluster AABBs."""
    inv = _safe_inv(d)[:, None, :]
    lo = (bmin[None, :, :] - o[:, None, :]) * inv
    hi = (bmax[None, :, :] - o[:, None, :]) * inv
    tmin = jnp.minimum(lo, hi)
    tmax = jnp.maximum(lo, hi)
    t0 = jnp.max(tmin, -1)
    t1 = jnp.min(tmax, -1)
    return (t0 <= t1) & (t1 > 0.0), t0


ROUND_W = 8  # clusters fetched per while-loop round (amortizes loop overhead)


def _sweep_type(kernel, tables, ids2d, bmin, bmax, o_t, d_t, carry):
    """One type's clustered sweep.

    o_t, d_t: [T, tile, 3]; carry: (t_best [T,tile], id_best [T,tile]).
    Each round gathers ROUND_W clusters per tile (padding repeats the first
    worklist entry; correctness is unaffected — extra tests only shrink t).
    """
    T, tile, _ = o_t.shape
    Cc = ids2d.shape[0]
    W = min(ROUND_W, Cc)

    hit, t0 = _cluster_slab(bmin, bmax, o_t.reshape(-1, 3),
                            d_t.reshape(-1, 3))
    hit = hit.reshape(T, tile, Cc)
    # per-tile conservative entry distance: min over the tile's rays
    t0_min = jnp.min(jnp.where(hit, t0.reshape(T, tile, Cc), C.BIG),
                     axis=1)                            # [T, Cc]
    hit = hit.any(axis=1)                               # [T, Cc]
    counts = hit.sum(axis=1)                            # [T]
    # FRONT-TO-BACK worklist: hit clusters ordered by tile entry distance.
    # Exactness of the early exit below: a remaining (sorted-later) cluster
    # c can only produce hits with t >= t0(ray,c) >= t0_min(c) >= next_t0,
    # so once every lane's running best is <= next_t0 the tile is done.
    sort_key = jnp.where(hit, t0_min, C.BIG)
    wl = jnp.argsort(sort_key, axis=1, stable=True).astype(jnp.int32)
    t0_sorted = jnp.sort(sort_key, axis=1)              # [T, Cc]
    n_rounds = (jnp.max(counts) + W - 1) // W

    def round_body(state):
        r, t_best, id_best = state
        w0 = r * W
        idx = jnp.clip(w0 + jnp.arange(W, dtype=jnp.int32), 0, Cc - 1)
        cid = wl[:, idx]                                # [T, W] (may repeat)
        act = ((w0 + jnp.arange(W, dtype=jnp.int32))[None, :]
               < counts[:, None])                       # [T, W]
        t, pid = kernel(tables, ids2d, cid, act, o_t, d_t)
        better = t < t_best
        t_best = jnp.where(better, t, t_best)
        id_best = jnp.where(better, pid, id_best)
        return (r + 1, t_best, id_best)

    def round_cond(state):
        r, t_best, _ = state
        nxt = t0_sorted[:, jnp.clip(r * W, 0, Cc - 1)]  # [T]
        nxt = jnp.where(r * W < counts, nxt, C.BIG)
        live = jnp.any(t_best > nxt[:, None])
        return (r < n_rounds) & live

    t_best, id_best = carry
    _, t_best, id_best = jax.lax.while_loop(
        round_cond, round_body, (jnp.int32(0), t_best, id_best))
    return (t_best, id_best)


def _tri_kernel(tables, ids2d, cid, act, o_t, d_t):
    """cid: [T, W] cluster ids. Tests W·CLUSTER triangles per tile.

    Out-of-worklist (repeated) clusters are tested redundantly rather than
    masked — the slab test is conservative, so extra tests can only re-find
    valid hits; correctness is unaffected and masking would cost more than
    the waste.
    """
    tri_mo, tri_md = tables
    T, tile, _ = o_t.shape
    W = cid.shape[1]
    mo = tri_mo[cid]                                    # [T, W, 3K, 4]
    md = tri_md[cid]                                    # [T, W, 3K, 3]
    ids = ids2d[cid]                                    # [T, W, K]
    o4 = jnp.concatenate(
        [o_t, jnp.ones(o_t.shape[:-1] + (1,), o_t.dtype)], -1)

    def one_cluster(carry, inp):
        # intermediates capped at one cluster's width: [T, tile, K]
        mo_w, md_w, ids_w = inp
        tb, pb = carry
        K = ids_w.shape[1]
        s_o = jnp.einsum("tra,tfa->trf", o4, mo_w,
                         precision=mxu._PREC).reshape(T, tile, K, 3)
        s_d = jnp.einsum("tra,tfa->trf", d_t, md_w,
                         precision=mxu._PREC).reshape(T, tile, K, 3)
        den = s_d[..., 0]
        ok = jnp.abs(den) > C.EPSILON
        invden = 1.0 / jnp.where(ok, den, 1.0)
        t = -s_o[..., 0] * invden
        u = s_o[..., 1] + t * s_d[..., 1]
        v = s_o[..., 2] + t * s_d[..., 2]
        ok &= (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0)
        ok &= (t > C.EPSILON) & (ids_w[:, None, :] >= 0)
        t = jnp.where(ok, t, C.BIG)                     # [T, tile, K]
        idx = jnp.argmin(t, axis=-1)
        tc = jnp.take_along_axis(t, idx[..., None], -1)[..., 0]
        pc = jnp.take_along_axis(
            jnp.broadcast_to(ids_w[:, None, :], t.shape),
            idx[..., None], -1)[..., 0]
        better = tc < tb
        return (jnp.where(better, tc, tb),
                jnp.where(better, pc, pb)), None

    init = (jnp.full((T, tile), C.BIG, jnp.float32),
            jnp.full((T, tile), -1, jnp.int32))
    (tb, pid), _ = jax.lax.scan(
        one_cluster, init,
        (mo.swapaxes(0, 1), md.swapaxes(0, 1), ids.swapaxes(0, 1)))
    return tb, jnp.where(tb < C.BIG, pid, -1)


def _sph_kernel(tables, ids2d, cid, act, o_t, d_t):
    sph_c, sph_k = tables
    T, tile, _ = o_t.shape
    cc_all = sph_c[cid]                                 # [T, W, K, 3]
    kk_all = sph_k[cid]                                 # [T, W, K]
    ids_all = ids2d[cid]                                # [T, W, K]
    a = jnp.sum(d_t * d_t, -1)[..., None]
    do = jnp.sum(d_t * o_t, -1)[..., None]
    oo = jnp.sum(o_t * o_t, -1)[..., None]
    inv2a = 0.5 / a

    def one_cluster(carry, inp):
        cc, kk, ids = inp                               # [T,K,3],[T,K],[T,K]
        tb, pb = carry
        oc = jnp.einsum("trc,tkc->trk", o_t, cc, precision=mxu._PREC)
        dc = jnp.einsum("trc,tkc->trk", d_t, cc, precision=mxu._PREC)
        b = 2.0 * (do - dc)
        ccoef = oo - 2.0 * oc + kk[:, None, :]
        delta = b * b - 4.0 * a * ccoef
        pos = delta > 0.0
        sq = jnp.where(pos, jnp.sqrt(jnp.where(pos, delta, 1.0)), 0.0)
        t0 = (-b - sq) * inv2a
        t1 = (-b + sq) * inv2a
        lo, hi = jnp.minimum(t0, t1), jnp.maximum(t0, t1)
        t = jnp.where(lo < 0.0, hi, lo)
        ok = (delta >= 0.0) & (t >= 0.0) & (ids[:, None, :] >= 0)
        t = jnp.where(ok, t, C.BIG)
        idx = jnp.argmin(t, axis=-1)
        tc = jnp.take_along_axis(t, idx[..., None], -1)[..., 0]
        pc = jnp.take_along_axis(
            jnp.broadcast_to(ids[:, None, :], t.shape),
            idx[..., None], -1)[..., 0]
        better = tc < tb
        return (jnp.where(better, tc, tb),
                jnp.where(better, pc, pb)), None

    init = (jnp.full((T, tile), C.BIG, jnp.float32),
            jnp.full((T, tile), -1, jnp.int32))
    (tb, pid), _ = jax.lax.scan(
        one_cluster, init,
        (cc_all.swapaxes(0, 1), kk_all.swapaxes(0, 1),
         ids_all.swapaxes(0, 1)))
    return tb, jnp.where(tb < C.BIG, pid, -1)


# ---------------------------------------------------------------------------
# any-hit (shadow) sweeps: the capability of bvh.cpp:348-416 / grid.cpp:313-361
# in clustered form. Three savings over the closest-hit sweep: (1) the
# worklist slab test is bounded by max_t, so clusters beyond the light are
# never fetched (every hit inside satisfies t >= slab entry t0 > max_t);
# (2) the kernels OR a [T,tile] occlusion mask instead of running the
# argmin + two take_along_axis winner gathers per cluster; (3) the round
# loop exits early once every lane is occluded (pad lanes start occluded).


def _cluster_slab_bounded(bmin, bmax, o, d, max_t):
    """[R, Cc] conservative hit mask for cluster AABBs with entry-t bound."""
    inv = _safe_inv(d)[:, None, :]
    lo = (bmin[None, :, :] - o[:, None, :]) * inv
    hi = (bmax[None, :, :] - o[:, None, :]) * inv
    tmin = jnp.minimum(lo, hi)
    tmax = jnp.maximum(lo, hi)
    t0 = jnp.max(tmin, -1)
    t1 = jnp.min(tmax, -1)
    return (t0 <= t1) & (t1 > 0.0) & (t0 < max_t)


def _sweep_type_any(kernel, tables, ids2d, bmin, bmax, o_t, d_t, occ, max_t):
    """One type's any-hit sweep. occ: [T, tile] bool carry."""
    T, tile, _ = o_t.shape
    Cc = ids2d.shape[0]
    W = min(ROUND_W, Cc)

    hit = _cluster_slab_bounded(bmin, bmax, o_t.reshape(-1, 3),
                                d_t.reshape(-1, 3), max_t)
    hit = hit.reshape(T, tile, Cc).any(axis=1)
    counts = hit.sum(axis=1)
    wl = jnp.argsort(~hit, axis=1, stable=True).astype(jnp.int32)
    n_rounds = (jnp.max(counts) + W - 1) // W

    def round_body(state):
        r, occ = state
        w0 = r * W
        idx = jnp.clip(w0 + jnp.arange(W, dtype=jnp.int32), 0, Cc - 1)
        cid = wl[:, idx]
        occ = occ | kernel(tables, ids2d, cid, o_t, d_t, max_t)
        return (r + 1, occ)

    def round_cond(state):
        r, occ = state
        return (r < n_rounds) & ~jnp.all(occ)

    _, occ = jax.lax.while_loop(round_cond, round_body, (jnp.int32(0), occ))
    return occ


def _tri_any_kernel(tables, ids2d, cid, o_t, d_t, max_t):
    """[T, tile] occlusion OR over W clusters of triangles. Redundant
    (repeated/padding) cluster tests stay exact: every tested primitive is
    real, so any t < max_t it produces is a true occlusion."""
    tri_mo, tri_md = tables
    T, tile, _ = o_t.shape
    mo = tri_mo[cid]
    md = tri_md[cid]
    ids = ids2d[cid]
    o4 = jnp.concatenate(
        [o_t, jnp.ones(o_t.shape[:-1] + (1,), o_t.dtype)], -1)

    def one_cluster(occ, inp):
        mo_w, md_w, ids_w = inp
        K = ids_w.shape[1]
        s_o = jnp.einsum("tra,tfa->trf", o4, mo_w,
                         precision=mxu._PREC).reshape(T, tile, K, 3)
        s_d = jnp.einsum("tra,tfa->trf", d_t, md_w,
                         precision=mxu._PREC).reshape(T, tile, K, 3)
        den = s_d[..., 0]
        ok = jnp.abs(den) > C.EPSILON
        invden = 1.0 / jnp.where(ok, den, 1.0)
        t = -s_o[..., 0] * invden
        u = s_o[..., 1] + t * s_d[..., 1]
        v = s_o[..., 2] + t * s_d[..., 2]
        ok &= (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0)
        ok &= (t > C.EPSILON) & (t < max_t) & (ids_w[:, None, :] >= 0)
        return occ | jnp.any(ok, axis=-1), None

    init = jnp.zeros((T, tile), bool)
    occ, _ = jax.lax.scan(
        one_cluster, init,
        (mo.swapaxes(0, 1), md.swapaxes(0, 1), ids.swapaxes(0, 1)))
    return occ


def _sph_any_kernel(tables, ids2d, cid, o_t, d_t, max_t):
    sph_c, sph_k = tables
    T, tile, _ = o_t.shape
    cc_all = sph_c[cid]
    kk_all = sph_k[cid]
    ids_all = ids2d[cid]
    a = jnp.sum(d_t * d_t, -1)[..., None]
    do = jnp.sum(d_t * o_t, -1)[..., None]
    oo = jnp.sum(o_t * o_t, -1)[..., None]
    inv2a = 0.5 / a

    def one_cluster(occ, inp):
        cc, kk, ids = inp
        oc = jnp.einsum("trc,tkc->trk", o_t, cc, precision=mxu._PREC)
        dc = jnp.einsum("trc,tkc->trk", d_t, cc, precision=mxu._PREC)
        b = 2.0 * (do - dc)
        ccoef = oo - 2.0 * oc + kk[:, None, :]
        delta = b * b - 4.0 * a * ccoef
        pos = delta > 0.0
        sq = jnp.where(pos, jnp.sqrt(jnp.where(pos, delta, 1.0)), 0.0)
        t0 = (-b - sq) * inv2a
        t1 = (-b + sq) * inv2a
        lo, hi = jnp.minimum(t0, t1), jnp.maximum(t0, t1)
        t = jnp.where(lo < 0.0, hi, lo)
        ok = (delta >= 0.0) & (t >= 0.0) & (t < max_t) & (ids[:, None, :] >= 0)
        return occ | jnp.any(ok, axis=-1), None

    init = jnp.zeros((T, tile), bool)
    occ, _ = jax.lax.scan(
        one_cluster, init,
        (cc_all.swapaxes(0, 1), kk_all.swapaxes(0, 1),
         ids_all.swapaxes(0, 1)))
    return occ


def clustered_any_hit(ct: ClusterTables, prims: Primitives, rays: Rays,
                      max_t, tile: int = 1024, coherence_sort: bool = True):
    """Occlusion test via max_t-bounded tile-coherent cluster sweeps. [R] bool.

    Same tiling/coherence machinery as clustered_closest_hit; per-tile
    worklists only contain clusters whose slab entry is closer than the
    light, the kernels skip all winner bookkeeping, and the sweep stops
    early once every lane is occluded.
    """
    o, d = rays.origin, rays.direction
    R = o.shape[0]

    perm = None
    if coherence_sort and R > tile:
        world_min = jnp.minimum(
            jnp.min(ct.tri_bmin, axis=0), jnp.min(ct.sph_bmin, axis=0))
        world_max = jnp.maximum(
            jnp.max(ct.tri_bmax, axis=0), jnp.max(ct.sph_bmax, axis=0))
        key = _coherence_key(o, d, world_min, world_max)
        perm = jnp.argsort(key)
        o = o[perm]
        d = d[perm]

    pad = (-R) % tile
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
        d = jnp.concatenate(
            [d, jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], d.dtype),
                                 (pad, 3))])
    T = o.shape[0] // tile
    o_t = o.reshape(T, tile, 3)
    d_t = d.reshape(T, tile, 3)

    # pad lanes start occluded so they never block the early exit
    occ = jnp.zeros((T * tile,), bool).at[R:].set(True).reshape(T, tile)
    if ct.n_tri_clusters > 0:
        occ = _sweep_type_any(_tri_any_kernel, (ct.tri_mo, ct.tri_md),
                              ct.tri_ids, ct.tri_bmin, ct.tri_bmax,
                              o_t, d_t, occ, max_t)
    if ct.n_sph_clusters > 0:
        occ = _sweep_type_any(_sph_any_kernel, (ct.sph_c, ct.sph_k),
                              ct.sph_ids, ct.sph_bmin, ct.sph_bmax,
                              o_t, d_t, occ, max_t)

    occ = occ.reshape(-1)[:R]
    if perm is not None:
        occ = occ[jnp.argsort(perm)]

    # planes and boxes: dense any-hit on the original ray batch
    from ..ops.intersect import _typed_any

    if prims.n_pl > 0:
        occ = _typed_any(_plane_t, prims.pl_p, prims.pl_ids,
                         rays.origin, rays.direction, 2048, occ, max_t)
    if prims.n_box > 0:
        occ = _typed_any(_box_t, prims.box_p, prims.box_ids,
                         rays.origin, rays.direction, 2048, occ, max_t)
    return occ


def _coherence_key(o, d, bmin, bmax):
    """Sort key packing direction octant (3 bits) over a 4-bit-per-axis
    origin cell: rays that start near each other and point the same way land
    in the same tile, which is what keeps per-tile worklists short."""
    octant = ((d[:, 0] > 0).astype(jnp.int32) * 4
              + (d[:, 1] > 0).astype(jnp.int32) * 2
              + (d[:, 2] > 0).astype(jnp.int32))
    ext = jnp.maximum(bmax - bmin, 1e-6)
    q = jnp.clip(((o - bmin[None, :]) / ext[None, :] * 16.0).astype(jnp.int32),
                 0, 15)
    return (octant << 12) | (q[:, 0] << 8) | (q[:, 1] << 4) | q[:, 2]


def clustered_closest_hit(ct: ClusterTables, prims: Primitives, rays: Rays,
                          tile: int = 1024, coherence_sort: bool = True):
    """Closest hit via tile-coherent cluster sweeps + dense planes/boxes.

    ``coherence_sort`` re-orders rays by (direction octant, origin cell)
    before tiling and scatters results back — the wavefront-compaction
    analogue of SURVEY.md §7 for incoherent secondary/shadow bounces.
    """
    o, d = rays.origin, rays.direction
    R = o.shape[0]

    perm = None
    if coherence_sort and R > tile:
        world_min = jnp.minimum(
            jnp.min(ct.tri_bmin, axis=0), jnp.min(ct.sph_bmin, axis=0))
        world_max = jnp.maximum(
            jnp.max(ct.tri_bmax, axis=0), jnp.max(ct.sph_bmax, axis=0))
        key = _coherence_key(o, d, world_min, world_max)
        perm = jnp.argsort(key)
        o = o[perm]
        d = d[perm]

    pad = (-R) % tile
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
        d = jnp.concatenate(
            [d, jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], d.dtype),
                                 (pad, 3))])
    T = o.shape[0] // tile
    o_t = o.reshape(T, tile, 3)
    d_t = d.reshape(T, tile, 3)

    # pad lanes start at -BIG so they can never block the front-to-back
    # early exit (they are sliced off below; -BIG also blocks any fold)
    t_init = jnp.full((T * tile,), C.BIG, jnp.float32).at[R:].set(
        -C.BIG).reshape(T, tile)
    carry = (t_init, jnp.full((T, tile), -1, jnp.int32))
    if ct.n_tri_clusters > 0:
        carry = _sweep_type(_tri_kernel, (ct.tri_mo, ct.tri_md), ct.tri_ids,
                            ct.tri_bmin, ct.tri_bmax, o_t, d_t, carry)
    if ct.n_sph_clusters > 0:
        carry = _sweep_type(_sph_kernel, (ct.sph_c, ct.sph_k), ct.sph_ids,
                            ct.sph_bmin, ct.sph_bmax, o_t, d_t, carry)

    t_best = carry[0].reshape(-1)[:R]
    id_best = carry[1].reshape(-1)[:R]
    if perm is not None:
        # scatter back to the caller's ray order
        inv = jnp.argsort(perm)
        t_best = t_best[inv]
        id_best = id_best[inv]

    # planes and boxes are few: dense sweep on the original ray batch
    carry2 = (t_best, id_best)
    if prims.n_pl > 0:
        carry2 = _typed_min(_plane_t, prims.pl_p, prims.pl_ids,
                            rays.origin, rays.direction, 2048, carry2)
    if prims.n_box > 0:
        carry2 = _typed_min(_box_t, prims.box_p, prims.box_ids,
                            rays.origin, rays.direction, 2048, carry2)
    t_best, id_best = carry2
    return t_best, jnp.where(t_best >= C.BIG, -1, id_best)
