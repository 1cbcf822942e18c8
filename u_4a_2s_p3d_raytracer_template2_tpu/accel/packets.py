"""Pallas packet-BVH traversal — the hierarchical accelerator for large /
incoherent workloads.

The tile-coherent cluster sweep (``accel/clusters.py``) culls with one
*linear* per-1024-ray-tile worklist; on incoherent secondary bounces inside a
dense mesh the tile union degrades toward brute force (measured: dragon
depth-4 at ~6 s/frame). This module is the short-stack BVH kernel that
SURVEY.md §7(a) originally called for, shaped for the TPU:

  * The tree (``accel/sah.py``, binned SAH) has 128-primitive *leaf chunks* —
    a leaf visit is one dense VPU lane-block test, the exact fold bodies of
    ``ops/pallas_intersect.py`` (Baldwin–Weber triangles / sphere quadratics,
    reference semantics scene.cpp:55-88, 149-172). An MXU-matmul leaf form
    was tried and measured slower (see ``_tri_fold``).
  * One kernel program traverses one PACK-ray packet with a *scalar*
    short-stack walk (node data in SMEM, prim chunks VMEM-resident): ordered
    near-to-far descent, per-ray ``entry <= t_best`` culling, stack entries
    pruned against the packet's worst t. Each program has an independent
    trip count — coherent packets finish in a handful of node visits while
    incoherent ones walk deeper, with no cross-packet barrier (the
    ``while_loop`` property no XLA-level vmap formulation has).
  * Rays are coherence-sorted (octant + origin cell, shared with
    ``accel/clusters.py``) so packets stay tight.

Any-hit (shadow) variants carry an occlusion mask instead of (t, pos), cull
children at ``max_t``, and exit as soon as the whole packet is occluded
(bvh.cpp:348-416 capability).

Traversal is discrete — outputs are wrapped in stop_gradient; shading
re-intersects the winner differentiably (SURVEY.md §7 custom-VJP split).
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import constants as C
from ..core.types import Primitives, Rays, pytree
from ..ops.pallas_intersect import _NOPOS, _mark_valid, _pad_rays, _ray_lhs
from .sah import sah_build

LANE = 128
PACK = 256          # rays per packet (one kernel program)
MIN_TREE = 192      # below this prim count the dense sweeps win — no tree
OUT_ROWS = 8        # f32 sublane quantum: Mosaic requires output blocks of
                    # ≥(8, 128); a PACK<1024 packet's results occupy the
                    # first PACK//LANE rows, the rest is sliced off host-side


@pytree(meta=("has_tri", "has_sph", "tri_nn", "sph_nn", "tri_leaf_chunks",
              "sph_leaf_chunks", "tri_n_leaves", "sph_n_leaves"))
class PacketTables:
    # triangles: nodes + leaf-chunk tables (Baldwin-Weber functional rows)
    tri_nbox: jnp.ndarray    # [tri_nn*6] f32 (bmin, bmax per node)
    tri_nmeta: jnp.ndarray   # [tri_nn*2] i32 (a, is_leaf)
    tri_chunks: jnp.ndarray  # [NCt, 16, LANE] f32
    tri_ids: jnp.ndarray     # [NCt*LANE] i32 global object ids, -1 pad
    # spheres
    sph_nbox: jnp.ndarray    # [sph_nn*6] f32
    sph_nmeta: jnp.ndarray   # [sph_nn*2] i32
    sph_chunks: jnp.ndarray  # [NCs, 8, LANE] f32 (-2c, |c|²-r², 0 pad rows)
    sph_ids: jnp.ndarray     # [NCs*LANE] i32
    world_min: jnp.ndarray   # [3] f32 — coherence-key bounds
    world_max: jnp.ndarray   # [3] f32
    # flat leaf tables for the shallow-tree kernels (leaf bbox + first
    # chunk index per leaf, in build order): a 17-node balls_high-class
    # treelet wastes the short-stack machinery — the walk is ~2 us/iter
    # SCALAR-bound while the whole scene is 58 chunk folds; a static
    # unroll over <=FLAT_MAX_LEAVES leaves has no stack and no pops
    tri_lbox: jnp.ndarray = None   # [n_leaves*6] f32
    tri_lbase: jnp.ndarray = None  # [n_leaves] i32 (first chunk of leaf)
    sph_lbox: jnp.ndarray = None
    sph_lbase: jnp.ndarray = None
    # per-CHUNK bboxes for the fused multi-query any-hit kernel (round 5):
    # chunk-granularity culling is 8x finer than the tuned wide leaves, so
    # whole packets skip chunks their shadow segments don't cross
    tri_cbox: jnp.ndarray = None   # [NCt*6] f32
    sph_cbox: jnp.ndarray = None   # [NCs*6] f32
    has_tri: bool = False
    has_sph: bool = False
    tri_nn: int = 2          # node count after padding (≥2 for child reads)
    sph_nn: int = 2
    tri_n_leaves: int = 0
    sph_n_leaves: int = 0
    tri_leaf_chunks: int = 1  # 128-prim lane blocks per leaf: a leaf visit
    sph_leaf_chunks: int = 1  # folds this many consecutive chunks, trading
                              # VPU fold work (~0.4 us tri / ~0.2 us sph per
                              # block) for a shallower tree (fewer
                              # scalar-bound loop iterations — the measured
                              # bottleneck; sweep: tools/tune_packets.py)


# ---------------------------------------------------------------------------
# build


def _tri_chunk_tables(params: np.ndarray, chunk_prims: np.ndarray):
    """chunk_prims [NC, LANE] global rows → ([NC, 16, LANE] f32, ids)."""
    from ..ops.mxu_intersect import triangle_functionals

    nc = chunk_prims.shape[0]
    flat = chunk_prims.reshape(-1)
    p = np.zeros((flat.size, 12), np.float32)
    ok = flat >= 0
    p[ok] = params[flat[ok]]
    mo, _ = triangle_functionals(p)                      # [3*NC*LANE, 4]
    mo = mo.reshape(nc, LANE, 3, 4)
    m = np.zeros((nc, 16, LANE), np.float32)
    # rows 0-3 N-plane (x,y,z,w), 4-7 U, 8-11 V — the triangle_closest layout
    m[:, :12] = mo.transpose(0, 2, 3, 1).reshape(nc, 12, LANE)
    return m, flat.astype(np.int32)


def _sph_chunk_tables(params: np.ndarray, chunk_prims: np.ndarray):
    nc = chunk_prims.shape[0]
    flat = chunk_prims.reshape(-1)
    p = np.zeros((flat.size, 4), np.float32)
    ok = flat >= 0
    p[ok] = params[flat[ok], :4]
    c = p[:, 0:3]
    k = (c * c).sum(-1) - p[:, 3] ** 2       # zero rows: delta ≤ 0, no hit
    a = np.zeros((nc, 8, LANE), np.float32)
    a[:, 0:3] = (-2.0 * c).reshape(nc, LANE, 3).transpose(0, 2, 1)
    a[:, 3] = k.reshape(nc, LANE)
    return a, flat.astype(np.int32)


def _pad_nodes(nbox: np.ndarray, nmeta: np.ndarray):
    """Flatten node arrays, padding to ≥2 nodes so child reads at a leaf
    root stay in-bounds (they are masked, never used)."""
    nn = max(2, nbox.shape[0])
    nb = np.zeros((nn, 6), np.float32)
    nm = np.zeros((nn, 2), np.int32)
    nb[: nbox.shape[0]] = nbox
    nm[: nmeta.shape[0]] = nmeta
    return nb.reshape(-1), nm.reshape(-1), nn


# Default lane blocks per leaf, tuned on-device (tools/tune_packets.py,
# v5e): wider leaves beat deeper trees until the per-block fold cost
# catches the saved scalar iterations — tris saturate at 4 (dragon
# primary closest 30.9 -> 21.2 ms), the half-width sphere folds at 8
# (balls_high incoherent closest 20.8 -> 9.2 ms, any-hit 21.5 -> 8.4 ms).
LEAF_CHUNKS = {"tri": 4, "sph": 8}


def build_packets(params: np.ndarray, ptype: np.ndarray,
                  strategy: str = "sah", leaf_chunks=None):
    """Host build: per-type SAH treelets + chunk tables. None if no type
    is large enough to benefit from a tree. ``strategy`` selects the tree
    build policy ("sah" | "median", see accel/sah.py); ``leaf_chunks``
    the leaf width in 128-prim lane blocks — an int for both types or a
    {"tri": n, "sph": n} dict (default: the tuned LEAF_CHUNKS)."""
    from .bvh import object_bounds

    if leaf_chunks is None:
        leaf_chunks = LEAF_CHUNKS
    if isinstance(leaf_chunks, int):
        leaf_chunks = {"tri": leaf_chunks, "sph": leaf_chunks}
    params = np.asarray(params, np.float32)
    ptype = np.asarray(ptype)
    bmin, bmax = object_bounds(params, ptype)

    out = {}
    wmin = np.full(3, np.inf, np.float32)
    wmax = np.full(3, -np.inf, np.float32)
    for name, code in (("tri", C.TRIANGLE), ("sph", C.SPHERE)):
        ids = np.nonzero(ptype == code)[0].astype(np.int64)
        if len(ids) < MIN_TREE:
            out[name] = None
            continue
        order, nbox, nmeta, chunk_rows = sah_build(
            bmin[ids], bmax[ids], leaf_size=LANE * leaf_chunks[name],
            strategy=strategy)
        del order  # chunk_rows already carries the permutation
        # a leaf's row block splits into leaf_chunks consecutive 128-wide
        # chunks; nmeta's leaf index a addresses chunk a*leaf_chunks
        chunk_rows = chunk_rows.reshape(-1, LANE)
        chunk_prims = np.where(chunk_rows >= 0, ids[np.maximum(chunk_rows, 0)],
                               -1).astype(np.int64)
        nb, nm, nn = _pad_nodes(nbox, nmeta)
        if name == "tri":
            chunks, cids = _tri_chunk_tables(params, chunk_prims)
        else:
            chunks, cids = _sph_chunk_tables(params, chunk_prims)
        # per-chunk bboxes (fused multi-query any-hit culling)
        nc = chunk_prims.shape[0]
        ok = chunk_prims >= 0                              # [nc, LANE]
        safe = np.maximum(chunk_prims, 0)
        cmin = np.where(ok[..., None], bmin[safe], np.inf).min(axis=1)
        cmax = np.where(ok[..., None], bmax[safe], -np.inf).max(axis=1)
        cbox = np.concatenate([cmin, cmax], axis=-1).astype(np.float32)
        out[name] = (nb, nm, nn, chunks, cids, cbox.reshape(-1))
        wmin = np.minimum(wmin, nbox[0, 0:3])
        wmax = np.maximum(wmax, nbox[0, 3:6])

    if out["tri"] is None and out["sph"] is None:
        return None

    def unpack(name, rows):
        v = out[name]
        if v is None:
            return (jnp.zeros(12, jnp.float32), jnp.zeros(4, jnp.int32),
                    jnp.zeros((1, rows, LANE), jnp.float32),
                    jnp.full(LANE, -1, jnp.int32), False, 2,
                    jnp.zeros(6, jnp.float32), jnp.zeros(1, jnp.int32), 0,
                    jnp.zeros(6, jnp.float32))
        nb, nm, nn, chunks, cids, cbox = v
        # flat leaf table (build order): leaf nodes' bboxes + first chunk
        nm2 = np.asarray(nm).reshape(-1, 2)
        nb2 = np.asarray(nb).reshape(-1, 6)
        leaf_rows = np.nonzero(nm2[:, 1] == 1)[0]
        lbox = nb2[leaf_rows].reshape(-1).astype(np.float32)
        lbase = (nm2[leaf_rows, 0] * leaf_chunks[name]).astype(np.int32)
        return (jnp.asarray(nb), jnp.asarray(nm), jnp.asarray(chunks),
                jnp.asarray(cids), True, nn,
                jnp.asarray(lbox), jnp.asarray(lbase), len(leaf_rows),
                jnp.asarray(cbox))

    t_nb, t_nm, t_ch, t_id, has_tri, t_nn, t_lb, t_lba, t_nl, t_cb = \
        unpack("tri", 16)
    s_nb, s_nm, s_ch, s_id, has_sph, s_nn, s_lb, s_lba, s_nl, s_cb = \
        unpack("sph", 8)
    if not np.isfinite(wmin).all():
        wmin = np.zeros(3, np.float32)
        wmax = np.ones(3, np.float32)
    return PacketTables(
        tri_nbox=t_nb, tri_nmeta=t_nm, tri_chunks=t_ch, tri_ids=t_id,
        sph_nbox=s_nb, sph_nmeta=s_nm, sph_chunks=s_ch, sph_ids=s_id,
        world_min=jnp.asarray(wmin.astype(np.float32)),
        world_max=jnp.asarray(wmax.astype(np.float32)),
        tri_lbox=t_lb, tri_lbase=t_lba, sph_lbox=s_lb, sph_lbase=s_lba,
        tri_cbox=t_cb, sph_cbox=s_cb,
        has_tri=has_tri, has_sph=has_sph, tri_nn=t_nn, sph_nn=s_nn,
        tri_n_leaves=t_nl, sph_n_leaves=s_nl,
        tri_leaf_chunks=leaf_chunks["tri"],
        sph_leaf_chunks=leaf_chunks["sph"],
    )


# ---------------------------------------------------------------------------
# kernels


def _sinv(c):
    """ops/intersect._safe_inv semantics, in-kernel."""
    tiny = jnp.abs(c) < 1e-30
    sgn = jnp.where(c < 0.0, -1.0, 1.0)
    return jnp.where(tiny, sgn * 1e30, 1.0 / jnp.where(tiny, 1.0, c))


def _tri_fold(m, cols, quad):
    """One chunk [16, LANE] of Baldwin-Weber triangles vs the packet.
    Returns the [PACK, LANE] hit-t map (BIG on miss).

    Broadcast-multiply VPU form, deliberately NOT an MXU matmul: the
    [6*pack, 16] @ [16, 128] formulation was measured SLOWER on-device
    (dragon primary closest 41 ms vs 32 ms) — f32 MXU emulation is
    multi-pass, K=16 pads to 128, and the matmul adds a latency chain to
    every leaf visit, while the broadcast form is ~40 ops on 32-vreg
    tiles that overlap with the scalar node walk."""
    ox, oy, oz, dx, dy, dz = cols

    def plane(r0):
        mx = m[r0:r0 + 1, :]
        my = m[r0 + 1:r0 + 2, :]
        mz = m[r0 + 2:r0 + 3, :]
        mw = m[r0 + 3:r0 + 4, :]
        so = ox * mx + oy * my + oz * mz + mw
        sd = dx * mx + dy * my + dz * mz
        return so, sd

    so_t, sd_t = plane(0)
    so_u, sd_u = plane(4)
    so_v, sd_v = plane(8)
    ok = jnp.abs(sd_t) > C.EPSILON
    inv = 1.0 / jnp.where(ok, sd_t, 1.0)
    t = -so_t * inv
    u = so_u + t * sd_u
    v = so_v + t * sd_v
    ok &= (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0)
    ok &= t > C.EPSILON
    return jnp.where(ok, t, C.BIG)


def _sph_fold(a, cols, quad):
    """One chunk [8, LANE] of spheres (reference smaller-positive-root)."""
    ox, oy, oz, dx, dy, dz = cols
    oo, do2, a4, minv2a = quad
    cx = a[0:1, :]
    cy = a[1:2, :]
    cz = a[2:3, :]
    kk = a[3:4, :]
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
    return jnp.where(ok, t, C.BIG)


_FOLDS = {"tri": _tri_fold, "sph": _sph_fold}


def _store_best(t_slot, pos_slot, t_ref, pos_ref, pack):
    """Cross-lane reduce + lowest-position tie-break, stored into the
    OUT_ROWS-padded output block (rows past pack//LANE are filler)."""
    t_best = jnp.min(t_slot, axis=-1)
    pos_best = jnp.min(
        jnp.where(t_slot == t_best[:, None], pos_slot, _NOPOS), axis=-1)
    pos_best = jnp.where(t_best >= C.BIG, -1.0, pos_best)
    used = pack // LANE
    rows = t_ref.shape[0]
    t_out = t_best.reshape(used, LANE)
    p_out = pos_best.reshape(used, LANE)
    if rows > used:
        t_out = jnp.concatenate(
            [t_out, jnp.full((rows - used, LANE), C.BIG, jnp.float32)])
        p_out = jnp.concatenate(
            [p_out, jnp.full((rows - used, LANE), -1.0, jnp.float32)])
    t_ref[:] = t_out
    pos_ref[:] = p_out


def _make_closest_kernel(kind: str, pack: int, leaf_chunks: int = 1):
    fold = _FOLDS[kind]

    def kernel(nbox_ref, nmeta_ref, chunks_ref, om_ref, dm_ref,
               t_ref, pos_ref, stackn_ref, stackt_ref, ts_ref, ps_ref,
               tb_ref):
        om = om_ref[:]
        dm = dm_ref[:]
        cols = (om[:, 0:1], om[:, 1:2], om[:, 2:3],
                dm[:, 0:1], dm[:, 1:2], dm[:, 2:3])
        quad = (om[:, 3:4], om[:, 4:5], om[:, 5:6], om[:, 6:7])
        valid = om[:, 7:8]
        ivx, ivy, ivz = _sinv(cols[3]), _sinv(cols[4]), _sinv(cols[5])
        iota = jax.lax.broadcasted_iota(
            jnp.int32, (pack, LANE), 1).astype(jnp.float32)

        # pad rays start at -BIG so they never gate pruning (sliced off)
        ts_ref[:] = jnp.broadcast_to(
            jnp.where(valid > 0.5, C.BIG, -C.BIG), (pack, LANE))
        ps_ref[:] = jnp.full((pack, LANE), -1.0, jnp.float32)
        # running per-ray best (== rowmin(ts)), updated only at leaf
        # visits so internal-node iterations skip the [pack, LANE] reduce
        tb_ref[:] = jnp.where(valid > 0.5, C.BIG, -C.BIG)

        def slab(ni):
            base = 6 * ni
            lox = (nbox_ref[base] - cols[0]) * ivx
            hix = (nbox_ref[base + 3] - cols[0]) * ivx
            loy = (nbox_ref[base + 1] - cols[1]) * ivy
            hiy = (nbox_ref[base + 4] - cols[1]) * ivy
            loz = (nbox_ref[base + 2] - cols[2]) * ivz
            hiz = (nbox_ref[base + 5] - cols[2]) * ivz
            tn = jnp.maximum(jnp.maximum(jnp.minimum(lox, hix),
                                         jnp.minimum(loy, hiy)),
                             jnp.minimum(loz, hiz))
            tf = jnp.minimum(jnp.minimum(jnp.maximum(lox, hix),
                                         jnp.maximum(loy, hiy)),
                             jnp.maximum(loz, hiz))
            return (tn <= tf) & (tf > 0.0), tn

        nn = nbox_ref.shape[0] // 6

        # Single-level walk loop: one node visit OR one stack pop per
        # iteration (cur == -1 ⇒ pop-only pass). A nested pop while_loop
        # compiles but HANGS on real hardware (observed wedging the chip
        # for minutes — see tools/probe_pallas_features.py history), so
        # stale stack entries cost one cheap masked iteration instead.
        def body(state):
            cur, sp = state
            active = cur >= 0
            node = jnp.clip(cur, 0, nn - 1)
            a = nmeta_ref[2 * node]
            is_leaf = nmeta_ref[2 * node + 1]

            @pl.when(active & (is_leaf == 1))
            def _():
                base = a * leaf_chunks
                for j in range(leaf_chunks):    # unrolled lane blocks
                    t = fold(chunks_ref[base + j], cols, quad)
                    ppos = iota + (base + j).astype(jnp.float32) * float(LANE)
                    better = t < ts_ref[:]
                    ps_ref[:] = jnp.where(better, ppos, ps_ref[:])
                    ts_ref[:] = jnp.where(better, t, ts_ref[:])
                    tb_ref[:] = jnp.minimum(
                        tb_ref[:], jnp.min(t, axis=-1, keepdims=True))

            tbest = tb_ref[:]                                   # [pack, 1]
            t_far = jnp.max(tbest)                              # scalar

            li = jnp.clip(a, 0, nn - 2)
            ri = li + 1
            hitl, tnl = slab(li)
            hitr, tnr = slab(ri)
            usel = hitl & (tnl <= tbest)
            user = hitr & (tnr <= tbest)
            internal = active & (is_leaf == 0)
            anyl = (jnp.max(jnp.where(usel, 1.0, 0.0)) > 0.0) & internal
            anyr = (jnp.max(jnp.where(user, 1.0, 0.0)) > 0.0) & internal
            entl = jnp.min(jnp.where(usel, tnl, C.BIG))
            entr = jnp.min(jnp.where(user, tnr, C.BIG))

            both = anyl & anyr
            goleft = entl <= entr
            near = jnp.where(goleft, li, ri)
            far = jnp.where(goleft, ri, li)
            fart = jnp.where(goleft, entr, entl)

            @pl.when(both)
            def _():
                stackn_ref[sp] = far
                stackt_ref[sp] = fart

            sp = jnp.where(both, sp + 1, sp)
            nxt = jnp.where(
                anyl | anyr,
                jnp.where(both, near, jnp.where(anyl, li, ri)),
                jnp.int32(-1))

            # one pop attempt; a stale entry leaves cur at -1 for the next
            # (pop-only) iteration
            do_pop = (nxt < 0) & (sp > 0)
            spm = jnp.maximum(sp - 1, 0)
            fresh = stackt_ref[spm] < t_far
            nxt = jnp.where(do_pop & fresh, stackn_ref[spm], nxt)
            sp = jnp.where(do_pop, spm, sp)
            return nxt, sp

        jax.lax.while_loop(lambda s: (s[0] >= 0) | (s[1] > 0), body,
                           (jnp.int32(0), jnp.int32(0)))
        _store_best(ts_ref[:], ps_ref[:], t_ref, pos_ref, pack)

    return kernel


def _make_any_kernel(kind: str, pack: int, max_t: float,
                     leaf_chunks: int = 1):
    fold = _FOLDS[kind]

    def kernel(nbox_ref, nmeta_ref, chunks_ref, om_ref, dm_ref,
               occ_ref, stackn_ref, oc_ref, ro_ref):
        om = om_ref[:]
        dm = dm_ref[:]
        cols = (om[:, 0:1], om[:, 1:2], om[:, 2:3],
                dm[:, 0:1], dm[:, 1:2], dm[:, 2:3])
        quad = (om[:, 3:4], om[:, 4:5], om[:, 5:6], om[:, 6:7])
        valid = om[:, 7:8]
        ivx, ivy, ivz = _sinv(cols[3]), _sinv(cols[4]), _sinv(cols[5])

        # pad rays start occluded so they never block the early exit;
        # ro = rowmax(oc), updated only at leaf visits so internal-node
        # iterations skip the [pack, LANE] reduces
        oc_ref[:] = jnp.broadcast_to(1.0 - valid, (pack, LANE))
        ro_ref[:] = 1.0 - valid

        def slab(ni):
            base = 6 * ni
            lox = (nbox_ref[base] - cols[0]) * ivx
            hix = (nbox_ref[base + 3] - cols[0]) * ivx
            loy = (nbox_ref[base + 1] - cols[1]) * ivy
            hiy = (nbox_ref[base + 4] - cols[1]) * ivy
            loz = (nbox_ref[base + 2] - cols[2]) * ivz
            hiz = (nbox_ref[base + 5] - cols[2]) * ivz
            tn = jnp.maximum(jnp.maximum(jnp.minimum(lox, hix),
                                         jnp.minimum(loy, hiy)),
                             jnp.minimum(loz, hiz))
            tf = jnp.minimum(jnp.minimum(jnp.maximum(lox, hix),
                                         jnp.maximum(loy, hiy)),
                             jnp.maximum(loz, hiz))
            return (tn <= tf) & (tf > 0.0) & (tn < max_t), tn

        nn = nbox_ref.shape[0] // 6

        # single-level loop (see the closest-hit kernel's no-nested-while
        # note); pops are single masked iterations
        def body(state):
            cur, sp = state
            active = cur >= 0
            node = jnp.clip(cur, 0, nn - 1)
            a = nmeta_ref[2 * node]
            is_leaf = nmeta_ref[2 * node + 1]

            @pl.when(active & (is_leaf == 1))
            def _():
                base = a * leaf_chunks
                for j in range(leaf_chunks):    # unrolled lane blocks
                    hit = jnp.where(
                        fold(chunks_ref[base + j], cols, quad) < max_t,
                        1.0, 0.0)
                    oc_ref[:] = jnp.maximum(oc_ref[:], hit)
                    ro_ref[:] = jnp.maximum(
                        ro_ref[:], jnp.max(hit, axis=-1, keepdims=True))

            no_occ = ro_ref[:] < 0.5
            all_occ = jnp.max(jnp.where(no_occ, 1.0, 0.0)) == 0.0

            li = jnp.clip(a, 0, nn - 2)
            ri = li + 1
            hitl, tnl = slab(li)
            hitr, tnr = slab(ri)
            internal = active & (is_leaf == 0)
            usel = hitl & no_occ
            user = hitr & no_occ
            anyl = (jnp.max(jnp.where(usel, 1.0, 0.0)) > 0.0) & internal
            anyr = (jnp.max(jnp.where(user, 1.0, 0.0)) > 0.0) & internal
            both = anyl & anyr

            # near-to-far descent (like the closest kernel). Measured
            # NEUTRAL on balls_high frames: occluded lanes do drop out
            # sooner, but the packet exit needs ALL lanes occluded, and
            # lit lanes (common — the light-facing surface) must prove
            # non-occlusion by visiting every overlapping leaf no matter
            # the order. Kept for structural symmetry with the closest
            # walk; it costs two scalar selects per iteration.
            entl = jnp.min(jnp.where(usel, tnl, C.BIG))
            entr = jnp.min(jnp.where(user, tnr, C.BIG))
            goleft = entl <= entr
            near = jnp.where(goleft, li, ri)
            far = jnp.where(goleft, ri, li)

            @pl.when(both)
            def _():
                stackn_ref[sp] = far

            sp = jnp.where(both, sp + 1, sp)
            nxt = jnp.where(
                anyl | anyr,
                jnp.where(both, near, jnp.where(anyl, li, ri)),
                jnp.int32(-1))
            sp = jnp.where(all_occ, 0, sp)
            nxt = jnp.where(all_occ, jnp.int32(-1), nxt)

            do_pop = (nxt < 0) & (sp > 0)
            spm = jnp.maximum(sp - 1, 0)
            nxt = jnp.where(do_pop, stackn_ref[spm], nxt)
            sp = jnp.where(do_pop, spm, sp)
            return nxt, sp

        jax.lax.while_loop(lambda s: (s[0] >= 0) | (s[1] > 0), body,
                           (jnp.int32(0), jnp.int32(0)))
        used = pack // LANE
        rows = occ_ref.shape[0]
        out = jnp.max(oc_ref[:], axis=-1).reshape(used, LANE)
        if rows > used:
            out = jnp.concatenate(
                [out, jnp.zeros((rows - used, LANE), jnp.float32)])
        occ_ref[:] = out

    return kernel


# Shallow trees run the FLAT kernels: the short-stack walk costs ~2 us per
# scalar iteration (SMEM node reads, stack ops, pop passes) — on a 17-node
# balls_high-class treelet that overhead dwarfs the ~0.2 us/chunk VPU fold.
# The flat form statically unrolls over the leaves: one slab test + a
# guarded chunk fold per leaf, no stack, no ordered descent (per-ray
# entry<=t_best culling still applies; with this few leaves ordering buys
# nothing). Measured on balls_high 512² (v5e): incoherent closest 43.3 ->
# 23.0 ms, primary closest 23.0 -> 10.3 ms, anyhit 5.0 -> 2.9 ms.
FLAT_MAX_LEAVES = 16


def _make_flat_closest_kernel(kind: str, pack: int, leaf_chunks: int,
                              n_leaves: int):
    fold = _FOLDS[kind]

    def kernel(lbox_ref, lbase_ref, chunks_ref, om_ref, dm_ref,
               t_ref, pos_ref, ts_ref, ps_ref, tb_ref):
        om = om_ref[:]
        dm = dm_ref[:]
        cols = (om[:, 0:1], om[:, 1:2], om[:, 2:3],
                dm[:, 0:1], dm[:, 1:2], dm[:, 2:3])
        quad = (om[:, 3:4], om[:, 4:5], om[:, 5:6], om[:, 6:7])
        valid = om[:, 7:8]
        ivx, ivy, ivz = _sinv(cols[3]), _sinv(cols[4]), _sinv(cols[5])
        iota = jax.lax.broadcasted_iota(
            jnp.int32, (pack, LANE), 1).astype(jnp.float32)

        ts_ref[:] = jnp.broadcast_to(
            jnp.where(valid > 0.5, C.BIG, -C.BIG), (pack, LANE))
        ps_ref[:] = jnp.full((pack, LANE), -1.0, jnp.float32)
        tb_ref[:] = jnp.where(valid > 0.5, C.BIG, -C.BIG)

        for li in range(n_leaves):
            base6 = 6 * li
            lox = (lbox_ref[base6] - cols[0]) * ivx
            hix = (lbox_ref[base6 + 3] - cols[0]) * ivx
            loy = (lbox_ref[base6 + 1] - cols[1]) * ivy
            hiy = (lbox_ref[base6 + 4] - cols[1]) * ivy
            loz = (lbox_ref[base6 + 2] - cols[2]) * ivz
            hiz = (lbox_ref[base6 + 5] - cols[2]) * ivz
            tn = jnp.maximum(jnp.maximum(jnp.minimum(lox, hix),
                                         jnp.minimum(loy, hiy)),
                             jnp.minimum(loz, hiz))
            tf = jnp.minimum(jnp.minimum(jnp.maximum(lox, hix),
                                         jnp.maximum(loy, hiy)),
                             jnp.maximum(loz, hiz))
            use = (tn <= tf) & (tf > 0.0) & (tn <= tb_ref[:])

            @pl.when(jnp.max(jnp.where(use, 1.0, 0.0)) > 0.0)
            def _(li=li):
                base = lbase_ref[li]
                for j in range(leaf_chunks):
                    t = fold(chunks_ref[base + j], cols, quad)
                    ppos = iota + (base + j).astype(jnp.float32) * float(LANE)
                    better = t < ts_ref[:]
                    ps_ref[:] = jnp.where(better, ppos, ps_ref[:])
                    ts_ref[:] = jnp.where(better, t, ts_ref[:])
                    tb_ref[:] = jnp.minimum(
                        tb_ref[:], jnp.min(t, axis=-1, keepdims=True))

        _store_best(ts_ref[:], ps_ref[:], t_ref, pos_ref, pack)

    return kernel


# Fused MULTI-QUERY any-hit (round 5, VERDICT r4 #3) — a MEASURED NEGATIVE
# RESULT, kept dispatchable (accel_impl="multi") so the number stays
# reproducible. The idea: balls_high's 3-light shadow pass was the biggest
# frame sink (23 ms/light, docs/ARCHITECTURE.md #16); fuse the L queries
# into one kernel with CHUNK-granularity bbox culling (8x finer than the
# tuned wide leaves) and per-(chunk, light) skip guards. Measured on v5e
# (tools/bench_r5.py, hitpoint->light queries, 512^2): 3 separate stack
# walks 53 ms TOTAL vs 169 ms fused — 3x SLOWER, because the static unroll
# pays its ~0.6 us slab+reduce+guard machinery for all 72 chunks x 3 lights
# on EVERY packet, while the stack walk's whole-packet early exit (all 256
# lanes occluded -> stop, common for from-inside-the-cloud segments)
# finishes in ~25 node visits per light. The per-light walk's fold work IS
# the floor at this tree shape.
# Each light brings its own (om, dm) block (segments differ per ray);
# occlusion per light is a [pack, 1] row scratch.
# cap on the static chunk unroll: balls_high (7,381 spheres) builds 9
# leaves x 8 = 72 chunks incl. leaf padding (pad chunks have empty cboxes
# -> their slab never passes)
MULTI_MAX_CHUNKS = 96


def _make_flat_any_multi_kernel(kind: str, pack: int, max_t: float,
                                n_chunks: int, n_lights: int):
    fold = _FOLDS[kind]

    def kernel(*refs):
        cbox_ref, chunks_ref = refs[0], refs[1]
        ray_refs = refs[2:2 + 2 * n_lights]
        occ_ref = refs[2 + 2 * n_lights]
        ocs = refs[3 + 2 * n_lights: 3 + 3 * n_lights]

        cols = []
        quads = []
        invs = []
        for l in range(n_lights):
            om = ray_refs[2 * l][:]
            dm = ray_refs[2 * l + 1][:]
            c = (om[:, 0:1], om[:, 1:2], om[:, 2:3],
                 dm[:, 0:1], dm[:, 1:2], dm[:, 2:3])
            cols.append(c)
            quads.append((om[:, 3:4], om[:, 4:5], om[:, 5:6], om[:, 6:7]))
            invs.append((_sinv(c[3]), _sinv(c[4]), _sinv(c[5])))
            # pad/dead rays start occluded: their chunk guards never fire
            ocs[l][:] = 1.0 - om[:, 7:8]

        for c in range(n_chunks):
            b6 = 6 * c
            for l in range(n_lights):
                ox, oy, oz = cols[l][0], cols[l][1], cols[l][2]
                ivx, ivy, ivz = invs[l]
                lox = (cbox_ref[b6] - ox) * ivx
                hix = (cbox_ref[b6 + 3] - ox) * ivx
                loy = (cbox_ref[b6 + 1] - oy) * ivy
                hiy = (cbox_ref[b6 + 4] - oy) * ivy
                loz = (cbox_ref[b6 + 2] - oz) * ivz
                hiz = (cbox_ref[b6 + 5] - oz) * ivz
                tn = jnp.maximum(jnp.maximum(jnp.minimum(lox, hix),
                                             jnp.minimum(loy, hiy)),
                                 jnp.minimum(loz, hiz))
                tf = jnp.minimum(jnp.minimum(jnp.maximum(lox, hix),
                                             jnp.maximum(loy, hiy)),
                                 jnp.maximum(loz, hiz))
                use = ((tn <= tf) & (tf > 0.0) & (tn < max_t)
                       & (ocs[l][:] < 0.5))
                need = jnp.max(jnp.where(use, 1.0, 0.0)) > 0.0

                @pl.when(need)
                def _(c=c, l=l):
                    t = fold(chunks_ref[c], cols[l], quads[l])
                    hit = jnp.max(jnp.where(t < max_t, 1.0, 0.0),
                                  axis=-1, keepdims=True)
                    ocs[l][:] = jnp.maximum(ocs[l][:], hit)

        used = pack // LANE
        orows = occ_ref.shape[0] // n_lights
        outs = []
        for l in range(n_lights):
            o = ocs[l][:].reshape(used, LANE)
            if orows > used:
                o = jnp.concatenate(
                    [o, jnp.zeros((orows - used, LANE), jnp.float32)])
            outs.append(o)
        occ_ref[:] = jnp.concatenate(outs, axis=0)

    return kernel


def _walk_any_multi(kind, cbox, chunks, oms, dms, pack, max_t, interpret):
    """Fused flat any-hit: L queries per ray in one kernel. Returns
    [L, R] occlusion f32."""
    n_lights = len(oms)
    R = oms[0].shape[0]
    nc = chunks.shape[0]
    n_packs = R // pack
    orows = _out_rows(pack)
    ray_ops = []
    for om, dm in zip(oms, dms):
        ray_ops += [om, dm]
    occ = pl.pallas_call(
        _make_flat_any_multi_kernel(kind, pack, float(max_t), nc, n_lights),
        grid=(n_packs,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ] + [_ray_blocks(pack)] * (2 * n_lights),
        out_specs=pl.BlockSpec((n_lights * orows, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_packs * n_lights * orows, LANE),
                                       jnp.float32),
        scratch_shapes=[pltpu.VMEM((pack, 1), jnp.float32)] * n_lights,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(cbox, chunks, *ray_ops)
    used = pack // LANE
    occ = occ.reshape(n_packs, n_lights, orows, LANE)[:, :, :used]
    # [n_packs, L, used, LANE] -> [L, R]
    return occ.transpose(1, 0, 2, 3).reshape(n_lights, -1)


# ---------------------------------------------------------------------------
# pallas_call wrappers


def _ray_blocks(pack):
    return pl.BlockSpec((pack, 8), lambda i: (i, 0), memory_space=pltpu.VMEM)


def _out_rows(pack):
    return max(OUT_ROWS, pack // LANE)


def _walk_closest(kind, nbox, nmeta, chunks, om, dm, pack, interpret,
                  leaf_chunks=1):
    R = om.shape[0]
    nc = chunks.shape[0]
    stack = max(64, nc + 8)
    n_packs = R // pack
    orows = _out_rows(pack)
    t, pos = pl.pallas_call(
        _make_closest_kernel(kind, pack, leaf_chunks),
        grid=(n_packs,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            _ray_blocks(pack), _ray_blocks(pack),
        ],
        out_specs=(
            pl.BlockSpec((orows, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((orows, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_packs * orows, LANE), jnp.float32),
            jax.ShapeDtypeStruct((n_packs * orows, LANE), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.SMEM((stack,), jnp.int32),
            pltpu.SMEM((stack,), jnp.float32),
            pltpu.VMEM((pack, LANE), jnp.float32),
            pltpu.VMEM((pack, LANE), jnp.float32),
            pltpu.VMEM((pack, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(nbox, nmeta, chunks, om, dm)
    used = pack // LANE
    t = t.reshape(n_packs, orows, LANE)[:, :used].reshape(-1)
    pos = pos.reshape(n_packs, orows, LANE)[:, :used].reshape(-1)
    return t, pos


def _walk_any(kind, nbox, nmeta, chunks, om, dm, pack, max_t, interpret,
              leaf_chunks=1):
    R = om.shape[0]
    nc = chunks.shape[0]
    stack = max(64, nc + 8)
    n_packs = R // pack
    orows = _out_rows(pack)
    occ = pl.pallas_call(
        _make_any_kernel(kind, pack, float(max_t), leaf_chunks),
        grid=(n_packs,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            _ray_blocks(pack), _ray_blocks(pack),
        ],
        out_specs=pl.BlockSpec((orows, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_packs * orows, LANE), jnp.float32),
        scratch_shapes=[
            pltpu.SMEM((stack,), jnp.int32),
            pltpu.VMEM((pack, LANE), jnp.float32),
            pltpu.VMEM((pack, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(nbox, nmeta, chunks, om, dm)
    used = pack // LANE
    return occ.reshape(n_packs, orows, LANE)[:, :used].reshape(-1)


def _walk_closest_flat(kind, lbox, lbase, chunks, om, dm, pack, interpret,
                       leaf_chunks, n_leaves):
    R = om.shape[0]
    n_packs = R // pack
    orows = _out_rows(pack)
    t, pos = pl.pallas_call(
        _make_flat_closest_kernel(kind, pack, leaf_chunks, n_leaves),
        grid=(n_packs,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            _ray_blocks(pack), _ray_blocks(pack),
        ],
        out_specs=(
            pl.BlockSpec((orows, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((orows, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_packs * orows, LANE), jnp.float32),
            jax.ShapeDtypeStruct((n_packs * orows, LANE), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((pack, LANE), jnp.float32),
            pltpu.VMEM((pack, LANE), jnp.float32),
            pltpu.VMEM((pack, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(lbox, lbase, chunks, om, dm)
    used = pack // LANE
    t = t.reshape(n_packs, orows, LANE)[:, :used].reshape(-1)
    pos = pos.reshape(n_packs, orows, LANE)[:, :used].reshape(-1)
    return t, pos


def _gather_ids(ids, pos):
    pos = pos.astype(jnp.int32)
    safe = jnp.maximum(pos, 0)
    return jnp.where(pos >= 0, ids[safe], -1)


# Coherence-sort auto threshold, measured on-device (v5e): the sort
# machinery (key + argsort + permute/inverse gathers) costs ~10 ns/ray
# per call; its benefit is tighter packets, which only matters when
# walks are long enough to diverge. dragon (539-node tri tree, 65k
# rays/frame): sorting wins 149 vs 158 ms/frame. balls_high (17-node
# sphere tree, 1M rays/frame): sorting LOSES 467 vs 378 ms — there is
# nothing to diverge over. Node count is the proxy: sort iff any
# treelet has >= this many nodes.
SORT_MIN_NODES = 256


def _auto_sort(pt: PacketTables) -> bool:
    return ((pt.has_tri and pt.tri_nn >= SORT_MIN_NODES)
            or (pt.has_sph and pt.sph_nn >= SORT_MIN_NODES))


def _sorted_padded(pt: PacketTables, rays: Rays, pack: int,
                   coherence_sort: bool, dead=None):
    """``dead`` [R] bool marks lanes whose result the caller will mask
    anyway (inactive queue entries, back-facing shadow rays): their valid
    bit is cleared so the kernels treat them like pad rays — pre-occluded
    in any-hit (whole-packet early exit fires sooner) and non-gating in
    closest-hit pruning."""
    from .clusters import _coherence_key

    o, d = rays.origin, rays.direction
    R = o.shape[0]
    perm = None
    if coherence_sort and R > pack:
        key = _coherence_key(o, d, pt.world_min, pt.world_max)
        perm = jnp.argsort(key)
        o = o[perm]
        d = d[perm]
        if dead is not None:
            dead = dead[perm]
    opad = (-R) % pack
    if opad:
        o = jnp.concatenate([o, jnp.zeros((opad, 3), o.dtype)])
        d = jnp.concatenate(
            [d, jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], d.dtype),
                                 (opad, 3))])
    om, dm = _ray_lhs(o, d)
    om = _mark_valid(om, R)
    if dead is not None:
        alive = jnp.concatenate(
            [~dead, jnp.zeros((opad,), bool)]) if opad else ~dead
        om = om.at[:, 7].set(om[:, 7] * alive.astype(om.dtype))
    return om, dm, R, perm


def packet_closest_hit(pt: PacketTables, prims: Primitives, rays: Rays,
                       pack: int = PACK, coherence_sort: bool | None = None,
                       interpret: bool | None = None):
    """Closest hit via packet-BVH walks + dense sweeps for treeless types.

    Returns (t [R], obj_id [R]); -1 id on miss. Discrete outputs — wrapped
    in stop_gradient (shading re-intersects the winner differentiably).
    ``interpret=None`` resolves to True off-TPU so a forced
    ``accel_impl="packets"`` stays runnable on any backend;
    ``coherence_sort=None`` resolves by treelet size (see SORT_MIN_NODES).
    The None defaults resolve HERE, outside jit, so the resolved bools are
    the static cache keys (a backend change after the first trace can't
    reuse a stale interpret choice).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if coherence_sort is None:
        coherence_sort = _auto_sort(pt)
    return _packet_closest_hit(pt, prims, rays, pack, bool(coherence_sort),
                               bool(interpret))


@functools.partial(jax.jit, static_argnames=("pack", "coherence_sort",
                                             "interpret"))
def _packet_closest_hit(pt: PacketTables, prims: Primitives, rays: Rays,
                        pack: int, coherence_sort: bool, interpret: bool):
    pt = jax.lax.stop_gradient(pt)
    rays = jax.lax.stop_gradient(rays)
    om, dm, R, perm = _sorted_padded(pt, rays, pack, coherence_sort)

    t_best = jnp.full((om.shape[0],), C.BIG, jnp.float32)
    id_best = jnp.full((om.shape[0],), -1, jnp.int32)

    def one_type(kind, carry):
        t_best, id_best = carry
        lbox = getattr(pt, f"{kind}_lbox")
        n_leaves = getattr(pt, f"{kind}_n_leaves")
        lc = getattr(pt, f"{kind}_leaf_chunks")
        if 0 < n_leaves <= FLAT_MAX_LEAVES and lbox is not None:
            t, pos = _walk_closest_flat(
                kind, lbox, getattr(pt, f"{kind}_lbase"),
                getattr(pt, f"{kind}_chunks"), om, dm, pack, interpret,
                lc, n_leaves)
        else:
            t, pos = _walk_closest(
                kind, getattr(pt, f"{kind}_nbox"),
                getattr(pt, f"{kind}_nmeta"), getattr(pt, f"{kind}_chunks"),
                om, dm, pack, interpret, lc)
        pid = _gather_ids(getattr(pt, f"{kind}_ids"), pos)
        better = t < t_best
        return (jnp.where(better, t, t_best),
                jnp.where(better, pid, id_best))

    if pt.has_tri:
        t_best, id_best = one_type("tri", (t_best, id_best))
    if pt.has_sph:
        t_best, id_best = one_type("sph", (t_best, id_best))

    t_best = t_best[:R]
    id_best = id_best[:R]
    if perm is not None:
        inv = jnp.argsort(perm)
        t_best = t_best[inv]
        id_best = id_best[inv]

    # treeless types: dense folds on the caller's ray order
    from ..ops.intersect import (_box_t, _plane_t, _sphere_t, _triangle_t,
                                 _typed_min)

    carry = (t_best, id_best)
    if not pt.has_tri and prims.n_tri > 0:
        carry = _typed_min(_triangle_t, prims.tri_p, prims.tri_ids,
                           rays.origin, rays.direction, 2048, carry)
    if not pt.has_sph and prims.n_sph > 0:
        carry = _typed_min(_sphere_t, prims.sph_p, prims.sph_ids,
                           rays.origin, rays.direction, 2048, carry)
    if prims.n_pl > 0:
        carry = _typed_min(_plane_t, prims.pl_p, prims.pl_ids,
                           rays.origin, rays.direction, 2048, carry)
    if prims.n_box > 0:
        carry = _typed_min(_box_t, prims.box_p, prims.box_ids,
                           rays.origin, rays.direction, 2048, carry)
    t_best, id_best = carry
    return t_best, jnp.where(t_best >= C.BIG, -1, id_best)


def packet_any_hit(pt: PacketTables, prims: Primitives, rays: Rays,
                   max_t: float, pack: int = PACK,
                   coherence_sort: bool | None = None,
                   interpret: bool | None = None, dead=None):
    """Early-exit occlusion via packet-BVH walks. [R] bool. None defaults
    resolve here, outside jit (see packet_closest_hit). ``dead`` [R] bool:
    lanes the caller masks downstream — reported occluded without
    traversing (see _sorted_padded)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if coherence_sort is None:
        coherence_sort = _auto_sort(pt)
    return _packet_any_hit(pt, prims, rays, float(max_t), pack,
                           bool(coherence_sort), bool(interpret), dead)


@functools.partial(jax.jit, static_argnames=("max_t", "pack",
                                             "coherence_sort", "interpret"))
def _packet_any_hit(pt: PacketTables, prims: Primitives, rays: Rays,
                    max_t: float, pack: int, coherence_sort: bool,
                    interpret: bool, dead=None):
    pt = jax.lax.stop_gradient(pt)
    rays = jax.lax.stop_gradient(rays)
    om, dm, R, perm = _sorted_padded(pt, rays, pack, coherence_sort, dead)

    occ = jnp.zeros((om.shape[0],), jnp.float32)

    # any-hit stays on the STACK walk at every tree size: its whole-packet
    # early exit beats the flat unroll on the common coherent shadow loads
    # (balls_high primary anyhit measured 5.0 ms stack vs 8.1 ms flat; the
    # flat form must still slab-test every leaf after full occlusion)
    def one_type(kind, occ):
        o = _walk_any(kind, getattr(pt, f"{kind}_nbox"),
                      getattr(pt, f"{kind}_nmeta"),
                      getattr(pt, f"{kind}_chunks"), om, dm, pack,
                      max_t, interpret, getattr(pt, f"{kind}_leaf_chunks"))
        return jnp.maximum(occ, o)

    if pt.has_tri:
        occ = one_type("tri", occ)
    if pt.has_sph:
        occ = one_type("sph", occ)
    occ = occ[:R] > 0.5
    if perm is not None:
        occ = occ[jnp.argsort(perm)]

    from ..ops.intersect import (_box_t, _plane_t, _sphere_t, _triangle_t,
                                 _typed_any)

    if not pt.has_tri and prims.n_tri > 0:
        occ = _typed_any(_triangle_t, prims.tri_p, prims.tri_ids,
                         rays.origin, rays.direction, 2048, occ, max_t)
    if not pt.has_sph and prims.n_sph > 0:
        occ = _typed_any(_sphere_t, prims.sph_p, prims.sph_ids,
                         rays.origin, rays.direction, 2048, occ, max_t)
    if prims.n_pl > 0:
        occ = _typed_any(_plane_t, prims.pl_p, prims.pl_ids,
                         rays.origin, rays.direction, 2048, occ, max_t)
    if prims.n_box > 0:
        occ = _typed_any(_box_t, prims.box_p, prims.box_ids,
                         rays.origin, rays.direction, 2048, occ, max_t)
    return occ


def multi_supported(pt: PacketTables) -> bool:
    """Every tree'd type fits the fused flat multi-query kernel."""
    if pt is None:
        return False
    ok = pt.has_tri or pt.has_sph
    if pt.has_tri:
        ok &= (pt.tri_cbox is not None
               and pt.tri_chunks.shape[0] <= MULTI_MAX_CHUNKS)
    if pt.has_sph:
        ok &= (pt.sph_cbox is not None
               and pt.sph_chunks.shape[0] <= MULTI_MAX_CHUNKS)
    return bool(ok)


def packet_any_hit_multi(pt: PacketTables, prims: Primitives, origin,
                         dirs, max_t: float, dead=None,
                         interpret: bool | None = None):
    """L occlusion queries per ray in ONE fused kernel (see the design note
    above _make_flat_any_multi_kernel). ``origin`` [R,3] shared; ``dirs``
    a tuple of L [R,3] segment vectors (unnormalized light vectors, the
    reference's shadow convention); ``dead`` an optional tuple of L [R]
    bool masks. Returns [L, R] bool, elementwise equal to L separate
    packet_any_hit calls (tests/test_packets.py). Caller must check
    multi_supported(pt); types without trees fold densely per query."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _packet_any_hit_multi(pt, prims, origin, tuple(dirs),
                                 float(max_t),
                                 None if dead is None else tuple(dead),
                                 bool(interpret))


@functools.partial(jax.jit, static_argnames=("max_t", "interpret"))
def _packet_any_hit_multi(pt, prims, origin, dirs, max_t, dead, interpret):
    pt = jax.lax.stop_gradient(pt)
    origin = jax.lax.stop_gradient(origin)
    dirs = jax.lax.stop_gradient(dirs)
    L = len(dirs)
    R = origin.shape[0]
    pack = PACK
    opad = (-R) % pack
    oms = []
    dms = []
    for l in range(L):
        o, d = origin, dirs[l]
        if opad:
            o = jnp.concatenate([o, jnp.zeros((opad, 3), o.dtype)])
            d = jnp.concatenate(
                [d, jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], d.dtype),
                                     (opad, 3))])
        om, dm = _ray_lhs(o, d)
        om = _mark_valid(om, R)
        if dead is not None and dead[l] is not None:
            alive = ~dead[l]
            if opad:
                alive = jnp.concatenate([alive, jnp.zeros((opad,), bool)])
            om = om.at[:, 7].set(om[:, 7] * alive.astype(om.dtype))
        oms.append(om)
        dms.append(dm)

    occ = jnp.zeros((L, oms[0].shape[0]), jnp.float32)
    if pt.has_tri:
        occ = jnp.maximum(occ, _walk_any_multi(
            "tri", pt.tri_cbox, pt.tri_chunks, oms, dms, pack, max_t,
            interpret))
    if pt.has_sph:
        occ = jnp.maximum(occ, _walk_any_multi(
            "sph", pt.sph_cbox, pt.sph_chunks, oms, dms, pack, max_t,
            interpret))
    occ = occ[:, :R] > 0.5

    from ..ops.intersect import (_box_t, _plane_t, _sphere_t, _triangle_t,
                                 _typed_any)

    rows = []
    for l in range(L):
        o = occ[l]
        if not pt.has_tri and prims.n_tri > 0:
            o = _typed_any(_triangle_t, prims.tri_p, prims.tri_ids,
                           origin, dirs[l], 2048, o, max_t)
        if not pt.has_sph and prims.n_sph > 0:
            o = _typed_any(_sphere_t, prims.sph_p, prims.sph_ids,
                           origin, dirs[l], 2048, o, max_t)
        if prims.n_pl > 0:
            o = _typed_any(_plane_t, prims.pl_p, prims.pl_ids,
                           origin, dirs[l], 2048, o, max_t)
        if prims.n_box > 0:
            o = _typed_any(_box_t, prims.box_p, prims.box_ids,
                           origin, dirs[l], 2048, o, max_t)
        rows.append(o)
    return jnp.stack(rows)
