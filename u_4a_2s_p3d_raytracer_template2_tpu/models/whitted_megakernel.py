"""Scene-baked Whitted megakernel — the whole depth-D recursion tree in ONE
Pallas kernel, zero HBM intermediates.

Both XLA engines (models/whitted.py sweep, models/whitted_wavefront.py)
re-materialize tens of [R,·] buffers between fusion boundaries every level:
XLA's own cost model put the depth-4 mount frame at 22 GB of HBM traffic for
~4 GFLOP of math (measured 61.8 ms on v5e — purely bandwidth/scatter bound).
For scenes whose primitive count is small (the mount/balls_medium class —
the reference's primary benchmark scenes), the entire scene fits in
registers: this module unrolls the full static Whitted tree (SURVEY.md §3.3)
over the scene's primitives INSIDE one kernel, so a frame's HBM traffic is
exactly rays-in (6 f32) and color-out (3 f32) per pixel.

Design choices, all TPU-first:
  * Rays occupy both sublanes and lanes ([SUB, 128] f32 blocks) — every ALU
    lane does useful work; there is no [R, N_prims] buffer anywhere.
  * The scene (primitive params, per-primitive materials, lights, bg) is
    BAKED into the kernel as immediate constants — the direct analogue of
    the reference's own GLSL path tracer whose world is hardcoded in the
    shader (P3D_RT.glsl:12-180). Mosaic constant-folds and schedules the
    unrolled per-primitive tests back-to-back. One compile per scene,
    cached; camera/ray inputs stay dynamic.
  * The recursion (main.cpp:530-721) unrolls as a static preorder tree:
    reflection child descends inline, refraction child's throughput weight
    folds per the linear combine color = local + KR·spec·refl + (1-KR)·refr
    (main.cpp:719) — identical math to the wavefront engine's weights.
    Static material-population pruning (has_reflective/has_transmissive)
    prunes absent subtrees exactly like the XLA engines.

Scope: every RenderConfig at scene sizes up to BAKE_MAX_PRIMS — including
skybox-on-miss (scene.cpp:383-461 capability, BASELINE config #4), via the
DEFERRED-SKY scheme: the 6x2048^2 cubemap (288 MB f32) can neither bake as
immediates nor fit VMEM, and Mosaic has no per-lane dynamic texture gather —
but the Whitted combine is LINEAR in each node's miss color
(color = local + KR*spec*refl + (1-KR)*refr, main.cpp:719), so a miss node's
sky term enters the frame as weight(node) (x) sky(d_node), with weight the
product of the branch factors along the path (already computed in-kernel).
The kernel therefore shades misses black, records per tree node a [3]-vector
weight row-triple plus the node's ray direction triple ([6 rows, R] extra
output — ~24-90 f32/ray, a few MB/frame), and an XLA epilogue outside the
kernel does the cubemap gather (ops/shade.skybox_color, XLA's bread and
butter) and adds sum_i w_i (x) sky(d_i) before the final clamp. Elementwise
equality with the sweep engine is preserved by construction.

Stochastic features follow the
pt_megakernel pattern — sample VALUES are drawn OUTSIDE the kernel with the
exact ``jax.random`` split chain of the sweep engine (_draw_stream mirrors
trace_rays/_level_step/direct_lighting draw for draw, exploiting
``jax.random.split`` prefix stability) and stream in as [NU, R] rows, so
megakernel images stay ELEMENTWISE equal to the sweep under every config:
  * soft shadows without AA: the deterministic 4×4 light grid
    (main.cpp:601-618) runs as an in-kernel fori_loop per light;
  * soft shadows with AA: the jittered light offsets (main.cpp:621-624) are
    computed outside (they need the subpixel indices) and streamed;
  * fuzzy reflection: the unit-sphere perturbations (main.cpp:651-660)
    are streamed; the hemisphere accept test runs in-kernel;
  * fresnel/refraction parity modes bake as compile-time constants.

Semantics per node match ops/intersect.py's component forms (EPSILON
cutoffs, strict-< first-wins closest hit, shadow max_t=1 on unnormalized L,
spec×0.4, Schlick Fresnel with KR=1 on TIR, the reference's tangent-form
refraction direction) — pinned against the sweep engine by
tests/test_megakernel.py.
"""
from __future__ import annotations

import functools
import math

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import constants as C

_EPS = C.EPSILON

SUB = 64          # sublane rows per program: SUB*128 = 8192 rays/program
LANE = 128

# primitive-count ceiling for baking (compile time grows with prims x nodes;
# the PT kernel unrolls 105+ spheres at BAKE_MAX_SPHERES=256 — same budget)
BAKE_MAX_PRIMS = 256


def _rsqrt_safe(x):
    ok = x > 0.0
    return jnp.where(ok, jax.lax.rsqrt(jnp.where(ok, x, 1.0)), 0.0)


class _SceneConsts:
    """Host-side numpy snapshot of everything baked into the kernel."""

    def __init__(self, scene):
        prims = scene.prims
        params = np.asarray(prims.params)
        ptype = np.asarray(prims.ptype)
        mat_id = np.asarray(prims.mat_id)
        mats = scene.materials
        m = {k: np.asarray(getattr(mats, k))
             for k in ("diff_color", "kd", "spec_color", "ks", "shine",
                       "transmit", "ior")}
        # type-grouped order = the chunked path's cross-type tie order
        order = []
        for code in (C.TRIANGLE, C.SPHERE, C.PLANE, C.AABOX):
            order += [i for i in range(scene.n_objects) if ptype[i] == code]
        self.objs = []
        for i in order:
            mi = mat_id[i]
            self.objs.append(dict(
                ptype=int(ptype[i]),
                p=[float(x) for x in params[i]],
                diff=[float(x) for x in m["diff_color"][mi]],
                spec=[float(x) for x in m["spec_color"][mi]],
                kd=float(m["kd"][mi]), ks=float(m["ks"][mi]),
                shine=float(m["shine"][mi]),
                transmit=float(m["transmit"][mi]),
                ior=float(m["ior"][mi]),
            ))
        self.lights = [([float(x) for x in np.asarray(scene.lights.position)[i]],
                        [float(x) for x in np.asarray(scene.lights.color)[i]])
                       for i in range(scene.n_lights)]
        self.bg = [float(x) for x in np.asarray(scene.bg_color)]
        self.has_refl = bool(scene.has_reflective)
        self.has_refr = bool(scene.has_transmissive)
        self.has_sky = bool(scene.has_skybox)
        self.n = scene.n_objects


def _prim_test(obj, o, d, quad, inv):
    """(t, normal_at_hit, hit_ok) for one baked primitive on [SUB,LANE]
    blocks. Normals follow ops/intersect.per_ray_normal semantics."""
    ox, oy, oz = o
    dx, dy, dz = d
    p = obj["p"]
    t_kind = obj["ptype"]
    if t_kind == C.SPHERE:
        # direct (o-c) form, matching ops/intersect._sphere_t_one (robust
        # against the factored form's catastrophic cancellation; the
        # reference computes it this way too, scene.cpp:149-172)
        cx, cy, cz, r = p[0], p[1], p[2], p[3]
        a = quad[0]
        lx = ox - cx
        ly = oy - cy
        lz = oz - cz
        b = 2.0 * (dx * lx + dy * ly + dz * lz)
        cc = lx * lx + ly * ly + lz * lz - r * r
        delta = b * b - 4.0 * a * cc
        pos = delta > 0.0
        sq = jnp.sqrt(jnp.where(pos, delta, 1.0)) * pos
        t0 = (-b - sq) / (2.0 * a)
        t1 = (-b + sq) / (2.0 * a)
        lo = jnp.minimum(t0, t1)
        hi = jnp.maximum(t0, t1)
        t = jnp.where(lo < 0.0, hi, lo)
        ok = pos & (t >= 0.0)
        # normal = (p - c)/r with the sign of the actual distance (normalize)
        px_ = ox + dx * t - cx
        py_ = oy + dy * t - cy
        pz_ = oz + dz * t - cz
        inv_n = _rsqrt_safe(px_ * px_ + py_ * py_ + pz_ * pz_)
        return t, (px_ * inv_n, py_ * inv_n, pz_ * inv_n), ok
    if t_kind == C.TRIANGLE:
        v0x, v0y, v0z = p[0], p[1], p[2]
        e1x, e1y, e1z = p[3], p[4], p[5]
        e2x, e2y, e2z = p[6], p[7], p[8]
        nx_, ny_, nz_ = p[9], p[10], p[11]
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
        full = jnp.full_like(t, 1.0)
        return t, (nx_ * full, ny_ * full, nz_ * full), ok
    if t_kind == C.PLANE:
        pnx, pny, pnz, dd = p[0], p[1], p[2], p[3]
        denom = dx * pnx + dy * pny + dz * pnz
        ok = jnp.abs(denom) > _EPS
        t = -(ox * pnx + oy * pny + oz * pnz + dd) / jnp.where(ok, denom, 1.0)
        ok &= t > 0.0
        full = jnp.full_like(t, 1.0)
        return t, (pnx * full, pny * full, pnz * full), ok
    # AABOX — slab test + entry/exit face normal (scene.cpp:198-283)
    t_in = None
    t_out = None
    tmins = []
    tmaxs = []
    for ax in range(3):
        iv = inv[ax]
        lo = (p[ax] - o[ax]) * iv
        hi = (p[3 + ax] - o[ax]) * iv
        pos = iv >= 0.0
        tmin = jnp.where(pos, lo, hi)
        tmax = jnp.where(pos, hi, lo)
        tmins.append(tmin)
        tmaxs.append(tmax)
        t_in = tmin if t_in is None else jnp.maximum(t_in, tmin)
        t_out = tmax if t_out is None else jnp.minimum(t_out, tmax)
    ok = (t_in < t_out) & (t_out > _EPS)
    use_in = t_in > _EPS
    t = jnp.where(use_in, t_in, t_out)
    ncols = []
    for ax in range(3):
        on_in = tmins[ax] >= t_in
        on_out = tmaxs[ax] <= t_out
        s_in = jnp.where(tmins[ax] < 0, -1.0, 1.0)
        s_out = jnp.where(tmaxs[ax] < 0, -1.0, 1.0)
        ncols.append(jnp.where(use_in, jnp.where(on_in, s_in, 0.0),
                               jnp.where(on_out, s_out, 0.0)))
    return t, tuple(ncols), ok


def _closest(consts, o, d, quad, inv):
    """Unrolled closest hit: fold (t, hit, normal, material fields)."""
    t_b = jnp.full_like(o[0], C.BIG)
    hit_b = jnp.zeros_like(o[0], bool)
    zero = jnp.zeros_like(o[0])
    n_b = [zero, zero, zero]
    mat_b = dict(diff=[zero] * 3, spec=[zero] * 3, kd=zero, ks=zero,
                 shine=zero, transmit=zero, ior=zero)
    for obj in consts.objs:
        t, n, ok = _prim_test(obj, o, d, quad, inv)
        t = jnp.where(ok, t, C.BIG)
        better = t < t_b
        t_b = jnp.where(better, t, t_b)
        hit_b = hit_b | (better & ok)
        for ax in range(3):
            n_b[ax] = jnp.where(better, n[ax], n_b[ax])
            mat_b["diff"][ax] = jnp.where(better, obj["diff"][ax],
                                          mat_b["diff"][ax])
            mat_b["spec"][ax] = jnp.where(better, obj["spec"][ax],
                                          mat_b["spec"][ax])
        for k in ("kd", "ks", "shine", "transmit", "ior"):
            mat_b[k] = jnp.where(better, obj[k], mat_b[k])
    return t_b, hit_b, n_b, mat_b


def _occluded(consts, o, d, quad, inv, max_t):
    occ = jnp.zeros_like(o[0], bool)
    for obj in consts.objs:
        t, _, ok = _prim_test(obj, o, d, quad, inv)
        occ |= ok & (t < max_t)
    return occ


def _quad_inv(o, d, need_inv):
    ox, oy, oz = o
    dx, dy, dz = d
    quad = (dx * dx + dy * dy + dz * dz,
            dx * ox + dy * oy + dz * oz,
            ox * ox + oy * oy + oz * oz)
    inv = None
    if need_inv:
        inv = []
        for comp in d:
            tiny = jnp.abs(comp) < 1e-30
            sign = jnp.where(comp < 0.0, -1.0, 1.0)
            inv.append(jnp.where(tiny, sign * 1e30,
                                 1.0 / jnp.where(tiny, 1.0, comp)))
        inv = tuple(inv)
    return quad, inv


def _stream_layout(consts, cfg):
    """Static row assignment for the streamed sample values.

    Returns (n_rows, rowmap) with rowmap keys:
      ("shadow", lvl, path, li) -> (row_jx, row_jy)   soft shadows + AA
      ("fuzzy", lvl, path)      -> (r0, r1, r2)       fuzzy reflection
    The (lvl, path) node coordinates follow the sweep's interleave layout
    (slot = ray*W + path, refl child bit 0 / refr bit 1 when both spawn).
    """
    rowmap = {}
    n = 0
    soft_jit = cfg.soft_shadow and cfg.anti_aliasing
    fuzzy = cfg.fuzzy_reflection and consts.has_refl
    if not (soft_jit or fuzzy):
        return 0, rowmap
    has_sec = consts.has_refl or consts.has_refr
    branch = 2 if (consts.has_refl and consts.has_refr) else 1
    n_levels = cfg.max_depth if has_sec else 1
    w = 1
    for lvl in range(n_levels):
        spawn = has_sec and lvl < n_levels - 1
        for path in range(w):
            if soft_jit:
                for li in range(len(consts.lights)):
                    rowmap[("shadow", lvl, path, li)] = (n, n + 1)
                    n += 2
            if spawn and fuzzy:
                rowmap[("fuzzy", lvl, path)] = (n, n + 1, n + 2)
                n += 3
        if spawn:
            w *= branch
    return n, rowmap


def _sky_on(consts, cfg) -> bool:
    return bool(cfg.use_skybox and consts.has_sky)


def _sky_layout(consts, cfg):
    """Static slot assignment for the deferred-sky output (module doc).

    Along any root-to-leaf path of the recursion tree AT MOST ONE node's
    sky weight is nonzero (children spawn only on hit; a miss terminates
    the path), so entries on the same path can SHARE a 6-row slot — the
    kernel merges them with an exclusive accumulate. A minimum path cover
    of the tree has exactly branch^(n_levels-1) slots: ONE for
    reflective-only chains (4x fewer epilogue gather rows at depth 4 —
    the gather is row-count-bound), 8 for the full refl+refr depth-4 tree
    (1.9x fewer). Node (lvl, path) maps to the slot of the leftmost leaf
    below it. Returns (n_rows, {(lvl, path): slot_first_row})."""
    if not _sky_on(consts, cfg):
        return 0, {}
    has_sec = consts.has_refl or consts.has_refr
    branch = 2 if (consts.has_refl and consts.has_refr) else 1
    n_levels = cfg.max_depth if has_sec else 1
    rowmap = {}
    w = 1
    for lvl in range(n_levels):
        for path in range(w):
            slot = path * branch ** (n_levels - 1 - lvl)
            rowmap[(lvl, path)] = 6 * slot
        if has_sec and lvl < n_levels - 1:
            w *= branch
    n_slots = branch ** (n_levels - 1)
    return 6 * n_slots, rowmap


def _direct_light(consts, cfg, o, d, hp, precise, n, mat, hit, need_inv,
                  stream, node):
    """processLight over baked lights (main.cpp:471-526), plus the two
    soft-shadow variants (main.cpp:593-630)."""
    zero = jnp.zeros_like(o[0])
    col = [zero, zero, zero]
    # V = -d normalized
    vx, vy, vz = -d[0], -d[1], -d[2]
    iv = _rsqrt_safe(vx * vx + vy * vy + vz * vz)
    vx, vy, vz = vx * iv, vy * iv, vz * iv
    max_t = C.BIG if cfg.shadow_unbounded else 1.0

    soft_grid = cfg.soft_shadow and not cfg.anti_aliasing
    soft_jit = cfg.soft_shadow and cfg.anti_aliasing

    for li, (lpos, lcol) in enumerate(consts.lights):

        def one_sample(px_, py_, pz_, scale):
            """Blinn-Phong from light position (px_,py_,pz_); scalar or
            per-lane offsets both broadcast. Returns 3 masked components."""
            Lx = px_ - hp[0]
            Ly = py_ - hp[1]
            Lz = pz_ - hp[2]
            facing = (Lx * n[0] + Ly * n[1] + Lz * n[2]) > 0.0
            squad, sinv = _quad_inv(precise, (Lx, Ly, Lz), need_inv)
            occ = _occluded(consts, precise, (Lx, Ly, Lz), squad, sinv,
                            max_t)
            lit = hit & facing & ~occ
            il = _rsqrt_safe(Lx * Lx + Ly * Ly + Lz * Lz)
            lx, ly, lz = Lx * il, Ly * il, Lz * il
            hx, hy, hz = lx + vx, ly + vy, lz + vz
            ih = _rsqrt_safe(hx * hx + hy * hy + hz * hz)
            hx, hy, hz = hx * ih, hy * ih, hz * ih
            ndl = jnp.maximum(0.0, lx * n[0] + ly * n[1] + lz * n[2])
            vdn = jnp.maximum(0.0, hx * n[0] + hy * n[1] + hz * n[2])
            vdn_safe = jnp.where(vdn > 0.0, vdn, 1.0)
            spec_pow = jnp.where(vdn > 0.0, vdn_safe ** mat["shine"],
                                 jnp.where(mat["shine"] == 0.0, 1.0, 0.0))
            out = []
            for ax in range(3):
                contrib = (lcol[ax] * scale * mat["diff"][ax] * ndl
                           * mat["kd"]
                           + lcol[ax] * scale * mat["spec"][ax] * spec_pow
                           * (mat["ks"] * 0.4))
                out.append(jnp.where(lit, contrib, 0.0))
            return out

        if soft_grid:
            # deterministic 4x4 light grid, each sample 1/16 of the color
            # (main.cpp:601-618); a fori_loop keeps the unrolled code size
            # independent of the 16 samples
            distance = 0.5 / 4.0
            start = -distance * 0.5 * 4.0

            def body(k, carry, lpos=lpos, one_sample=one_sample):
                jj = (k % 4).astype(jnp.float32)
                ii = (k // 4).astype(jnp.float32)
                s = one_sample(lpos[0] + (start + jj * distance),
                               lpos[1] + (start + ii * distance),
                               lpos[2], 1.0 / 16.0)
                return (carry[0] + s[0], carry[1] + s[1], carry[2] + s[2])

            acc = jax.lax.fori_loop(0, 16, body, (zero, zero, zero))
            for ax in range(3):
                col[ax] = col[ax] + acc[ax]
        elif soft_jit:
            # jittered single sample; the offsets (which need the subpixel
            # indices and the sweep's RNG stream) are computed outside and
            # streamed per (node, light) (main.cpp:621-624)
            u_row, rowmap = stream
            rjx, rjy = rowmap[("shadow", node[0], node[1], li)]
            jx = u_row(rjx)
            jy = u_row(rjy)
            s = one_sample(lpos[0] + jx, lpos[1] + jy, lpos[2], 1.0)
            for ax in range(3):
                col[ax] = col[ax] + s[ax]
        else:
            s = one_sample(lpos[0], lpos[1], lpos[2], 1.0)
            for ax in range(3):
                col[ax] = col[ax] + s[ax]
    return col


def _node(consts, cfg, o, d, ior_in, depth, need_inv, stream, path,
          skymap=None):
    """One Whitted node, recursing statically into its children.
    Returns ([3] color block components (already bg-on-miss),
    sky entries [(first_row, w3, d3), ...] — empty unless deferred-sky)."""
    lvl = depth - 1
    quad, inv = _quad_inv(o, d, need_inv)
    t, hit, n, mat = _closest(consts, o, d, quad, inv)
    # reference normalizes the winner normal (main.cpp:587); folded normals
    # are unit except aaBox corner ties, one rsqrt covers all cases
    inn = _rsqrt_safe(n[0] * n[0] + n[1] * n[1] + n[2] * n[2])
    n = (n[0] * inn, n[1] * inn, n[2] * inn)
    t = jnp.where(hit, t, 1.0)
    hp = tuple(o[ax] + d[ax] * t for ax in range(3))
    precise = tuple(hp[ax] + n[ax] * _EPS for ax in range(3))

    local = _direct_light(consts, cfg, o, d, hp, precise, n, mat, hit,
                          need_inv, stream, (lvl, path))

    # deferred-sky: misses shade black in-kernel; this node's miss weight +
    # ray direction go to the epilogue's cubemap lookup (module doc)
    sky = []
    if skymap is not None:
        miss_w = jnp.where(hit, 0.0, 1.0)
        sky.append((skymap[(lvl, path)], [miss_w, miss_w, miss_w],
                    (d[0], d[1], d[2])))
        bg = (0.0, 0.0, 0.0)
    else:
        bg = consts.bg

    leaf = depth >= cfg.max_depth
    spawn_refl = (not leaf) and consts.has_refl
    spawn_refr = (not leaf) and consts.has_refr
    if leaf or not (spawn_refl or spawn_refr):
        # depth cap clamps local (main.cpp:632-634)
        out = []
        for ax in range(3):
            c = jnp.clip(local[ax], 0.0, 1.0) if leaf else local[ax]
            out.append(jnp.where(hit, c, bg[ax]))
        return out, sky

    branch = 2 if (consts.has_refl and consts.has_refr) else 1

    # flipped normal for secondary math (main.cpp:639-643)
    ddn = d[0] * n[0] + d[1] * n[1] + d[2] * n[2]
    inside = ddn > 0.0
    sgn = jnp.where(inside, -1.0, 1.0)
    nf = tuple(n[ax] * sgn for ax in range(3))
    dnf = ddn * sgn

    color = [jnp.where(hit, local[ax], bg[ax]) for ax in range(3)]

    # Fresnel KR (main.cpp:699-717) and refraction setup; the parity-mode
    # switches (RenderConfig.fresnel_mode / refraction_mode) bake as
    # compile-time constants
    if spawn_refr:
        ndv = -dnf  # dot(nf, V) with V = -d (d unit)
        vnx = nf[0] * ndv - (-d[0])
        vny = nf[1] * ndv - (-d[1])
        vnz = nf[2] * ndv - (-d[2])
        # viewtangent = viewnormal - V
        mior = jnp.where(mat["ior"] > 0.0, mat["ior"], 1.0)
        eta = jnp.where(inside, ior_in, ior_in / mior)
        cos_i = jnp.abs(ndv)
        vt2 = vnx * vnx + vny * vny + vnz * vnz
        sin_t = eta * jnp.sqrt(jnp.maximum(vt2, 1e-24))
        insq = 1.0 - sin_t * sin_t
        can = insq > 0.0
        it = _rsqrt_safe(jnp.maximum(vt2, 1e-24))
        new_ior = jnp.where(inside, 1.0, mior)
        if cfg.refraction_mode == "physical":
            # Snell's transmitted direction t̂·sinθt − n̂·cosθt, normalized
            # (ops/shade.refract mode "physical")
            cos_t = jnp.where(can, jnp.sqrt(jnp.where(can, insq, 1.0)), 0.0)
            rdx = vnx * it * sin_t - nf[0] * cos_t
            rdy = vny * it * sin_t - nf[1] * cos_t
            rdz = vnz * it * sin_t - nf[2] * cos_t
            irn = _rsqrt_safe(
                jnp.maximum(rdx * rdx + rdy * rdy + rdz * rdz, 1e-24))
            rdx, rdy, rdz = rdx * irn, rdy * irn, rdz * irn
        else:  # "reference": the shipped t̂·sinθt + n̂ (main.cpp:683-688)
            rdx = vnx * it * sin_t + nf[0]
            rdy = vny * it * sin_t + nf[1]
            rdz = vnz * it * sin_t + nf[2]
        refr_active = hit & (mat["transmit"] != 0.0) & can
        rdx = jnp.where(refr_active, rdx, 0.0)
        rdy = jnp.where(refr_active, rdy, 0.0)
        rdz = jnp.where(refr_active, rdz, 1.0)
        if cfg.fresnel_mode == "reference_exact":
            # the dead int-division branch: KR = 0 always (main.cpp:711)
            kr_t = jnp.zeros_like(cos_i)
        else:
            r0 = ((ior_in - new_ior) / (ior_in + new_ior)) ** 2
            schlick = r0 + (1.0 - r0) * (1.0 - cos_i) ** 5
            tir = 1.0 if cfg.fresnel_mode == "schlick" else 0.0
            kr_t = jnp.where(can, schlick, tir)
        kr = jnp.where(mat["transmit"] != 0.0, kr_t, mat["ks"])
    else:
        kr = mat["ks"]

    if spawn_refl:
        # mirror direction (main.cpp:646-667); unit since d unit, nf unit
        rx = d[0] - 2.0 * nf[0] * dnf
        ry = d[1] - 2.0 * nf[1] * dnf
        rz = d[2] - 2.0 * nf[2] * dnf
        irr = _rsqrt_safe(rx * rx + ry * ry + rz * rz)
        rx, ry, rz = rx * irr, ry * irr, rz * irr
        if cfg.fuzzy_reflection:
            # streamed unit-sphere perturbation; hemisphere accept test
            # in-kernel (ops/shade.fuzzy_reflect_dir, main.cpp:651-660)
            u_row, rowmap = stream
            s0r, s1r, s2r = rowmap[("fuzzy", lvl, path)]
            fx = rx + cfg.roughness * u_row(s0r)
            fy = ry + cfg.roughness * u_row(s1r)
            fz = rz + cfg.roughness * u_row(s2r)
            ifn = _rsqrt_safe(fx * fx + fy * fy + fz * fz)
            fx, fy, fz = fx * ifn, fy * ifn, fz * ifn
            keep = (fx * nf[0] + fy * nf[1] + fz * nf[2]) > 0.0
            rx = jnp.where(keep, fx, rx)
            ry = jnp.where(keep, fy, ry)
            rz = jnp.where(keep, fz, rz)
        refl_col, refl_sky = _node(consts, cfg, precise, (rx, ry, rz),
                                   ior_in, depth + 1, need_inv, stream,
                                   path * branch, skymap)
        w = hit & (mat["ks"] > 0.0)
        for ax in range(3):
            color[ax] = color[ax] + jnp.where(
                w, refl_col[ax] * kr * mat["spec"][ax], 0.0)
        # fold this node's branch factor into the child's sky weights
        for row, sw, sd in refl_sky:
            sky.append((row,
                        [jnp.where(w, sw[ax] * kr * mat["spec"][ax], 0.0)
                         for ax in range(3)], sd))

    if spawn_refr:
        ro = tuple(hp[ax] + (rdx, rdy, rdz)[ax] * 0.001 for ax in range(3))
        refr_col, refr_sky = _node(consts, cfg, ro, (rdx, rdy, rdz),
                                   new_ior, depth + 1, need_inv, stream,
                                   path * branch + (1 if branch == 2 else 0),
                                   skymap)
        for ax in range(3):
            color[ax] = color[ax] + jnp.where(
                refr_active, refr_col[ax] * (1.0 - kr), 0.0)
        for row, sw, sd in refr_sky:
            sky.append((row,
                        [jnp.where(refr_active, sw[ax] * (1.0 - kr), 0.0)
                         for ax in range(3)], sd))

    return color, sky


def _merge_sky(sky):
    """Exclusive-accumulate sky entries sharing a path-cover slot (see
    _sky_layout): weights add (at most one is nonzero per lane), the nonzero
    entry's direction wins. Returns {first_row: ([w3], [d3])}. Shared by the
    baked kernel, the operand-streamed kernel, and its XLA twin
    (models/whitted_streamed.py)."""
    merged = {}
    for row, sw, sd in sky:
        if row not in merged:
            merged[row] = (list(sw), list(sd))
        else:
            w0, d0 = merged[row]
            nz = (sw[0] + sw[1] + sw[2]) > 0.0
            merged[row] = (
                [w0[ax] + sw[ax] for ax in range(3)],
                [jnp.where(nz, sd[ax], d0[ax]) for ax in range(3)],
            )
    return merged


def _build_kernel(consts: _SceneConsts, cfg):
    need_inv = any(ob["ptype"] == C.AABOX for ob in consts.objs)
    n_rows, rowmap = _stream_layout(consts, cfg)
    n_sky, skymap = _sky_layout(consts, cfg)

    def kernel(*refs):
        i = 0
        ox, oy, oz, dx, dy, dz = refs[0:6]
        i = 6
        uni = None
        if n_rows:
            uni = refs[i]
            i += 1
        r_out, g_out, b_out = refs[i:i + 3]
        sky_out = refs[i + 3] if n_sky else None

        o = (ox[:], oy[:], oz[:])
        d = (dx[:], dy[:], dz[:])
        stream = ((lambda r: uni[r]), rowmap) if n_rows else None
        col, sky = _node(consts, cfg, o, d, jnp.ones_like(o[0]), 1,
                         need_inv, stream, 0, skymap if n_sky else None)
        if n_sky:
            merged = _merge_sky(sky)
            for row, (sw, sd) in merged.items():
                for ax in range(3):
                    sky_out[row + ax] = sw[ax]
                    sky_out[row + 3 + ax] = sd[ax]
            # UNclamped: the epilogue adds the sky terms, then clamps
            r_out[:] = col[0]
            g_out[:] = col[1]
            b_out[:] = col[2]
        else:
            r_out[:] = jnp.clip(col[0], 0.0, 1.0)
            g_out[:] = jnp.clip(col[1], 0.0, 1.0)
            b_out[:] = jnp.clip(col[2], 0.0, 1.0)

    return kernel, n_rows, n_sky


def supports(scene, cfg) -> bool:
    """Configs/scenes the baked megakernel can serve (see module doc):
    every RenderConfig — skybox-on-miss included (deferred-sky scheme) — up
    to BAKE_MAX_PRIMS primitives."""
    return scene.n_objects <= BAKE_MAX_PRIMS


@functools.lru_cache(maxsize=8)
def _trace_fn_cached(consts_key, cfg, interpret):
    consts, = consts_key  # unwrap the singleton holder

    kernel, n_rows, n_sky = _build_kernel(consts, cfg)
    spec = pl.BlockSpec((SUB, LANE), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    uspec = pl.BlockSpec((max(n_rows, 1), SUB, LANE), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM)
    skyspec = pl.BlockSpec((max(n_sky, 1), SUB, LANE), lambda i: (0, i, 0),
                           memory_space=pltpu.VMEM)

    @jax.jit
    def trace(o, d, uni=None, skybox=None):
        """o, d: [R,3]; uni: [n_rows, R] streamed sample values (only when
        the (scene, cfg) has stochastic features — see _stream_layout);
        skybox: [6, H, W, 3] cubemap (only in deferred-sky mode)."""
        R = o.shape[0]
        pad = (-R) % (SUB * LANE)
        if pad:
            o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
            d = jnp.concatenate(
                [d, jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], d.dtype),
                                     (pad, 3))])
            if n_rows:
                uni = jnp.concatenate(
                    [uni, jnp.zeros((n_rows, pad), uni.dtype)], axis=-1)
        rows = o.shape[0] // LANE
        cols = [a.reshape(rows, LANE) for a in
                (o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2])]
        extra = [uni.reshape(n_rows, rows, LANE)] if n_rows else []
        out_shape = [jax.ShapeDtypeStruct((rows, LANE), jnp.float32)
                     for _ in range(3)]
        out_specs = [spec, spec, spec]
        if n_sky:
            out_shape.append(
                jax.ShapeDtypeStruct((n_sky, rows, LANE), jnp.float32))
            out_specs.append(skyspec)
        outs = pl.pallas_call(
            kernel,
            grid=(rows // SUB,),
            in_specs=[spec] * 6 + ([uspec] if n_rows else []),
            out_specs=tuple(out_specs),
            out_shape=tuple(out_shape),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(*cols, *extra)
        color = jnp.stack([a.reshape(-1) for a in outs[:3]], -1)
        if n_sky:
            # deferred-sky epilogue (module doc): one batched cubemap gather
            # over every node's recorded miss direction, weighted add, clamp.
            # XLA's TPU gather is element-count bound (~2.5 ns/element), so
            # u8 cubemaps ride the packed-u32 path: 1 gathered element per
            # texel instead of 3 (bit-identical colors; ops/shade).
            # This EXACT form is the measured optimum — r5 re-litigated it
            # on device (tools/bench_r5.py parts s/c, balls_low 16-sample
            # distribution frame): raw-u8 3-channel rows 84.7 ms, +gather
            # barriers 83.3 ms, plane-wise unpack with per-entry gathers
            # 125.8 ms, vs 77.9 ms for this packed+stacked form. Isolated
            # op timings said otherwise (u8 2.05 ms vs packed 3.86 ms per
            # 262k rows) — in-frame fusion context dominates; A/B whole
            # frames before believing an op-level lever.
            from ..ops.shade import skybox_color, skybox_color_packed

            sk = outs[3].reshape(n_sky // 6, 6, rows * LANE)
            w = sk[:, 0:3].transpose(0, 2, 1)            # [E, Rpad, 3]
            dv = sk[:, 3:6].transpose(0, 2, 1)           # [E, Rpad, 3]
            lookup = skybox_color_packed if skybox.ndim == 3 else skybox_color
            rgb = lookup(skybox, dv.reshape(-1, 3))
            color = color + (w * rgb.reshape(w.shape)).sum(axis=0)
            color = jnp.clip(color, 0.0, 1.0)
        return color[:R]

    return trace


def _draw_stream(consts, cfg, R, ktrace, shadow_offsets):
    """[n_rows, R] streamed sample values, mirroring trace_rays' exact
    ``jax.random`` split chain (models/whitted.py) so megakernel images are
    ELEMENTWISE equal to the sweep's under stochastic configs.

    Chain per level (trace_rays → _level_step → direct_lighting):
      key, sub = split(key)            # trace_rays loop
      lkey, klight = split(sub)        # _level_step
      per light (soft+AA): klight, s2 = split(klight); r2 = uniform(s2)
      (spawn & fuzzy): lkey, kf = split(lkey); s = sample_unit_sphere(kf)
    Level-l draws have shape [R·W_l]; slot = ray·W_l + path (the sweep's
    interleave layout), so column `path` of the [R, W_l] reshape is the
    node's row.
    """
    from ..ops.sampling import sample_unit_sphere

    n_rows, rowmap = _stream_layout(consts, cfg)
    if n_rows == 0:
        return None
    vals = [None] * n_rows
    soft_jit = cfg.soft_shadow and cfg.anti_aliasing
    fuzzy = cfg.fuzzy_reflection and consts.has_refl
    spp = max(cfg.spp, 1)
    ox, oy = shadow_offsets if shadow_offsets is not None else (0.0, 0.0)
    has_sec = consts.has_refl or consts.has_refr
    branch = 2 if (consts.has_refl and consts.has_refr) else 1
    n_levels = cfg.max_depth if has_sec else 1

    key = ktrace
    w = 1
    for lvl in range(n_levels):
        key, sub = jax.random.split(key)
        lkey, klight = jax.random.split(sub)
        spawn = has_sec and lvl < n_levels - 1
        if soft_jit:
            kk = klight
            for li in range(len(consts.lights)):
                kk, s2 = jax.random.split(kk)
                r2 = jax.random.uniform(s2, (R * w, 2), jnp.float32)
                jx = (0.5 * ((ox + r2[:, 0]) / spp)).reshape(R, w)
                jy = (0.5 * ((oy + r2[:, 1]) / spp)).reshape(R, w)
                for path in range(w):
                    rjx, rjy = rowmap[("shadow", lvl, path, li)]
                    vals[rjx] = jx[:, path]
                    vals[rjy] = jy[:, path]
        if spawn and cfg.fuzzy_reflection:
            lkey, kf = jax.random.split(lkey)
            if fuzzy:
                s = sample_unit_sphere(kf, (R * w,)).reshape(R, w, 3)
                for path in range(w):
                    r0, r1, r2_ = rowmap[("fuzzy", lvl, path)]
                    vals[r0] = s[:, path, 0]
                    vals[r1] = s[:, path, 1]
                    vals[r2_] = s[:, path, 2]
        if spawn:
            w *= branch
    return jnp.stack(vals)


class _ConstsKey:
    """Hashable singleton wrapper so lru_cache can key on scene identity."""

    def __init__(self, consts, token):
        self.consts = consts
        self.token = token

    def __hash__(self):
        return hash(self.token)

    def __eq__(self, other):
        return isinstance(other, _ConstsKey) and self.token == other.token

    def __iter__(self):  # unwrap via consts, = key
        yield self.consts


def _consts_token(consts: _SceneConsts) -> tuple:
    """Value digest of everything baked — safe cache key across scenes."""
    import hashlib

    h = hashlib.sha1()
    for ob in consts.objs:
        h.update(repr((ob["ptype"], ob["p"], ob["diff"], ob["spec"],
                       ob["kd"], ob["ks"], ob["shine"], ob["transmit"],
                       ob["ior"])).encode())
    h.update(repr((consts.lights, consts.bg, consts.has_refl,
                   consts.has_refr, consts.has_sky)).encode())
    return (h.hexdigest(),)


def trace_rays_megakernel(scene, cfg, interpret: bool = False):
    """Returns trace(o, d) -> [R,3] color for the baked (scene, cfg).

    Bakes the scene's current host values; re-call after mutating the scene.
    """
    consts = _SceneConsts(scene)
    return _trace_fn_cached(_ConstsKey(consts, _consts_token(consts)), cfg,
                            interpret)


# ---------------------------------------------------------------------------
# tile renderer (the render_tile equivalent for the baked engine)


def make_render_tile(scene, cfg, interpret: bool = False):
    """Jitted (px, py, key) -> [R,3] tile renderer over the baked kernel.

    Mirrors models/whitted.render_tile's pixel semantics (center +0.5, the
    spp x spp jittered AA scan with the /16 quirk switch, DoF/motion-blur
    ray generation) — the stochastic pieces all live OUTSIDE the kernel.
    """
    import dataclasses

    from ..ops.camera import primary_rays

    consts = _SceneConsts(scene)
    trace = _trace_fn_cached(_ConstsKey(consts, _consts_token(consts)), cfg,
                             interpret)
    n_rows, _ = _stream_layout(consts, cfg)
    camera = scene.camera
    # the cubemap rides as an explicit jit argument (NOT a closure capture:
    # a captured 288 MB device array would lower as an XLA constant); u8
    # cubemaps are packed to one u32 per texel ONCE here — the epilogue
    # gathers one row per texel and unpacks plane-wise (see epilogue note;
    # the raw-u8 3-channel row gather was A/B'd in-frame and lost)
    sky_operand = None
    if _sky_on(consts, cfg):
        sky_operand = scene.skybox
        if jnp.issubdtype(jnp.asarray(sky_operand).dtype, jnp.integer):
            from ..ops.shade import pack_skybox_u32

            sky_operand = pack_skybox_u32(sky_operand)

    def _trace(rays, ktrace, offsets, skybox):
        if n_rows:
            uni = _draw_stream(consts, cfg, rays.origin.shape[0], ktrace,
                               offsets)
            return trace(rays.origin, rays.direction, uni, skybox)
        return trace(rays.origin, rays.direction, None, skybox)

    @jax.jit
    def tile_inner(px, py, key, skybox):
        if not cfg.anti_aliasing:
            # same 3-way split as the sweep's render_tile so kcam/ktrace
            # (DoF lens draws, stream chain) are IDENTICAL to the sweep's
            key, kcam, ktrace = jax.random.split(key, 3)
            rays = primary_rays(camera, px + 0.5, py + 0.5, kcam,
                                depth_of_field=cfg.depth_of_field,
                                motion_blur=cfg.motion_blur)
            return _trace(rays, ktrace, None, skybox)

        spp = max(cfg.spp, 1)
        R = px.shape[0]
        ij = jnp.array(
            [(float(i), float(j)) for i in range(spp) for j in range(spp)],
            jnp.float32)
        keys = jax.random.split(key, spp * spp)

        def body(acc, inp):
            (i, j), k = inp
            kj, kcam, ktrace = jax.random.split(k, 3)
            r2 = jax.random.uniform(kj, (R, 2), jnp.float32)
            rays = primary_rays(camera, px + (i + r2[:, 0]) / spp,
                                py + (j + r2[:, 1]) / spp, kcam,
                                depth_of_field=cfg.depth_of_field,
                                motion_blur=cfg.motion_blur)
            # (i, j) are the reference's global subpixel indices feeding
            # the jittered soft-shadow offsets (main.cpp:779-780)
            return acc + _trace(rays, ktrace, (i, j), skybox), None

        acc, _ = jax.lax.scan(body, jnp.zeros((R, 3), jnp.float32),
                              (ij, keys))
        denom = 16.0 if cfg.reference_aa_div16 else float(spp * spp)
        return acc / denom

    def tile(px, py, key):
        return tile_inner(px, py, key, sky_operand)

    # exposed for callers that jit/loop AROUND the tile (bench timing loops):
    # tracing `tile` inside another jit would capture the cubemap closure as
    # an XLA constant (a 288 MB compile payload — the remote-compile tunnel
    # rejects it outright with HTTP 413); `tile.inner(px, py, key, skybox)`
    # keeps it a runtime operand instead.
    tile.inner = tile_inner
    tile.sky_operand = sky_operand
    return tile
