"""Scene-baked Monte Carlo path-tracer megakernel — the whole bounce loop
(P3D_RT.glsl:236-282 rayColor) in ONE Pallas kernel, zero HBM intermediates.

The XLA integrator (models/pathtracer.ray_color) re-materializes [R, N]
buffers for every hit_world call — 4 per bounce (closest + 3 shadow feelers)
× ~15 arrays × [262k, 104+] each at 512², tens of GB of HBM traffic per
frame for a few GFLOP of math: the same bandwidth-bound shape that cost the
Whitted wavefront engine 61.8 ms (models/whitted_megakernel.py module doc).
Here the world — the GLSL template hardcodes it in the shader
(P3D_RT.glsl:12-180), our glsl_world() regenerates it bit-exactly — is BAKED
into the kernel as immediate constants and the full bounce loop runs on
[SUB, 128] ray blocks in registers/VMEM. Per-frame HBM traffic is exactly
rays in (7 f32: origin, direction, shutter time), pre-drawn uniforms in
(11·B f32, see below), and color out (3 f32).

Randomness: raw U[0,1) draws happen OUTSIDE the kernel with ``jax.random``
(models/pathtracer.draw_uniforms) and stream in as a [B·11, SUB, LANE]
block; the kernel applies the exact closed-form transforms of
ops/sampling.py. That keeps the kernel deterministic given its inputs and
makes it the draw-for-draw twin of pathtracer.ray_color_presampled — parity
is testable elementwise, not statistically (tests/test_pt_megakernel.py).

TPU-first design notes:
  * Bounces run as a ``while_loop`` that exits as soon as EVERY lane in the
    block is dead (absorbed/missed to sky) — sky-heavy blocks stop after 2-3
    of the 10 GLSL bounces, a real win the masked XLA fori_loop cannot have.
  * Per-primitive tests unroll over the baked world (~105 spheres + ground
    triangles); the closest-hit fold carries the winner's shading fields
    (center-or-normal, material) so no gather ever happens.
  * Shadow feelers are OR-folds bounded by the light distance — the any-hit
    capability (grid.cpp:313-361 analogue) inside the kernel.

Semantics mirror models/pathtracer.py line for line: GLSL half-b sphere
quadratic with the c>0 && b>0 reject (common.glsl:427-506), the GLSL
triangle test WITHOUT the u+v<=1 guard (common.glsl:335-380 quirk),
lerped-center moving spheres, per-type Blinn-Phong direct light constants
(P3D_RT.glsl:201-219), scatter incl. Beer's law on the refracted branch
only and the non-renormalized fuzzy metal (common.glsl:216-324), optional
Russian roulette (P3D_RT.glsl:265-271), and the shadow-feeler length quirk
switch (PTConfig.reference_shadow_len1).
"""
from __future__ import annotations

import functools
import hashlib

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import constants as C
from ..ops.sampling import TWO_PI
from .pathtracer import MT_DIELECTRIC, MT_DIFFUSE, MT_METAL, N_UNIFORMS

T_MIN = 1e-3
T_MAX = 1e4  # P3D_RT.glsl:243
_EPS = 1e-3  # common.glsl:2

SUB = 64
LANE = 128

# bake ceilings: compile time grows with the unrolled primitive count
BAKE_MAX_SPHERES = 256
BAKE_MAX_TRIS = 16
BAKE_MAX_LIGHTS = 8


class _PTConsts:
    """Host-side numpy snapshot of the PTScene baked into the kernel."""

    def __init__(self, scene):
        mats = scene.materials
        mtype = np.asarray(mats.mtype)
        alb = np.asarray(mats.albedo)
        spec = np.asarray(mats.spec_color)
        rough = np.asarray(mats.roughness)
        ridx = np.asarray(mats.ref_idx)
        refr = np.asarray(mats.refract_color)

        def mat(mi):
            return dict(
                mtype=int(mtype[mi]),
                albedo=[float(x) for x in alb[mi]],
                spec=[float(x) for x in spec[mi]],
                rough=float(rough[mi]),
                ref_idx=float(ridx[mi]),
                refract=[float(x) for x in refr[mi]],
            )

        c0 = np.asarray(scene.sp_center0)
        c1 = np.asarray(scene.sp_center1)
        rad = np.asarray(scene.sp_radius)
        st0 = np.asarray(scene.sp_time0)
        st1 = np.asarray(scene.sp_time1)
        smat = np.asarray(scene.sp_mat)
        self.spheres = []
        for i in range(rad.shape[0]):
            if rad[i] == 0.0:          # padding rows never hit
                continue
            span = float(st1[i] - st0[i])
            self.spheres.append(dict(
                c0=[float(x) for x in c0[i]],
                dc=[float(x) for x in (c1[i] - c0[i])],
                moving=bool(np.any(c1[i] != c0[i])) and span != 0.0,
                t0=float(st0[i]), inv_span=(1.0 / span) if span else 0.0,
                r=float(rad[i]), **mat(int(smat[i]))))

        tv0 = np.asarray(scene.tri_v0)
        te1 = np.asarray(scene.tri_e1)
        te2 = np.asarray(scene.tri_e2)
        tmat = np.asarray(scene.tri_mat)
        self.tris = []
        for i in range(tmat.shape[0]):
            n = np.cross(te1[i], te2[i])
            nn = float(np.linalg.norm(n))
            if nn == 0.0:              # degenerate padding rows
                continue
            self.tris.append(dict(
                v0=[float(x) for x in tv0[i]],
                e1=[float(x) for x in te1[i]],
                e2=[float(x) for x in te2[i]],
                n=[float(x) for x in (n / nn)], **mat(int(tmat[i]))))

        self.lights = [([float(x) for x in np.asarray(scene.light_pos)[i]],
                        [float(x) for x in np.asarray(scene.light_color)[i]])
                       for i in range(np.asarray(scene.light_pos).shape[0])]

    def token(self) -> str:
        h = hashlib.sha1()
        h.update(repr((self.spheres, self.tris, self.lights)).encode())
        return h.hexdigest()


def supports(scene) -> bool:
    consts = _PTConsts(scene)
    return (len(consts.spheres) <= BAKE_MAX_SPHERES
            and len(consts.tris) <= BAKE_MAX_TRIS
            and len(consts.lights) <= BAKE_MAX_LIGHTS)


# ---------------------------------------------------------------------------
# componentwise helpers (mirroring core/types + ops/sampling forms)


def _rsqrt_pos(x):
    ok = x > 0.0
    return jnp.where(ok, jax.lax.rsqrt(jnp.where(ok, x, 1.0)), 0.0)


def _normalize3(x, y, z):
    """core/types.normalize: zero vectors map to zero."""
    inv = _rsqrt_pos(x * x + y * y + z * z)
    return x * inv, y * inv, z * inv


def _cbrt01(u):
    """cbrt on [0,1) via exp/log (Mosaic has no cbrt lowering); exact 0 at 0."""
    ok = u > 0.0
    return jnp.where(
        ok, jnp.exp(jnp.log(jnp.where(ok, u, 1.0)) * (1.0 / 3.0)), 0.0)


def _unit_sphere(u1, u2, u3):
    """ops/sampling.unit_sphere_from_uniforms, componentwise."""
    x = u1 * 2.0 - 1.0
    phi = u2 * TWO_PI
    r = _cbrt01(u3)
    s = jnp.sqrt(jnp.maximum(1.0 - x * x, 0.0))
    return r * s * jnp.sin(phi), r * s * jnp.cos(phi), r * x


def _pow_const(x, n: int):
    """x**n for the two shininess constants via squaring (exact, no log(0))."""
    out = None
    bit = x
    while n:
        if n & 1:
            out = bit if out is None else out * bit
        n >>= 1
        bit = bit * bit
    return out


# ---------------------------------------------------------------------------
# baked world tests


def _sphere_t(sph, o, d, time, t_max):
    """GLSL half-b quadratic (common.glsl:427-506), mirroring _hit_spheres.
    Returns (t, ok, center3)."""
    if sph["moving"]:
        frac = (time - sph["t0"]) * sph["inv_span"]
        c = tuple(sph["c0"][ax] + sph["dc"][ax] * frac for ax in range(3))
    else:
        c = tuple(sph["c0"])  # scalar immediates — no per-sphere arrays
    Lx = o[0] - c[0]
    Ly = o[1] - c[1]
    Lz = o[2] - c[2]
    b = Lx * d[0] + Ly * d[1] + Lz * d[2]
    cc = Lx * Lx + Ly * Ly + Lz * Lz - sph["r"] * sph["r"]
    reject = (cc > 0.0) & (b > 0.0)
    disc = b * b - cc
    ok = ~reject & (disc >= 0.0)
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0 = -b - sq
    t1 = -b + sq
    t = jnp.where(t0 < 0.0, t1, t0)
    ok &= (t > T_MIN) & (t < t_max)
    return t, ok, c


def _tri_t(tri, o, d, t_max):
    """GLSL MT without the u+v<=1 guard (common.glsl:335-380 quirk),
    mirroring _hit_triangles."""
    e1 = tri["e1"]
    e2 = tri["e2"]
    hx = d[1] * e2[2] - d[2] * e2[1]
    hy = d[2] * e2[0] - d[0] * e2[2]
    hz = d[0] * e2[1] - d[1] * e2[0]
    det = hx * e1[0] + hy * e1[1] + hz * e1[2]
    ok = jnp.abs(det) > 1e-7
    f = 1.0 / jnp.where(ok, det, 1.0)
    sx = o[0] - tri["v0"][0]
    sy = o[1] - tri["v0"][1]
    sz = o[2] - tri["v0"][2]
    u = f * (sx * hx + sy * hy + sz * hz)
    ok &= (u >= 0.0) & (u <= 1.0)
    qx = sy * e1[2] - sz * e1[1]
    qy = sz * e1[0] - sx * e1[2]
    qz = sx * e1[1] - sy * e1[0]
    v = f * (d[0] * qx + d[1] * qy + d[2] * qz)
    ok &= (v >= 0.0) & (v <= 1.0)
    t = f * (e2[0] * qx + e2[1] * qy + e2[2] * qz)
    ok &= (t > T_MIN) & (t < t_max)
    return t, ok


def _closest(consts, o, d, time):
    """Unrolled closest hit; fold carries everything shading needs.

    Tie order mirrors hit_world: within a type the FIRST minimum wins
    (argmin), and a triangle displaces a sphere only if strictly closer
    (use_tri = tt < ts)."""
    zero = jnp.zeros_like(o[0])
    t_b = jnp.full_like(o[0], C.BIG)
    hit_b = jnp.zeros_like(o[0], bool)
    # type flags fold as f32 0/1 — Mosaic cannot select scalar bools into
    # i1 vectors ("unsupported target bitwidth for truncation")
    st = dict(
        is_sph=zero, cn=[zero, zero, zero], sgn=zero,
        albedo=[zero, zero, zero], spec=[zero, zero, zero],
        rough=zero, ref_idx=jnp.ones_like(o[0]), refract=[zero, zero, zero],
        is_metal=zero, is_diel=zero,
    )

    def fold(better, obj, is_sph, cn, sgn):
        nonlocal st
        st = dict(
            is_sph=jnp.where(better, is_sph, st["is_sph"]),
            cn=[jnp.where(better, cn[ax], st["cn"][ax]) for ax in range(3)],
            sgn=jnp.where(better, sgn, st["sgn"]),
            albedo=[jnp.where(better, obj["albedo"][ax], st["albedo"][ax])
                    for ax in range(3)],
            spec=[jnp.where(better, obj["spec"][ax], st["spec"][ax])
                  for ax in range(3)],
            rough=jnp.where(better, obj["rough"], st["rough"]),
            ref_idx=jnp.where(better, obj["ref_idx"], st["ref_idx"]),
            refract=[jnp.where(better, obj["refract"][ax], st["refract"][ax])
                     for ax in range(3)],
            is_metal=jnp.where(
                better, 1.0 if obj["mtype"] == MT_METAL else 0.0,
                st["is_metal"]),
            is_diel=jnp.where(
                better, 1.0 if obj["mtype"] == MT_DIELECTRIC else 0.0,
                st["is_diel"]),
        )

    for sph in consts.spheres:
        t, ok, c = _sphere_t(sph, o, d, time, T_MAX)
        t = jnp.where(ok, t, C.BIG)
        better = t < t_b
        fold(better, sph, 1.0, c, 1.0 if sph["r"] >= 0.0 else -1.0)
        t_b = jnp.where(better, t, t_b)
        hit_b |= better & ok
    for tri in consts.tris:
        t, ok = _tri_t(tri, o, d, T_MAX)
        t = jnp.where(ok, t, C.BIG)
        better = t < t_b
        fold(better, tri, 0.0, tri["n"], 1.0)
        t_b = jnp.where(better, t, t_b)
        hit_b |= better & ok
    return t_b, hit_b, st


def _occluded(consts, o, d, time, max_t):
    occ = jnp.zeros_like(o[0], bool)
    for sph in consts.spheres:
        _, ok, _ = _sphere_t(sph, o, d, time, max_t)
        occ |= ok
    for tri in consts.tris:
        _, ok = _tri_t(tri, o, d, max_t)
        occ |= ok
    return occ


# ---------------------------------------------------------------------------
# the bounce


def _direct_light(consts, cfg, o, d, point, n, st, live, time):
    """P3D_RT.glsl:182-232 / pathtracer.direct_lighting, baked lights."""
    zero = jnp.zeros_like(o[0])
    out = [zero, zero, zero]
    is_diff = (st["is_metal"] + st["is_diel"]) < 0.5
    kd = jnp.where(is_diff, 1.0, 0.0)
    diff_col = [st["albedo"][ax] * kd for ax in range(3)]
    spec_col = [jnp.where(is_diff, 0.1,
                          jnp.where(st["is_metal"] > 0.5, st["albedo"][ax],
                                    0.004))
                for ax in range(3)]
    for lpos, lcol in consts.lights:
        Lx = lpos[0] - point[0]
        Ly = lpos[1] - point[1]
        Lz = lpos[2] - point[2]
        d2 = Lx * Lx + Ly * Ly + Lz * Lz
        invd = _rsqrt_pos(d2)
        lx, ly, lz = Lx * invd, Ly * invd, Lz * invd
        ndl = lx * n[0] + ly * n[1] + lz * n[2]
        facing = ndl > 0.0

        fo = tuple(point[ax] + _EPS * n[ax] for ax in range(3))
        if cfg.reference_shadow_len1:
            max_t = jnp.ones_like(o[0])
        else:
            max_t = d2 * invd  # |L|
        occ = _occluded(consts, fo, (lx, ly, lz), time, max_t)
        lit = facing & ~occ & live

        hx, hy, hz = _normalize3(lx - d[0], ly - d[1], lz - d[2])
        nh = jnp.maximum(0.0, hx * n[0] + hy * n[1] + hz * n[2])
        spow = jnp.where(is_diff, _pow_const(nh, 10), _pow_const(nh, 100))
        ks = 1.0 - kd
        ndl_pos = jnp.maximum(0.0, ndl)
        for ax in range(3):
            contrib = (lcol[ax] * diff_col[ax] * ndl_pos * kd
                       + lcol[ax] * spec_col[ax] * spow * ks)
            out[ax] = out[ax] + jnp.where(lit, contrib, 0.0)
    return out


def _scatter(cfg, u, o, d, t, point, n, st):
    """pathtracer.scatter_presampled, componentwise on folded fields.
    u: list of 10 [SUB,LANE] uniforms. Returns (new_o, new_d, atten)."""
    precise = tuple(point[ax] + n[ax] * _EPS for ax in range(3))

    # DIFFUSE
    uvx, uvy, uvz = _unit_sphere(u[0], u[1], u[2])
    # unit_vector_from_uniforms: v / max(|v|, 1e-12)
    nv = jnp.sqrt(uvx * uvx + uvy * uvy + uvz * uvz)
    inv = 1.0 / jnp.maximum(nv, 1e-12)
    uvx, uvy, uvz = uvx * inv, uvy * inv, uvz * inv
    dd = _normalize3(n[0] + uvx, n[1] + uvy, n[2] + uvz)
    ddn_diff = jnp.maximum(dd[0] * n[0] + dd[1] * n[1] + dd[2] * n[2], 0.0)
    a_diff = [st["albedo"][ax] * ddn_diff / jnp.pi for ax in range(3)]

    # METAL: fuzzy mirror, NOT renormalized (common.glsl:229-240)
    dn = d[0] * n[0] + d[1] * n[1] + d[2] * n[2]
    mirror = _normalize3(d[0] - 2.0 * dn * n[0], d[1] - 2.0 * dn * n[1],
                         d[2] - 2.0 * dn * n[2])
    s2 = _unit_sphere(u[3], u[4], u[5])
    d_metal = tuple(mirror[ax] + st["rough"] * s2[ax] for ax in range(3))

    # DIELECTRIC (common.glsl:241-322)
    inside = dn > 0.0
    osgn = jnp.where(inside, -1.0, 1.0)
    ow = tuple(n[ax] * osgn for ax in range(3))
    ref_idx = st["ref_idx"]
    ni_over_nt = jnp.where(inside, ref_idx, 1.0 / ref_idx)
    cosine = jnp.where(inside, dn, -dn)
    eta_i = jnp.where(inside, ref_idx, 1.0)
    eta_t = jnp.where(inside, 1.0, ref_idx)
    r0 = (eta_i - eta_t) / (eta_i + eta_t)
    r0 = r0 * r0
    k_tir = 1.0 - ni_over_nt * ni_over_nt * (1.0 - cosine * cosine)
    tir = k_tir < 0.0
    om = 1.0 - cosine
    om5 = (om * om) * (om * om) * om
    reflect_prob = jnp.where(tir, 1.0, r0 + (1.0 - r0) * om5)
    do_reflect = u[6] < reflect_prob

    s4 = _unit_sphere(u[7], u[8], u[9])
    d_refl = tuple(mirror[ax] + st["rough"] * s4[ax] for ax in range(3))
    o_refl = tuple(point[ax] + ow[ax] * _EPS for ax in range(3))

    sqk = jnp.sqrt(jnp.maximum(k_tir, 0.0))
    coef = ni_over_nt * cosine - sqk
    d_refr = _normalize3(ni_over_nt * d[0] + coef * ow[0],
                         ni_over_nt * d[1] + coef * ow[1],
                         ni_over_nt * d[2] + coef * ow[2])
    blend = _normalize3(ow[0] + s4[0], ow[1] + s4[1], ow[2] + s4[2])
    rr = st["rough"] * st["rough"]
    d_refr = tuple(d_refr[ax] * (1.0 - rr) + blend[ax] * rr
                   for ax in range(3))
    o_refr = tuple(point[ax] - ow[ax] * _EPS for ax in range(3))
    beer = [jnp.exp(st["refract"][ax] * (-t)) for ax in range(3)]

    d_diel = tuple(jnp.where(do_reflect, d_refl[ax], d_refr[ax])
                   for ax in range(3))
    o_diel = tuple(jnp.where(do_reflect, o_refl[ax], o_refr[ax])
                   for ax in range(3))
    a_diel = [st["albedo"][ax] * jnp.where(do_reflect, 1.0, beer[ax])
              for ax in range(3)]

    im, idl = st["is_metal"] > 0.5, st["is_diel"] > 0.5
    new_d = tuple(jnp.where(idl, d_diel[ax],
                            jnp.where(im, d_metal[ax], dd[ax]))
                  for ax in range(3))
    # metal and diffuse both restart from the n-offset point (common.glsl
    # 224, 236); only the dielectric picks a side of the surface
    new_o = tuple(jnp.where(idl, o_diel[ax], precise[ax])
                  for ax in range(3))
    atten = [jnp.where(idl, a_diel[ax],
                       jnp.where(im, st["spec"][ax], a_diff[ax]))
             for ax in range(3)]
    return new_o, new_d, atten


def _build_kernel(consts: _PTConsts, cfg, n_bounces: int):
    NU = N_UNIFORMS

    def kernel(ox, oy, oz, dx, dy, dz, tm, uni, r_out, g_out, b_out):
        time = tm[:]
        zero = jnp.zeros_like(time)

        def u_row(idx):
            return uni[pl.dslice(idx, 1), :, :][0]

        def bounce(state):
            # ``alive`` carries as f32 0/1: Mosaic cannot yield i1 vectors
            # through scf.while ("failed to legalize scf.yield")
            b, o, d, thr, col, alive = state
            active = alive > 0.5
            u = [u_row(b * NU + k) for k in range(NU)]

            t, hit, st = _closest(consts, o, d, time)

            # sky on miss (P3D_RT.glsl:274-279)
            tt = 0.8 * (d[1] + 1.0)
            sky = ((1.0 - tt) + tt * 0.5, (1.0 - tt) + tt * 0.7,
                   (1.0 - tt) + tt * 1.0)
            miss = active & ~hit
            col = [col[ax] + jnp.where(miss, thr[ax] * sky[ax], 0.0)
                   for ax in range(3)]

            point = tuple(o[ax] + d[ax] * t for ax in range(3))
            # normal: sphere (point-c)/|.|·sign(r); triangle baked const
            pcx = point[0] - st["cn"][0]
            pcy = point[1] - st["cn"][1]
            pcz = point[2] - st["cn"][2]
            sn = _normalize3(pcx, pcy, pcz)
            is_s = st["is_sph"] > 0.5
            n = tuple(jnp.where(is_s, sn[ax] * st["sgn"], st["cn"][ax])
                      for ax in range(3))

            live = active & hit
            dl = _direct_light(consts, cfg, o, d, point, n, st, live, time)
            col = [col[ax] + jnp.where(live, thr[ax] * dl[ax], 0.0)
                   for ax in range(3)]

            new_o, new_d, atten = _scatter(cfg, u, o, d, t, point, n, st)
            thr = [jnp.where(live, thr[ax] * atten[ax], thr[ax])
                   for ax in range(3)]
            o = tuple(jnp.where(live, new_o[ax], o[ax]) for ax in range(3))
            d = tuple(jnp.where(live, new_d[ax], d[ax]) for ax in range(3))
            active = live

            if cfg.russian_roulette:  # P3D_RT.glsl:265-271
                p = jnp.maximum(thr[0], jnp.maximum(thr[1], thr[2]))
                kill = active & (u[10] > p)
                active &= ~kill
                inv_p = 1.0 / jnp.maximum(p, 1e-8)
                thr = [jnp.where(active, thr[ax] * inv_p, thr[ax])
                       for ax in range(3)]
            alive = jnp.where(active, 1.0, 0.0)
            return (b + 1, o, d, thr, col, alive)

        def cond(state):
            b, _, _, _, _, alive = state
            return (b < n_bounces) & (jnp.max(alive) > 0.5)

        one = jnp.ones_like(time)
        state = (jnp.int32(0), (ox[:], oy[:], oz[:]), (dx[:], dy[:], dz[:]),
                 [one, one, one], [zero, zero, zero], one)
        _, _, _, _, col, _ = jax.lax.while_loop(cond, bounce, state)
        r_out[:] = col[0]
        g_out[:] = col[1]
        b_out[:] = col[2]

    return kernel


@functools.lru_cache(maxsize=8)
def _trace_fn_cached(consts_key, cfg, n_bounces, interpret, sub):
    consts, = consts_key
    kernel = _build_kernel(consts, cfg, n_bounces)
    NU = N_UNIFORMS
    SUB = sub
    spec = pl.BlockSpec((SUB, LANE), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    uspec = pl.BlockSpec((n_bounces * NU, SUB, LANE), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM)

    @jax.jit
    def trace(o, d, time, uni):
        """o, d: [R,3]; time: [R]; uni: [B, N_UNIFORMS, R] -> color [R,3]."""
        R = o.shape[0]
        pad = (-R) % (SUB * LANE)
        if pad:
            o = jnp.concatenate(
                [o, jnp.broadcast_to(jnp.array([0.0, 1e4, 0.0], o.dtype),
                                     (pad, 3))])
            d = jnp.concatenate(
                [d, jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], d.dtype),
                                     (pad, 3))])
            time = jnp.concatenate([time, jnp.zeros((pad,), time.dtype)])
            uni = jnp.concatenate(
                [uni, jnp.zeros(uni.shape[:2] + (pad,), uni.dtype)], axis=-1)
        rows = o.shape[0] // LANE
        cols = [a.reshape(rows, LANE) for a in
                (o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2], time)]
        u3 = uni.reshape(n_bounces * NU, rows, LANE)
        outs = pl.pallas_call(
            kernel,
            grid=(rows // SUB,),
            in_specs=[spec] * 7 + [uspec],
            out_specs=(spec, spec, spec),
            out_shape=tuple(
                jax.ShapeDtypeStruct((rows, LANE), jnp.float32)
                for _ in range(3)),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(*cols, u3)
        color = jnp.stack([a.reshape(-1) for a in outs], -1)
        return color[:R]

    return trace


class _ConstsKey:
    def __init__(self, consts, token):
        self.consts = consts
        self.token = token

    def __hash__(self):
        return hash(self.token)

    def __eq__(self, other):
        return isinstance(other, _ConstsKey) and self.token == other.token

    def __iter__(self):
        yield self.consts


def trace_rays_megakernel(scene, cfg, interpret: bool = False,
                          sub: int = SUB):
    """Returns trace(o, d, time, uni) -> [R,3] for the baked (scene, cfg).

    ``uni`` is pathtracer.draw_uniforms(key, cfg.max_bounces, R). The pad
    rays injected for non-multiple-of-block batches point up from above the
    world, so they die on the first bounce and never stall the early exit.
    ``sub`` is the block's sublane rows (tests shrink it so interpret mode
    pads 8x less).
    """
    consts = _PTConsts(scene)
    return _trace_fn_cached(_ConstsKey(consts, consts.token()), cfg,
                            int(cfg.max_bounces), interpret, int(sub))


# ---------------------------------------------------------------------------
# frame renderer (render_frame twin over the baked kernel)


def make_render_frame(scene, cam, cfg, interpret: bool = False,
                      sub: int = SUB):
    """Jitted key -> [H,W,3] linear 1-spp estimate, megakernel-traced.

    Pixel jitter, thin-lens sampling and shutter times mirror
    pathtracer.render_frame exactly — stochastic camera work stays OUTSIDE
    the kernel; only the bounce loop is baked.
    """
    from ..ops.camera import thin_lens_rays
    from ..ops.sampling import sample_unit_disk
    from .pathtracer import draw_uniforms

    trace = trace_rays_megakernel(scene, cfg, interpret, sub=sub)
    res_x, res_y = int(cam.res_x), int(cam.res_y)

    @jax.jit
    def frame(key):
        kj, kl, kt, kc = jax.random.split(key, 4)
        ys, xs = jnp.meshgrid(
            jnp.arange(res_y, dtype=jnp.float32),
            jnp.arange(res_x, dtype=jnp.float32), indexing="ij")
        px = xs.reshape(-1)
        py = ys.reshape(-1)
        R = px.shape[0]
        jit2 = jax.random.uniform(kj, (R, 2), jnp.float32)
        lens = sample_unit_disk(kl, (R,)) * (cam.aperture * 0.5)
        time = cam.time0 + jax.random.uniform(kt, (R,)) * (cam.time1
                                                           - cam.time0)
        rays = thin_lens_rays(cam, px + jit2[:, 0], py + jit2[:, 1], lens,
                              time)
        uni = draw_uniforms(kc, cfg.max_bounces, R)
        col = trace(rays.origin, rays.direction, rays.time, uni)
        return col.reshape(res_y, res_x, 3)

    return frame
