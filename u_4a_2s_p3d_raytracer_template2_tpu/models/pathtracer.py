"""Monte Carlo path tracer — the GLSL template (P3D_RT.glsl, common.glsl)
re-architected as a batched iterative megakernel with progressive,
checkpointable accumulation (BASELINE config #5).

Design: the GLSL fragment shader runs one thread per pixel per frame with a
10-bounce loop and a self-feedback accumulation texture (P3D_RT.glsl:236-366).
Here a whole pixel tile traces together: bounce loop = ``lax.fori_loop`` over
masked SoA ray state (inactive lanes carry zero throughput), one frame = one
1-spp estimate, and the accumulator pytree (linear-space running sum + sample
count) is the orbax-checkpointable equivalent of the feedback texture
(SURVEY.md §5 checkpoint/resume).

Material model (common.glsl:147-324): DIFFUSE cosine-ish scatter with
albedo·max(N·L,0)/π attenuation, METAL fuzzy mirror, DIELECTRIC with
Schlick-probability branch between reflection and refraction plus Beer's-law
absorption. Direct lighting: Blinn-Phong with per-type constants and a shadow
feeler (P3D_RT.glsl:182-232).
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import constants as C
from ..core.types import Camera, Rays, dot, normalize, pytree
from ..ops.camera import thin_lens_rays
from ..ops.sampling import (
    sample_unit_disk,
    unit_sphere_from_uniforms,
    unit_vector_from_uniforms,
)

MT_DIFFUSE = 0
MT_METAL = 1
MT_DIELECTRIC = 2

_EPS = 1e-3  # common.glsl:2
T_MIN = 1e-3
T_MAX = 1e4  # P3D_RT.glsl:243


@pytree
class PTMaterials:
    mtype: jnp.ndarray          # [K] i32
    albedo: jnp.ndarray         # [K,3]
    spec_color: jnp.ndarray     # [K,3]
    roughness: jnp.ndarray      # [K]
    ref_idx: jnp.ndarray        # [K]
    refract_color: jnp.ndarray  # [K,3]
    emissive: jnp.ndarray       # [K,3]


@pytree
class PTScene:
    """Spheres (static + moving, lerped center — common.glsl:398-420) and
    triangles, SoA; per-primitive material ids; point lights."""

    sp_center0: jnp.ndarray  # [N,3]
    sp_center1: jnp.ndarray  # [N,3]
    sp_radius: jnp.ndarray   # [N] (negative radius = hollow interior shell)
    sp_time0: jnp.ndarray    # [N]
    sp_time1: jnp.ndarray    # [N]
    sp_mat: jnp.ndarray      # [N] i32
    tri_v0: jnp.ndarray      # [M,3]
    tri_e1: jnp.ndarray      # [M,3]
    tri_e2: jnp.ndarray      # [M,3]
    tri_mat: jnp.ndarray     # [M] i32
    materials: PTMaterials
    light_pos: jnp.ndarray   # [L,3]
    light_color: jnp.ndarray # [L,3]


@pytree
class Accumulator:
    """Progressive estimate state — the feedback-texture equivalent
    (P3D_RT.glsl:345-365): linear-space sum + sample count."""

    sum_linear: jnp.ndarray  # [H,W,3]
    count: jnp.ndarray       # [] f32


@dataclasses.dataclass(frozen=True)
class PTConfig:
    max_bounces: int = C.MAX_BOUNCES
    russian_roulette: bool = False        # P3D_RT.glsl:4
    max_samples: int = C.MAX_SAMPLES      # P3D_RT.glsl:284
    # GLSL shadow feeler bug: tmax = length(normalized dir) == 1
    # (P3D_RT.glsl:195-197). False = physical distance-to-light bound.
    reference_shadow_len1: bool = False


class PTHit(NamedTuple):
    t: jnp.ndarray        # [R]
    hit: jnp.ndarray      # [R] bool
    point: jnp.ndarray    # [R,3]
    normal: jnp.ndarray   # [R,3]
    mat_id: jnp.ndarray   # [R] i32


# ---------------------------------------------------------------------------
# intersections (GLSL forms)


def _hit_spheres(scene: PTScene, o, d, time, t_max):
    """hit_sphere/hit_movingSphere (common.glsl:427-506): half-b quadratic
    with the c>0 && b>0 early reject; lerped center for motion blur.
    Returns per-ray (t, idx) of the closest sphere below t_max."""
    span = scene.sp_time1 - scene.sp_time0
    frac = (time[:, None] - scene.sp_time0[None, :]) / jnp.where(
        span == 0.0, 1.0, span)[None, :]
    frac = jnp.where(span[None, :] == 0.0, 0.0, frac)
    center = (scene.sp_center0[None, :, :]
              + (scene.sp_center1 - scene.sp_center0)[None, :, :]
              * frac[:, :, None])                       # [R,N,3]
    L = o[:, None, :] - center
    b = jnp.einsum("rnc,rc->rn", L, d)
    c = dot(L, L) - (scene.sp_radius * scene.sp_radius)[None, :]
    reject = (c > 0.0) & (b > 0.0)
    disc = b * b - c
    ok = ~reject & (disc >= 0.0)
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0 = -b - sq
    t1 = -b + sq
    t = jnp.where(t0 < 0.0, t1, t0)
    ok &= (t > T_MIN) & (t < t_max[:, None])
    t = jnp.where(ok, t, C.BIG)
    idx = jnp.argmin(t, axis=-1)
    tbest = jnp.take_along_axis(t, idx[:, None], -1)[:, 0]
    return tbest, idx, center


def _hit_triangles(scene: PTScene, o, d, t_max):
    """hit_triangle (common.glsl:335-380) — MT with 1e-7 det cutoff and the
    GLSL's missing u+v<=1 guard replaced by its exact checks (u,v in [0,1])."""
    v0 = scene.tri_v0[None, :, :]
    e1 = scene.tri_e1[None, :, :]
    e2 = scene.tri_e2[None, :, :]
    dv = d[:, None, :]
    h = jnp.cross(dv, e2)
    det = dot(h, e1)
    ok = jnp.abs(det) > 1e-7
    f = 1.0 / jnp.where(ok, det, 1.0)
    s = o[:, None, :] - v0
    u = f * dot(s, h)
    ok &= (u >= 0.0) & (u <= 1.0)
    q = jnp.cross(s, e1 * jnp.ones_like(s))
    v = f * dot(dv * jnp.ones_like(q), q)
    # GLSL checks v in [0,1] but not u+v<=1 (common.glsl:366-368) — replicate
    ok &= (v >= 0.0) & (v <= 1.0)
    t = f * dot(e2 * jnp.ones_like(q), q)
    ok &= (t > T_MIN) & (t < t_max[:, None])
    t = jnp.where(ok, t, C.BIG)
    idx = jnp.argmin(t, axis=-1)
    tbest = jnp.take_along_axis(t, idx[:, None], -1)[:, 0]
    return tbest, idx


def hit_world(scene: PTScene, rays: Rays, t_max=None) -> PTHit:
    """Closest hit across the whole world (P3D_RT.glsl:12-180 brute force)."""
    R = rays.origin.shape[0]
    if t_max is None:
        t_max = jnp.full((R,), T_MAX, jnp.float32)
    o, d = rays.origin, rays.direction
    ts, si, centers = _hit_spheres(scene, o, d, rays.time, t_max)
    tt, ti = _hit_triangles(scene, o, d, t_max)

    use_tri = tt < ts
    t = jnp.where(use_tri, tt, ts)
    hit = t < C.BIG

    point = o + d * t[:, None]
    # sphere normal: sign of radius picks shell orientation (common.glsl:460)
    csel = jnp.take_along_axis(centers, si[:, None, None], axis=1)[:, 0, :]
    rsel = scene.sp_radius[si]
    n_sph = normalize(point - csel) * jnp.sign(rsel)[:, None]
    n_tri = normalize(jnp.cross(scene.tri_e1[ti], scene.tri_e2[ti]))
    normal = jnp.where(use_tri[:, None], n_tri, n_sph)

    mat = jnp.where(use_tri, scene.tri_mat[ti], scene.sp_mat[si])
    return PTHit(t, hit, point, normal, mat)


# ---------------------------------------------------------------------------
# direct lighting (P3D_RT.glsl:182-232)


def direct_lighting(scene: PTScene, cfg: PTConfig, rays: Rays, hit: PTHit,
                    mats) -> jnp.ndarray:
    out = jnp.zeros_like(hit.point)
    n_lights = scene.light_pos.shape[0]
    mtype = mats.mtype[hit.mat_id]
    albedo = mats.albedo[hit.mat_id]

    # per-type Blinn-Phong constants (P3D_RT.glsl:201-219)
    diff_col = jnp.where((mtype == MT_DIFFUSE)[:, None], albedo, 0.0)
    spec_col = jnp.where(
        (mtype == MT_DIFFUSE)[:, None], 0.1,
        jnp.where((mtype == MT_METAL)[:, None], albedo, 0.004))
    shininess = jnp.where(mtype == MT_DIFFUSE, 10.0, 100.0)
    kd = jnp.where(mtype == MT_DIFFUSE, 1.0, 0.0)
    ks = jnp.where(mtype == MT_DIFFUSE, 0.0, 1.0)

    for li in range(n_lights):
        lpos = scene.light_pos[li]
        lcol = scene.light_color[li][None, :]
        ldir = normalize(lpos[None, :] - hit.point)
        ndl = dot(hit.normal, ldir)
        facing = ndl > 0.0

        feeler_o = hit.point + _EPS * hit.normal
        if cfg.reference_shadow_len1:
            max_t = jnp.ones(ldir.shape[0], jnp.float32)
        else:
            max_t = jnp.linalg.norm(lpos[None, :] - hit.point, axis=-1)
        sh = hit_world(scene, Rays(feeler_o, ldir, rays.time), max_t)
        lit = facing & ~sh.hit & hit.hit

        H = normalize(ldir - rays.direction)
        nh = jnp.maximum(0.0, dot(hit.normal, H))
        dterm = lcol * diff_col * jnp.maximum(0.0, ndl)[:, None]
        sterm = lcol * spec_col * jnp.power(nh, shininess)[:, None]
        out = out + jnp.where(lit[:, None], dterm * kd[:, None]
                              + sterm * ks[:, None], 0.0)
    return out


# ---------------------------------------------------------------------------
# scatter (common.glsl:216-324)


# Raw U[0,1) draws consumed per bounce, in stream order: 3 for the diffuse
# unit vector, 3 for the metal fuzz sphere, 1 reflect-probability, 3 for the
# shared dielectric refl/blend sphere, 1 Russian-roulette. The keyed path
# (scatter/ray_color) and the pre-sampled path (scatter_presampled/
# ray_color_presampled — what models/pt_megakernel.py mirrors in-kernel)
# apply identical transforms to these draws.
N_UNIFORMS = 11


def draw_uniforms(key, n_bounces: int, R: int) -> jnp.ndarray:
    """[B, N_UNIFORMS, R] raw draws for the pre-sampled integrator."""
    return jax.random.uniform(key, (n_bounces, N_UNIFORMS, R), jnp.float32)


def _raw3(key, R):
    ka, kb, kc = jax.random.split(key, 3)
    return (jax.random.uniform(ka, (R,), jnp.float32),
            jax.random.uniform(kb, (R,), jnp.float32),
            jax.random.uniform(kc, (R,), jnp.float32))


def scatter(key, cfg: PTConfig, rays: Rays, hit: PTHit, mats):
    """Returns (new_rays, atten [R,3], scattered mask)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    R = hit.point.shape[0]
    u = jnp.stack([*_raw3(k1, R), *_raw3(k2, R),
                   jax.random.uniform(k3, (R,), jnp.float32), *_raw3(k4, R)])
    return scatter_presampled(u, cfg, rays, hit, mats)


def scatter_presampled(u, cfg: PTConfig, rays: Rays, hit: PTHit, mats):
    """scatter() from pre-drawn uniforms. u: [>=10, R] (rows 0-9 used)."""
    R = hit.point.shape[0]
    mtype = mats.mtype[hit.mat_id]
    albedo = mats.albedo[hit.mat_id]
    spec = mats.spec_color[hit.mat_id]
    rough = mats.roughness[hit.mat_id]
    ref_idx = mats.ref_idx[hit.mat_id]
    refract_color = mats.refract_color[hit.mat_id]

    d = rays.direction
    n = hit.normal
    precise = hit.point + n * _EPS

    # DIFFUSE (common.glsl:220-227)
    s_point = hit.point + n + unit_vector_from_uniforms(u[0], u[1], u[2])
    d_diff = normalize(s_point - hit.point)
    a_diff = albedo * jnp.maximum(dot(d_diff, n), 0.0)[:, None] / jnp.pi
    o_diff = precise

    # METAL (common.glsl:229-240): fuzzy mirror, direction NOT renormalized
    mirror = normalize(d - 2.0 * dot(d, n)[:, None] * n)
    d_metal = mirror + rough[:, None] * unit_sphere_from_uniforms(
        u[3], u[4], u[5])
    a_metal = spec
    o_metal = precise

    # DIELECTRIC (common.glsl:241-322)
    ddn = dot(d, n)
    inside = ddn > 0.0
    outward = jnp.where(inside[:, None], -n, n)
    ni_over_nt = jnp.where(inside, ref_idx, 1.0 / ref_idx)
    cosine = jnp.where(inside, ddn, -ddn)
    eta_i = jnp.where(inside, ref_idx, 1.0)
    eta_t = jnp.where(inside, 1.0, ref_idx)

    r0 = (eta_i - eta_t) / (eta_i + eta_t)
    r0 = r0 * r0  # schlick() squares (common.glsl:212)
    k_tir = 1.0 - ni_over_nt * ni_over_nt * (1.0 - cosine * cosine)
    tir = k_tir < 0.0
    reflect_prob = jnp.where(
        tir, 1.0, r0 + (1.0 - r0) * (1.0 - cosine) ** 5)

    do_reflect = u[6] < reflect_prob
    # reflect branch uses rec.normal, not outwardNormal (common.glsl:296);
    # the same sphere sample feeds both the fuzz and the rough-blend below
    sph4 = unit_sphere_from_uniforms(u[7], u[8], u[9])
    d_refl = mirror + rough[:, None] * sph4
    o_refl = hit.point + outward * _EPS

    sqk = jnp.sqrt(jnp.maximum(k_tir, 0.0))
    d_refr = normalize(ni_over_nt[:, None] * d
                       + (ni_over_nt * cosine - sqk)[:, None] * outward)
    blend = normalize(outward + sph4)
    rr = (rough * rough)[:, None]
    d_refr = d_refr * (1.0 - rr) + blend * rr  # mix() (common.glsl:307)
    o_refr = hit.point - outward * _EPS
    beer = jnp.exp(refract_color * (-hit.t[:, None]))  # common.glsl:314

    d_diel = jnp.where(do_reflect[:, None], d_refl, d_refr)
    o_diel = jnp.where(do_reflect[:, None], o_refl, o_refr)
    a_diel = albedo * jnp.where(do_reflect[:, None], 1.0, beer)

    is_m = (mtype == MT_METAL)[:, None]
    is_d = (mtype == MT_DIELECTRIC)[:, None]
    new_d = jnp.where(is_d, d_diel, jnp.where(is_m, d_metal, d_diff))
    new_o = jnp.where(is_d, o_diel, jnp.where(is_m, o_metal, o_diff))
    atten = jnp.where(is_d, a_diel, jnp.where(is_m, a_metal, a_diff))

    return Rays(new_o, new_d, rays.time), atten, hit.hit


# ---------------------------------------------------------------------------
# the bounce loop (rayColor, P3D_RT.glsl:236-282)


def _bounce(scene: PTScene, cfg: PTConfig, u, state):
    """One bounce of the integrator from pre-drawn uniforms u [N_UNIFORMS, R].
    state = (rays, throughput, col, active)."""
    rays, throughput, col, active = state
    mats = scene.materials
    R = rays.origin.shape[0]
    hit = hit_world(scene, rays)

    # background (P3D_RT.glsl:274-279)
    tt = 0.8 * (rays.direction[:, 1] + 1.0)
    sky = ((1.0 - tt)[:, None] * jnp.ones(3)
           + tt[:, None] * jnp.array([0.5, 0.7, 1.0]))
    miss = active & ~hit.hit
    col = col + jnp.where(miss[:, None], throughput * sky, 0.0)

    live = active & hit.hit
    dl = direct_lighting(scene, cfg, rays, hit, mats)
    col = col + jnp.where(live[:, None], throughput * dl, 0.0)

    new_rays, atten, scattered = scatter_presampled(u, cfg, rays, hit, mats)
    throughput = jnp.where(live[:, None], throughput * atten, throughput)
    rays = Rays(
        jnp.where(live[:, None], new_rays.origin, rays.origin),
        jnp.where(live[:, None], new_rays.direction, rays.direction),
        rays.time,
    )
    active = live & scattered

    if cfg.russian_roulette:  # P3D_RT.glsl:265-271
        p = jnp.max(throughput, axis=-1)
        kill = active & (u[10] > p)
        active &= ~kill
        keep = active
        throughput = jnp.where(
            keep[:, None], throughput / jnp.maximum(p, 1e-8)[:, None],
            throughput)
    return (rays, throughput, col, active)


def ray_color(scene: PTScene, cfg: PTConfig, rays: Rays, key) -> jnp.ndarray:
    R = rays.origin.shape[0]

    def body(i, state):
        rays, throughput, col, active, key = state
        key, ks, kr = jax.random.split(key, 3)
        k1, k2, k3, k4 = jax.random.split(ks, 4)
        u = jnp.stack([*_raw3(k1, R), *_raw3(k2, R),
                       jax.random.uniform(k3, (R,), jnp.float32),
                       *_raw3(k4, R),
                       jax.random.uniform(kr, (R,), jnp.float32)])
        state = _bounce(scene, cfg, u, (rays, throughput, col, active))
        return state + (key,)

    init = (rays, jnp.ones((R, 3), jnp.float32), jnp.zeros((R, 3), jnp.float32),
            jnp.ones((R,), bool), key)
    _, _, col, _, _ = jax.lax.fori_loop(0, cfg.max_bounces, body, init)
    return col


def ray_color_presampled(scene: PTScene, cfg: PTConfig, rays: Rays,
                         uni) -> jnp.ndarray:
    """ray_color from pre-drawn uniforms (draw_uniforms). uni: [B, 11, R].

    This is the draw-for-draw XLA twin of the Pallas path-tracer megakernel
    (models/pt_megakernel.py) — feeding both the same uniforms must produce
    the same image up to float reassociation (tests/test_pt_megakernel.py).
    """
    R = rays.origin.shape[0]

    def body(i, state):
        return _bounce(scene, cfg, uni[i], state)

    init = (rays, jnp.ones((R, 3), jnp.float32), jnp.zeros((R, 3), jnp.float32),
            jnp.ones((R,), bool))
    _, _, col, _ = jax.lax.fori_loop(0, uni.shape[0], body, init)
    return col


# ---------------------------------------------------------------------------
# per-frame estimate + progressive accumulation (mainImage, P3D_RT.glsl:286-366)


def make_accumulator(res_x: int, res_y: int) -> Accumulator:
    return Accumulator(jnp.zeros((res_y, res_x, 3), jnp.float32),
                       jnp.zeros((), jnp.float32))


def render_frame(scene: PTScene, cam: Camera, cfg: PTConfig, key) -> jnp.ndarray:
    """One 1-spp jittered estimate of the full frame, linear space. [H,W,3]"""
    kj, kl, kt, kc = jax.random.split(key, 4)
    ys, xs = jnp.meshgrid(
        jnp.arange(cam.res_y, dtype=jnp.float32),
        jnp.arange(cam.res_x, dtype=jnp.float32),
        indexing="ij",
    )
    px = xs.reshape(-1)
    py = ys.reshape(-1)
    R = px.shape[0]
    jit2 = jax.random.uniform(kj, (R, 2), jnp.float32)
    lens = sample_unit_disk(kl, (R,)) * (cam.aperture * 0.5)  # common.glsl:120
    time = cam.time0 + jax.random.uniform(kt, (R,)) * (cam.time1 - cam.time0)
    rays = thin_lens_rays(cam, px + jit2[:, 0], py + jit2[:, 1], lens, time)
    col = ray_color(scene, cfg, rays, kc)
    return col.reshape(cam.res_y, cam.res_x, 3)


@jax.jit
def accumulate(acc: Accumulator, frame: jnp.ndarray) -> Accumulator:
    """Running linear-space mean, capped at max_samples (P3D_RT.glsl:357-364).
    The cap is enforced by the caller; the state itself is exact."""
    return Accumulator(acc.sum_linear + frame, acc.count + 1.0)


def to_image(acc: Accumulator) -> jnp.ndarray:
    """Gamma-2.2 display image (toGamma, common.glsl:66-69)."""
    mean = acc.sum_linear / jnp.maximum(acc.count, 1.0)
    return jnp.power(jnp.clip(mean, 0.0, 1.0), 1.0 / 2.2)


def render_progressive(scene: PTScene, cam: Camera, cfg: PTConfig, key,
                       n_frames: int,
                       acc: Accumulator | None = None,
                       start_count: float | None = None,
                       frame_fn=None) -> Accumulator:
    """Accumulate up to n_frames 1-spp estimates, respecting the max_samples
    cap (P3D_RT.glsl:357-361). The cap check uses a host-side frame counter
    (``start_count`` when resuming) — no per-frame device sync.

    ``frame_fn``: optional key -> [H,W,3] estimator override (e.g. the baked
    pt_megakernel.make_render_frame); default is the XLA integrator."""
    if acc is None:
        acc = make_accumulator(cam.res_x, cam.res_y)
        count = 0.0
    else:
        count = float(acc.count) if start_count is None else start_count
    if frame_fn is None:
        xla_fn = jax.jit(render_frame, static_argnums=(2,))
        frame_fn = lambda k: xla_fn(scene, cam, cfg, k)  # noqa: E731
    for i in range(n_frames):
        if count >= cfg.max_samples:
            break
        key, sub = jax.random.split(key)
        acc = accumulate(acc, frame_fn(sub))
        count += 1.0
    return acc
