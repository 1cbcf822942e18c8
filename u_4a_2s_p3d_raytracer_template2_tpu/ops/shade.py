"""Whitted shading math: Blinn-Phong direct lighting, reflection/refraction
directions, Fresnel weights.

Reference semantics: processLight (main.cpp:471-526) and the recursive
rayTracing body (main.cpp:530-721), flattened here into pure per-ray batch
functions. All quirk switches are documented in RenderConfig.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import constants as C
from ..core.types import Materials, RenderConfig, Rays, dot, normalize
from . import intersect
from .sampling import sample_unit_sphere

_EPS = C.EPSILON


class MatView(NamedTuple):
    """Per-ray gathered material parameters."""

    diff_color: jnp.ndarray  # [R,3]
    kd: jnp.ndarray          # [R]
    spec_color: jnp.ndarray  # [R,3]
    ks: jnp.ndarray          # [R]
    shine: jnp.ndarray       # [R]
    transmit: jnp.ndarray    # [R]
    ior: jnp.ndarray         # [R]


def gather_materials(materials: Materials, mat_id: jnp.ndarray) -> MatView:
    M = materials.kd.shape[0]
    if M <= intersect.GATHER_DENSE_MAX:
        # one fused [R,M] @ [M,11] MXU contraction instead of 7 per-row
        # gathers (dynamic row gathers are the slow path on TPU; see
        # intersect.GATHER_DENSE_MAX)
        table = jnp.concatenate(
            [materials.diff_color, materials.kd[:, None],
             materials.spec_color, materials.ks[:, None],
             materials.shine[:, None], materials.transmit[:, None],
             materials.ior[:, None]], axis=-1)
        rows = intersect._dense_select(
            intersect._onehot_rows(mat_id, M), table)
        return MatView(rows[:, 0:3], rows[:, 3], rows[:, 4:7], rows[:, 7],
                       rows[:, 8], rows[:, 9], rows[:, 10])
    g = lambda a: a[mat_id]
    return MatView(
        g(materials.diff_color), g(materials.kd), g(materials.spec_color),
        g(materials.ks), g(materials.shine), g(materials.transmit),
        g(materials.ior),
    )


def blinn_phong(L_unnorm, lit_mask, light_color, mat: MatView, ray_dir, normal):
    """One light's unshadowed contribution (main.cpp:513-525).

    ``lit_mask`` combines the N·L>0 gate (on unnormalized L, main.cpp:476)
    with the shadow test result. The specular term carries the reference's
    hard-coded 0.4 scale (main.cpp:524).
    """
    Lh = normalize(L_unnorm, eps=1e-20)
    V = normalize(-ray_dir, eps=1e-20)
    H = normalize(Lh + V, eps=1e-20)
    ndl = jnp.maximum(0.0, dot(normal, Lh))
    vdn = jnp.maximum(0.0, dot(H, normal))
    # double-where guard: pow(0, s) has a NaN gradient wrt s (0^s·ln 0);
    # C pow(0,0)==1 semantics preserved for shine==0.
    vdn_safe = jnp.where(vdn > 0.0, vdn, 1.0)
    spec_pow = jnp.where(
        vdn > 0.0,
        jnp.power(vdn_safe, mat.shine),
        jnp.where(mat.shine == 0.0, 1.0, 0.0),
    )
    diff = light_color * mat.diff_color * ndl[:, None]
    spec = light_color * mat.spec_color * spec_pow[:, None]
    contrib = diff * mat.kd[:, None] + spec * (mat.ks * 0.4)[:, None]
    return jnp.where(lit_mask[:, None], contrib, 0.0)


def reflect_dir(d, n):
    """Mirror direction d - 2 n (d·n) (main.cpp:649); unit when d is unit."""
    return d - 2.0 * n * dot(d, n)[:, None]


def fuzzy_reflect_dir(key, refl, normal, roughness: float):
    """Fuzzy perturbation (main.cpp:651-660): accept the perturbed direction
    only if it stays in the normal's hemisphere, else keep the mirror."""
    fuzz = normalize(refl + roughness * sample_unit_sphere(key, refl.shape[:-1]))
    keep = dot(fuzz, normal) > 0.0
    return jnp.where(keep[:, None], fuzz, refl)


class RefractOut(NamedTuple):
    direction: jnp.ndarray  # [R,3]
    can_refract: jnp.ndarray  # [R] bool (False on total internal reflection)
    cos_i: jnp.ndarray      # [R]
    cos_t: jnp.ndarray      # [R]
    new_ior: jnp.ndarray    # [R]


def refract(d, normal_flipped, inside, ior_1, mat_ior, mode: str) -> RefractOut:
    """Refraction via the reference's tangent/normal decomposition
    (main.cpp:671-697).

    mode "reference" reproduces the shipped direction t̂·sinθt + n̂ exactly;
    mode "physical" is Snell's transmitted direction t̂·sinθt − n̂·cosθt.
    """
    V = -d
    nf = normal_flipped
    ndv = dot(nf, V)
    viewnormal = nf * ndv[:, None]
    viewtangent = viewnormal - V
    # non-transmissive materials may carry ior=0 (e.g. mount_low's rock,
    # "f ... 0 0"); their refraction output is masked out downstream, but an
    # inf eta would still poison gradients through 0·inf — guard it.
    mat_ior = jnp.where(mat_ior > 0.0, mat_ior, 1.0)
    eta = jnp.where(inside, ior_1, ior_1 / mat_ior)
    cos_i = jnp.abs(ndv)  # == |viewnormal| for unit nf
    # safe norm: ||.|| has a NaN gradient at 0 (normal incidence lanes)
    vt2 = jnp.sum(viewtangent * viewtangent, axis=-1)
    sin_t = eta * jnp.sqrt(jnp.maximum(vt2, 1e-24))
    insqrt = 1.0 - sin_t * sin_t
    # strict >: miss lanes can produce insqrt == 0.0 exactly (degenerate
    # normal => |viewtangent| == 1, eta == 1), and sqrt's infinite slope at 0
    # turns into NaN cotangents via 0*inf even though the lane is masked
    # downstream. cos_t at the boundary is 0 either way.
    can = insqrt > 0.0
    # double-where: sqrt has an infinite gradient at 0
    cos_t = jnp.where(can, jnp.sqrt(jnp.where(can, insqrt, 1.0)), 0.0)
    t_hat = normalize(viewtangent, eps=1e-12)
    if mode == "reference":
        direction = t_hat * sin_t[:, None] + nf
    elif mode == "physical":
        direction = normalize(
            t_hat * sin_t[:, None] - nf * cos_t[:, None], eps=1e-12
        )
    else:
        raise ValueError(f"unknown refraction mode {mode!r}")
    new_ior = jnp.where(inside, 1.0, mat_ior)
    return RefractOut(direction, can, cos_i, cos_t, new_ior)


def fresnel_kr(ro: RefractOut, ior_1, transmit, ks, mode: str):
    """Reflection weight KR (main.cpp:699-717).

    Non-transmissive materials: KR = Ks (main.cpp:716). Transmissive:
      "schlick"           — Schlick approx; KR=1 on TIR
      "reference_schlick" — Schlick approx; KR=0 on TIR (int-division bug)
      "reference_exact"   — KR=0 always (the dead branch at main.cpp:711)
    """
    transmissive = transmit != 0.0
    if mode == "reference_exact":
        kr_t = jnp.zeros_like(ior_1)
    else:
        r0 = ((ior_1 - ro.new_ior) / (ior_1 + ro.new_ior)) ** 2
        schlick = r0 + (1.0 - r0) * (1.0 - ro.cos_i) ** 5
        tir_kr = 1.0 if mode == "schlick" else 0.0
        kr_t = jnp.where(ro.can_refract, schlick, tir_kr)
    return jnp.where(transmissive, kr_t, ks)


def cubemap_index(d: jnp.ndarray, H: int, W: int):
    """(side, yp, xp) nearest-texel cubemap indices by dominant axis
    (scene.cpp:383-461). Face order RIGHT,LEFT,TOP,BOTTOM,FRONT,BACK with
    the reference's unusual conventions: LEFT at X=+1, RIGHT at X=-1
    (scene.cpp:398). d: [R, 3] (need not be normalized)."""
    return cubemap_index_xyz(d[:, 0], d[:, 1], d[:, 2], H, W)


def cubemap_index_xyz(x, y, z, H: int, W: int):
    """cubemap_index on three separate [R] direction planes (callers that
    keep SoA planes avoid materializing a 3-wide-minor-dim [R,3])."""
    ax, ay, az = jnp.abs(x), jnp.abs(y), jnp.abs(z)

    # dominant-axis selection, z checked last with strict > (scene.cpp:396-408)
    use_x = ax > ay
    ma = jnp.where(use_x, ax, ay)
    side = jnp.where(use_x, jnp.where(x >= 0, 1, 0), jnp.where(y >= 0, 2, 3))
    use_z = az > ma
    ma = jnp.where(use_z, az, ma)
    side = jnp.where(use_z, jnp.where(z >= 0, 4, 5), side)

    sc = jnp.select(
        [side == 0, side == 1, side == 2, side == 3, side == 4, side == 5],
        [-z, z, -x, -x, -x, x],
    )
    tc = jnp.select(
        [side == 0, side == 1, side == 2, side == 3, side == 4, side == 5],
        [y, y, -z, z, y, y],
    )
    inv = 1.0 / jnp.maximum(ma, 1e-20)
    s = (sc * inv + 1.0) * 0.5
    t = (tc * inv + 1.0) * 0.5

    xp = jnp.clip(((W - 1) * s).astype(jnp.int32), 0, W - 1)
    yp = jnp.clip(((H - 1) * t).astype(jnp.int32), 0, H - 1)
    return side, yp, xp


def skybox_texel_to_float(rgb):
    """u8 texel -> float color, reference u8tofloat semantics (byte/255.99,
    maths.h); float skyboxes (synthetic test cubemaps) pass through."""
    if jnp.issubdtype(rgb.dtype, jnp.integer):
        return rgb.astype(jnp.float32) / 255.99
    return rgb


def skybox_color(skybox: jnp.ndarray, d: jnp.ndarray,
                 valid=None) -> jnp.ndarray:
    """Cubemap nearest-texel lookup (scene.cpp:383-461).

    skybox: [6, H, W, 3] uint8 (loaded faces) or float32 (synthetic);
    d: [R, 3] (need not be normalized).

    ``valid`` [R] bool: lanes whose result the caller discards (e.g. rays
    that HIT — bg is only consumed on miss) have their texel index clamped
    to 0, so dead rows read one cache-resident texel. Measured NEUTRAL on
    mount_high (the depth-4 'sky cost' there turned out to be an XLA
    scheduling artifact, not gather locality — tools/probe_sky_struct.py);
    kept because it is semantically free and bounds worst-case locality.
    Gather barriers were also tried and measured neutral-here /
    harmful-elsewhere (whitted_megakernel epilogue note) — do not
    re-add."""
    side, yp, xp = cubemap_index(d, skybox.shape[1], skybox.shape[2])
    if valid is not None:
        side = jnp.where(valid, side, 0)
        yp = jnp.where(valid, yp, 0)
        xp = jnp.where(valid, xp, 0)
    return skybox_texel_to_float(skybox[side, yp, xp])


def pack_skybox_u32(skybox) -> jnp.ndarray:
    """[6,H,W,3] u8 -> [6,H,W] uint32 (r<<16 | g<<8 | b): ONE gathered
    element per texel fetch instead of three. XLA's TPU gather is
    element-count-bound (~2.5 ns/element measured), so this is a ~3x cut
    in cubemap lookup cost; unpacking is vector bit-math. Only valid for
    u8 cubemaps (packing a float cubemap would quantize)."""
    s = jnp.asarray(skybox)
    if not jnp.issubdtype(s.dtype, jnp.integer):
        # a bare assert would vanish under python -O and silently bit-mangle
        # a float cubemap
        raise TypeError(
            f"pack_skybox_u32 requires a u8 cubemap, got dtype {s.dtype}")
    s = s.astype(jnp.uint32)
    return (s[..., 0] << 16) | (s[..., 1] << 8) | s[..., 2]


def skybox_color_packed(packed: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """Packed-u32 twin of skybox_color: bit-identical colors (the unpacked
    bytes are the same bytes; the /255.99 conversion is the same op).

    This exact shape — one u32 gather, shift-unpack, [R,3] stack — is the
    measured in-frame optimum for the deferred-sky epilogues. r5 A/B'd the
    'obvious improvements' on device and ALL lost in the frame despite
    winning in isolation: raw u8 3-channel rows (isolated 2.05 ms vs
    packed 3.86 ms per 262k rows, but 84.7 vs 77.9 ms in balls_low's
    distribution frame), optimization barriers around the gather
    (83.3 ms), plane-wise unpack with per-entry gathers and no [R,3]
    stacks (125.8 ms). In-frame fusion context dominates op-level
    reasoning here."""
    side, yp, xp = cubemap_index(d, packed.shape[1], packed.shape[2])
    v = packed[side, yp, xp]
    rgb = jnp.stack([(v >> 16) & 0xFF, (v >> 8) & 0xFF, v & 0xFF], -1)
    return rgb.astype(jnp.float32) / 255.99
