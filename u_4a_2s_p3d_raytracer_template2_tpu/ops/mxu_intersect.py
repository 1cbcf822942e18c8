"""MXU-resident brute-force intersection.

The reference's innermost hot loop is scalar Möller–Trumbore / sphere
quadratics per object pointer (scene.cpp:55-88, 149-172). On TPU the FLOPs
belong on the MXU: every per-(ray, primitive) dot product in those tests is a
row of a [R,3/4] x [3/4, P] matmul.

  * Triangles use the Baldwin–Weber affine-functional form: per triangle
    precompute rows N=(n, -n·v0), U=(e2×n, -U·v0)/|n|², V=(n×e1, -V·v0)/|n|²;
    then den = n·d, num = N·[o,1], t = -num/den, u = U·[o,1] + t·(U·d),
    v likewise — two matmuls + a short VPU epilogue. Equivalent to the
    reference's MT up to f32 rounding, including the |det| = |n·d| > EPSILON
    cutoff (det_MT = -n·d) and t > EPSILON.
  * Spheres: o·c and d·c matmuls + quadratic epilogue (same smaller-positive
    -root semantics as scene.cpp:149-172, with (o-c)·(o-c) re-associated as
    |o|² - 2 o·c + |c|²).
  * Planes: pn·d and pn·o matmuls (scene.cpp:119-142 semantics).
  * Boxes stay on the VPU (slab min/max doesn't map to matmul; box counts
    are tiny).

All matmuls run with Precision.HIGHEST (f32-accurate on the MXU).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core import constants as C

_EPS = C.EPSILON
_PREC = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# build-time precompute (host, NumPy)


def triangle_functionals(tri_p: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """tri_p: [Kt, 12] (v0, e1, e2, normal) → (mo [3Kt, 4], md [3Kt, 3]).

    Row order per triangle: (N, U, V); degenerate (|n|² = 0 — padding) rows
    are zeroed and never produce hits (den = 0 fails the EPS cutoff).
    """
    v0 = tri_p[:, 0:3].astype(np.float64)
    e1 = tri_p[:, 3:6].astype(np.float64)
    e2 = tri_p[:, 6:9].astype(np.float64)
    n = np.cross(e1, e2)
    n2 = (n * n).sum(-1)
    safe = np.where(n2 > 0, n2, 1.0)
    U = np.cross(e2, n) / safe[:, None]
    V = np.cross(n, e1) / safe[:, None]
    ok = (n2 > 0)[:, None]
    n = np.where(ok, n, 0.0)
    U = np.where(ok, U, 0.0)
    V = np.where(ok, V, 0.0)
    mo = np.stack([
        np.concatenate([n, -(n * v0).sum(-1, keepdims=True)], -1),
        np.concatenate([U, -(U * v0).sum(-1, keepdims=True)], -1),
        np.concatenate([V, -(V * v0).sum(-1, keepdims=True)], -1),
    ], axis=1)  # [Kt, 3, 4]
    md = np.stack([n, U, V], axis=1)  # [Kt, 3, 3]
    kt = tri_p.shape[0]
    return (mo.reshape(3 * kt, 4).astype(np.float32),
            md.reshape(3 * kt, 3).astype(np.float32))


def triangle_functionals_jnp(tri_p):
    """jnp twin of :func:`triangle_functionals` (f32, traceable) so the
    Baldwin–Weber tables can be rebuilt DIFFERENTIABLY from updated
    geometry inside a jit (core/build.with_prim_params — geometry-parameter
    inverse rendering). Used only for table refresh; gradients to shading
    flow through ops/intersect.per_ray_t, not these tables."""
    v0 = tri_p[:, 0:3]
    e1 = tri_p[:, 3:6]
    e2 = tri_p[:, 6:9]
    n = jnp.cross(e1, e2)
    n2 = jnp.sum(n * n, -1)
    ok = n2 > 0
    safe = jnp.where(ok, n2, 1.0)
    U = jnp.cross(e2, n) / safe[:, None]
    V = jnp.cross(n, e1) / safe[:, None]
    okc = ok[:, None]
    n = jnp.where(okc, n, 0.0)
    U = jnp.where(okc, U, 0.0)
    V = jnp.where(okc, V, 0.0)
    mo = jnp.stack([
        jnp.concatenate([n, -jnp.sum(n * v0, -1, keepdims=True)], -1),
        jnp.concatenate([U, -jnp.sum(U * v0, -1, keepdims=True)], -1),
        jnp.concatenate([V, -jnp.sum(V * v0, -1, keepdims=True)], -1),
    ], axis=1)
    md = jnp.stack([n, U, V], axis=1)
    kt = tri_p.shape[0]
    return mo.reshape(3 * kt, 4), md.reshape(3 * kt, 3)


# ---------------------------------------------------------------------------
# runtime kernels: [R, K] hit-t maps, BIG on miss


def tri_t(mo, md, o, d):
    """mo [3K,4], md [3K,3] → t [R, K]."""
    k3 = mo.shape[0]
    K = k3 // 3
    o4 = jnp.concatenate([o, jnp.ones(o.shape[:-1] + (1,), o.dtype)], -1)
    s_o = jnp.dot(o4, mo.T, precision=_PREC,
                  preferred_element_type=jnp.float32).reshape(-1, K, 3)
    s_d = jnp.dot(d, md.T, precision=_PREC,
                  preferred_element_type=jnp.float32).reshape(-1, K, 3)
    den = s_d[..., 0]
    ok = jnp.abs(den) > _EPS  # |det_MT| = |n·d| cutoff (scene.cpp:68)
    inv = 1.0 / jnp.where(ok, den, 1.0)
    t = -s_o[..., 0] * inv
    u = s_o[..., 1] + t * s_d[..., 1]
    v = s_o[..., 2] + t * s_d[..., 2]
    ok &= (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0)
    ok &= t > _EPS
    return jnp.where(ok, t, C.BIG)


def sphere_t(centers, k_const, o, d):
    """centers [K,3], k_const [K] = |c|²-r² → t [R, K]."""
    oc = jnp.dot(o, centers.T, precision=_PREC,
                 preferred_element_type=jnp.float32)
    dc = jnp.dot(d, centers.T, precision=_PREC,
                 preferred_element_type=jnp.float32)
    a = jnp.sum(d * d, -1)[:, None]
    do = jnp.sum(d * o, -1)[:, None]
    oo = jnp.sum(o * o, -1)[:, None]
    b = 2.0 * (do - dc)
    cc = oo - 2.0 * oc + k_const[None, :]
    delta = b * b - 4.0 * a * cc
    pos = delta > 0.0
    sq = jnp.where(pos, jnp.sqrt(jnp.where(pos, delta, 1.0)), 0.0)
    inv2a = 0.5 / a
    t0 = (-b - sq) * inv2a
    t1 = (-b + sq) * inv2a
    lo, hi = jnp.minimum(t0, t1), jnp.maximum(t0, t1)
    t = jnp.where(lo < 0.0, hi, lo)
    ok = (delta >= 0.0) & (t >= 0.0)
    return jnp.where(ok, t, C.BIG)


def plane_t(pn, pd, o, d):
    """pn [K,3], pd [K] → t [R, K]."""
    den = jnp.dot(d, pn.T, precision=_PREC,
                  preferred_element_type=jnp.float32)
    num = jnp.dot(o, pn.T, precision=_PREC,
                  preferred_element_type=jnp.float32) + pd[None, :]
    ok = jnp.abs(den) > _EPS
    t = -num / jnp.where(ok, den, 1.0)
    ok &= t > 0.0
    return jnp.where(ok, t, C.BIG)
