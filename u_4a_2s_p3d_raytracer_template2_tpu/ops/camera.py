"""Primary-ray generation: pinhole, thin-lens DoF, shutter-time motion blur.

Vectorized over a pixel tile; matches the reference's two PrimaryRay overloads
(camera.h:91-108 pinhole, camera.h:110-127 thin lens) and the GLSL getRay
(common.glsl:130-145). Stochastic samples come from counter-based jax.random
keys instead of libc rand() (maths.h:59-110) — see SURVEY.md §5 on RNG.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.types import Camera, Rays, normalize
from .sampling import sample_unit_disk


def pinhole_rays(cam: Camera, px: jnp.ndarray, py: jnp.ndarray,
                 time: jnp.ndarray | None = None) -> Rays:
    """px, py: [R] pixel-sample coordinates in viewport space (x+0.5 etc.).

    dir = u*w*(px/res_x - 0.5) + v*h*(py/res_y - 0.5) - n*plane_dist,
    normalized (camera.h:93-98).
    """
    sx = cam.w * (px / cam.res_x - 0.5)
    sy = cam.h * (py / cam.res_y - 0.5)
    d = (sx[:, None] * cam.u[None, :]
         + sy[:, None] * cam.v[None, :]
         - cam.plane_dist * cam.n[None, :])
    d = normalize(d)
    o = jnp.broadcast_to(cam.eye[None, :], d.shape)
    if time is None:
        time = jnp.zeros(px.shape, jnp.float32)
    return Rays(o, d, time)


def thin_lens_rays(cam: Camera, px: jnp.ndarray, py: jnp.ndarray,
                   lens_xy: jnp.ndarray,
                   time: jnp.ndarray | None = None) -> Rays:
    """Thin-lens rays from lens samples (already scaled by aperture) to the
    focal-plane point (camera.h:110-127).

    p = (w*(px/res_x-0.5)*focal, h*(py/res_y-0.5)*focal);
    dir = u*(p.x-ls.x) + v*(p.y-ls.y) + n*(-focal*plane_dist), normalized;
    origin = eye + u*ls.x + v*ls.y.
    """
    fpx = cam.w * (px / cam.res_x - 0.5) * cam.focal_ratio
    fpy = cam.h * (py / cam.res_y - 0.5) * cam.focal_ratio
    lx, ly = lens_xy[..., 0], lens_xy[..., 1]
    d = ((fpx - lx)[:, None] * cam.u[None, :]
         + (fpy - ly)[:, None] * cam.v[None, :]
         - (cam.focal_ratio * cam.plane_dist) * cam.n[None, :])
    d = normalize(d)
    o = (cam.eye[None, :]
         + lx[:, None] * cam.u[None, :]
         + ly[:, None] * cam.v[None, :])
    if time is None:
        time = jnp.zeros(px.shape, jnp.float32)
    return Rays(o, d, time)


def primary_rays(cam: Camera, px, py, key=None, *,
                 depth_of_field: bool = False,
                 motion_blur: bool = False) -> Rays:
    """Dispatch matching renderScene's ray setup (main.cpp:757-798)."""
    time = None
    if motion_blur or depth_of_field:
        if key is None:
            raise ValueError("stochastic camera features require a PRNG key")
    if motion_blur:
        key, sub = jax.random.split(key)
        tt = jax.random.uniform(sub, px.shape, jnp.float32)
        time = cam.time0 + tt * (cam.time1 - cam.time0)
    if depth_of_field:
        key, sub = jax.random.split(key)
        lens = sample_unit_disk(sub, px.shape) * cam.aperture
        return thin_lens_rays(cam, px, py, lens, time)
    return pinhole_rays(cam, px, py, time)


def with_eye(cam: Camera, eye) -> Camera:
    """Re-derive the uvn frame for a moved eye, keeping ``at`` implied by the
    current frame and the original up vector — Camera::SetEye semantics
    (camera.h:80-89) used by the reference's mouse-orbit viewer
    (main.cpp:357-433). ``at`` is reconstructed as eye_old - n*plane_dist.
    """
    import dataclasses

    eye = jnp.asarray(eye, jnp.float32)
    at = cam.eye - cam.n * cam.plane_dist
    # the original up is not stored; v still spans the up-ish direction
    up = cam.v
    n = eye - at
    plane_dist = jnp.linalg.norm(n)
    n = n / plane_dist
    u = jnp.cross(up, n)
    u = u / jnp.linalg.norm(u)
    v = jnp.cross(n, u)
    return dataclasses.replace(cam, eye=eye, u=u, v=v, n=n,
                               plane_dist=plane_dist)


def orbit_eye(cam: Camera, alpha_deg, beta_deg, radius) -> jnp.ndarray:
    """Spherical-orbit camera position (main.cpp:419-421)."""
    a = jnp.deg2rad(jnp.asarray(alpha_deg, jnp.float32))
    b = jnp.deg2rad(jnp.asarray(beta_deg, jnp.float32))
    return jnp.stack([radius * jnp.sin(a) * jnp.cos(b),
                      radius * jnp.sin(b),
                      radius * jnp.cos(a) * jnp.cos(b)])
