"""Stochastic sampling primitives.

The reference uses rejection sampling over libc rand() (maths.h:89-104);
rejection loops are hostile to SIMD/XLA, so we use the closed-form polar
methods — the same construction the in-repo GLSL uses (common.glsl:71-89),
which is the reference's own precedent for counter-based, loop-free sampling.

Each sampler is split into a pure ``*_from_uniforms`` transform plus a keyed
wrapper that draws the raw uniforms with ``jax.random``. The transforms are
shared with the pre-sampled paths (models/pt_megakernel.py consumes raw
uniforms drawn OUTSIDE its Pallas kernel and applies the same transforms
in-kernel, so kernel and XLA integrators are comparable draw-for-draw).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

TWO_PI = 6.28318530718


def disk_from_uniforms(u1, u2) -> jnp.ndarray:
    """Uniform on the unit disk from two U[0,1) draws, polar method
    (common.glsl:71-76). [*shape, 2]"""
    r = jnp.sqrt(u1)
    phi = u2 * TWO_PI
    return jnp.stack([r * jnp.sin(phi), r * jnp.cos(phi)], axis=-1)


def unit_sphere_from_uniforms(u1, u2, u3) -> jnp.ndarray:
    """Uniform inside the unit sphere from three U[0,1) draws,
    cube-root-radius method (common.glsl:78-84). [*shape, 3]"""
    x = u1 * 2.0 - 1.0
    phi = u2 * TWO_PI
    r = jnp.cbrt(u3)
    s = jnp.sqrt(jnp.maximum(1.0 - x * x, 0.0))
    return r[..., None] * jnp.stack(
        [s * jnp.sin(phi), s * jnp.cos(phi), x], axis=-1)


def unit_vector_from_uniforms(u1, u2, u3) -> jnp.ndarray:
    """Normalized unit-sphere sample for cosine-ish diffuse scatter
    (common.glsl:86-89)."""
    v = unit_sphere_from_uniforms(u1, u2, u3)
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    return v / jnp.maximum(n, 1e-12)


def _u(key, shape):
    return jax.random.uniform(key, shape, jnp.float32)


def sample_unit_disk(key, shape) -> jnp.ndarray:
    k1, k2 = jax.random.split(key)
    return disk_from_uniforms(_u(k1, shape), _u(k2, shape))


def sample_unit_sphere(key, shape) -> jnp.ndarray:
    k1, k2, k3 = jax.random.split(key, 3)
    return unit_sphere_from_uniforms(_u(k1, shape), _u(k2, shape),
                                     _u(k3, shape))


def sample_unit_vector(key, shape) -> jnp.ndarray:
    k1, k2, k3 = jax.random.split(key, 3)
    return unit_vector_from_uniforms(_u(k1, shape), _u(k2, shape),
                                     _u(k3, shape))
