"""Stochastic sampling primitives.

The reference uses rejection sampling over libc rand() (maths.h:89-104);
rejection loops are hostile to SIMD/XLA, so we use the closed-form polar
methods — the same construction the in-repo GLSL uses (common.glsl:71-89),
which is the reference's own precedent for counter-based, loop-free sampling.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

TWO_PI = 6.28318530718


def sample_unit_disk(key, shape) -> jnp.ndarray:
    """Uniform on the unit disk, polar method (common.glsl:71-76). [*shape, 2]"""
    k1, k2 = jax.random.split(key)
    r = jnp.sqrt(jax.random.uniform(k1, shape, jnp.float32))
    phi = jax.random.uniform(k2, shape, jnp.float32) * TWO_PI
    return jnp.stack([r * jnp.sin(phi), r * jnp.cos(phi)], axis=-1)


def sample_unit_sphere(key, shape) -> jnp.ndarray:
    """Uniform inside the unit sphere, cube-root-radius method
    (common.glsl:78-84). [*shape, 3]"""
    k1, k2, k3 = jax.random.split(key, 3)
    x = jax.random.uniform(k1, shape, jnp.float32) * 2.0 - 1.0
    phi = jax.random.uniform(k2, shape, jnp.float32) * TWO_PI
    r = jnp.cbrt(jax.random.uniform(k3, shape, jnp.float32))
    s = jnp.sqrt(jnp.maximum(1.0 - x * x, 0.0))
    return r[..., None] * jnp.stack(
        [s * jnp.sin(phi), s * jnp.cos(phi), x], axis=-1)


def sample_unit_vector(key, shape) -> jnp.ndarray:
    """Normalized unit-sphere sample for cosine-ish diffuse scatter
    (common.glsl:86-89)."""
    v = sample_unit_sphere(key, shape)
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    return v / jnp.maximum(n, 1e-12)
