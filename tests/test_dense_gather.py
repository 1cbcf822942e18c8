"""Dense one-hot gather (MXU path) vs plain row gathers — must be exact.

The hot shading path fetches per-ray primitive params + materials with a
[R, N] @ [N, k] one-hot contraction when the table is small
(ops/intersect.GATHER_DENSE_MAX); a 0/1 left operand makes the contraction
bit-exact, so the two paths must agree bitwise, including miss lanes'
downstream-masked defaults.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import u_4a_2s_p3d_raytracer_template2_tpu as rt
from u_4a_2s_p3d_raytracer_template2_tpu.models.scenes import mount_scene
from u_4a_2s_p3d_raytracer_template2_tpu.ops import intersect, shade


@pytest.fixture(scope="module")
def scene():
    return rt.build_scene(mount_scene(res=32))


def _force_gather(fn, *args):
    old = intersect.GATHER_DENSE_MAX
    intersect.GATHER_DENSE_MAX = 0
    try:
        return fn(*args)
    finally:
        intersect.GATHER_DENSE_MAX = old


def test_gather_prims_dense_matches_gather(scene):
    key = jax.random.PRNGKey(7)
    obj_id = jax.random.randint(key, (4096,), -1,
                                scene.prims.params.shape[0])
    p1, t1, m1 = intersect.gather_prims(scene.prims, obj_id)
    p0, t0, m0 = _force_gather(intersect.gather_prims, scene.prims, obj_id)
    miss = np.asarray(obj_id) < 0
    assert bool(jnp.all(jnp.where(miss[:, None], True, p0 == p1)))
    assert bool(jnp.all(t0 == t1))          # INVALID on miss in both paths
    assert bool(jnp.all(jnp.where(miss, True, m0 == m1)))
    # dense path miss lanes are all-zero (masked downstream)
    assert bool(jnp.all(jnp.where(miss[:, None], p1 == 0.0, True)))


def test_gather_materials_dense_matches_gather(scene):
    key = jax.random.PRNGKey(8)
    mat_id = jax.random.randint(key, (4096,), 0,
                                scene.materials.kd.shape[0])
    mv1 = shade.gather_materials(scene.materials, mat_id)
    mv0 = _force_gather(shade.gather_materials, scene.materials, mat_id)
    for f in mv0._fields:
        assert bool(jnp.all(getattr(mv0, f) == getattr(mv1, f))), f


def test_dense_gather_frame_bit_identical(scene):
    from u_4a_2s_p3d_raytracer_template2_tpu.models.whitted import (
        render_image,
    )

    cfg = rt.RenderConfig()
    img1 = render_image(scene, cfg)
    img0 = _force_gather(render_image, scene, cfg)
    assert bool(jnp.all(img0 == img1))


def test_dense_gather_material_gradients_match(scene):
    """Gradients w.r.t. materials flow identically through both paths."""
    from u_4a_2s_p3d_raytracer_template2_tpu.models.whitted import (
        render_image,
    )

    import dataclasses

    cfg = rt.RenderConfig()

    def loss(diff_color):
        mats = dataclasses.replace(scene.materials, diff_color=diff_color)
        sc = dataclasses.replace(scene, materials=mats)
        return jnp.sum(render_image(sc, cfg) ** 2)

    g1 = jax.grad(loss)(scene.materials.diff_color)
    g0 = _force_gather(jax.grad(loss), scene.materials.diff_color)
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g1),
                               rtol=1e-5, atol=1e-6)
