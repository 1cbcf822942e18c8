"""Finite-difference validation of the differentiable render path.

BASELINE.md's north star asks for "image + gradient allclose"; the other
gradient tests check finiteness and end-to-end fit convergence, this one
checks the *values*: central finite differences over smooth parameters
(material colors/coefficients, light color — parameters that do not move
silhouettes, SURVEY.md §7c) must match jax.grad.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import u_4a_2s_p3d_raytracer_template2_tpu as rt
from u_4a_2s_p3d_raytracer_template2_tpu.models.whitted import render_tile

from test_whitted_vs_oracle import sphere_plane_scene, mixed_scene


def _pixel_grid(res):
    ys, xs = jnp.meshgrid(jnp.arange(res, dtype=jnp.float32),
                          jnp.arange(res, dtype=jnp.float32), indexing="ij")
    return xs.reshape(-1), ys.reshape(-1)


def _fd_check(scene, cfg, res, coords, eps=2e-3, rtol=0.08, atol=2e-4):
    """Compare jax.grad against central differences at selected coordinates.

    coords: list of (field_name, index_tuple) into scene.materials or
    ("light_color", idx) into scene.lights.color.
    """
    px, py = _pixel_grid(res)
    key = jax.random.PRNGKey(0)

    def loss_from(scene_):
        img = render_tile(scene_, px, py, cfg, key)
        return jnp.mean(img ** 2)

    def set_param(field, idx, val):
        if field == "light_color":
            col = scene.lights.color.at[idx].set(val)
            lights = dataclasses.replace(scene.lights, color=col)
            return dataclasses.replace(scene, lights=lights)
        arr = getattr(scene.materials, field).at[idx].set(val)
        mats = dataclasses.replace(scene.materials, **{field: arr})
        return dataclasses.replace(scene, materials=mats)

    def loss_wrt(field, idx):
        def f(v):
            return loss_from(set_param(field, idx, v))
        return f

    # analytic gradients in one pass
    def loss_full(mats, light_color):
        lights = dataclasses.replace(scene.lights, color=light_color)
        s = dataclasses.replace(scene, materials=mats, lights=lights)
        return loss_from(s)

    g_mats, g_light = jax.grad(loss_full, argnums=(0, 1))(
        scene.materials, scene.lights.color)

    for field, idx in coords:
        if field == "light_color":
            base = float(scene.lights.color[idx])
            analytic = float(g_light[idx])
        else:
            base = float(getattr(scene.materials, field)[idx])
            analytic = float(getattr(g_mats, field)[idx])
        f = jax.jit(loss_wrt(field, idx))
        fp = float(f(base + eps))
        fm = float(f(base - eps))
        fd = (fp - fm) / (2 * eps)
        assert np.isfinite(fd) and np.isfinite(analytic)
        tol = atol + rtol * max(abs(fd), abs(analytic))
        assert abs(fd - analytic) <= tol, (
            f"{field}{idx}: analytic {analytic:.6g} vs FD {fd:.6g}")


def test_fd_gradients_sphere_plane():
    sd = sphere_plane_scene(res=12)
    scene = rt.build_scene(sd)
    cfg = rt.RenderConfig()
    _fd_check(scene, cfg, 12, [
        ("diff_color", (0, 0)),
        ("diff_color", (1, 2)),
        ("kd", (0,)),
        ("ks", (0,)),
        ("spec_color", (0, 1)),
        ("light_color", (0, 0)),
        ("light_color", (1, 2)),
    ])


def test_fd_gradients_reflective_refractive():
    """Through reflection AND refraction branches (mixed_scene has a mirror
    and a glass sphere): transmit/ior/shine gradients must match FD."""
    sd = mixed_scene(res=12)
    scene = rt.build_scene(sd)
    cfg = rt.RenderConfig()
    _fd_check(scene, cfg, 12, [
        ("diff_color", (0, 0)),     # diffuse floor
        ("ks", (1,)),               # mirror strength
        ("spec_color", (1, 0)),
        ("transmit", (2,)),         # glass T
        ("shine", (1,)),            # specular exponent
    ], eps=4e-3, rtol=0.12)


@pytest.mark.parametrize("field,idx", [("ior", (2,))])
def test_fd_gradient_ior(field, idx):
    """ior bends refraction directions, so the loss is only *piecewise*
    smooth: refracted rays sweep across silhouettes as ior moves (measured:
    a visibility jump at ior~1.4963 on this scene). The analytic gradient is
    the smooth-segment slope; keep the FD step inside the segment."""
    sd = mixed_scene(res=10)
    scene = rt.build_scene(sd)
    cfg = rt.RenderConfig(refraction_mode="physical")
    _fd_check(scene, cfg, 10, [(field, idx)], eps=1e-3, rtol=0.15)


def test_wavefront_gradients_match_sweep():
    """The compacted wavefront engine is a valid GRADIENT path for
    deterministic configs: its value and jax.grad over the full FitParams
    group match the sweep engine's to f32-reassociation noise (the engines
    compute the same function through different schedules — scatter-add
    queues vs 2^l level slots). This is what lets the production train step
    (parallel/dist.train_step_full, bench.py gradient line) run the ~1.7x
    cheaper wavefront forward+backward; measured on-device 260 -> 154 ms
    per 512^2 step (tools/bench_r5.py part d)."""
    from u_4a_2s_p3d_raytracer_template2_tpu.models.scenes import mount_scene
    from u_4a_2s_p3d_raytracer_template2_tpu.parallel.dist import (
        _apply_params,
        params_of,
    )

    res = 20
    scene = rt.build_scene(mount_scene(res=res))
    px, py = _pixel_grid(res)
    key = jax.random.PRNGKey(0)

    def loss(params, engine):
        s = _apply_params(scene, params)
        img = render_tile(s, px, py, rt.RenderConfig(engine=engine), key)
        return jnp.mean(img ** 2)

    p0 = params_of(scene)
    ls, gs = jax.value_and_grad(lambda p: loss(p, "sweep"))(p0)
    lw, gw = jax.value_and_grad(lambda p: loss(p, "wavefront"))(p0)
    assert abs(float(ls) - float(lw)) < 1e-5
    for a, b in zip(jax.tree.leaves(gs), jax.tree.leaves(gw)):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.max(np.abs(a)) + 1e-12
        assert np.max(np.abs(a - b)) <= 5e-3 * scale + 1e-6


def test_geometry_gradient_finite_on_tangential_hits():
    """Regression: a discrete-traversal hit whose differentiable
    re-intersection disagrees (tangential sphere under f32 re-association)
    used to produce t=BIG -> |hit_point|~1e30 -> inf squares -> 0*inf NaN
    cotangents that the one-hot gather matmul spread to EVERY prim row.
    _level_step now falls back to the discrete winner t for such lanes."""
    import dataclasses

    from u_4a_2s_p3d_raytracer_template2_tpu.core import constants as C
    from u_4a_2s_p3d_raytracer_template2_tpu.core.build import (
        with_prim_params,
    )
    from u_4a_2s_p3d_raytracer_template2_tpu.models.scenes import (
        sphere_field_scene,
    )
    from u_4a_2s_p3d_raytracer_template2_tpu.models.whitted import render_tile

    sd = sphere_field_scene(res=48)
    scene = rt.build_scene(sd)
    tp = np.asarray(scene.prims.params)
    ptype = np.asarray(scene.prims.ptype)
    rows = np.nonzero(ptype == C.SPHERE)[0]
    row = int(rows[np.argmax(tp[rows, 3])])
    delta = np.zeros_like(tp)
    delta[row, 0:3] = np.array([0.8, -0.5, 0.6]) * (0.4 * tp[row, 3])
    newp = jnp.asarray(tp + delta)

    ys, xs = jnp.meshgrid(jnp.arange(48.0), jnp.arange(48.0), indexing="ij")
    cfg = rt.RenderConfig(max_depth=3)

    def loss(p):
        s2 = with_prim_params(scene, p)
        img = render_tile(s2, xs.reshape(-1), ys.reshape(-1), cfg,
                          jax.random.PRNGKey(0))
        return jnp.mean(img)

    g = np.asarray(jax.grad(loss)(newp))
    assert np.isfinite(g).all(), (~np.isfinite(g)).sum()
