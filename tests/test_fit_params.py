"""Differentiability beyond materials: light position/color and camera eye
gradients (parallel/dist.FitParams / train_step_full), FD-validated and
exercised end-to-end by recovering a perturbed light position — the
material/light/camera gradient all-reduce promised in SURVEY.md §2/§7.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

import u_4a_2s_p3d_raytracer_template2_tpu as rt
from u_4a_2s_p3d_raytracer_template2_tpu.models.whitted import render_tile
from u_4a_2s_p3d_raytracer_template2_tpu.parallel.dist import (
    FitParams,
    _apply_params,
    default_mesh,
    lr_scales,
    params_of,
    train_step_full,
)

from test_whitted_vs_oracle import sphere_plane_scene


def _grid(res):
    ys, xs = jnp.meshgrid(jnp.arange(res, dtype=jnp.float32),
                          jnp.arange(res, dtype=jnp.float32), indexing="ij")
    return xs.reshape(-1), ys.reshape(-1)


def test_fd_gradient_light_position():
    """Central differences vs jax.grad on a light-position component.
    Moving the light changes L directions smoothly; shadow boundaries are
    discrete but at this eps no pixel flips on this scene."""
    sd = sphere_plane_scene(res=12)
    scene = rt.build_scene(sd)
    cfg = rt.RenderConfig()
    px, py = _grid(12)
    key = jax.random.PRNGKey(0)

    def loss_wrt_light(pos):
        lights = dataclasses.replace(scene.lights, position=pos)
        s = dataclasses.replace(scene, lights=lights)
        img = render_tile(s, px, py, cfg, key)
        return jnp.mean(img ** 2)

    g = jax.grad(loss_wrt_light)(scene.lights.position)
    f = jax.jit(loss_wrt_light)
    for idx in [(0, 0), (0, 1), (0, 2)]:
        eps = 2e-2
        base = scene.lights.position
        fp = float(f(base.at[idx].add(eps)))
        fm = float(f(base.at[idx].add(-eps)))
        fd = (fp - fm) / (2 * eps)
        analytic = float(g[idx])
        assert np.isfinite(fd) and np.isfinite(analytic)
        tol = 2e-4 + 0.08 * max(abs(fd), abs(analytic))
        assert abs(fd - analytic) <= tol, (
            f"light_pos{idx}: analytic {analytic:.6g} vs FD {fd:.6g}")


def test_fd_gradient_camera_eye():
    """Camera-eye gradients are finite and match FD on a smooth segment
    (the loss is piecewise smooth in eye: silhouettes sweep across pixels)."""
    sd = sphere_plane_scene(res=10)
    scene = rt.build_scene(sd)
    cfg = rt.RenderConfig()
    px, py = _grid(10)
    key = jax.random.PRNGKey(0)

    def loss_wrt_eye(eye):
        p = dataclasses.replace(params_of(scene), cam_eye=eye)
        s = _apply_params(scene, p)
        img = render_tile(s, px, py, cfg, key)
        return jnp.mean(img ** 2)

    g = np.asarray(jax.grad(loss_wrt_eye)(scene.camera.eye))
    assert np.isfinite(g).all()
    f = jax.jit(loss_wrt_eye)
    eps = 1e-3
    base = scene.camera.eye
    fd = (float(f(base.at[2].add(eps))) - float(f(base.at[2].add(-eps)))) / (
        2 * eps)
    tol = 5e-4 + 0.15 * max(abs(fd), abs(g[2]))
    assert abs(fd - g[2]) <= tol, f"eye z: analytic {g[2]:.6g} vs FD {fd:.6g}"


def test_recover_perturbed_light_position():
    """Inverse rendering: target rendered with the true light; start from a
    displaced light; train_step_full must cut the loss and move the light
    back toward the truth (sharded, psum'd gradients)."""
    sd = sphere_plane_scene(res=16)
    scene = rt.build_scene(sd)
    cfg = rt.RenderConfig()
    mesh = default_mesh()
    from u_4a_2s_p3d_raytracer_template2_tpu.models.whitted import (
        render_image,
    )

    target = render_image(scene, cfg)
    true_pos = np.asarray(scene.lights.position)

    delta = np.zeros_like(true_pos)
    delta[0] = [1.5, -1.0, 0.8]
    lights = dataclasses.replace(
        scene.lights, position=jnp.asarray(true_pos + delta))
    s = dataclasses.replace(scene, lights=lights)

    # fit the light position only (parameter groups live on very different
    # scales; see lr_scales)
    sc = lr_scales(materials=0.0, light_pos=1.0, light_color=0.0, camera=0.0)
    d0 = float(np.linalg.norm(np.asarray(s.lights.position) - true_pos))
    losses = []
    for i in range(12):
        s, loss = train_step_full(s, target, cfg, mesh, 100.0,
                                  jax.random.PRNGKey(i), sc)
        losses.append(float(loss))
    d1 = float(np.linalg.norm(np.asarray(s.lights.position) - true_pos))
    assert losses[-1] < losses[0] * 0.2, losses
    assert d1 < d0 * 0.6, (d0, d1)


def test_recover_displaced_sphere_center():
    """Geometry inverse rendering (FitParams.prim_params): target rendered
    with the true sphere; start from a displaced center; train_step_full
    with the geometry group enabled must pull it back (the north star's
    'gradients flow through intersection barycentrics', end-to-end)."""
    sd = sphere_plane_scene(res=16)
    scene = rt.build_scene(sd)
    cfg = rt.RenderConfig()
    mesh = default_mesh()
    from u_4a_2s_p3d_raytracer_template2_tpu.models.whitted import (
        render_image,
    )

    target = render_image(scene, cfg)
    true_params = np.asarray(scene.prims.params)

    delta = np.zeros_like(true_params)
    delta[0, 0:3] = [0.12, -0.08, 0.1]   # sphere 0 center displaced
    from u_4a_2s_p3d_raytracer_template2_tpu.core.build import (
        with_prim_params,
    )

    s = with_prim_params(scene, jnp.asarray(true_params + delta))
    # the lr_scales multipliers broadcast, so the geometry group scale can
    # be a per-row mask — fit ONLY the displaced sphere's row (updating all
    # rows also drifts the un-perturbed plane, whose silhouette terms the
    # smooth gradient cannot see)
    mask = np.zeros((true_params.shape[0], 1), np.float32)
    mask[0] = 1.0
    sc = lr_scales(materials=0.0, light_pos=0.0, light_color=0.0,
                   camera=0.0, geometry=0.0)
    sc = dataclasses.replace(sc, prim_params=jnp.asarray(mask))
    d0 = float(np.linalg.norm(np.asarray(s.prims.params)[0, 0:3]
                              - true_params[0, 0:3]))
    losses = []
    for i in range(15):
        s, loss = train_step_full(s, target, cfg, mesh, 2.0,
                                  jax.random.PRNGKey(i), sc)
        losses.append(float(loss))
    d1 = float(np.linalg.norm(np.asarray(s.prims.params)[0, 0:3]
                              - true_params[0, 0:3]))
    assert losses[-1] < losses[0] * 0.2, losses
    assert d1 < d0 * 0.5, (d0, d1, losses)
