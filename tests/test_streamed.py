"""Operand-streamed Whitted megakernel (models/whitted_streamed.py).

Three layers of pinning:
  * the Pallas kernel itself (interpret mode) against the sweep engine —
    proves the SMEM-operand kernel computes the baked kernel's math;
  * the pure-XLA twin (the off-TPU primal and the universal backward)
    against the sweep across configs, scenes, and stochastic features;
  * the integration surfaces the streamed engine exists for: gradients
    (custom_vjp), shard_map sharding, and the full train step.
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import u_4a_2s_p3d_raytracer_template2_tpu as rt
from u_4a_2s_p3d_raytracer_template2_tpu.core.types import clamp01
from u_4a_2s_p3d_raytracer_template2_tpu.models import whitted
from u_4a_2s_p3d_raytracer_template2_tpu.models.whitted_streamed import (
    scene_tables,
    shape_of,
    supports,
    trace_rays_streamed,
)
from u_4a_2s_p3d_raytracer_template2_tpu.ops.camera import primary_rays

from conftest import assert_images_close
from test_megakernel import _grid, _with_skybox
from test_whitted_vs_oracle import mixed_scene, sphere_plane_scene
from u_4a_2s_p3d_raytracer_template2_tpu.models.scenes import mount_scene


def _primary(scene, px, py, key, cfg):
    key, kcam, ktrace = jax.random.split(key, 3)
    rays = primary_rays(scene.camera, px + 0.5, py + 0.5, kcam,
                        depth_of_field=cfg.depth_of_field,
                        motion_blur=cfg.motion_blur)
    return rays, ktrace


def _compare_trace(scene, cfg, res, impl, atol=2e-3):
    px, py = _grid(res)
    rays, ktrace = _primary(scene, px, py, jax.random.PRNGKey(0), cfg)
    want = np.asarray(clamp01(whitted.trace_rays(scene, rays, cfg, ktrace)))
    got = np.asarray(trace_rays_streamed(scene, rays, cfg, ktrace,
                                         impl=impl))
    assert np.isfinite(got).all()
    assert_images_close(got.reshape(res, res, 3), want.reshape(res, res, 3),
                        atol=atol)


def test_streamed_kernel_interpret_parity():
    """The actual Pallas kernel (interpret emulation) == sweep engine."""
    scene = rt.build_scene(mount_scene(res=16))
    _compare_trace(scene, rt.RenderConfig(max_depth=2), 16, "interpret")


def test_streamed_kernel_interpret_mixed_types():
    scene = rt.build_scene(mixed_scene())
    _compare_trace(scene, rt.RenderConfig(max_depth=2), 16, "interpret")


def test_streamed_twin_depth3():
    scene = rt.build_scene(mount_scene(res=32))
    _compare_trace(scene, rt.RenderConfig(max_depth=3), 32, "twin")


def test_streamed_twin_skybox():
    """Deferred-sky rows + epilogue through the streamed path."""
    scene = _with_skybox(rt.build_scene(mount_scene(res=16)))
    cfg = rt.RenderConfig(max_depth=3, use_skybox=True)
    _compare_trace(scene, cfg, 16, "twin")


def test_streamed_kernel_interpret_skybox():
    scene = _with_skybox(rt.build_scene(mount_scene(res=16)))
    cfg = rt.RenderConfig(max_depth=2, use_skybox=True)
    _compare_trace(scene, cfg, 16, "interpret")


def test_streamed_render_tile_dispatch_aa_dof():
    """render_tile(engine='megakernel', megakernel_interpret) routes through
    the streamed path and matches the sweep ELEMENTWISE under the stochastic
    distribution mode (same jax.random chain by construction)."""
    sd = sphere_plane_scene()
    scene = rt.build_scene(sd)
    res = 16
    px, py = _grid(res)
    key = jax.random.PRNGKey(3)
    base = dict(max_depth=2, anti_aliasing=True, depth_of_field=True, spp=2,
                soft_shadow=True)
    cfg_mk = rt.RenderConfig(engine="megakernel", megakernel_interpret=True,
                             **base)
    cfg_sw = rt.RenderConfig(**base)
    got = np.asarray(whitted.render_tile(scene, px, py, cfg_mk, key))
    want = np.asarray(whitted.render_tile(scene, px, py, cfg_sw, key))
    assert_images_close(got.reshape(res, res, 3), want.reshape(res, res, 3))


def test_streamed_fuzzy_soft_jittered():
    sd = mixed_scene()
    scene = rt.build_scene(sd)
    res = 16
    px, py = _grid(res)
    key = jax.random.PRNGKey(5)
    base = dict(max_depth=2, anti_aliasing=True, spp=2, soft_shadow=True,
                fuzzy_reflection=True)
    cfg_mk = rt.RenderConfig(engine="megakernel", megakernel_interpret=True,
                             **base)
    cfg_sw = rt.RenderConfig(**base)
    got = np.asarray(whitted.render_tile(scene, px, py, cfg_mk, key))
    want = np.asarray(whitted.render_tile(scene, px, py, cfg_sw, key))
    assert_images_close(got.reshape(res, res, 3), want.reshape(res, res, 3))


def test_streamed_gradients_match_sweep():
    """custom_vjp backward (vjp of the twin) == sweep autodiff for material,
    light, and geometry parameters."""
    scene = rt.build_scene(mount_scene(res=8))
    cfg_mk = rt.RenderConfig(max_depth=2, engine="megakernel",
                             megakernel_interpret=True)
    cfg_sw = rt.RenderConfig(max_depth=2)
    px, py = _grid(8)
    key = jax.random.PRNGKey(0)

    from u_4a_2s_p3d_raytracer_template2_tpu.core.build import (
        with_prim_params,
    )

    def make_loss(cfg):
        def loss(mats, lpos, pp):
            s = dataclasses.replace(
                scene, materials=mats,
                lights=dataclasses.replace(scene.lights, position=lpos))
            s = with_prim_params(s, pp)
            img = whitted.render_tile(s, px, py, cfg, key)
            return jnp.sum(img ** 2)
        return loss

    args = (scene.materials, scene.lights.position, scene.prims.params)
    g_mk = jax.grad(make_loss(cfg_mk), argnums=(0, 1, 2))(*args)
    g_sw = jax.grad(make_loss(cfg_sw), argnums=(0, 1, 2))(*args)
    for a, b in zip(jax.tree.leaves(g_mk), jax.tree.leaves(g_sw)):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(b).max() + 1e-6
        assert np.abs(a - b).max() / scale < 5e-2


def test_streamed_sharded_matches_single_device():
    """The whole point of the streamed kernel: engine='megakernel' renders
    under shard_map (scene as a traced replicated pytree)."""
    from u_4a_2s_p3d_raytracer_template2_tpu.parallel.dist import (
        default_mesh,
        render_image_sharded,
    )

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    scene = rt.build_scene(mount_scene(res=16))
    cfg = rt.RenderConfig(max_depth=2, engine="megakernel",
                          megakernel_interpret=True)
    cfg_sweep = rt.RenderConfig(max_depth=2)
    mesh = default_mesh(8)
    img = np.asarray(render_image_sharded(scene, cfg, mesh))
    want = np.asarray(whitted.render_image(scene, cfg_sweep))
    assert_images_close(img, want)


def test_streamed_train_step_full_matches_sweep():
    """Sharded inverse-rendering step through the streamed engine: loss and
    stepped parameters match the sweep engine's step."""
    from u_4a_2s_p3d_raytracer_template2_tpu.parallel.dist import (
        default_mesh,
        lr_scales,
        train_step_full,
    )

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    scene = rt.build_scene(mount_scene(res=8))
    cfg = rt.RenderConfig(max_depth=2, engine="megakernel",
                          megakernel_interpret=True)
    cfg_sweep = rt.RenderConfig(max_depth=2)
    mesh = default_mesh(8)
    target = whitted.render_image(scene, cfg_sweep)
    s_mk, loss_mk = train_step_full(scene, target, cfg, mesh, 0.01,
                                    jax.random.PRNGKey(1),
                                    lr_scales(materials=1.0))
    s_sw, loss_sw = train_step_full(scene, target, cfg_sweep, mesh, 0.01,
                                    jax.random.PRNGKey(1),
                                    lr_scales(materials=1.0))
    assert abs(float(loss_mk) - float(loss_sw)) < 1e-5
    for a, b in zip(jax.tree.leaves(s_mk.materials),
                    jax.tree.leaves(s_sw.materials)):
        assert np.abs(np.asarray(a) - np.asarray(b)).max() < 1e-4


def test_streamed_supports_and_tables():
    scene = rt.build_scene(mount_scene(res=8))
    cfg = rt.RenderConfig()
    assert supports(scene, cfg)
    tbl, lt, bg = scene_tables(scene)
    shape = shape_of(scene, cfg)
    assert tbl.shape == (shape.n * 23,)
    assert lt.shape == (max(1, scene.n_lights) * 6,)
    assert bg.shape == (3,)
    # param rows land in the baked kernel's type-grouped order
    tblr = np.asarray(tbl).reshape(shape.n, 23)
    p = scene.prims
    n_tri = p.n_tri
    np.testing.assert_allclose(tblr[:n_tri, :12], np.asarray(p.tri_p[:n_tri]))
    np.testing.assert_allclose(tblr[n_tri:n_tri + p.n_sph, :4],
                               np.asarray(p.sph_p[:p.n_sph]))
