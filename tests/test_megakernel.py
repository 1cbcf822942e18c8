"""Scene-baked Whitted megakernel vs the XLA sweep engine.

The megakernel (models/whitted_megakernel.py) re-implements the full
recursion tree in one Pallas kernel; these tests pin its images against the
sweep engine (interpret mode on CPU) across primitive types, depths, and
the AA/DoF distribution mode, plus the unsupported-config fallback.
"""
import dataclasses

import numpy as np
import jax
import pytest

import u_4a_2s_p3d_raytracer_template2_tpu as rt
from u_4a_2s_p3d_raytracer_template2_tpu.models import whitted
from u_4a_2s_p3d_raytracer_template2_tpu.models import whitted_megakernel as mk

from conftest import assert_images_close
from test_whitted_vs_oracle import mixed_scene, sphere_plane_scene


def _grid(res):
    import jax.numpy as jnp

    ys, xs = jnp.meshgrid(jnp.arange(res, dtype=jnp.float32),
                          jnp.arange(res, dtype=jnp.float32), indexing="ij")
    return xs.reshape(-1), ys.reshape(-1)


def _test_skybox():
    """Small smooth synthetic cubemap: per-face tint + gradient (smooth so
    a one-texel lookup flip from float-assoc differences stays tiny)."""
    import jax.numpy as jnp

    h = w = 8
    faces = np.zeros((6, h, w, 3), np.float32)
    tints = np.array([[1, .3, .2], [.2, 1, .3], [.3, .2, 1],
                      [1, 1, .2], [.2, 1, 1], [1, .2, 1]], np.float32)
    yy, xx = np.meshgrid(np.linspace(0, 1, h), np.linspace(0, 1, w),
                         indexing="ij")
    g = (0.3 + 0.7 * 0.5 * (yy + xx))[None, :, :, None]
    faces = tints[:, None, None, :] * g
    return jnp.asarray(faces)


def _with_skybox(scene):
    return dataclasses.replace(scene, skybox=_test_skybox(),
                               has_skybox=True)


def _compare(sd, cfg, res, atol=2e-3, skybox=False):
    scene = rt.build_scene(sd)
    if skybox:
        scene = _with_skybox(scene)
    px, py = _grid(res)
    key = jax.random.PRNGKey(0)
    from u_4a_2s_p3d_raytracer_template2_tpu.core.types import clamp01

    want = np.asarray(whitted.render_tile(scene, px, py, cfg, key))
    tile = mk.make_render_tile(scene, cfg, interpret=True)
    got = np.asarray(tile(px, py, key))
    if not cfg.anti_aliasing:
        want = np.clip(want, 0.0, 1.0)
    assert np.isfinite(got).all()
    assert_images_close(got.reshape(res, res, 3), want.reshape(res, res, 3),
                        atol=atol)


def test_megakernel_mount():
    """Depth 3 on CPU: interpret-mode compile grows ~5x per extra level
    (the full depth-4 tree is pinned on device; see ARCHITECTURE.md)."""
    from u_4a_2s_p3d_raytracer_template2_tpu.models.scenes import mount_scene

    _compare(mount_scene(res=24), rt.RenderConfig(max_depth=3), 24)


def test_megakernel_mixed_types():
    """mixed_scene exercises sphere+plane+triangle+mirror+glass."""
    _compare(mixed_scene(res=16), rt.RenderConfig(max_depth=2), 16)


def test_megakernel_depth_3_mixed():
    _compare(mixed_scene(res=12), rt.RenderConfig(max_depth=3), 12)


def test_megakernel_box_scene():
    """aaBox primitive path incl. the slab face normal."""
    sd = sphere_plane_scene(res=12)
    m = sd.add_material([0.8, 0.3, 0.2], 0.9, [1, 1, 1], 0.2, 30, 0, 1)
    sd.add_box([-1.5, -0.5, -1.5], [-0.5, 0.5, -0.5], m)
    _compare(sd, rt.RenderConfig(max_depth=2), 12)


def test_megakernel_aa_dof():
    """Distribution mode: jittered AA + DoF rays generated outside the
    kernel; stochastic, so compare against the sweep on the same key."""
    sd = mixed_scene(res=10)
    sd.camera["aperture_ratio"] = 2.0
    cfg = dataclasses.replace(rt.RenderConfig(max_depth=2), spp=2,
                              anti_aliasing=True, depth_of_field=True)
    _compare(sd, cfg, 10, atol=5e-3)


def test_megakernel_fresnel_refraction_modes():
    """The reference-quirk fresnel/refraction switches bake as compile-time
    constants; images stay elementwise equal to the sweep's."""
    for kw in (dict(fresnel_mode="reference_schlick"),
               dict(fresnel_mode="reference_exact"),
               dict(refraction_mode="physical")):
        _compare(mixed_scene(res=10), rt.RenderConfig(max_depth=2, **kw), 10)


def test_megakernel_soft_shadow_grid():
    """Deterministic 4x4 soft-shadow light grid (main.cpp:601-618), run as
    an in-kernel fori_loop."""
    _compare(sphere_plane_scene(res=12),
             rt.RenderConfig(max_depth=2, soft_shadow=True), 12)


def test_megakernel_soft_shadow_grid_mixed_depth3():
    _compare(mixed_scene(res=10),
             rt.RenderConfig(max_depth=3, soft_shadow=True), 10)


def test_megakernel_soft_shadow_jittered():
    """Jittered soft shadows under AA: the offsets are drawn OUTSIDE the
    kernel with the sweep's exact RNG chain and streamed in — elementwise
    parity, not statistical."""
    cfg = dataclasses.replace(
        rt.RenderConfig(max_depth=2, soft_shadow=True), spp=2,
        anti_aliasing=True)
    _compare(mixed_scene(res=8), cfg, 8, atol=5e-3)


def test_megakernel_fuzzy_reflection():
    """Streamed unit-sphere perturbations; hemisphere accept in-kernel."""
    _compare(mixed_scene(res=10),
             rt.RenderConfig(max_depth=3, fuzzy_reflection=True), 10)


def test_megakernel_fuzzy_plus_jittered_soft():
    """Both stochastic features at once (independent stream rows)."""
    cfg = dataclasses.replace(
        rt.RenderConfig(max_depth=2, soft_shadow=True,
                        fuzzy_reflection=True),
        spp=2, anti_aliasing=True)
    _compare(mixed_scene(res=8), cfg, 8, atol=5e-3)


def test_megakernel_skybox_deferred():
    """Deferred-sky: misses shade black in-kernel; weights+directions stream
    out and the epilogue's cubemap gather reconstitutes the sweep's image
    elementwise (refl+refr tree — every node can contribute sky)."""
    cfg = dataclasses.replace(rt.RenderConfig(max_depth=3),
                              use_skybox=True)
    _compare(mixed_scene(res=12), cfg, 12, skybox=True)


def test_megakernel_skybox_refl_only_chain():
    """balls_low/dof-class scenes: reflective-only materials → chain
    recursion, 4 sky nodes."""
    sd = sphere_plane_scene(res=12)
    cfg = dataclasses.replace(rt.RenderConfig(max_depth=4),
                              use_skybox=True)
    _compare(sd, cfg, 12, skybox=True)


def test_megakernel_skybox_distribution_mode():
    """The reference's headline spp>0 mode (AA+DoF, main.cpp:939-946) with
    skybox-on-miss — the balls_low.p3f / dof.p3f configuration."""
    sd = mixed_scene(res=8)
    sd.camera["aperture_ratio"] = 2.0
    cfg = dataclasses.replace(rt.RenderConfig(max_depth=2), spp=2,
                              anti_aliasing=True, depth_of_field=True,
                              use_skybox=True)
    _compare(sd, cfg, 8, atol=5e-3, skybox=True)


def test_megakernel_skybox_u8_packed():
    """Loaded (u8) cubemaps ride the packed-u32 plane-wise epilogue
    (the in-frame A/B winner, tools/bench_r5.py parts s/c); colors must
    still match the sweep's u8 skybox_color path exactly."""
    rng = np.random.RandomState(7)
    sky_u8 = rng.randint(0, 256, (6, 8, 8, 3)).astype(np.uint8)
    sd = mixed_scene(res=10)
    scene = rt.build_scene(sd)
    import jax.numpy as jnp

    scene = dataclasses.replace(scene, skybox=jnp.asarray(sky_u8),
                                has_skybox=True)
    cfg = dataclasses.replace(rt.RenderConfig(max_depth=2), use_skybox=True)
    px, py = _grid(10)
    key = jax.random.PRNGKey(0)
    want = np.clip(np.asarray(whitted.render_tile(scene, px, py, cfg, key)),
                   0.0, 1.0)
    tile = mk.make_render_tile(scene, cfg, interpret=True)
    assert tile.sky_operand.ndim == 3  # packed u32 [6,H,W]
    got = np.asarray(tile(px, py, key))
    assert_images_close(got.reshape(10, 10, 3), want.reshape(10, 10, 3),
                        atol=2e-3)


def test_megakernel_supports_skybox():
    from u_4a_2s_p3d_raytracer_template2_tpu.models.scenes import mount_scene

    scene = _with_skybox(rt.build_scene(mount_scene(res=8)))
    cfg = dataclasses.replace(rt.RenderConfig(), use_skybox=True)
    assert mk.supports(scene, cfg)


def test_megakernel_fallback_unsupported(monkeypatch):
    """Scenes the kernel doesn't serve (over the bake ceiling) must fall
    back to the wavefront engine inside render_image (same image either
    way). Soft shadows/fuzzy/parity modes/skybox are all SUPPORTED now —
    the bake ceiling is the only fallback left."""
    from u_4a_2s_p3d_raytracer_template2_tpu.models.scenes import mount_scene

    scene = rt.build_scene(mount_scene(res=12))
    cfg = rt.RenderConfig(engine="megakernel")
    monkeypatch.setattr(mk, "BAKE_MAX_PRIMS", 4)
    assert not mk.supports(scene, cfg)
    img = np.asarray(whitted.render_image(scene, cfg))
    want = np.asarray(
        whitted.render_image(scene, dataclasses.replace(
            cfg, engine="wavefront")))
    np.testing.assert_allclose(img, want, atol=1e-6)


def test_megakernel_supports_stochastic_configs():
    """The r2-verdict config gaps are closed: soft shadows (both modes),
    fuzzy reflection, and every fresnel/refraction parity mode bake."""
    from u_4a_2s_p3d_raytracer_template2_tpu.models.scenes import mount_scene

    scene = rt.build_scene(mount_scene(res=12))
    for cfg in (
        rt.RenderConfig(soft_shadow=True),
        dataclasses.replace(rt.RenderConfig(soft_shadow=True), spp=2,
                            anti_aliasing=True),
        rt.RenderConfig(fuzzy_reflection=True),
        rt.RenderConfig(fresnel_mode="reference_schlick"),
        rt.RenderConfig(fresnel_mode="reference_exact"),
        rt.RenderConfig(refraction_mode="physical"),
    ):
        assert mk.supports(scene, cfg)
