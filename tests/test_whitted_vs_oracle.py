"""Golden test: vectorized Whitted renderer vs the scalar NumPy oracle.

Covers BASELINE configs #1/#2: sphere+plane Whitted and a multi-sphere scene
with reflection + refraction, brute-force intersection.
"""
import jax
import numpy as np
import pytest

import u_4a_2s_p3d_raytracer_template2_tpu as rt
from conftest import assert_images_close
from oracle import Oracle


def sphere_plane_scene(res=24):
    sd = rt.SceneDef()
    sd.set_camera(eye=[0, 1, 5], at=[0, 0, 0], up=[0, 1, 0], fov=45,
                  hither=0.01, res_x=res, res_y=res, aperture_ratio=0,
                  focal_ratio=1)
    m0 = sd.add_material([0.8, 0.2, 0.2], 0.9, [1, 1, 1], 0.1, 30, 0, 1)
    sd.add_sphere([0, 0, 0], 1.0, m0)
    m1 = sd.add_material([0.4, 0.4, 0.9], 1.0, [1, 1, 1], 0.0, 10, 0, 1)
    sd.add_plane_points([0, -1, 0], [1, -1, 0], [0, -1, -1], m1)
    sd.add_light([5, 5, 5], [1, 1, 1])
    sd.add_light([-4, 6, 2], [0.4, 0.4, 0.6])
    sd.bg_color = np.array([0.1, 0.2, 0.3], np.float32)
    return sd


def mixed_scene(res=24):
    """Spheres with reflection and refraction, a triangle, a box."""
    sd = rt.SceneDef()
    sd.set_camera(eye=[0.5, 1.5, 6], at=[0, 0.3, 0], up=[0, 1, 0], fov=40,
                  hither=0.01, res_x=res, res_y=res, aperture_ratio=0,
                  focal_ratio=1)
    diffuse = sd.add_material([0.7, 0.7, 0.2], 1.0, [1, 1, 1], 0.0, 10, 0, 1)
    mirror = sd.add_material([0.1, 0.1, 0.1], 0.2, [0.9, 0.9, 0.9], 0.8, 200, 0, 1)
    glass = sd.add_material([0.0, 0.0, 0.0], 0.0, [1, 1, 1], 0.1, 100, 1, 1.5)
    sd.add_plane_points([0, -0.5, 0], [1, -0.5, 0], [0, -0.5, -1], diffuse)
    sd.add_sphere([-1.2, 0.3, 0], 0.8, mirror)
    sd.add_sphere([1.0, 0.2, 1.0], 0.7, glass)
    sd.add_triangle([-0.5, -0.4, 2.0], [0.5, -0.4, 2.0], [0, 0.7, 1.8], diffuse)
    sd.add_box([-0.4, -0.5, -1.5], [0.6, 0.5, -0.6], mirror)
    sd.add_light([4, 6, 4], [1, 1, 1])
    sd.bg_color = np.array([0.3, 0.5, 0.9], np.float32)
    return sd


@pytest.mark.parametrize("mode", ["schlick", "reference_exact"])
@pytest.mark.parametrize("refr", ["reference", "physical"])
def test_mixed_scene_matches_oracle(mode, refr):
    sd = mixed_scene()
    cfg = rt.RenderConfig(fresnel_mode=mode, refraction_mode=refr)
    scene = rt.build_scene(sd)
    img = np.asarray(rt.render_image(scene, cfg), np.float64)
    want = Oracle(sd, cfg).render()
    assert_images_close(img, want)


def test_sphere_plane_matches_oracle():
    sd = sphere_plane_scene()
    cfg = rt.RenderConfig()
    scene = rt.build_scene(sd)
    img = np.asarray(rt.render_image(scene, cfg), np.float64)
    want = Oracle(sd, cfg).render()
    assert_images_close(img, want)


def test_background_pixels():
    sd = sphere_plane_scene()
    scene = rt.build_scene(sd)
    img = np.asarray(rt.render_image(scene, rt.RenderConfig()))
    # top corners look at the sky
    np.testing.assert_allclose(img[-1, 0], [0.1, 0.2, 0.3], atol=1e-5)
    np.testing.assert_allclose(img[-1, -1], [0.1, 0.2, 0.3], atol=1e-5)


def test_unbounded_shadow_quirk():
    """NONE-mode shadows: occluders beyond the light still shadow when the
    reference quirk is enabled (SURVEY.md quirk #6)."""
    sd = rt.SceneDef()
    sd.set_camera(eye=[0, 0, 5], at=[0, 0, 0], up=[0, 1, 0], fov=20,
                  hither=0.01, res_x=16, res_y=16, aperture_ratio=0,
                  focal_ratio=1)
    m = sd.add_material([1, 1, 1], 1.0, [1, 1, 1], 0.0, 10, 0, 1)
    # small floor triangle at z=0, light just above it, and a huge occluder
    # sphere far beyond the light that every extended shadow ray would hit
    sd.add_triangle([-0.5, -0.5, 0], [0.5, -0.5, 0], [0, 0.5, 0], m)
    sd.add_light([0, 0, 1], [1, 1, 1])
    sd.add_sphere([0, 0, 100], 60.0, m)
    sd.bg_color = np.array([0, 0, 0], np.float32)

    scene = rt.build_scene(sd)
    bounded = np.asarray(rt.render_image(scene, rt.RenderConfig()))
    unbounded = np.asarray(
        rt.render_image(scene, rt.RenderConfig(shadow_unbounded=True)))
    lit = bounded[..., 0] > 0.2        # physically lit floor pixels
    assert lit.sum() >= 3
    # reference quirk: the same pixels fall in shadow from an occluder that
    # sits beyond the light
    assert unbounded[lit].max() <= 1e-6


def test_distribution_mode_aa_dof():
    """AA+DoF distribution mode (spp>0): the jittered-subpixel scan path.
    The AA estimate must stay close to the deterministic render and the
    reference /16 quirk must scale it by (spp/4)^2."""
    import dataclasses

    sd = mixed_scene(res=16)
    sd.spp = 2
    scene = rt.build_scene(sd)
    cfg = rt.RenderConfig(soft_shadow=True).with_scene_flags(scene)
    assert cfg.anti_aliasing and cfg.depth_of_field and cfg.spp == 2
    img = np.asarray(rt.render_image(scene, cfg))
    assert np.isfinite(img).all() and img.min() >= 0 and img.max() <= 1

    plain = np.asarray(rt.render_image(scene, rt.RenderConfig()))
    assert np.abs(img.mean() - plain.mean()) < 0.1

    # reference AA quirk: hard-coded /(4*4) average (main.cpp:800)
    cfg16 = dataclasses.replace(cfg, reference_aa_div16=True)
    img16 = np.asarray(rt.render_image(scene, cfg16, jax.random.PRNGKey(0)))
    img_n = np.asarray(rt.render_image(scene, cfg, jax.random.PRNGKey(0)))
    np.testing.assert_allclose(img16 * 16.0, img_n * 4.0, atol=1e-5)


def test_fuzzy_reflection_and_motion_blur_run():
    sd = mixed_scene(res=12)
    scene = rt.build_scene(sd)
    cfg = rt.RenderConfig(fuzzy_reflection=True, motion_blur=True)
    img = np.asarray(rt.render_image(scene, cfg, jax.random.PRNGKey(1)))
    assert np.isfinite(img).all()


def test_camera_orbit_reframe():
    """SetEye-equivalent orbit (camera.h:80-89): moving the eye re-derives a
    valid orthonormal frame and changes the picture."""
    from u_4a_2s_p3d_raytracer_template2_tpu.ops.camera import orbit_eye, with_eye
    import dataclasses

    sd = sphere_plane_scene(res=12)
    scene = rt.build_scene(sd)
    img0 = np.asarray(rt.render_image(scene, rt.RenderConfig()))

    cam2 = with_eye(scene.camera, orbit_eye(scene.camera, 30.0, 20.0, 5.0))
    u, v, n = np.asarray(cam2.u), np.asarray(cam2.v), np.asarray(cam2.n)
    for a, b in [(u, v), (u, n), (v, n)]:
        assert abs(float(a @ b)) < 1e-5
    scene2 = dataclasses.replace(scene, camera=cam2)
    img1 = np.asarray(rt.render_image(scene2, rt.RenderConfig()))
    assert np.abs(img0 - img1).mean() > 0.01


def test_random_scene_builder_renders():
    """create_random_scene equivalent (scene.cpp:677-751): RTiOW field with
    BVH accel; renders finite on a small raster."""
    from u_4a_2s_p3d_raytracer_template2_tpu.models.scenes import random_scene

    sd = random_scene(res_x=24, res_y=18)
    scene = rt.build_scene(sd)
    assert scene.accel_type == rt.constants.ACCEL_BVH and scene.bvh is not None
    assert scene.n_objects > 80
    img = np.asarray(rt.render_image(scene, rt.RenderConfig()))
    assert np.isfinite(img).all() and img.std() > 0.02


def test_subtree_pruning_matches_oracle():
    """Static subtree pruning (no transmissive -> no refraction subtree; no
    reflective -> single level) must not change results vs the oracle."""
    # diffuse-only scene: everything prunes to one level
    sd = rt.SceneDef()
    sd.set_camera(eye=[0, 1, 5], at=[0, 0, 0], up=[0, 1, 0], fov=45,
                  hither=0.01, res_x=16, res_y=16, aperture_ratio=0,
                  focal_ratio=1)
    m = sd.add_material([0.8, 0.3, 0.2], 1.0, [1, 1, 1], 0.0, 10, 0, 1)
    sd.add_sphere([0, 0, 0], 1.0, m)
    sd.add_plane_points([0, -1, 0], [1, -1, 0], [0, -1, -1], m)
    sd.add_light([5, 5, 5], [1, 1, 1])
    sd.bg_color = np.array([0.2, 0.2, 0.2], np.float32)
    scene = rt.build_scene(sd)
    assert not scene.has_reflective and not scene.has_transmissive
    cfg = rt.RenderConfig()
    img = np.asarray(rt.render_image(scene, cfg), np.float64)
    from conftest import assert_images_close
    assert_images_close(img, Oracle(sd, cfg).render())

    # reflective-only (sphere_plane has ks>0, T=0 everywhere): chain tree
    sd2 = sphere_plane_scene(res=16)
    scene2 = rt.build_scene(sd2)
    assert scene2.has_reflective and not scene2.has_transmissive
    img2 = np.asarray(rt.render_image(scene2, cfg), np.float64)
    assert_images_close(img2, Oracle(sd2, cfg).render())


def test_soft_shadow_grid_matches_oracle():
    """Deterministic 4x4-grid soft shadows (SOFT_SHADOW && !AA,
    main.cpp:601-618) against the oracle."""
    sd = mixed_scene(res=16)
    cfg = rt.RenderConfig(soft_shadow=True)
    scene = rt.build_scene(sd)
    img = np.asarray(rt.render_image(scene, cfg), np.float64)
    want = Oracle(sd, cfg).render()
    assert_images_close(img, want, max_bad_frac=0.02)
