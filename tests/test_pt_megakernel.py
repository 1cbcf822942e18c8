"""PT megakernel vs the XLA integrator: draw-for-draw parity.

Both consume the same pre-drawn uniforms (pathtracer.draw_uniforms), so the
comparison is elementwise, not statistical (see models/pt_megakernel.py
module doc). Kernel runs in Pallas interpret mode on the CPU backend with a
small block (sub=8).

CI uses a tiny world exercising every branch — static/moving spheres,
negative-radius shell, all three scatter types, fuzzy metal, Beer's-law
glass, triangles, multiple lights — because interpret-compiling the full
~105-sphere glsl_world takes minutes on CPU; the full world is validated
on-device by tools/device_validate.py (artifact committed there).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from u_4a_2s_p3d_raytracer_template2_tpu.models import pathtracer as pt
from u_4a_2s_p3d_raytracer_template2_tpu.models import pt_megakernel as mk
from u_4a_2s_p3d_raytracer_template2_tpu.models.glsl_scene import (
    glsl_camera,
    glsl_world,
)
from u_4a_2s_p3d_raytracer_template2_tpu.ops.camera import thin_lens_rays


def tiny_world() -> pt.PTScene:
    """Every megakernel branch in 7 spheres + 2 triangles + 2 lights."""
    f = np.float32
    mats = pt.PTMaterials(
        mtype=jnp.asarray([pt.MT_DIFFUSE, pt.MT_DIFFUSE, pt.MT_METAL,
                           pt.MT_METAL, pt.MT_DIELECTRIC, pt.MT_DIELECTRIC,
                           pt.MT_DIFFUSE], jnp.int32),
        albedo=jnp.asarray([[.6, .3, .2], [.2, .5, .7], [0, 0, 0], [0, 0, 0],
                            [1, 1, 1], [1, 1, 1], [.4, .4, .4]], f),
        spec_color=jnp.asarray([[0] * 3, [0] * 3, [.8, .7, .6], [.9, .9, .9],
                                [.04] * 3, [.04] * 3, [0] * 3], f),
        roughness=jnp.asarray([1, 1, 0, 0.4, 0, 0.2, 1], f),
        ref_idx=jnp.asarray([1, 1, 1, 1, 1.5, 1.2, 1], f),
        refract_color=jnp.asarray([[0] * 3] * 4 + [[0, 0, 0], [.3, .1, .6],
                                   [0] * 3], f),
        emissive=jnp.zeros((7, 3), f),
    )
    c0 = np.array([[-2, 0.5, 0], [0, 0.5, 0], [2, 0.5, 0], [-1, 0.5, -2],
                   [1, 0.5, -2], [1, 0.5, -2], [3, 0.5, -1]], f)
    c1 = c0.copy()
    c1[1] += [0, 0.4, 0]  # moving diffuse
    rad = np.array([0.5, 0.5, 0.5, 0.5, 0.5, -0.25, 0.5], f)  # hollow shell
    return pt.PTScene(
        sp_center0=jnp.asarray(c0), sp_center1=jnp.asarray(c1),
        sp_radius=jnp.asarray(rad),
        sp_time0=jnp.zeros(7, f), sp_time1=jnp.ones(7, f),
        sp_mat=jnp.asarray([0, 1, 2, 3, 4, 5, 1], jnp.int32),
        tri_v0=jnp.asarray([[-8, 0, 8], [-8, 0, -8]], f),
        tri_e1=jnp.asarray([[16, 0, 0], [16, 0, 16]], f),
        tri_e2=jnp.asarray([[0, 0, -16], [16, 0, 0]], f),
        tri_mat=jnp.asarray([6, 6], jnp.int32),
        materials=mats,
        light_pos=jnp.asarray([[-5, 8, 3], [5, 8, -3]], f),
        light_color=jnp.asarray([[1, 1, 1], [.8, .8, 1]], f),
    )


def _rays(res=8, seed=5, eye=(0.0, 2.0, 6.0)):
    from u_4a_2s_p3d_raytracer_template2_tpu.core.build import build_camera

    cam = build_camera(dict(
        eye=np.array(eye, np.float32),
        at=np.array([0, 0.5, -1], np.float32),
        up=np.array([0, 1, 0], np.float32),
        fov=60.0, hither=0.01, res_x=res, res_y=res,
        aperture_ratio=0.0, focal_ratio=1.0))
    ys, xs = jnp.meshgrid(jnp.arange(float(res)), jnp.arange(float(res)),
                          indexing="ij")
    px = xs.reshape(-1) + 0.5
    py = ys.reshape(-1) + 0.5
    R = px.shape[0]
    time = jax.random.uniform(jax.random.PRNGKey(seed), (R,))
    return thin_lens_rays(cam, px, py, jnp.zeros((R, 2)), time)


def _compare(scene, cfg, rays, uni, atol=2e-3):
    ref = np.asarray(pt.ray_color_presampled(scene, cfg, rays, uni))
    trace = mk.trace_rays_megakernel(scene, cfg, interpret=True, sub=8)
    got = np.asarray(trace(rays.origin, rays.direction, rays.time, uni))
    assert np.isfinite(got).all()
    d = np.abs(got - ref)
    # f32 reassociation at silhouettes can push isolated rays past atol;
    # the image must agree everywhere else and in the mean
    assert (d.max(axis=-1) > atol).mean() < 0.02, d.max()
    assert d.mean() < 1e-4
    return got


def test_supports_glsl_world():
    assert mk.supports(glsl_world())


def test_parity_basic():
    scene = tiny_world()
    rays = _rays()
    cfg = pt.PTConfig(max_bounces=3)
    uni = pt.draw_uniforms(jax.random.PRNGKey(1), 3, rays.origin.shape[0])
    got = _compare(scene, cfg, rays, uni)
    assert got.std() > 0.05  # a real image, not a constant


def test_parity_russian_roulette():
    scene = tiny_world()
    rays = _rays(seed=6)
    cfg = pt.PTConfig(max_bounces=4, russian_roulette=True)
    uni = pt.draw_uniforms(jax.random.PRNGKey(2), 4, rays.origin.shape[0])
    _compare(scene, cfg, rays, uni)


def test_parity_shadow_len1_quirk():
    scene = tiny_world()
    rays = _rays(seed=7)
    cfg = pt.PTConfig(max_bounces=2, reference_shadow_len1=True)
    uni = pt.draw_uniforms(jax.random.PRNGKey(3), 2, rays.origin.shape[0])
    _compare(scene, cfg, rays, uni)


def test_quirk_switch_changes_image():
    """len-1 feelers treat nothing within |L|>1 as occluding — the two
    switch settings must differ somewhere on a shadowed view."""
    scene = tiny_world()
    rays = _rays(seed=7)
    uni = pt.draw_uniforms(jax.random.PRNGKey(3), 2, rays.origin.shape[0])
    a = np.asarray(pt.ray_color_presampled(
        scene, pt.PTConfig(max_bounces=2), rays, uni))
    b = np.asarray(pt.ray_color_presampled(
        scene, pt.PTConfig(max_bounces=2, reference_shadow_len1=True),
        rays, uni))
    assert np.abs(a - b).max() > 1e-3


def test_render_frame_megakernel_matches_statistically():
    """make_render_frame: same camera sampling machinery, so a few frames
    must land near the keyed integrator's estimate of the same view."""
    scene = tiny_world()
    cam = glsl_camera(8, 8)
    cfg = pt.PTConfig(max_bounces=3)
    frame_fn = mk.make_render_frame(scene, cam, cfg, interpret=True, sub=8)
    mk_mean = np.zeros((8, 8, 3))
    xla_mean = np.zeros((8, 8, 3))
    n = 4
    for i in range(n):
        mk_mean += np.asarray(frame_fn(jax.random.PRNGKey(100 + i))) / n
        xla_mean += np.asarray(
            pt.render_frame(scene, cam, cfg, jax.random.PRNGKey(200 + i))) / n
    assert np.isfinite(mk_mean).all()
    # same scene, same estimator family: means agree within MC noise
    assert np.abs(mk_mean.mean() - xla_mean.mean()) / xla_mean.mean() < 0.3


def test_keyed_scatter_stream_unchanged():
    """The scatter refactor (presampled core + keyed wrapper) must keep the
    keyed draw structure: scatter(key) == scatter_presampled(raw draws of
    that key), bitwise."""
    scene = tiny_world()
    rays = _rays(res=4, seed=9)
    hit = pt.hit_world(scene, rays)
    key = jax.random.PRNGKey(11)
    cfg = pt.PTConfig()
    r1, a1, s1 = pt.scatter(key, cfg, rays, hit, scene.materials)
    R = rays.origin.shape[0]
    k1, k2, k3, k4 = jax.random.split(key, 4)
    u = jnp.stack([*pt._raw3(k1, R), *pt._raw3(k2, R),
                   jax.random.uniform(k3, (R,), jnp.float32),
                   *pt._raw3(k4, R)])
    r2, a2, s2 = pt.scatter_presampled(u, cfg, rays, hit, scene.materials)
    np.testing.assert_array_equal(np.asarray(r1.direction),
                                  np.asarray(r2.direction))
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
