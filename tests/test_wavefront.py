"""Wavefront engine parity: the stream-compacted queue renderer must match
the level sweep exactly (deterministic configs) — same images, live
gradients, AA mode, and odd batch sizes."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import u_4a_2s_p3d_raytracer_template2_tpu as rt
from u_4a_2s_p3d_raytracer_template2_tpu.models.scenes import mount_scene
from u_4a_2s_p3d_raytracer_template2_tpu.models.whitted import render_tile

from conftest import assert_images_close
from test_whitted_vs_oracle import mixed_scene, sphere_plane_scene


SCENES = {
    "mount": lambda: mount_scene(res=32),
    "mixed": lambda: mixed_scene(res=32),
    "sphere_plane": lambda: sphere_plane_scene(res=32),
}


@pytest.mark.parametrize("scene_name", sorted(SCENES))
@pytest.mark.parametrize("kw", [
    {},
    {"fresnel_mode": "reference_exact"},
    {"refraction_mode": "physical"},
    {"soft_shadow": True},
])
def test_wavefront_matches_sweep(scene_name, kw):
    scene = rt.build_scene(SCENES[scene_name]())
    a = np.asarray(rt.render_image(scene, rt.RenderConfig(engine="sweep", **kw)))
    b = np.asarray(rt.render_image(scene, rt.RenderConfig(engine="wavefront", **kw)))
    # identical math, different accumulation association (weight products
    # vs backward fold) — f32 reassociation only
    np.testing.assert_allclose(b, a, atol=5e-4)


def test_wavefront_aa_dof_matches_sweep():
    """AA+DoF distribution mode: same RNG stream order for camera samples,
    so images must agree to f32 reassociation."""
    sd = mixed_scene(res=24)
    scene = rt.build_scene(sd)
    kw = dict(anti_aliasing=True, depth_of_field=True, spp=2)
    a = np.asarray(rt.render_image(scene, rt.RenderConfig(engine="sweep", **kw),
                                   key=jax.random.PRNGKey(7)))
    b = np.asarray(rt.render_image(scene, rt.RenderConfig(engine="wavefront", **kw),
                                   key=jax.random.PRNGKey(7)))
    np.testing.assert_allclose(b, a, atol=5e-4)


def test_wavefront_skybox_deferred_matches_sweep():
    """Skybox-on-miss parity in BOTH wavefront modes: the default per-level
    lookup and the opt-in deferred epilogue (wavefront_defer_sky — weight-
    recorded misses, one gather pass per level's records) must match the
    sweep; the deferred form only changes the f32 add order. Exercises miss
    lanes at every depth (the glass sphere refracts rays out to the sky)."""
    rng = np.random.RandomState(3)
    sky_u8 = rng.randint(0, 256, (6, 16, 16, 3)).astype(np.uint8)
    scene = rt.build_scene(mixed_scene(res=28))
    scene = dataclasses.replace(scene, skybox=jnp.asarray(sky_u8),
                                has_skybox=True)
    a = np.asarray(rt.render_image(
        scene, rt.RenderConfig(engine="sweep", use_skybox=True)))
    for defer in (False, True):
        b = np.asarray(rt.render_image(scene, rt.RenderConfig(
            engine="wavefront", use_skybox=True,
            wavefront_defer_sky=defer)))
        np.testing.assert_allclose(b, a, atol=5e-4, err_msg=f"defer={defer}")


def test_wavefront_gradients_match_sweep():
    scene = rt.build_scene(mount_scene(res=12))
    ys, xs = jnp.meshgrid(jnp.arange(12, dtype=jnp.float32),
                          jnp.arange(12, dtype=jnp.float32), indexing="ij")
    px, py = xs.reshape(-1), ys.reshape(-1)

    def loss(materials, engine):
        cfg = rt.RenderConfig(engine=engine)
        s = dataclasses.replace(scene, materials=materials)
        img = render_tile(s, px, py, cfg, jax.random.PRNGKey(0))
        return jnp.mean(img ** 2)

    g_s = jax.grad(lambda m: loss(m, "sweep"))(scene.materials)
    g_w = jax.grad(lambda m: loss(m, "wavefront"))(scene.materials)
    for a, b in zip(jax.tree.leaves(g_s), jax.tree.leaves(g_w)):
        assert np.isfinite(np.asarray(b)).all()
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-3, atol=1e-5)


def test_wavefront_capacity_overflow_drops_gracefully():
    """A tiny capacity drops the lowest-priority children but must stay
    finite and close to the full render (secondary energy is bounded)."""
    scene = rt.build_scene(mixed_scene(res=24))
    full = np.asarray(rt.render_image(scene, rt.RenderConfig(engine="wavefront")))
    tiny = np.asarray(rt.render_image(
        scene, rt.RenderConfig(engine="wavefront", wavefront_capacity=0.05)))
    assert np.isfinite(tiny).all()
    # primary shading is identical; only secondary contributions can drop
    assert np.abs(tiny - full).mean() < 0.1
