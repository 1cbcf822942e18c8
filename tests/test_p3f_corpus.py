"""Parse the reference .p3f scene corpus and sanity-render (SURVEY.md §2
scene asset inventory — the corpus IS the reference's fixture set)."""
import numpy as np
import pytest

import u_4a_2s_p3d_raytracer_template2_tpu as rt
from u_4a_2s_p3d_raytracer_template2_tpu.core import constants as C

from conftest import ref_scene_path

# name -> (n_objects, n_lights, accel, spp, res_x)
EXPECTED = {
    "mount_low.p3f": (12, 1, 0, 0, 512),
    "mount_high.p3f": (2052, 1, 0, 0, 512),
    "balls_low.p3f": (12, 3, 2, 4, 512),
    "balls_medium.p3f": (92, 3, 0, 0, 512),
    "balls_high.p3f": (7382, 3, 0, 0, 512),
    "balls_box.p3f": (93, 3, 0, 0, 1024),
    "dof.p3f": (9, 3, 2, 4, 512),
    "dragon.p3f": (100005, 2, 0, 0, 256),
}


@pytest.mark.parametrize("name", sorted(EXPECTED))
def test_parse_counts(name):
    sd = rt.parse_p3f(ref_scene_path(name))
    n_obj, n_l, accel, spp, res_x = EXPECTED[name]
    assert len(sd.objects) == n_obj
    assert len(sd.lights) == n_l
    assert sd.accel_type == accel
    assert sd.spp == spp
    assert sd.camera["res_x"] == res_x


def test_mount_low_subsampled_render():
    """Render a 32x32 subsampled grid of mount_low pixels; finite, in-range,
    and not degenerate."""
    import jax
    import jax.numpy as jnp
    from u_4a_2s_p3d_raytracer_template2_tpu.models.whitted import render_tile

    sd = rt.parse_p3f(ref_scene_path("mount_low.p3f"))
    scene = rt.build_scene(sd, load_skybox=False)
    cfg = rt.RenderConfig().with_scene_flags(scene)
    assert scene.spp == 0  # Whitted mode
    n = 32
    xs = jnp.linspace(0, 511, n)
    px, py = [a.reshape(-1) for a in jnp.meshgrid(xs, xs)]
    img = np.asarray(render_tile(scene, px, py, cfg, jax.random.PRNGKey(0)))
    assert np.isfinite(img).all()
    assert img.min() >= 0.0 and img.max() <= 1.0
    assert img.std() > 0.05  # an actual picture, not a flat field


def test_balls_low_distribution_mode():
    """spp=4 scene flips on AA+DoF (main.cpp:939-946)."""
    sd = rt.parse_p3f(ref_scene_path("balls_low.p3f"))
    scene = rt.build_scene(sd, load_skybox=False)
    cfg = rt.RenderConfig().with_scene_flags(scene)
    assert cfg.anti_aliasing and cfg.depth_of_field and cfg.spp == 4
    assert scene.accel_type == C.ACCEL_BVH
    assert scene.bvh is not None
