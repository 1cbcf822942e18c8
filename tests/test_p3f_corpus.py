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


def test_skybox_lookup_on_miss():
    """BASELINE config #4: env cubemap lookup on miss. The shipped reference
    never calls GetSkyboxColor from rayTracing (quirk #8); use_skybox=True
    wires it in. Face conventions follow scene.cpp:383-461."""
    import os

    import jax

    sky_dir = "/root/reference/P3D_RayTracer_Template2/skybox"
    if not os.path.isdir(sky_dir):
        pytest.skip("reference skybox not available")
    sd = rt.parse_p3f(ref_scene_path("mount_low.p3f"))
    sd.skybox_dir = sky_dir
    scene = rt.build_scene(sd)
    assert scene.has_skybox and scene.skybox.shape[0] == 6

    from u_4a_2s_p3d_raytracer_template2_tpu.models.whitted import render_tile
    import jax.numpy as jnp

    # pixels in the sky region (top rows look above the mountain)
    px = jnp.linspace(0, 511, 16)
    py = jnp.full((16,), 500.0)
    flat = np.asarray(render_tile(scene, px, py,
                                  rt.RenderConfig(use_skybox=False),
                                  jax.random.PRNGKey(0)))
    sky = np.asarray(render_tile(scene, px, py,
                                 rt.RenderConfig(use_skybox=True),
                                 jax.random.PRNGKey(0)))
    # flat-bg misses are the constant bclr; skybox misses vary per direction
    miss = np.abs(flat - np.array([0.078, 0.361, 0.753])).max(-1) < 1e-4
    assert miss.sum() >= 4
    assert sky[miss].std(axis=0).max() > 0.01
    assert not np.allclose(sky[miss], flat[miss])


def test_skybox_color_directions():
    """Dominant-axis cubemap indexing: +X maps to the LEFT face, -X to
    RIGHT (scene.cpp:398), ±Y to TOP/BOTTOM, ±Z to FRONT/BACK."""
    import jax.numpy as jnp
    from u_4a_2s_p3d_raytracer_template2_tpu.ops.shade import skybox_color

    # distinct constant-color faces
    sky = np.zeros((6, 2, 2, 3), np.float32)
    for i in range(6):
        sky[i, :, :, 0] = (i + 1) / 6.0
    d = jnp.asarray(np.array([
        [1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1],
    ], np.float32))
    out = np.asarray(skybox_color(jnp.asarray(sky), d))[:, 0]
    want = np.array([2, 1, 3, 4, 5, 6]) / 6.0  # LEFT,RIGHT,TOP,BOTTOM,FRONT,BACK
    np.testing.assert_allclose(out, want, atol=1e-6)


def test_skybox_packed_u32_bit_identical():
    """The packed-u32 cubemap path (one gathered element per texel — the
    megakernel epilogue's fast path) must reproduce skybox_color exactly
    for u8 cubemaps."""
    import jax.numpy as jnp
    from u_4a_2s_p3d_raytracer_template2_tpu.ops.shade import (
        pack_skybox_u32,
        skybox_color,
        skybox_color_packed,
    )

    rng = np.random.default_rng(0)
    sky = rng.integers(0, 256, (6, 16, 16, 3), dtype=np.uint8)
    d = rng.normal(size=(512, 3)).astype(np.float32)
    a = np.asarray(skybox_color(jnp.asarray(sky), jnp.asarray(d)))
    b = np.asarray(skybox_color_packed(pack_skybox_u32(jnp.asarray(sky)),
                                       jnp.asarray(d)))
    np.testing.assert_array_equal(a, b)
    assert a.min() >= 0.0 and a.max() <= 1.0
