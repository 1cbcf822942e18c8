"""Multi-device tests on the virtual 8-device CPU mesh (SURVEY.md §4):
sharded render must be bit-identical to unsharded; inverse-rendering
train_step must reduce loss with psum'd gradients."""
import numpy as np
import jax
import jax.numpy as jnp

import u_4a_2s_p3d_raytracer_template2_tpu as rt
from u_4a_2s_p3d_raytracer_template2_tpu.models.scenes import mount_scene
from u_4a_2s_p3d_raytracer_template2_tpu.parallel.dist import (
    default_mesh,
    render_image_sharded,
    train_step,
)

from test_whitted_vs_oracle import sphere_plane_scene


def test_virtual_devices_present():
    assert len(jax.devices()) == 8


def test_sharded_render_bit_identical():
    scene = rt.build_scene(mount_scene(res=32))
    cfg = rt.RenderConfig()
    mesh = default_mesh()
    img_sharded = np.asarray(render_image_sharded(scene, cfg, mesh))
    img_single = np.asarray(rt.render_image(scene, cfg))
    # deterministic features: sharding must not change results. The fused
    # component-form intersection chain gets shape-dependent FMA contraction
    # from the compiler (per-shard R differs from the single-device R), so
    # exact bit-identity relaxes to a 1-2 ulp bound.
    np.testing.assert_allclose(img_sharded, img_single, atol=3e-7, rtol=0)


def test_sharded_render_odd_sizes():
    """Pixel counts that don't divide the mesh size must pad correctly."""
    sd = sphere_plane_scene(res=23)  # 529 pixels, not divisible by 8
    scene = rt.build_scene(sd)
    mesh = default_mesh()
    img = np.asarray(render_image_sharded(scene, rt.RenderConfig(), mesh))
    assert img.shape == (23, 23, 3)
    assert np.isfinite(img).all()


def test_train_step_reduces_loss():
    """Inverse rendering: perturb the diffuse color, recover it by gradient
    descent on the pixel loss (BASELINE north star: differentiable through
    shading with gradient all-reduce)."""
    import dataclasses

    sd = sphere_plane_scene(res=16)
    scene = rt.build_scene(sd)
    cfg = rt.RenderConfig()
    mesh = default_mesh()
    target = rt.render_image(scene, cfg)

    # perturb materials
    mats = dataclasses.replace(
        scene.materials,
        diff_color=jnp.clip(scene.materials.diff_color + 0.25, 0, 1),
    )
    bad = dataclasses.replace(scene, materials=mats)

    losses = []
    s = bad
    for i in range(8):
        s, loss = train_step(s, target, cfg, mesh, 2.0,
                             jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5, losses


def test_mount_scene_gradients_finite():
    """Gradients through the refraction-heavy mount scene (transmissive
    ior=1.6 spheres AND an ior=0 rock material) must be finite — guards
    against 0*inf poisoning through masked-out refraction lanes."""
    import dataclasses

    import jax.numpy as jnp
    from u_4a_2s_p3d_raytracer_template2_tpu.models.whitted import render_tile

    scene = rt.build_scene(mount_scene(res=12))
    cfg = rt.RenderConfig()
    ys, xs = jnp.meshgrid(jnp.arange(12, dtype=jnp.float32),
                          jnp.arange(12, dtype=jnp.float32), indexing="ij")
    px, py = xs.reshape(-1), ys.reshape(-1)

    def loss(materials):
        s = dataclasses.replace(scene, materials=materials)
        img = render_tile(s, px, py, cfg, jax.random.PRNGKey(0))
        return jnp.sum(img ** 2)

    grads = jax.grad(loss)(scene.materials)
    for leaf in jax.tree.leaves(grads):
        assert np.isfinite(np.asarray(leaf)).all()


def test_pathtracer_sharded_frame():
    """PT frame sharded over 8 virtual devices renders and matches the
    single-device estimator statistically (same per-shard keys differ, so
    compare means)."""
    from u_4a_2s_p3d_raytracer_template2_tpu.models import pathtracer as pt
    from u_4a_2s_p3d_raytracer_template2_tpu.models.glsl_scene import (
        glsl_camera,
        glsl_world,
    )
    from u_4a_2s_p3d_raytracer_template2_tpu.parallel.dist import (
        default_mesh,
        pt_frame_sharded,
    )

    scene = glsl_world()
    cam = glsl_camera(16, 16)
    cfg = pt.PTConfig(max_bounces=3)
    mesh = default_mesh()
    frame = np.asarray(pt_frame_sharded(scene, cam, cfg, mesh,
                                        jax.random.PRNGKey(0)))
    assert frame.shape == (16, 16, 3)
    assert np.isfinite(frame).all()
    single = np.asarray(pt.render_frame(scene, cam, cfg, jax.random.PRNGKey(1)))
    assert abs(frame.mean() - single.mean()) < 0.35


def test_sharded_packets_traversal():
    """The packet-BVH Pallas traversal (the production TPU path) under
    shard_map on the CPU mesh (interpret mode): sharded == unsharded
    (VERDICT r3 #7)."""
    import dataclasses

    from u_4a_2s_p3d_raytracer_template2_tpu.models.scenes import (
        sphere_field_scene,
    )

    scene = rt.build_scene(sphere_field_scene(n_side=16, res=16), accel=2)
    assert scene.packets is not None
    cfg = dataclasses.replace(rt.RenderConfig(), accel_impl="packets")
    mesh = default_mesh()
    img_sharded = np.asarray(render_image_sharded(scene, cfg, mesh))
    img_single = np.asarray(rt.render_image(scene, cfg))
    assert np.isfinite(img_sharded).all()
    # few-ulp bound: per-shard R changes the compiler's FMA contraction in
    # the shading chain around the (bit-identical) traversal
    np.testing.assert_allclose(img_sharded, img_single, atol=1e-6, rtol=0)


def test_train_step_full_freeze_matches_zero_scales():
    """Static `freeze` stop-gradients groups that zero scales merely skip
    UPDATING — results must be identical for the live groups (the frozen
    groups' backward work is dead-code-eliminated, not changed)."""
    import dataclasses

    import jax
    import numpy as np

    import u_4a_2s_p3d_raytracer_template2_tpu as rt
    from u_4a_2s_p3d_raytracer_template2_tpu.models.scenes import mount_scene
    from u_4a_2s_p3d_raytracer_template2_tpu.models.whitted import (
        render_image,
    )
    from u_4a_2s_p3d_raytracer_template2_tpu.parallel.dist import (
        default_mesh,
        lr_scales,
        train_step_full,
    )

    scene = rt.build_scene(mount_scene(res=8))
    cfg = rt.RenderConfig(max_depth=2)
    mesh = default_mesh(2)
    target = render_image(scene, cfg)
    sc = lr_scales(materials=1.0, light_pos=1.0, camera=0.0, geometry=0.0)
    key = jax.random.PRNGKey(3)
    s_a, loss_a = train_step_full(scene, target, cfg, mesh, 0.05, key, sc)
    s_b, loss_b = train_step_full(scene, target, cfg, mesh, 0.05, key, sc,
                                  ("geometry", "camera"))
    assert float(loss_a) == float(loss_b)
    for a, b in zip(jax.tree.leaves(s_a.materials),
                    jax.tree.leaves(s_b.materials)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(s_a.lights.position),
                               np.asarray(s_b.lights.position),
                               rtol=1e-6, atol=1e-7)
    # frozen groups unchanged in both (zero scale / zero grad)
    np.testing.assert_array_equal(np.asarray(s_b.camera.eye),
                                  np.asarray(scene.camera.eye))
