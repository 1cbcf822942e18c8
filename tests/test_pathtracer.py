"""Path tracer tests: GLSL world regeneration, frame sanity, progressive
accumulation convergence, Russian roulette, checkpointable state."""
import numpy as np
import jax
import jax.numpy as jnp

from u_4a_2s_p3d_raytracer_template2_tpu.models import pathtracer as pt
from u_4a_2s_p3d_raytracer_template2_tpu.models.glsl_scene import (
    glsl_camera,
    glsl_world,
)
from u_4a_2s_p3d_raytracer_template2_tpu.ops.glsl_hash import SeedStream, base_hash


def test_base_hash_deterministic():
    # regression pins: values must never drift (scene identity depends on them)
    a = base_hash(np.uint32(1), np.uint32(2))
    b = base_hash(np.uint32(1), np.uint32(2))
    assert a == b
    s = SeedStream(0.0)
    v1 = s.hash3()
    v2 = s.hash3()
    assert not np.allclose(v1, v2)
    assert ((0 <= v1) & (v1 <= 1)).all()


def test_world_regeneration_stable():
    w1 = glsl_world()
    w2 = glsl_world()
    np.testing.assert_array_equal(np.asarray(w1.sp_center0),
                                  np.asarray(w2.sp_center0))
    n_spheres = int((np.asarray(w1.sp_radius) != 0).sum())
    # 4 hero spheres (incl. hollow shell) + procedural field; the exact count
    # is pinned by the replicated GLSL hash. 10x10 grid minus the exclusion
    # zone near (4, 0.2, 0).
    assert 80 <= n_spheres <= 104
    assert np.asarray(w1.tri_v0).shape[0] >= 2


def test_single_frame_finite():
    scene = glsl_world()
    cam = glsl_camera(32, 32)
    cfg = pt.PTConfig(max_bounces=4)
    frame = np.asarray(pt.render_frame(scene, cam, cfg, jax.random.PRNGKey(0)))
    assert frame.shape == (32, 32, 3)
    assert np.isfinite(frame).all()
    assert frame.min() >= 0.0
    assert frame.mean() > 0.01  # light reaches the film


def test_progressive_accumulation_converges():
    scene = glsl_world()
    cam = glsl_camera(16, 16)
    cfg = pt.PTConfig(max_bounces=4)
    acc4 = pt.render_progressive(scene, cam, cfg, jax.random.PRNGKey(1), 4)
    acc8 = pt.render_progressive(scene, cam, cfg, jax.random.PRNGKey(1), 8)
    # same stream: first 4 frames shared; count advances
    assert float(acc4.count) == 4.0
    assert float(acc8.count) == 8.0
    img4 = np.asarray(pt.to_image(acc4))
    img8 = np.asarray(pt.to_image(acc8))
    # estimates agree within Monte Carlo error and are genuinely images
    assert np.abs(img4 - img8).mean() < 0.1
    assert img8.std() > 0.05


def test_accumulator_is_checkpointable():
    """The accumulator pytree round-trips through flatten/unflatten — the
    orbax-style checkpoint contract (SURVEY.md §5 checkpoint/resume)."""
    scene = glsl_world()
    cam = glsl_camera(8, 8)
    cfg = pt.PTConfig(max_bounces=2)
    acc = pt.render_progressive(scene, cam, cfg, jax.random.PRNGKey(2), 3)
    leaves, treedef = jax.tree.flatten(acc)
    # simulate save/restore through host numpy
    restored = jax.tree.unflatten(treedef, [jnp.asarray(np.asarray(l))
                                            for l in leaves])
    cont = pt.render_progressive(scene, cam, cfg, jax.random.PRNGKey(3), 1,
                                 acc=restored)
    assert float(cont.count) == 4.0


def test_russian_roulette_unbiased_mean():
    scene = glsl_world()
    cam = glsl_camera(16, 16)
    key = jax.random.PRNGKey(4)
    base = pt.render_progressive(scene, cam, pt.PTConfig(max_bounces=6),
                                 key, 6)
    rr = pt.render_progressive(
        scene, cam, pt.PTConfig(max_bounces=6, russian_roulette=True), key, 6)
    m0 = float(np.asarray(pt.to_image(base)).mean())
    m1 = float(np.asarray(pt.to_image(rr)).mean())
    assert abs(m0 - m1) / m0 < 0.25  # same energy within MC noise


def test_checkpoint_npz_roundtrip(tmp_path):
    """utils/checkpoint fallback path: save/restore an accumulator via .npz."""
    from u_4a_2s_p3d_raytracer_template2_tpu.utils import checkpoint as ckpt

    acc = pt.Accumulator(jnp.arange(12.0).reshape(2, 2, 3),
                         jnp.asarray(3.0))
    path = str(tmp_path / "acc.npz")
    # force the npz path (orbax needs a directory target; a .npz suffix path
    # routes to the numpy fallback)
    leaves, treedef = jax.tree.flatten(acc)
    np.savez(path, *[np.asarray(l) for l in leaves])
    got = ckpt.restore(path, pt.make_accumulator(2, 2))
    np.testing.assert_array_equal(np.asarray(got.sum_linear),
                                  np.asarray(acc.sum_linear))
    assert float(got.count) == 3.0


def test_orbit_camera_modes():
    """ORBIT_CAMERA branch (P3D_RT.glsl:5, 296-316): both mouse modes render
    finite, non-trivial, mutually distinct frames; mouse (0,0) in orbit mode
    pins the eye at (0,0,-8)."""
    scene = glsl_world()
    cam_slide = glsl_camera(16, 16, mouse=(0.3, 0.4))
    cam_orbit = glsl_camera(16, 16, mouse=(0.3, 0.4), orbit=True)
    cam_orbit0 = glsl_camera(16, 16, mouse=(0.0, 0.0), orbit=True)
    assert np.allclose(np.asarray(cam_orbit0.eye), [0.0, 0.0, -8.0])
    # eye on a radius-8 sphere around the target (0,0,-1)
    r = np.linalg.norm(np.asarray(cam_orbit.eye) - np.array([0, 0, -1.0]))
    assert abs(r - 8.0) < 1e-5

    cfg = pt.PTConfig(max_bounces=3)
    key = jax.random.PRNGKey(0)
    imgs = []
    for cam in (cam_slide, cam_orbit, cam_orbit0):
        acc = pt.render_progressive(scene, cam, cfg, key, 2)
        img = np.asarray(pt.to_image(acc))
        assert np.isfinite(img).all()
        assert img.std() > 0.01
        imgs.append(img)
    assert np.abs(imgs[0] - imgs[1]).max() > 0.05
    assert np.abs(imgs[1] - imgs[2]).max() > 0.05
