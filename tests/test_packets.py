"""Packet-BVH traversal (accel/packets.py) parity vs brute force, plus SAH
treelet build invariants (accel/sah.py).

Kernels run in Pallas interpret mode on the CPU backend; on-device numbers
live in tools/device_validate.py. Brute equality IS reference parity
(SURVEY.md quirks #1/#4 — the reference's BVH mode re-scans brute-force).
"""
import numpy as np
import pytest

import u_4a_2s_p3d_raytracer_template2_tpu as rt
from u_4a_2s_p3d_raytracer_template2_tpu.accel.bvh import object_bounds
from u_4a_2s_p3d_raytracer_template2_tpu.accel.packets import (
    build_packets,
    packet_any_hit,
    packet_closest_hit,
)
from u_4a_2s_p3d_raytracer_template2_tpu.accel.sah import sah_build
from u_4a_2s_p3d_raytracer_template2_tpu.core.types import Rays
from u_4a_2s_p3d_raytracer_template2_tpu.ops.intersect import (
    any_hit_brute,
    closest_hit_brute,
)


def soup(n_sph=256, n_tri=256, seed=0, planes=True, box=True):
    rng = np.random.default_rng(seed)
    sd = rt.SceneDef()
    sd.set_camera(eye=[0, 0, 12], at=[0, 0, 0], up=[0, 1, 0], fov=45,
                  hither=0.01, res_x=24, res_y=24, aperture_ratio=0,
                  focal_ratio=1)
    m = sd.add_material([0.7, 0.7, 0.7], 1.0, [1, 1, 1], 0.1, 20, 0, 1)
    for _ in range(n_sph):
        sd.add_sphere(rng.uniform(-5, 5, 3), rng.uniform(0.1, 0.5), m)
    for _ in range(n_tri):
        base = rng.uniform(-5, 5, 3)
        sd.add_triangle(base, base + rng.uniform(-0.8, 0.8, 3),
                        base + rng.uniform(-0.8, 0.8, 3), m)
    if planes:
        sd.add_plane_points([0, -8, 0], [1, -8, 0], [0, -8, 1], m)
    if box:
        sd.add_box([-6, -6, -6], [-5.2, -5.2, -5.2], m)
    sd.add_light([10, 10, 10], [1, 1, 1])
    return rt.build_scene(sd)


def make_rays(n, seed=1, coherent=False):
    rng = np.random.default_rng(seed)
    if coherent:
        o = np.broadcast_to(np.array([0, 0, 12], np.float32), (n, 3)).copy()
        d = rng.normal(size=(n, 3)) * np.array([0.2, 0.2, 1.0])
        d[:, 2] = -np.abs(d[:, 2]) - 0.5
    else:
        o = rng.uniform(-8, 8, (n, 3))
        d = rng.normal(size=(n, 3))
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    return Rays.make(o.astype(np.float32), d.astype(np.float32))


# ---------------------------------------------------------------------------
# SAH build invariants


def test_sah_tree_invariants():
    rng = np.random.default_rng(3)
    n = 1000
    c = rng.uniform(-10, 10, (n, 3))
    e = rng.uniform(0.05, 0.6, (n, 3))
    bmin = (c - e).astype(np.float32)
    bmax = (c + e).astype(np.float32)
    order, nbox, nmeta, chunks = sah_build(bmin, bmax)

    # the permutation covers every prim exactly once; so do the chunks
    assert sorted(order.tolist()) == list(range(n))
    flat = chunks.reshape(-1)
    real = flat[flat >= 0]
    assert sorted(real.tolist()) == list(range(n))

    # every node box contains its children (internal) / its prims (leaf)
    nn = nbox.shape[0]
    for i in range(nn):
        a, leaf = nmeta[i]
        if leaf:
            sel = chunks[a][chunks[a] >= 0]
            assert (bmin[sel] >= nbox[i, 0:3] - 1e-5).all()
            assert (bmax[sel] <= nbox[i, 3:6] + 1e-5).all()
            assert len(sel) <= 128
        else:
            for ch in (a, a + 1):
                assert ch < nn
                assert (nbox[ch, 0:3] >= nbox[i, 0:3] - 1e-5).all()
                assert (nbox[ch, 3:6] <= nbox[i, 3:6] + 1e-5).all()

    # fill-rate: the endgame split keeps the table near-minimal
    assert chunks.shape[0] <= int(np.ceil(n / 128)) * 2


# ---------------------------------------------------------------------------
# traversal parity (interpret mode)


@pytest.mark.parametrize("coherent", [True, False])
def test_packet_closest_matches_brute(coherent):
    scene = soup()
    pt = build_packets(np.asarray(scene.prims.params),
                       np.asarray(scene.prims.ptype))
    assert pt is not None and pt.has_tri and pt.has_sph
    rays = make_rays(512, coherent=coherent)
    t_ref, id_ref = closest_hit_brute(scene.prims, rays)
    t, oid = packet_closest_hit(pt, scene.prims, rays, interpret=True)
    t, oid = np.asarray(t), np.asarray(oid)
    t_ref, id_ref = np.asarray(t_ref), np.asarray(id_ref)
    np.testing.assert_allclose(np.minimum(t, 1e30), np.minimum(t_ref, 1e30),
                               rtol=1e-4, atol=1e-4)
    assert (oid == id_ref).mean() > 0.995  # ids differ only on exact ties


def test_packet_closest_unpadded_ray_count():
    scene = soup(n_sph=200, n_tri=200, seed=5)
    pt = build_packets(np.asarray(scene.prims.params),
                       np.asarray(scene.prims.ptype))
    rays = make_rays(300, seed=7)  # not a multiple of PACK
    t_ref, id_ref = closest_hit_brute(scene.prims, rays)
    t, oid = packet_closest_hit(pt, scene.prims, rays, interpret=True)
    np.testing.assert_allclose(np.minimum(np.asarray(t), 1e30),
                               np.minimum(np.asarray(t_ref), 1e30),
                               rtol=1e-4, atol=1e-4)
    assert (np.asarray(oid) == np.asarray(id_ref)).mean() > 0.99


def test_packet_deep_tree_triangles_only():
    scene = soup(n_sph=0, n_tri=1400, seed=11, planes=False, box=False)
    pt = build_packets(np.asarray(scene.prims.params),
                       np.asarray(scene.prims.ptype))
    assert pt.has_tri and not pt.has_sph
    rays = make_rays(256, seed=13)
    t_ref, id_ref = closest_hit_brute(scene.prims, rays)
    t, oid = packet_closest_hit(pt, scene.prims, rays, interpret=True)
    np.testing.assert_allclose(np.minimum(np.asarray(t), 1e30),
                               np.minimum(np.asarray(t_ref), 1e30),
                               rtol=1e-4, atol=1e-4)
    assert (np.asarray(oid) == np.asarray(id_ref)).mean() > 0.995


@pytest.mark.parametrize("lc,sort", [(1, True), (2, False), (8, True)])
def test_packet_leaf_width_parity(lc, sort):
    """Tunable leaf widths (LEAF_CHUNKS lane blocks per leaf) and both
    coherence-sort settings keep exact brute parity — the on-device tuned
    defaults (tri x4 / sph x8, tools/tune_packets.py) change only the
    walk schedule, never the fold semantics."""
    scene = soup(seed=21)
    pt = build_packets(np.asarray(scene.prims.params),
                       np.asarray(scene.prims.ptype), leaf_chunks=lc)
    assert pt.tri_leaf_chunks == lc and pt.sph_leaf_chunks == lc
    rays = make_rays(384, seed=3)
    t_ref, id_ref = closest_hit_brute(scene.prims, rays)
    t, oid = packet_closest_hit(pt, scene.prims, rays, interpret=True,
                                coherence_sort=sort)
    np.testing.assert_allclose(np.minimum(np.asarray(t), 1e30),
                               np.minimum(np.asarray(t_ref), 1e30),
                               rtol=1e-4, atol=1e-4)
    assert (np.asarray(oid) == np.asarray(id_ref)).mean() > 0.995
    occ = packet_any_hit(pt, scene.prims, rays, 5.0, interpret=True,
                         coherence_sort=sort)
    occ_ref = any_hit_brute(scene.prims, rays, 5.0)
    assert (np.asarray(occ) == np.asarray(occ_ref)).all()


def test_median_build_invariants_and_parity():
    """The median-split build policy (accel/sah.py strategy="median", the
    reference's shipped policy bvh.cpp:77-126) produces a valid tree the
    same traversal kernel walks to brute-equal results."""
    rng = np.random.default_rng(17)
    n = 700
    c = rng.uniform(-10, 10, (n, 3))
    e = rng.uniform(0.05, 0.6, (n, 3))
    order, nbox, nmeta, chunks = sah_build((c - e).astype(np.float32),
                                           (c + e).astype(np.float32),
                                           strategy="median")
    assert sorted(order.tolist()) == list(range(n))
    flat = chunks.reshape(-1)
    assert sorted(flat[flat >= 0].tolist()) == list(range(n))

    scene = soup(n_sph=220, n_tri=220, seed=41)
    pt = build_packets(np.asarray(scene.prims.params),
                       np.asarray(scene.prims.ptype), strategy="median")
    rays = make_rays(256, seed=43)
    t_ref, id_ref = closest_hit_brute(scene.prims, rays)
    t, oid = packet_closest_hit(pt, scene.prims, rays, interpret=True)
    np.testing.assert_allclose(np.minimum(np.asarray(t), 1e30),
                               np.minimum(np.asarray(t_ref), 1e30),
                               rtol=1e-4, atol=1e-4)
    assert (np.asarray(oid) == np.asarray(id_ref)).mean() > 0.99


def test_accel_impl_dispatch_parity():
    """RenderConfig.accel_impl routes trace_closest/trace_shadow to each
    traversal implementation; all agree on a BVH scene (CPU: clusters,
    perray, brute — the packets path is TPU-only and covered above in
    interpret mode)."""
    from u_4a_2s_p3d_raytracer_template2_tpu.models.whitted import (
        trace_closest,
        trace_shadow,
    )

    scene = soup(n_sph=40, n_tri=40)  # below MIN_TREE: no packet tables
    assert scene.packets is None
    rays = make_rays(128, seed=31)
    outs = {}
    for impl in ("clusters", "perray", "brute"):
        cfg = rt.RenderConfig(accel_impl=impl)
        t, oid = trace_closest(scene, rays, cfg)
        occ = trace_shadow(scene, rays, 1e30, cfg)
        outs[impl] = (np.asarray(t), np.asarray(oid), np.asarray(occ))
    t0, id0, occ0 = outs["brute"]
    for impl in ("clusters", "perray"):
        t, oid, occ = outs[impl]
        np.testing.assert_allclose(np.minimum(t, 1e30),
                                   np.minimum(t0, 1e30),
                                   rtol=1e-4, atol=1e-4)
        assert (oid == id0).mean() > 0.99
        assert (occ == occ0).mean() > 0.99


@pytest.mark.parametrize("max_t", [1.0, 1e30])
def test_packet_any_hit_matches_brute(max_t):
    scene = soup(seed=21)
    pt = build_packets(np.asarray(scene.prims.params),
                       np.asarray(scene.prims.ptype))
    rng = np.random.default_rng(23)
    o = rng.uniform(-6, 6, (512, 3)).astype(np.float32)
    d = rng.uniform(-6, 6, (512, 3)).astype(np.float32) - o  # unnormalized L
    rays = Rays.make(o, d)
    occ_ref = np.asarray(any_hit_brute(scene.prims, rays, max_t))
    occ = np.asarray(packet_any_hit(pt, scene.prims, rays, max_t,
                                    interpret=True))
    # borderline t ≈ max_t hits may flip under f32 reassociation
    assert (occ == occ_ref).mean() > 0.995


def test_packet_flat_multi_leaf_closest_matches_brute():
    """The flat shallow-tree closest kernel with MULTIPLE leaves per type
    (2..FLAT_MAX_LEAVES), including its per-ray tn<=best-t leaf culling —
    soup()'s default sizes build single-leaf trees, which never exercised
    the multi-leaf unroll (ADVICE r4)."""
    # tris: 4 chunks/leaf = 512/leaf -> 1100 => 3 leaves
    # spheres: 8 chunks/leaf = 1024/leaf -> 1200 => 2 leaves
    scene = soup(n_sph=1200, n_tri=1100, seed=33)
    pt = build_packets(np.asarray(scene.prims.params),
                       np.asarray(scene.prims.ptype))
    assert pt is not None
    from u_4a_2s_p3d_raytracer_template2_tpu.accel.packets import (
        FLAT_MAX_LEAVES,
    )

    assert 2 <= pt.tri_n_leaves <= FLAT_MAX_LEAVES, pt.tri_n_leaves
    assert 2 <= pt.sph_n_leaves <= FLAT_MAX_LEAVES, pt.sph_n_leaves
    for coherent in (False, True):
        rays = make_rays(640, seed=7, coherent=coherent)
        t, oid = packet_closest_hit(pt, scene.prims, rays, interpret=True)
        tb, ob = closest_hit_brute(scene.prims, rays)
        np.testing.assert_array_equal(np.asarray(oid), np.asarray(ob))
        # winner ids are EXACTLY equal; t re-derivations differ only by f32
        # re-association (same tolerance as the stack-walk parity tests)
        np.testing.assert_allclose(np.minimum(np.asarray(t), 1e30),
                                   np.minimum(np.asarray(tb), 1e30),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("max_t", [1.0, 1e30])
def test_packet_any_hit_multi_matches_per_light(max_t):
    """Fused multi-query any-hit (one kernel, L=3 segment sets + dead
    masks) == three separate packet_any_hit calls."""
    from u_4a_2s_p3d_raytracer_template2_tpu.accel.packets import (
        multi_supported,
        packet_any_hit_multi,
    )

    scene = soup(n_sph=900, n_tri=700, seed=13)
    pt = build_packets(np.asarray(scene.prims.params),
                       np.asarray(scene.prims.ptype))
    assert pt is not None and multi_supported(pt)
    rng = np.random.default_rng(9)
    R = 500  # not a multiple of PACK: exercises padding
    origin = rng.uniform(-6, 6, (R, 3)).astype(np.float32)
    lights = np.array([[10, 10, 10], [-8, 6, 4], [0, -9, 7]], np.float32)
    dirs = [jnp.asarray(lights[l][None, :] - origin) for l in range(3)]
    dead = [jnp.asarray(rng.random(R) < 0.2) for _ in range(3)]

    import jax.numpy as jnp2

    occ = np.asarray(packet_any_hit_multi(
        pt, scene.prims, jnp.asarray(origin), dirs, max_t, dead=dead,
        interpret=True))
    for l in range(3):
        want = np.asarray(packet_any_hit(
            pt, scene.prims,
            Rays.make(origin, np.asarray(dirs[l])), max_t,
            interpret=True, dead=dead[l]))
        np.testing.assert_array_equal(occ[l], want)


def test_packet_any_hit_multi_no_dead():
    from u_4a_2s_p3d_raytracer_template2_tpu.accel.packets import (
        multi_supported,
        packet_any_hit_multi,
    )

    scene = soup(n_sph=400, n_tri=0, seed=17, planes=True, box=True)
    pt = build_packets(np.asarray(scene.prims.params),
                       np.asarray(scene.prims.ptype))
    assert pt is not None and multi_supported(pt)
    rng = np.random.default_rng(21)
    R = 256
    origin = rng.uniform(-6, 6, (R, 3)).astype(np.float32)
    lights = np.array([[10, 10, 10], [0, -9, 7]], np.float32)
    dirs = [jnp.asarray(lights[l][None, :] - origin) for l in range(2)]
    occ = np.asarray(packet_any_hit_multi(
        pt, scene.prims, jnp.asarray(origin), dirs, 1.0, interpret=True))
    for l in range(2):
        want = np.asarray(packet_any_hit(
            pt, scene.prims, Rays.make(origin, np.asarray(dirs[l])), 1.0,
            interpret=True))
        np.testing.assert_array_equal(occ[l], want)


import jax.numpy as jnp  # noqa: E402  (used by the multi-query tests)
