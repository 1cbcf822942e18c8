"""BVH and uniform-grid traversal must agree with brute-force closest hit.

The reference's shipped BVH mode renders brute-force results anyway (missing
``break`` at main.cpp:561-578), so brute-force equality IS reference parity
(SURVEY.md quirks #1/#4).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import u_4a_2s_p3d_raytracer_template2_tpu as rt
from u_4a_2s_p3d_raytracer_template2_tpu.accel.bvh import build_bvh
from u_4a_2s_p3d_raytracer_template2_tpu.accel.grid import build_grid
from u_4a_2s_p3d_raytracer_template2_tpu.accel.traverse import (
    bvh_closest_hit,
    grid_closest_hit,
)
from u_4a_2s_p3d_raytracer_template2_tpu.core.types import Rays
from u_4a_2s_p3d_raytracer_template2_tpu.ops.intersect import closest_hit_brute

from conftest import assert_images_close
from test_whitted_vs_oracle import mixed_scene


def random_sphere_soup(n=60, seed=0):
    rng = np.random.default_rng(seed)
    sd = rt.SceneDef()
    sd.set_camera(eye=[0, 0, 12], at=[0, 0, 0], up=[0, 1, 0], fov=45,
                  hither=0.01, res_x=24, res_y=24, aperture_ratio=0,
                  focal_ratio=1)
    m = sd.add_material([0.7, 0.7, 0.7], 1.0, [1, 1, 1], 0.1, 20, 0, 1)
    for _ in range(n):
        c = rng.uniform(-4, 4, 3)
        r = rng.uniform(0.2, 0.8)
        sd.add_sphere(c, r, m)
    for _ in range(10):
        base = rng.uniform(-4, 4, 3)
        sd.add_triangle(base, base + rng.uniform(-1, 1, 3),
                        base + rng.uniform(-1, 1, 3), m)
    sd.add_light([10, 10, 10], [1, 1, 1])
    return sd


def make_rays(n=256, seed=1):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-8, 8, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return Rays.make(o, d)


@pytest.mark.parametrize("accel", ["bvh", "grid"])
def test_traversal_matches_brute(accel):
    sd = random_sphere_soup()
    scene = rt.build_scene(sd)
    rays = make_rays()
    t_ref, id_ref = closest_hit_brute(scene.prims, rays)
    if accel == "bvh":
        acc = build_bvh(np.asarray(scene.prims.params),
                        np.asarray(scene.prims.ptype))
        t, oid = bvh_closest_hit(acc, scene.prims, rays)
    else:
        acc = build_grid(np.asarray(scene.prims.params),
                         np.asarray(scene.prims.ptype))
        t, oid = grid_closest_hit(acc, scene.prims, rays)
    t, oid = np.asarray(t), np.asarray(oid)
    t_ref, id_ref = np.asarray(t_ref), np.asarray(id_ref)
    # t must match everywhere (brute force uses the MXU Baldwin-Weber form,
    # traversal the VPU Möller-Trumbore form — identical up to f32 rounding);
    # ids may differ only on exact-tie overlaps
    np.testing.assert_allclose(np.minimum(t, 1e30), np.minimum(t_ref, 1e30),
                               rtol=1e-4, atol=1e-4)
    assert (oid == id_ref).mean() > 0.995


@pytest.mark.parametrize("accel", [rt.constants.ACCEL_BVH,
                                   rt.constants.ACCEL_GRID])
def test_full_render_matches_brute(accel):
    """Whole-image parity: accel on vs off, including planes handled via the
    unbounded side-table."""
    sd = mixed_scene()
    cfg = rt.RenderConfig()
    img_none = np.asarray(
        rt.render_image(rt.build_scene(sd, accel=rt.constants.ACCEL_NONE), cfg))
    img_acc = np.asarray(rt.render_image(rt.build_scene(sd, accel=accel), cfg))
    assert_images_close(img_acc, img_none, atol=1e-4, max_bad_frac=0.005)


def test_native_builders_match_numpy():
    """The C++ accelerator builders must produce identical flat arrays to
    the NumPy reference implementations."""
    from u_4a_2s_p3d_raytracer_template2_tpu import native

    if not native.available():
        pytest.skip("no native toolchain")
    sd = random_sphere_soup(n=120, seed=3)
    scene = rt.build_scene(sd, accel=rt.constants.ACCEL_NONE)
    params = np.asarray(scene.prims.params)
    ptype = np.asarray(scene.prims.ptype)

    b_native = build_bvh(params, ptype, use_native=True)
    b_py = build_bvh(params, ptype, use_native=False)
    assert b_native.n_nodes == b_py.n_nodes
    np.testing.assert_array_equal(np.asarray(b_native.order),
                                  np.asarray(b_py.order))
    np.testing.assert_allclose(np.asarray(b_native.bbox_min),
                               np.asarray(b_py.bbox_min), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(b_native.leaf),
                                  np.asarray(b_py.leaf))
    np.testing.assert_array_equal(np.asarray(b_native.index),
                                  np.asarray(b_py.index))

    g_native = build_grid(params, ptype, use_native=True)
    g_py = build_grid(params, ptype, use_native=False)
    assert (g_native.nx, g_native.ny, g_native.nz) == (g_py.nx, g_py.ny, g_py.nz)
    np.testing.assert_array_equal(np.asarray(g_native.cell_count),
                                  np.asarray(g_py.cell_count))

    # same per-cell membership (intra-cell order and padding width may differ)
    def cell_sets(items):
        return [frozenset(int(x) for x in row if x >= 0) for row in items]

    assert cell_sets(np.asarray(g_native.cell_items)) ==         cell_sets(np.asarray(g_py.cell_items))


def test_clustered_tracer_matches_brute_large():
    """Tile-coherent clustered tracer (accel/clusters.py) vs brute force on
    a multi-cluster sphere+triangle scene."""
    from u_4a_2s_p3d_raytracer_template2_tpu.accel.clusters import (
        build_clusters,
        clustered_closest_hit,
    )
    from u_4a_2s_p3d_raytracer_template2_tpu.accel.bvh import build_bvh

    sd = random_sphere_soup(n=300, seed=11)
    scene = rt.build_scene(sd, accel=rt.constants.ACCEL_NONE)
    params = np.asarray(scene.prims.params)
    ptype = np.asarray(scene.prims.ptype)
    bvh = build_bvh(params, ptype)
    ct = build_clusters(params, ptype, np.asarray(bvh.order))
    assert ct.n_sph_clusters >= 2  # multi-cluster

    rays = make_rays(n=500, seed=5)
    t_ref, id_ref = closest_hit_brute(scene.prims, rays)
    t, oid = clustered_closest_hit(ct, scene.prims, rays, tile=128)
    np.testing.assert_allclose(np.minimum(np.asarray(t), 1e30),
                               np.minimum(np.asarray(t_ref), 1e30),
                               rtol=1e-4, atol=1e-4)
    assert (np.asarray(oid) == np.asarray(id_ref)).mean() > 0.995


def test_grid_quirk7_cross_cell_closest_is_physical():
    """SURVEY quirk #7 (grid.cpp:262-307 carries `closestObj` across cells):
    proven UNOBSERVABLE in docs/PARITY.md — the accept test requires a
    current-cell hit, and a nearer object whose hit lies beyond its cell's
    exit slab is re-found in the cell containing the hit point. This test
    pins the construction that WOULD diverge if the carry were live: a big
    sphere spanning many cells whose first-visited-cell hit distance exceeds
    that cell's slab, plus a farther small sphere behind it."""
    sd = rt.SceneDef()
    sd.set_camera(eye=[0, 0, 20], at=[0, 0, 0], up=[0, 1, 0], fov=30,
                  hither=0.01, res_x=8, res_y=8, aperture_ratio=0,
                  focal_ratio=1)
    m = sd.add_material([0.8, 0.2, 0.2], 1.0, [1, 1, 1], 0.0, 10, 0, 1)
    # big sphere overlapping many grid cells; rays enter its AABB cells long
    # before reaching the surface
    sd.add_sphere([0.0, 0.0, 0.0], 4.0, m)
    # farther small sphere hidden behind it on the axis
    sd.add_sphere([0.0, 0.0, -7.0], 1.0, m)
    # off-axis clutter so the grid resolution is non-trivial
    for k in range(6):
        sd.add_sphere([3.5 * np.cos(k), 3.5 * np.sin(k), 2.0 - k], 0.3, m)
    sd.add_light([10, 10, 10], [1, 1, 1])
    scene = rt.build_scene(sd, accel=1)
    assert scene.grid is not None

    n = 64
    rng = np.random.default_rng(3)
    o = np.broadcast_to(np.array([0, 0, 20], np.float32), (n, 3)).copy()
    d = rng.normal(size=(n, 3)) * np.array([0.15, 0.15, 1.0])
    d[:, 2] = -np.abs(d[:, 2]) - 0.5
    d = (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)
    rays = Rays.make(o, d)

    t_g, id_g = grid_closest_hit(scene.grid, scene.prims, rays)
    t_b, id_b = closest_hit_brute(scene.prims, rays)
    np.testing.assert_array_equal(np.asarray(id_g), np.asarray(id_b))
    np.testing.assert_allclose(np.minimum(np.asarray(t_g), 1e30),
                               np.minimum(np.asarray(t_b), 1e30), rtol=1e-5)
