"""Dedicated any-hit shadow traversals must equal closest-hit-derived
occlusion (occluded ⇔ min t < max_t) on every accelerator path.

Reference semantics: the early-exit shadow variants BVH::Traverse(Ray&)
(bvh.cpp:348-416) and Grid::Traverse(Ray&) (grid.cpp:313-361) answer the
same predicate as a bounded closest hit; these tests pin that equivalence
plus the grid's 'Init failure = in shadow' quirk (grid.cpp:326-328).
"""
import numpy as np
import jax.numpy as jnp
import pytest

import u_4a_2s_p3d_raytracer_template2_tpu as rt
from u_4a_2s_p3d_raytracer_template2_tpu.accel.bvh import (
    build_bvh,
    last_host_order,
)
from u_4a_2s_p3d_raytracer_template2_tpu.accel.clusters import (
    build_clusters,
    clustered_any_hit,
    clustered_closest_hit,
)
from u_4a_2s_p3d_raytracer_template2_tpu.accel.grid import build_grid
from u_4a_2s_p3d_raytracer_template2_tpu.accel.traverse import (
    bvh_any_hit,
    bvh_closest_hit,
    grid_any_hit,
    grid_closest_hit,
)
from u_4a_2s_p3d_raytracer_template2_tpu.core import constants as C
from u_4a_2s_p3d_raytracer_template2_tpu.core.types import Rays
from u_4a_2s_p3d_raytracer_template2_tpu.ops import pallas_intersect as pk
from u_4a_2s_p3d_raytracer_template2_tpu.ops.intersect import (
    any_hit_brute,
    closest_hit_brute,
)

from test_accel import make_rays, random_sphere_soup


@pytest.fixture(scope="module")
def soup():
    sd = random_sphere_soup(n=60, seed=3)
    scene = rt.build_scene(sd)
    return scene


@pytest.mark.parametrize("max_t", [0.5, 2.0, 10.0, C.BIG])
def test_brute_anyhit_equals_closest(soup, max_t):
    rays = make_rays(512, seed=7)
    t, _ = closest_hit_brute(soup.prims, rays)
    want = np.asarray(t < max_t)
    got = np.asarray(any_hit_brute(soup.prims, rays, max_t))
    assert (got == want).all()


@pytest.mark.parametrize("max_t", [0.5, 2.0, 10.0])
def test_bvh_anyhit_equals_closest(soup, max_t):
    bvh = build_bvh(np.asarray(soup.prims.params)[:soup.n_objects],
                    np.asarray(soup.prims.ptype)[:soup.n_objects])
    rays = make_rays(256, seed=11)
    t, _ = bvh_closest_hit(bvh, soup.prims, rays)
    want = np.asarray(t < max_t)
    got = np.asarray(bvh_any_hit(bvh, soup.prims, rays, max_t))
    assert (got == want).all()


@pytest.mark.parametrize("max_t", [0.5, 2.0, 10.0])
def test_grid_anyhit_equals_closest(soup, max_t):
    grid = build_grid(np.asarray(soup.prims.params)[:soup.n_objects],
                      np.asarray(soup.prims.ptype)[:soup.n_objects])
    rays = make_rays(256, seed=13)
    t, _ = grid_closest_hit(grid, soup.prims, rays)
    want = np.asarray(t < max_t)
    got = np.asarray(grid_any_hit(grid, soup.prims, rays, max_t))
    assert (got == want).all()


@pytest.mark.parametrize("max_t", [0.5, 2.0, 10.0])
def test_clusters_anyhit_equals_closest(soup, max_t):
    params = np.asarray(soup.prims.params)[:soup.n_objects]
    ptype = np.asarray(soup.prims.ptype)[:soup.n_objects]
    build_bvh(params, ptype)
    ct = build_clusters(params, ptype, last_host_order())
    rays = make_rays(256, seed=17)
    t, _ = clustered_closest_hit(ct, soup.prims, rays)
    want = np.asarray(t < max_t)
    got = np.asarray(clustered_any_hit(ct, soup.prims, rays, max_t))
    assert (got == want).all()


def test_grid_initfail_quirk(soup):
    """Rays that never reach the grid bbox: physical = lit, reference =
    occluded (grid.cpp:326-328)."""
    grid = build_grid(np.asarray(soup.prims.params)[:soup.n_objects],
                      np.asarray(soup.prims.ptype)[:soup.n_objects])
    # origin far outside, pointing away from the scene
    o = np.full((8, 3), 100.0, np.float32)
    d = np.tile(np.array([1.0, 0.0, 0.0], np.float32), (8, 1))
    rays = Rays.make(o, d)
    phys = np.asarray(grid_any_hit(grid, soup.prims, rays, 1e6,
                                   init_fail_occludes=False))
    ref = np.asarray(grid_any_hit(grid, soup.prims, rays, 1e6,
                                  init_fail_occludes=True))
    assert not phys.any()
    assert ref.all()


def test_pallas_anyhit_kernels_interpret(soup):
    """Pallas occlusion kernels (interpret mode) vs the XLA brute mask."""
    rays = make_rays(300, seed=23)
    prims = soup.prims
    for max_t in (0.5, 2.0, 10.0):
        t, _ = closest_hit_brute(prims, rays)

        occ_s = pk.sphere_any_hit(prims.sph_p[:, 0:3], prims.sph_k,
                                  rays.origin, rays.direction, max_t,
                                  interpret=True)
        occ_t = pk.triangle_any_hit(prims.tri_mo, rays.origin,
                                    rays.direction, max_t, interpret=True)
        got = np.asarray(occ_s | occ_t)
        want = np.asarray(t < max_t)
        assert (got == want).all(), f"max_t={max_t}"


def test_shadow_render_parity_across_accels():
    """Full renders must be identical no matter which any-hit path serves
    the shadow rays (mount: brute vs BVH/clusters vs grid)."""
    from u_4a_2s_p3d_raytracer_template2_tpu.core.types import RenderConfig
    from u_4a_2s_p3d_raytracer_template2_tpu.models.scenes import mount_scene
    from u_4a_2s_p3d_raytracer_template2_tpu.models.whitted import (
        render_image,
    )

    sd = mount_scene(res=24)
    cfg = RenderConfig()
    imgs = [np.asarray(render_image(rt.build_scene(sd, accel=a), cfg))
            for a in (0, 1, 2)]
    assert np.abs(imgs[1] - imgs[0]).max() < 1e-6
    assert np.abs(imgs[2] - imgs[0]).max() < 1e-6
