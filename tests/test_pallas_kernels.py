"""Pallas kernels vs their XLA twins, in interpret mode on CPU."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import u_4a_2s_p3d_raytracer_template2_tpu as rt
from u_4a_2s_p3d_raytracer_template2_tpu.ops import mxu_intersect as mxu
from u_4a_2s_p3d_raytracer_template2_tpu.ops import pallas_intersect as pk

from test_accel import make_rays, random_sphere_soup


def _assert_mostly_close(t, t_want, frac=0.995):
    """t per ray vs the XLA argmin winner's t. Near-grazing deltas amplify
    f32 association differences between the fused kernel and the XLA fusion
    into different winners on a tiny fraction of rays; all other rays must
    match to 1e-5."""
    t = np.minimum(t, 1e30)
    t_want = np.minimum(np.asarray(t_want), 1e30)
    ok = np.isclose(t, t_want, rtol=1e-5, atol=1e-5)
    assert ok.mean() >= frac, f"only {ok.mean()*100:.2f}% of t values match"


def _scene_tables(n=200, seed=2):
    sd = random_sphere_soup(n=n, seed=seed)
    scene = rt.build_scene(sd)
    return scene


def test_pallas_sphere_matches_mxu():
    scene = _scene_tables()
    p = scene.prims
    K = p.sph_ids.shape[0]
    padK = ((K + pk.LANE - 1) // pk.LANE) * pk.LANE
    centers = jnp.zeros((padK, 3)).at[:K].set(p.sph_p[:, 0:3])
    kc = jnp.zeros((padK,)).at[:K].set(p.sph_k)
    ids = jnp.full((padK,), -1, jnp.int32).at[:K].set(p.sph_ids)

    rays = make_rays(700, seed=3)
    t_ref = mxu.sphere_t(p.sph_p[:, 0:3], p.sph_k, rays.origin,
                         rays.direction)
    t_ref = jnp.where((p.sph_ids >= 0)[None, :], t_ref, 1e30)
    idx = jnp.argmin(t_ref, -1)
    t_want = np.asarray(jnp.take_along_axis(t_ref, idx[:, None], -1)[:, 0])
    id_want = np.asarray(jnp.where(t_want < 1e30, p.sph_ids[idx], -1))

    t, pid = pk.sphere_closest(centers, kc, ids, rays.origin, rays.direction,
                               interpret=True)
    _assert_mostly_close(np.asarray(t), t_want)
    assert (np.asarray(pid) == id_want).mean() > 0.995


def test_pallas_triangle_matches_mxu():
    scene = _scene_tables()
    p = scene.prims
    K = p.tri_ids.shape[0]
    padK = ((K + pk.LANE - 1) // pk.LANE) * pk.LANE
    mo = jnp.zeros((3 * padK, 4)).at[: 3 * K].set(p.tri_mo)
    md = jnp.zeros((3 * padK, 3)).at[: 3 * K].set(p.tri_md)
    ids = jnp.full((padK,), -1, jnp.int32).at[:K].set(p.tri_ids)

    rays = make_rays(600, seed=4)
    t_ref = mxu.tri_t(p.tri_mo, p.tri_md, rays.origin, rays.direction)
    t_ref = jnp.where((p.tri_ids >= 0)[None, :], t_ref, 1e30)
    idx = jnp.argmin(t_ref, -1)
    t_want = np.asarray(jnp.take_along_axis(t_ref, idx[:, None], -1)[:, 0])
    id_want = np.asarray(jnp.where(t_want < 1e30, p.tri_ids[idx], -1))

    t, pid = pk.triangle_closest(mo, md, ids, rays.origin, rays.direction,
                                 interpret=True)
    _assert_mostly_close(np.asarray(t), t_want)
    assert (np.asarray(pid) == id_want).mean() > 0.995


@pytest.mark.parametrize("drop", ["none", "tri", "sph"])
def test_pallas_small_scene_matches_brute(drop):
    """Fused tri+sphere small-scene kernel vs the XLA closest_hit_brute."""
    from u_4a_2s_p3d_raytracer_template2_tpu.core.types import Rays
    from u_4a_2s_p3d_raytracer_template2_tpu.ops import intersect

    scene = _scene_tables(n=40, seed=5)
    p = scene.prims
    rays = make_rays(600, seed=6)

    tri = drop != "tri"
    sph = drop != "sph"
    mo = p.tri_mo if tri else jnp.zeros((0, 4), jnp.float32)
    tids = p.tri_ids if tri else jnp.zeros((0,), jnp.int32)
    cs = p.sph_p[:, 0:3] if sph else jnp.zeros((0, 3), jnp.float32)
    kc = p.sph_k if sph else jnp.zeros((0,), jnp.float32)
    sids = p.sph_ids if sph else jnp.zeros((0,), jnp.int32)

    t, pid = pk.small_scene_closest(mo, tids, cs, kc, sids, rays.origin,
                                    rays.direction, interpret=True)

    R = rays.origin.shape[0]
    carry = (jnp.full((R,), 1e30, jnp.float32), jnp.full((R,), -1, jnp.int32))
    if tri:
        carry = intersect._typed_min(intersect._triangle_t, p.tri_p,
                                     p.tri_ids, rays.origin, rays.direction,
                                     2048, carry)
    if sph:
        carry = intersect._typed_min(intersect._sphere_t, p.sph_p,
                                     p.sph_ids, rays.origin, rays.direction,
                                     2048, carry)
    t_want, id_want = np.asarray(carry[0]), np.asarray(carry[1])

    _assert_mostly_close(np.asarray(t), t_want)
    assert (np.asarray(pid) == id_want).mean() > 0.995
