"""Finite differences of the REFERENCE renderer vs jax.grad of ours.

The other FD tests differentiate our own renderer against itself
(test_gradients.py). This one closes the loop the north star asks for
literally: central finite differences computed on ``tests/oracle.py`` — the
independent scalar implementation of the reference semantics
(main.cpp:530-721) — must match ``jax.grad`` of the vectorized renderer on
the same pixel batch (VERDICT r2 item 9).

Valid because the two renderers agree pointwise (test_whitted_vs_oracle.py):
where f_ours == f_ref on a neighborhood, df_ours == df_ref. Parameters are
the smooth ones (colors/coefficients — silhouettes don't move, SURVEY.md
§7c).
"""
import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

import u_4a_2s_p3d_raytracer_template2_tpu as rt
from u_4a_2s_p3d_raytracer_template2_tpu.models.whitted import render_tile

from oracle import Oracle
from test_whitted_vs_oracle import mixed_scene, sphere_plane_scene

RES = 10


def _oracle_loss(sd, cfg):
    img = Oracle(sd, cfg).render()
    return float(np.mean(img))


def _jax_grad(scene, cfg, field, idx):
    ys, xs = jnp.meshgrid(jnp.arange(RES, dtype=jnp.float32),
                          jnp.arange(RES, dtype=jnp.float32), indexing="ij")
    px = xs.reshape(-1)
    py = ys.reshape(-1)
    key = jax.random.PRNGKey(0)

    def loss(v):
        arr = getattr(scene.materials, field).at[idx].set(v)
        mats = dataclasses.replace(scene.materials, **{field: arr})
        s = dataclasses.replace(scene, materials=mats)
        img = render_tile(s, px, py, cfg, key)
        return jnp.mean(img)

    base = getattr(scene.materials, field)[idx]
    return float(jax.grad(loss)(base))


def _oracle_fd(sd, cfg, mat_idx, col, eps):
    def at(delta):
        sd2 = dataclasses.replace(sd) if dataclasses.is_dataclass(sd) else sd
        import copy

        sd2 = copy.deepcopy(sd)
        sd2.materials[mat_idx] = sd2.materials[mat_idx].copy()
        sd2.materials[mat_idx][col] += delta
        return _oracle_loss(sd2, cfg)

    return (at(eps) - at(-eps)) / (2 * eps)


# material row layout in SceneDef: [diff(3), kd, spec(3), ks, shine, T, ior]
_COL = {"diff_color": 0, "kd": 3, "spec_color": 4, "ks": 7}


def _check(sd, cfg, cases, eps=2e-3, rtol=0.10, atol=3e-4):
    scene = rt.build_scene(sd)
    for field, mat_idx, comp in cases:
        col = _COL[field] + comp
        fd = _oracle_fd(sd, cfg, mat_idx, col, eps)
        idx = (mat_idx, comp) if field in ("diff_color", "spec_color") \
            else (mat_idx,)
        analytic = _jax_grad(scene, cfg, field, idx)
        assert np.isfinite(fd) and np.isfinite(analytic)
        tol = atol + rtol * max(abs(fd), abs(analytic))
        assert abs(fd - analytic) <= tol, (
            f"{field}[{mat_idx},{comp}]: jax.grad {analytic:.6g} "
            f"vs oracle FD {fd:.6g}")


def test_oracle_fd_sphere_plane():
    sd = sphere_plane_scene(res=RES)
    _check(sd, rt.RenderConfig(), [
        ("diff_color", 0, 0),
        ("diff_color", 1, 2),
        ("kd", 0, 0),
        ("ks", 0, 0),
    ])


def test_oracle_fd_through_secondary_rays():
    sd = mixed_scene(res=RES)
    _check(sd, rt.RenderConfig(), [
        ("diff_color", 0, 0),
        ("ks", 1, 0),          # mirror strength feeds the KR fold
        ("spec_color", 1, 0),
    ], eps=4e-3, rtol=0.12)


# ---------------------------------------------------------------------------
# geometry parameters (north star: "gradients flow through ... intersection
# barycentrics"): sphere center/radius, triangle vertex — jax.grad through
# core.build.with_prim_params vs oracle central differences.


def _tri_renormal(p):
    """Re-derive the stored flat normal after an edge perturbation, exactly
    like with_prim_params / the reference ctor (scene.cpp:10-40)."""
    n = np.cross(p[3:6], p[6:9])
    nn = np.linalg.norm(n)
    p[9:12] = n / nn if nn > 0 else 0.0
    return p


def _oracle_fd_geom(sd, cfg, obj_idx, col, eps):
    import copy

    def at(delta):
        sd2 = copy.deepcopy(sd)
        p = sd2.objects[obj_idx].params.astype(np.float64).copy()
        p[col] += delta
        if sd2.objects[obj_idx].ptype == 1:  # TRIANGLE
            p = _tri_renormal(p)
        sd2.objects[obj_idx].params = p.astype(np.float32)
        return _oracle_loss(sd2, cfg)

    return (at(eps) - at(-eps)) / (2 * eps)


def _jax_grad_geom(scene, cfg, obj_idx, col):
    from u_4a_2s_p3d_raytracer_template2_tpu.core.build import (
        with_prim_params,
    )

    ys, xs = jnp.meshgrid(jnp.arange(RES, dtype=jnp.float32),
                          jnp.arange(RES, dtype=jnp.float32), indexing="ij")
    px = xs.reshape(-1)
    py = ys.reshape(-1)
    key = jax.random.PRNGKey(0)

    def loss(v):
        params = scene.prims.params.at[obj_idx, col].set(v)
        s = with_prim_params(scene, params)
        img = render_tile(s, px, py, cfg, key)
        return jnp.mean(img)

    return float(jax.grad(loss)(scene.prims.params[obj_idx, col]))


def _check_geom(sd, cfg, cases, eps=1e-3, rtol=0.15, atol=5e-4):
    scene = rt.build_scene(sd)
    for obj_idx, col in cases:
        fd = _oracle_fd_geom(sd, cfg, obj_idx, col, eps)
        analytic = _jax_grad_geom(scene, cfg, obj_idx, col)
        assert np.isfinite(fd) and np.isfinite(analytic)
        tol = atol + rtol * max(abs(fd), abs(analytic))
        assert abs(fd - analytic) <= tol, (
            f"geom obj {obj_idx} col {col}: jax.grad {analytic:.6g} "
            f"vs oracle FD {fd:.6g}")


def test_oracle_fd_sphere_geometry():
    """Sphere center (x, z) and radius of the diffuse sphere: gradients
    through the quadratic's t and the hit-point normal."""
    sd = sphere_plane_scene(res=RES)
    # sphere is object 0: params = (cx, cy, cz, r)
    _check_geom(sd, rt.RenderConfig(), [(0, 0), (0, 2), (0, 3)])


def test_oracle_fd_triangle_vertex():
    """Triangle v0 translation and an e1 edge component (normal re-derived
    on both sides) through the full secondary-ray tree."""
    sd = mixed_scene(res=RES)
    # object 3 is the triangle: params = (v0, e1, e2, normal)
    _check_geom(sd, rt.RenderConfig(), [(3, 0), (3, 4)], eps=2e-3)


def test_oracle_fd_sphere_geometry_secondary():
    """Mirror-sphere center: the geometry gradient must survive the
    reflection subtree (hit point feeds the child ray origin)."""
    sd = mixed_scene(res=RES)
    _check_geom(sd, rt.RenderConfig(), [(1, 0), (1, 3)], eps=2e-3)
