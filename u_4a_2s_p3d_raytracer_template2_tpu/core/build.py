"""SceneDef (host NumPy) → Scene pytree (device arrays, padded static shapes).

This is the boundary between the host runtime (parsing, accel build) and the
XLA-compiled compute path. Everything downstream of here is statically shaped.
"""
from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp
import numpy as np

from . import constants as C
from .types import (
    BvhArrays,
    Camera,
    GridArrays,
    Lights,
    Materials,
    Primitives,
    Rays,
    Scene,
)


def _round_up(n: int, m: int) -> int:
    return max(m, ((n + m - 1) // m) * m)


def build_camera(cam: dict) -> Camera:
    """Derive the uvn frame exactly like the reference ctor (camera.h:35-73)."""
    eye = np.asarray(cam["eye"], np.float32)
    at = np.asarray(cam["at"], np.float32)
    up = np.asarray(cam["up"], np.float32)
    n = eye - at
    plane_dist = float(np.linalg.norm(n))
    n = n / plane_dist
    u = np.cross(up, n)
    u = u / np.linalg.norm(u)
    v = np.cross(n, u)
    h = 2.0 * plane_dist * math.tan(math.pi * cam["fov"] / 180.0 / 2.0)
    w = (cam["res_x"] / cam["res_y"]) * h
    # Lens aperture = aperture_ratio * pixel size (camera.h:66)
    aperture = cam["aperture_ratio"] * (w / cam["res_x"])
    f32 = lambda x: jnp.asarray(x, jnp.float32)
    return Camera(
        eye=f32(eye), u=f32(u), v=f32(v), n=f32(n),
        w=f32(w), h=f32(h), plane_dist=f32(plane_dist),
        focal_ratio=f32(cam["focal_ratio"]), aperture=f32(aperture),
        time0=f32(0.0), time1=f32(0.0),
        res_x=int(cam["res_x"]), res_y=int(cam["res_y"]),
    )


def build_scene(
    sd,
    *,
    accel: Optional[int] = None,
    pad_to: int = 8,
    load_skybox: bool = True,
) -> Scene:
    """Pad and upload a SceneDef; build the requested accelerator host-side."""
    n_obj = len(sd.objects)
    n_pad = _round_up(n_obj, pad_to)

    params = np.zeros((n_pad, 12), np.float32)
    ptype = np.full(n_pad, C.INVALID, np.int32)
    mat_id = np.zeros(n_pad, np.int32)
    for i, o in enumerate(sd.objects):
        params[i] = o.params
        ptype[i] = o.ptype
        mat_id[i] = max(o.mat_id, 0)

    # type-grouped views (pre-gathered so the brute-force path is dense)
    def group(code, width):
        ids = np.nonzero(ptype[:n_obj] == code)[0].astype(np.int32)
        k = _round_up(max(len(ids), 1), pad_to)
        p = np.zeros((k, width), np.float32)
        gi = np.full(k, -1, np.int32)
        if len(ids):
            p[: len(ids)] = params[ids, :width]
            gi[: len(ids)] = ids
        return p, gi, len(ids)

    tri_p, tri_ids, n_tri = group(C.TRIANGLE, 12)
    sph_p, sph_ids, n_sph = group(C.SPHERE, 4)
    pl_p, pl_ids, n_pl = group(C.PLANE, 4)
    box_p, box_ids, n_box = group(C.AABOX, 6)

    # MXU-ready tables (ops/mxu_intersect.py)
    from ..ops.mxu_intersect import triangle_functionals

    tri_mo, tri_md = triangle_functionals(tri_p)
    sph_k = ((sph_p[:, 0:3] ** 2).sum(-1) - sph_p[:, 3] ** 2).astype(
        np.float32)

    n_mat = max(1, len(sd.materials))
    mats = np.zeros((n_mat, 11), np.float32)
    for i, m in enumerate(sd.materials):
        mats[i] = m
    materials = Materials(
        diff_color=jnp.asarray(mats[:, 0:3]),
        kd=jnp.asarray(mats[:, 3]),
        spec_color=jnp.asarray(mats[:, 4:7]),
        ks=jnp.asarray(mats[:, 7]),
        shine=jnp.asarray(mats[:, 8]),
        transmit=jnp.asarray(mats[:, 9]),
        ior=jnp.asarray(mats[:, 10]),
    )

    n_l = max(1, len(sd.lights))
    lt = np.zeros((n_l, 6), np.float32)
    for i, l in enumerate(sd.lights):
        lt[i] = l
    lights = Lights(position=jnp.asarray(lt[:, 0:3]), color=jnp.asarray(lt[:, 3:6]))

    if sd.camera is None:
        raise ValueError("scene has no camera ('v' block)")
    camera = build_camera(sd.camera)

    accel_type = sd.accel_type if accel is None else accel

    bvh = grid = clusters = packets = None
    if accel_type == C.ACCEL_BVH and n_obj > 0:
        from ..accel.bvh import build_bvh, last_host_order
        from ..accel.clusters import build_clusters
        from ..accel.packets import build_packets

        bvh = build_bvh(params[:n_obj], ptype[:n_obj])
        # tile-coherent clusters along the BVH-sorted order: the TPU-native
        # traversal path (accel/clusters.py). The order comes from the
        # builder's host-side stash — never read back from the device.
        clusters = build_clusters(params[:n_obj], ptype[:n_obj],
                                  last_host_order())
        # SAH treelet tables for the packet-BVH Pallas kernel — the
        # production TPU path for large scenes (accel/packets.py); None
        # when no type is big enough to benefit.
        packets = build_packets(params[:n_obj], ptype[:n_obj])
    elif accel_type == C.ACCEL_GRID and n_obj > 0:
        from ..accel.grid import build_grid
        from ..accel.packets import build_packets

        grid = build_grid(params[:n_obj], ptype[:n_obj])
        # packet tables too: on TPU, grid mode routes traversal to the
        # packet-BVH kernel (the vmapped per-ray DDA is ~100x slower on
        # device — measured, tools/bench_grid.py); the DDA stays
        # dispatchable via accel_impl="perray"
        packets = build_packets(params[:n_obj], ptype[:n_obj])

    skybox = jnp.zeros((6, 1, 1, 3), jnp.float32)
    has_skybox = False
    if sd.skybox_dir is not None and load_skybox:
        from ..io.skybox import load_skybox_dir

        faces = load_skybox_dir(sd.skybox_dir)
        if faces is not None:
            skybox = jnp.asarray(faces)
            has_skybox = True

    return Scene(
        prims=Primitives(
            params=jnp.asarray(params),
            ptype=jnp.asarray(ptype),
            mat_id=jnp.asarray(mat_id),
            tri_p=jnp.asarray(tri_p), tri_ids=jnp.asarray(tri_ids),
            tri_mo=jnp.asarray(tri_mo), tri_md=jnp.asarray(tri_md),
            sph_p=jnp.asarray(sph_p), sph_ids=jnp.asarray(sph_ids),
            sph_k=jnp.asarray(sph_k),
            pl_p=jnp.asarray(pl_p), pl_ids=jnp.asarray(pl_ids),
            box_p=jnp.asarray(box_p), box_ids=jnp.asarray(box_ids),
            n_tri=n_tri, n_sph=n_sph, n_pl=n_pl, n_box=n_box,
        ),
        materials=materials,
        lights=lights,
        camera=camera,
        bg_color=jnp.asarray(sd.bg_color, jnp.float32),
        skybox=skybox,
        bvh=bvh,
        grid=grid,
        clusters=clusters,
        packets=packets,
        accel_type=int(accel_type),
        spp=int(sd.spp),
        has_skybox=has_skybox,
        n_objects=n_obj,
        n_lights=len(sd.lights),
        has_reflective=bool((mats[:, 7] > 0).any()),
        has_transmissive=bool((mats[:, 9] != 0).any()),
    )


def load_scene(path: str, **kw) -> Scene:
    from ..io.p3f import parse_p3f

    return build_scene(parse_p3f(path), **kw)


def with_prim_params(scene: Scene, params) -> Scene:
    """Differentiably swap the unified primitive table and rebuild every
    derived per-type view inside a jit — the geometry half of inverse
    rendering (north star: "gradients flow through intersection
    barycentrics").

    * Triangle normal rows (params[:, 9:12]) are RE-DERIVED from (e1, e2)
      exactly like the reference ctor (scene.cpp:10-40: normalized cross),
      so optimizing vertices keeps the flat-shading normal consistent and
      normal gradients flow back to the vertices.
    * The per-type tables (tri_p/sph_p/pl_p/box_p), sphere |c|²-r²
      constants, and Baldwin–Weber functionals are regenerated with jnp ops.
    * Host-built accel tables (BVH/grid/clusters/packets) keep their
      STRUCTURE — the tree topology is a discrete build product; for the
      small displacements of a fit step the traversal stays conservative
      enough in practice, and they are refreshed on the next host rebuild.
    """
    import dataclasses

    from ..core.types import normalize
    from ..ops.mxu_intersect import triangle_functionals_jnp

    prims = scene.prims
    params = jnp.asarray(params, jnp.float32)
    is_tri = (prims.ptype == C.TRIANGLE)[:, None]
    tri_n = normalize(jnp.cross(params[:, 3:6], params[:, 6:9]))
    params = jnp.where(is_tri,
                        jnp.concatenate([params[:, 0:9], tri_n], -1),
                        params)

    def view(ids, width):
        rows = params[jnp.maximum(ids, 0), :width]
        return jnp.where((ids >= 0)[:, None], rows, 0.0)

    tri_p = view(prims.tri_ids, 12)
    sph_p = view(prims.sph_ids, 4)
    pl_p = view(prims.pl_ids, 4)
    box_p = view(prims.box_ids, 6)
    sph_k = jnp.sum(sph_p[:, 0:3] ** 2, -1) - sph_p[:, 3] ** 2
    tri_mo, tri_md = triangle_functionals_jnp(tri_p)
    new_prims = dataclasses.replace(
        prims, params=params, tri_p=tri_p, sph_p=sph_p, pl_p=pl_p,
        box_p=box_p, sph_k=sph_k, tri_mo=tri_mo, tri_md=tri_md)
    return dataclasses.replace(scene, prims=new_prims)
