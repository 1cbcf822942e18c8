"""On-device (pack, leaf_chunks) sweep for the packet-BVH kernel.

The walk loop is scalar-control-flow-bound (~2 us/iteration; the VPU leaf
fold is ~0.4 us/lane-block), so the tuning levers are the ones that cut
ITERATIONS: leaf width (lane blocks per leaf -> shallower tree) and packet
size (rays amortizing one walk). This sweep measures dragon (100k tris) and
balls_high (7,381 spheres) closest-hit + any-hit on primary and incoherent
batches for each combo; winners get baked into accel/packets.py defaults.

Usage: python -u tools/tune_packets.py [combo ...]   # e.g. 256x2 512x1
       (no args = default grid; one TPU consumer at a time)
"""
import json
import sys

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp

import u_4a_2s_p3d_raytracer_template2_tpu as rt
from u_4a_2s_p3d_raytracer_template2_tpu.accel import packets as P
from u_4a_2s_p3d_raytracer_template2_tpu.core import constants as C
from u_4a_2s_p3d_raytracer_template2_tpu.core.types import Rays
from u_4a_2s_p3d_raytracer_template2_tpu.ops.camera import primary_rays
from u_4a_2s_p3d_raytracer_template2_tpu.utils.profiling import (
    enable_compilation_cache,
)
from u_4a_2s_p3d_raytracer_template2_tpu.utils.timing import loop_time

SCENES = "/root/reference/P3D_RayTracer_Template2/P3D_Scenes"


def prim_tables(prims):
    """Reconstruct (params, ptype) rows from the scene's SoA views."""
    n = 0
    for ids in (prims.tri_ids, prims.sph_ids):
        if ids.shape[0]:
            n = max(n, int(np.asarray(ids).max()) + 1)
    params = np.zeros((n, 12), np.float32)
    ptype = np.full(n, -1)
    if prims.n_tri:
        ids = np.asarray(prims.tri_ids)[: prims.n_tri]
        params[ids] = np.asarray(prims.tri_p)[: prims.n_tri]
        ptype[ids] = C.TRIANGLE
    if prims.n_sph:
        ids = np.asarray(prims.sph_ids)[: prims.n_sph]
        params[ids, :4] = np.asarray(prims.sph_p)[: prims.n_sph, :4]
        ptype[ids] = C.SPHERE
    return params, ptype


def time_one(tag, fn, rays, n_hi=8):
    o0 = rays.origin

    def step(i, acc):
        r = Rays(o0 + i.astype(jnp.float32) * 1e-5, rays.direction,
                 rays.time)
        out = fn(r)
        if isinstance(out, tuple):
            return acc + out[0].sum() + out[1].sum().astype(jnp.float32)
        return acc + out.astype(jnp.float32).sum()

    dt = loop_time(step, jnp.float32(0.0), n_lo=2, n_hi=n_hi, reps=3)
    return round(dt * 1e3, 3)


def main():
    enable_compilation_cache()
    print(json.dumps({"tag": "backend", "backend": jax.default_backend()}),
          flush=True)
    combos = [(256, 1), (256, 2), (256, 4), (512, 2)]
    if len(sys.argv) > 1:
        combos = [tuple(int(x) for x in a.split("x")) for a in sys.argv[1:]]

    for scene_name, res in (("dragon", 256), ("balls_high", 256)):
        sd = rt.parse_p3f(f"{SCENES}/{scene_name}.p3f")
        scene = rt.build_scene(sd, accel=2)
        params, ptype = prim_tables(scene.prims)

        ys, xs = np.meshgrid(np.arange(res, dtype=np.float32),
                             np.arange(res, dtype=np.float32), indexing="ij")
        prim = primary_rays(scene.camera, jnp.asarray(xs.reshape(-1)) + 0.5,
                            jnp.asarray(ys.reshape(-1)) + 0.5,
                            jax.random.PRNGKey(0))
        pt0 = scene.packets
        rng = np.random.default_rng(3)
        o = rng.uniform(np.asarray(pt0.world_min), np.asarray(pt0.world_max),
                        (res * res, 3)).astype(np.float32)
        d = rng.normal(size=(res * res, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        inc = Rays.make(o, d)

        for pack, lc in combos:
            pt = P.build_packets(params, ptype, leaf_chunks=lc)
            row = {"tag": f"{scene_name}.{pack}x{lc}",
                   "chunks": int((pt.tri_chunks if pt.has_tri
                                  else pt.sph_chunks).shape[0]),
                   "nodes": int(pt.tri_nn if pt.has_tri else pt.sph_nn)}
            for rtag, rays in (("primary", prim), ("incoherent", inc)):
                row[f"closest_{rtag}_ms"] = time_one(
                    "c", lambda r: P.packet_closest_hit(
                        pt, scene.prims, r, pack=pack), rays)
                row[f"anyhit_{rtag}_ms"] = time_one(
                    "a", lambda r: P.packet_any_hit(
                        pt, scene.prims, r, 1e30, pack=pack), rays)
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
