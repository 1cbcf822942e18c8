"""On-device A/B of the BVH-mode traversal implementations (VERDICT r2 #1).

Times, on the real chip, for dragon (100k tris, 256², depth-4) and
balls_high (7,381 spheres, 512²):

  * per-traversal: packet-BVH kernel vs cluster sweeps vs Pallas brute,
    on primary-like and incoherent ray batches;
  * full frames: wavefront engine under accel_impl = packets / clusters /
    (brute for balls_high).

Usage: python -u tools/bench_packets.py [dragon|balls|mini] > log 2>&1
(one TPU consumer at a time — serialize with any other bench).
"""
import json
import sys

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp

import u_4a_2s_p3d_raytracer_template2_tpu as rt
from u_4a_2s_p3d_raytracer_template2_tpu.core.types import Rays
from u_4a_2s_p3d_raytracer_template2_tpu.models import whitted
from u_4a_2s_p3d_raytracer_template2_tpu.ops.camera import primary_rays
from u_4a_2s_p3d_raytracer_template2_tpu.utils.profiling import (
    enable_compilation_cache,
)
from u_4a_2s_p3d_raytracer_template2_tpu.utils.timing import loop_time

SCENES = "/root/reference/P3D_RayTracer_Template2/P3D_Scenes"


def res_rays(scene, res):
    ys, xs = np.meshgrid(np.arange(res, dtype=np.float32),
                         np.arange(res, dtype=np.float32), indexing="ij")
    px = jnp.asarray(xs.reshape(-1)) + 0.5
    py = jnp.asarray(ys.reshape(-1)) + 0.5
    return primary_rays(scene.camera, px, py, jax.random.PRNGKey(0))


def incoherent_rays(n, lo, hi, seed=3):
    rng = np.random.default_rng(seed)
    o = rng.uniform(lo, hi, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return Rays.make(o, d)


def time_traversal(tag, fn, rays, n_hi=8):
    o0 = rays.origin

    def step(i, acc):
        r = Rays(o0 + i.astype(jnp.float32) * 1e-5, rays.direction,
                 rays.time)
        t, oid = fn(r)
        return acc + t.sum() + oid.sum().astype(jnp.float32)

    dt = loop_time(step, jnp.float32(0.0), n_lo=2, n_hi=n_hi, reps=3)
    print(json.dumps({"tag": tag, "ms": round(dt * 1e3, 3),
                      "rays": int(o0.shape[0])}), flush=True)
    return dt


def time_any(tag, fn, rays, n_hi=8):
    o0 = rays.origin

    def step(i, acc):
        r = Rays(o0 + i.astype(jnp.float32) * 1e-5, rays.direction,
                 rays.time)
        return acc + fn(r).astype(jnp.float32).sum()

    dt = loop_time(step, jnp.float32(0.0), n_lo=2, n_hi=n_hi, reps=3)
    print(json.dumps({"tag": tag, "ms": round(dt * 1e3, 3),
                      "rays": int(o0.shape[0])}), flush=True)
    return dt


def time_frame(tag, scene, cfg, res, n_hi=4):
    ys, xs = np.meshgrid(np.arange(res, dtype=np.float32),
                         np.arange(res, dtype=np.float32), indexing="ij")
    px = jnp.asarray(xs.reshape(-1))
    py = jnp.asarray(ys.reshape(-1))
    key = jax.random.PRNGKey(0)

    def step(i, acc):
        img = whitted.render_tile(scene, px + 0.37 * i.astype(jnp.float32),
                                  py, cfg, key)
        return acc + img.sum()

    dt = loop_time(step, jnp.float32(0.0), n_lo=1, n_hi=n_hi, reps=3)
    print(json.dumps({"tag": tag, "frame_ms": round(dt * 1e3, 2)}),
          flush=True)
    return dt


def parity_check(tag, scene, cfg_a, cfg_b, res=64):
    img_a = np.asarray(whitted.render_image(scene, cfg_a))
    img_b = np.asarray(whitted.render_image(scene, cfg_b))
    diff = np.abs(img_a - img_b).max(axis=-1)
    print(json.dumps({"tag": tag, "max_px_diff": float(diff.max()),
                      "bad_frac": float((diff > 2e-3).mean())}), flush=True)


def run_dragon(full=True):
    from u_4a_2s_p3d_raytracer_template2_tpu.accel.clusters import (
        clustered_any_hit,
        clustered_closest_hit,
    )
    from u_4a_2s_p3d_raytracer_template2_tpu.accel.packets import (
        packet_any_hit,
        packet_closest_hit,
    )

    sd = rt.parse_p3f(f"{SCENES}/dragon.p3f")
    scene = rt.build_scene(sd, accel=2)
    pt, prims = scene.packets, scene.prims
    print(json.dumps({"tag": "dragon.build",
                      "tri_chunks": int(pt.tri_chunks.shape[0]),
                      "tri_nodes": pt.tri_nn}), flush=True)

    prim = res_rays(scene, 256)
    inc = incoherent_rays(256 * 256, np.asarray(pt.world_min),
                          np.asarray(pt.world_max))

    time_traversal("dragon.primary.packets",
                   lambda r: packet_closest_hit(pt, prims, r), prim)
    time_traversal("dragon.primary.clusters",
                   lambda r: clustered_closest_hit(scene.clusters, prims, r),
                   prim, n_hi=4)
    time_traversal("dragon.incoherent.packets",
                   lambda r: packet_closest_hit(pt, prims, r), inc, n_hi=4)
    time_traversal("dragon.incoherent.clusters",
                   lambda r: clustered_closest_hit(scene.clusters, prims, r),
                   inc, n_hi=4)
    time_any("dragon.shadow.packets",
             lambda r: packet_any_hit(pt, prims, r, 1e30), inc, n_hi=4)
    time_any("dragon.shadow.clusters",
             lambda r: clustered_any_hit(scene.clusters, prims, r, 1e30),
             inc, n_hi=4)

    if full:
        cfg_p = rt.RenderConfig(engine="wavefront", accel_impl="packets")
        cfg_c = rt.RenderConfig(engine="wavefront", accel_impl="clusters")
        time_frame("dragon.frame.packets", scene, cfg_p, 256)
        time_frame("dragon.frame.clusters", scene, cfg_c, 256, n_hi=2)
        parity_check("dragon.parity64", scene, cfg_p, cfg_c)


def run_balls(full=True, res=256):
    from u_4a_2s_p3d_raytracer_template2_tpu.accel.packets import (
        packet_closest_hit,
    )
    from u_4a_2s_p3d_raytracer_template2_tpu.ops.intersect import (
        closest_hit_brute,
    )

    sd = rt.parse_p3f(f"{SCENES}/balls_high.p3f")
    scene = rt.build_scene(sd, accel=2)
    pt, prims = scene.packets, scene.prims
    print(json.dumps({"tag": "balls.build",
                      "sph_chunks": int(pt.sph_chunks.shape[0]),
                      "sph_nodes": pt.sph_nn}), flush=True)

    prim = res_rays(scene, res)
    time_traversal(f"balls.primary{res}.packets",
                   lambda r: packet_closest_hit(pt, prims, r), prim)
    time_traversal(f"balls.primary{res}.brute",
                   lambda r: closest_hit_brute(prims, r), prim)

    if full:
        scene0 = rt.build_scene(sd, accel=0)
        cfg_p = rt.RenderConfig(engine="wavefront", accel_impl="packets")
        cfg_b = rt.RenderConfig(engine="wavefront")
        time_frame("balls.frame.packets", scene, cfg_p, res)
        time_frame("balls.frame.brute", scene0, cfg_b, res)


def run_sah_vs_median():
    """Tree-quality A/B on dragon: SAH vs the reference's median-split
    policy, same traversal kernel (VERDICT r2 item 2's measured delta)."""
    from u_4a_2s_p3d_raytracer_template2_tpu.accel.packets import (
        build_packets,
        packet_closest_hit,
    )

    sd = rt.parse_p3f(f"{SCENES}/dragon.p3f")
    scene = rt.build_scene(sd, accel=2)
    prims = scene.prims
    params = np.asarray(prims.params)
    ptype = np.asarray(prims.ptype)

    prim = res_rays(scene, 256)
    inc = incoherent_rays(256 * 256,
                          np.asarray(scene.packets.world_min),
                          np.asarray(scene.packets.world_max))
    for strategy in ("sah", "median"):
        pt = build_packets(params, ptype, strategy=strategy)
        print(json.dumps({"tag": f"dragon.build.{strategy}",
                          "tri_chunks": int(pt.tri_chunks.shape[0]),
                          "tri_nodes": pt.tri_nn}), flush=True)
        time_traversal(f"dragon.primary.{strategy}",
                       lambda r, pt=pt: packet_closest_hit(pt, prims, r),
                       prim)
        time_traversal(f"dragon.incoherent.{strategy}",
                       lambda r, pt=pt: packet_closest_hit(pt, prims, r),
                       inc, n_hi=4)


def run_mini():
    """Small-scale smoke: compile + parity on-device without long waits."""
    from u_4a_2s_p3d_raytracer_template2_tpu.accel.packets import (
        build_packets,
        packet_any_hit,
        packet_closest_hit,
    )
    from u_4a_2s_p3d_raytracer_template2_tpu.ops.intersect import (
        any_hit_brute,
        closest_hit_brute,
    )

    rng = np.random.default_rng(0)
    sd = rt.SceneDef()
    sd.set_camera(eye=[0, 0, 12], at=[0, 0, 0], up=[0, 1, 0], fov=45,
                  hither=0.01, res_x=24, res_y=24, aperture_ratio=0,
                  focal_ratio=1)
    m = sd.add_material([0.7, 0.7, 0.7], 1.0, [1, 1, 1], 0.1, 20, 0, 1)
    for _ in range(300):
        sd.add_sphere(rng.uniform(-5, 5, 3), rng.uniform(0.1, 0.5), m)
    for _ in range(300):
        b = rng.uniform(-5, 5, 3)
        sd.add_triangle(b, b + rng.uniform(-0.8, 0.8, 3),
                        b + rng.uniform(-0.8, 0.8, 3), m)
    sd.add_light([10, 10, 10], [1, 1, 1])
    scene = rt.build_scene(sd, accel=2)
    pt = scene.packets
    assert pt is not None

    rays = incoherent_rays(1024, -6.0, 6.0)
    t_ref, id_ref = closest_hit_brute(scene.prims, rays)
    t, oid = packet_closest_hit(pt, scene.prims, rays)
    t, t_ref = np.asarray(t), np.asarray(t_ref)
    ok = np.allclose(np.minimum(t, 1e30), np.minimum(t_ref, 1e30),
                     rtol=1e-4, atol=1e-4)
    ids_ok = float((np.asarray(oid) == np.asarray(id_ref)).mean())
    occ_ref = np.asarray(any_hit_brute(scene.prims, rays, 1e30))
    occ = np.asarray(packet_any_hit(pt, scene.prims, rays, 1e30))
    occ_ok = float((occ == occ_ref).mean())
    print(json.dumps({"tag": "mini.parity", "t_ok": bool(ok),
                      "ids_match": ids_ok, "occ_match": occ_ok}), flush=True)


if __name__ == "__main__":
    enable_compilation_cache()
    which = sys.argv[1] if len(sys.argv) > 1 else "mini"
    print(json.dumps({"tag": "backend",
                      "backend": jax.default_backend()}), flush=True)
    if which == "mini":
        run_mini()
    elif which == "dragon":
        run_dragon()
    elif which == "balls":
        run_balls()
    elif which == "balls-trav":
        run_balls(full=False)
    elif which == "balls512":
        run_balls(res=512)
    elif which == "dragon-trav":
        run_dragon(full=False)
    elif which == "sah-vs-median":
        run_sah_vs_median()
