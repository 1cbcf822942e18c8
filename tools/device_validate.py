"""On-device validation artifact for the Pallas kernels (VERDICT r1 weak #9).

CI validates Pallas kernels in interpret mode on CPU; this script runs the
REAL compiled kernels on the TPU and records parity + timing into
``tools/device_validate.json`` so the numbers cited in docstrings are
reproducible from the repo.

Sections: sphere kernels, Whitted megakernel, PT megakernel (full
glsl_world), packet-BVH traversal on dragon — each guarded so a failure
records the error instead of losing the artifact.

Usage: python tools/device_validate.py [section ...]
       (needs the TPU backend; no args = all sections)
"""
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "device_validate.json")
SCENES = "/root/reference/P3D_RayTracer_Template2/P3D_Scenes"


def main():
    import jax
    import jax.numpy as jnp

    import u_4a_2s_p3d_raytracer_template2_tpu as rt
    from u_4a_2s_p3d_raytracer_template2_tpu.models import (
        whitted,
        whitted_megakernel as mk,
    )
    from u_4a_2s_p3d_raytracer_template2_tpu.models.scenes import mount_scene
    from u_4a_2s_p3d_raytracer_template2_tpu.ops import (
        intersect,
        pallas_intersect as pk,
    )
    from u_4a_2s_p3d_raytracer_template2_tpu.core.types import Rays
    from u_4a_2s_p3d_raytracer_template2_tpu.utils.profiling import (
        enable_compilation_cache,
    )
    from u_4a_2s_p3d_raytracer_template2_tpu.utils.timing import frame_time

    enable_compilation_cache()
    backend = jax.default_backend()
    if os.path.exists(OUT):
        with open(OUT) as f:
            report = json.load(f)   # extend the committed artifact
    else:
        report = {}
    report.update({"backend": backend, "device": str(jax.devices()[0])})
    if backend != "tpu":
        print("needs TPU; backend =", backend)
        return 1

    want = set(sys.argv[1:])

    def section(name):
        return not want or name in want

    rng = np.random.default_rng(0)
    if section("spheres"):
        try:
            _spheres(jax, jnp, pk, rng, report)
        except Exception:
            report["sphere_closest"] = {"error": traceback.format_exc()}
            print(report["sphere_closest"]["error"], flush=True)

    if section("whitted_mk"):
        try:
            _whitted_mk(jax, jnp, rt, whitted, mk, mount_scene, report)
        except Exception:
            report["megakernel_mount_512"] = {"error": traceback.format_exc()}
            print(report["megakernel_mount_512"]["error"], flush=True)

    if section("pt_mk"):
        try:
            _pt_mk(jax, jnp, report)
        except Exception:
            report["pt_megakernel_glsl"] = {"error": traceback.format_exc()}
            print(report["pt_megakernel_glsl"]["error"], flush=True)

    if section("packets"):
        try:
            _packets(jax, jnp, rt, report)
        except Exception:
            report["dragon_packets"] = {"error": traceback.format_exc()}
            print(report["dragon_packets"]["error"], flush=True)

    report["timestamp"] = time.strftime("%Y-%m-%d %H:%M:%S")
    with open(OUT, "w") as f:
        json.dump(report, f, indent=1)
    print("wrote", OUT)
    return 0


def _spheres(jax, jnp, pk, rng, report):
    from u_4a_2s_p3d_raytracer_template2_tpu.utils.timing import frame_time

    R, K = 262144, 7424
    centers = jnp.asarray(rng.uniform(-10, 10, (K, 3)), jnp.float32)
    radii = jnp.asarray(rng.uniform(0.2, 1.0, K), jnp.float32)
    kc = (centers ** 2).sum(-1) - radii ** 2
    ids = jnp.arange(K, dtype=jnp.int32)
    o = jnp.asarray(rng.uniform(-12, 12, (R, 3)), jnp.float32)
    d = jnp.asarray(rng.normal(size=(R, 3)), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    # --- sphere closest: Pallas vs MXU winners ---------------------------
    t_pk, id_pk = pk.sphere_closest(centers, kc, ids, o, d)
    from u_4a_2s_p3d_raytracer_template2_tpu.ops import mxu_intersect as mxu

    # reference winners, chunked over rays (a full [R, K] map is ~7.8 GB)
    @jax.jit
    def ref_min(o, d):
        def body(c):
            oc, dc = c
            return jnp.min(mxu.sphere_t(centers, kc, oc, dc), axis=-1)
        return jax.lax.map(
            body, (o.reshape(-1, 4096, 3), d.reshape(-1, 4096, 3))
        ).reshape(-1)

    t_ref = ref_min(o, d)
    agree = float(jnp.mean(jnp.isclose(t_pk, t_ref, rtol=1e-5, atol=1e-4)
                           | ((t_pk >= 1e30) & (t_ref >= 1e30))))
    dt = frame_time(lambda i: pk.sphere_closest(
        centers, kc, ids, o + 1e-4 * i, d)[0].sum(), n_lo=2, n_hi=10, reps=3)
    report["sphere_closest"] = {
        "rays": R, "prims": K, "t_agree_frac": agree,
        "sweep_ms": round(dt * 1e3, 2),
        "gtests_per_s": round(R * K / dt / 1e12, 3),
    }
    print("sphere_closest:", report["sphere_closest"], flush=True)

    # --- sphere any-hit: early-exit kernel vs closest-derived mask -------
    for max_t in (2.0, 1e30):
        occ = pk.sphere_any_hit(centers, kc, o, d, max_t)
        want = t_pk < max_t
        eq = float(jnp.mean(occ == want))
        dt = frame_time(lambda i: pk.sphere_any_hit(
            centers, kc, o + 1e-4 * i, d, max_t).sum().astype(jnp.float32),
            n_lo=2, n_hi=10, reps=3)
        report[f"sphere_any_hit_max_t_{max_t:g}"] = {
            "mask_equal_frac": eq, "sweep_ms": round(dt * 1e3, 2)}
        print(f"sphere_any_hit {max_t:g}:",
              report[f"sphere_any_hit_max_t_{max_t:g}"], flush=True)


def _whitted_mk(jax, jnp, rt, whitted, mk, mount_scene, report):
    """Whitted megakernel: device image parity vs wavefront + timing."""
    from u_4a_2s_p3d_raytracer_template2_tpu.utils.timing import frame_time

    res = 512
    scene = rt.build_scene(mount_scene(res=res))
    cfg = rt.RenderConfig()
    px = jnp.tile(jnp.arange(res, dtype=jnp.float32), res)
    py = jnp.repeat(jnp.arange(res, dtype=jnp.float32), res)
    key = jax.random.PRNGKey(0)
    tile = mk.make_render_tile(scene, cfg)
    got = tile(px, py, key)
    import dataclasses

    want = jnp.clip(whitted.render_tile(
        scene, px, py, dataclasses.replace(cfg, engine="wavefront"), key),
        0, 1)
    diff = jnp.abs(got - want)
    dt = frame_time(lambda i: tile(px + 0.37 * i, py, key).sum(),
                    n_lo=10, n_hi=110, reps=3)
    report["megakernel_mount_512"] = {
        "parity_max": float(diff.max()),
        "parity_mean": float(diff.mean()),
        "frac_pixels_gt_2e-3": float((diff.max(-1) > 2e-3).mean()),
        "frame_ms": round(dt * 1e3, 3),
        "mrays_per_s": round(res * res * 2 / dt / 1e6, 1),
    }
    print("megakernel:", report["megakernel_mount_512"], flush=True)


def _pt_mk(jax, jnp, report):
    """PT megakernel on the FULL glsl_world: draw-for-draw parity vs the
    XLA presampled integrator (same uniforms → elementwise comparison, see
    tests/test_pt_megakernel.py module doc) + frame timing."""
    from u_4a_2s_p3d_raytracer_template2_tpu.models import pathtracer as pt
    from u_4a_2s_p3d_raytracer_template2_tpu.models import pt_megakernel as mk
    from u_4a_2s_p3d_raytracer_template2_tpu.models.glsl_scene import (
        glsl_camera,
        glsl_world,
    )
    from u_4a_2s_p3d_raytracer_template2_tpu.ops.camera import thin_lens_rays
    from u_4a_2s_p3d_raytracer_template2_tpu.ops.sampling import (
        sample_unit_disk,
    )
    from u_4a_2s_p3d_raytracer_template2_tpu.utils.timing import frame_time

    res = 256
    scene = glsl_world()
    cam = glsl_camera(res, res)
    cfg = pt.PTConfig()
    frame = mk.make_render_frame(scene, cam, cfg)

    key = jax.random.PRNGKey(7)
    got = frame(key)

    # XLA twin consuming the identical sample stream (render_frame body)
    kj, kl, kt, kc = jax.random.split(key, 4)
    ys, xs = jnp.meshgrid(jnp.arange(res, dtype=jnp.float32),
                          jnp.arange(res, dtype=jnp.float32), indexing="ij")
    px, py = xs.reshape(-1), ys.reshape(-1)
    R = px.shape[0]
    jit2 = jax.random.uniform(kj, (R, 2), jnp.float32)
    lens = sample_unit_disk(kl, (R,)) * (cam.aperture * 0.5)
    tm = cam.time0 + jax.random.uniform(kt, (R,)) * (cam.time1 - cam.time0)
    rays = thin_lens_rays(cam, px + jit2[:, 0], py + jit2[:, 1], lens, tm)
    uni = pt.draw_uniforms(kc, cfg.max_bounces, R)
    want = pt.ray_color_presampled(scene, cfg, rays, uni).reshape(res, res, 3)

    diff = jnp.abs(got - want)
    dt = frame_time(lambda i: frame(jax.random.PRNGKey(100 + i)).sum(),
                    n_lo=2, n_hi=10, reps=3)
    report["pt_megakernel_glsl_256"] = {
        "spheres": int(scene.sp_center0.shape[0]),
        "parity_max": float(diff.max()),
        "parity_mean": float(diff.mean()),
        "frac_gt_2e-3": float((diff.max(-1) > 2e-3).mean()),
        "frame_ms": round(dt * 1e3, 3),
        "mpaths_per_s": round(res * res / dt / 1e6, 2),
    }
    print("pt_megakernel:", report["pt_megakernel_glsl_256"], flush=True)


def _packets(jax, jnp, rt, report):
    """Packet-BVH kernel on dragon: parity vs cluster sweeps + timing on
    primary and incoherent batches (the VERDICT r2 #1 workload)."""
    from u_4a_2s_p3d_raytracer_template2_tpu.accel.clusters import (
        clustered_closest_hit,
    )
    from u_4a_2s_p3d_raytracer_template2_tpu.accel.packets import (
        packet_any_hit,
        packet_closest_hit,
    )
    from u_4a_2s_p3d_raytracer_template2_tpu.core.types import Rays
    from u_4a_2s_p3d_raytracer_template2_tpu.ops.camera import primary_rays
    from u_4a_2s_p3d_raytracer_template2_tpu.utils.timing import loop_time

    sd = rt.parse_p3f(f"{SCENES}/dragon.p3f")
    scene = rt.build_scene(sd, accel=2)
    pt_tab, prims = scene.packets, scene.prims

    res = 256
    ys, xs = np.meshgrid(np.arange(res, dtype=np.float32),
                         np.arange(res, dtype=np.float32), indexing="ij")
    prim = primary_rays(scene.camera, jnp.asarray(xs.reshape(-1)) + 0.5,
                        jnp.asarray(ys.reshape(-1)) + 0.5,
                        jax.random.PRNGKey(0))
    rng2 = np.random.default_rng(3)
    o = rng2.uniform(np.asarray(pt_tab.world_min),
                     np.asarray(pt_tab.world_max),
                     (res * res, 3)).astype(np.float32)
    dd = rng2.normal(size=(res * res, 3)).astype(np.float32)
    dd /= np.linalg.norm(dd, axis=-1, keepdims=True)
    inc = Rays.make(o, dd)

    out = {"tris": int(prims.n_tri), "chunks": int(pt_tab.tri_chunks.shape[0])}
    for tag, rays in (("primary", prim), ("incoherent", inc)):
        t_p, id_p = packet_closest_hit(pt_tab, prims, rays)
        t_c, id_c = clustered_closest_hit(scene.clusters, prims, rays)
        agree = float(jnp.mean(jnp.isclose(t_p, t_c, rtol=1e-4, atol=1e-4)
                               | ((t_p >= 1e30) & (t_c >= 1e30))))
        o0 = rays.origin

        def stepk(i, acc, rays=rays, o0=o0):
            r = Rays(o0 + i.astype(jnp.float32) * 1e-5, rays.direction,
                     rays.time)
            t, oid = packet_closest_hit(pt_tab, prims, r)
            return acc + t.sum() + oid.sum().astype(jnp.float32)

        dt = loop_time(stepk, jnp.float32(0.0), n_lo=2, n_hi=8, reps=3)

        def stepa(i, acc, rays=rays, o0=o0):
            r = Rays(o0 + i.astype(jnp.float32) * 1e-5, rays.direction,
                     rays.time)
            return acc + packet_any_hit(pt_tab, prims, r,
                                        1e30).astype(jnp.float32).sum()

        dta = loop_time(stepa, jnp.float32(0.0), n_lo=2, n_hi=8, reps=3)
        out[tag] = {
            "t_agree_vs_clusters": agree,
            "closest_ms": round(dt * 1e3, 3),
            "mrays_per_s": round(res * res / dt / 1e6, 2),
            "anyhit_ms": round(dta * 1e3, 3),
        }
        print(f"packets dragon {tag}:", out[tag], flush=True)
    report["dragon_packets"] = out


if __name__ == "__main__":
    raise SystemExit(main())
