"""On-device validation artifact for the Pallas kernels (VERDICT r1 weak #9,
r3 next-round #5).

CI validates Pallas kernels in interpret mode on CPU; this script runs the
REAL compiled kernels on the TPU and records parity + timing + roofline
rows into ``tools/device_validate.json`` so every measured number cited in
docs/ARCHITECTURE.md is reproducible from the repo.

Sections: sphere kernels (with f64-oracle forensics on any disagreeing
rays), Whitted megakernel (+roofline), distribution-mode skybox frame,
PT megakernel (+roofline, parity-outlier account), packet-BVH traversal on
dragon, grid-vs-packets on mount_high.

Roofline convention: achieved FLOP/s uses a STATIC per-primitive op-count
model (documented inline, ±30%); the VPU peak is MEASURED by the
`vpu_peak` section (pure-FMA Pallas microbenchmark), HBM peak is the v5e
public 819 GB/s.

Usage: python tools/device_validate.py [section ...]
       (needs the TPU backend; no args = all sections, FRESH artifact)
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

HBM_PEAK = 819e9          # v5e public spec

# measured f32 FMA ceiling (the `vpu_peak` section fills this at runtime;
# roofline pct columns use the MEASURED value, not a datasheet guess — the
# r3 artifact's assumed 2 TFLOP/s put one kernel at "113% of peak")
_MEASURED_VPU = {"flops": None}


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
        pallas_intersect as pk,
    )
    from u_4a_2s_p3d_raytracer_template2_tpu.utils.profiling import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    backend = jax.default_backend()
    want = set(sys.argv[1:])
    # FRESH artifact on a full run (a stale error key shipped in r3 because
    # the old script extended the committed file); section-selective runs
    # still merge so one section can be refreshed without losing the rest.
    if want and os.path.exists(OUT):
        with open(OUT) as f:
            report = json.load(f)
    else:
        report = {}
    report.update({"backend": backend, "device": str(jax.devices()[0])})
    if backend != "tpu":
        print("needs TPU; backend =", backend)
        return 1

    def section(name):
        return not want or name in want

    rng = np.random.default_rng(0)
    for name, fn in (
            ("vpu_peak", lambda: _vpu_peak(jax, jnp, report)),
            ("spheres", lambda: _spheres(jax, jnp, pk, rng, report)),
            ("whitted_mk", lambda: _whitted_mk(jax, jnp, rt, whitted, mk,
                                               mount_scene, report)),
            ("distribution", lambda: _distribution(jax, jnp, rt, mk,
                                                   report)),
            ("pt_mk", lambda: _pt_mk(jax, jnp, report)),
            ("packets", lambda: _packets(jax, jnp, rt, report)),
            ("grid", lambda: _grid(jax, jnp, rt, report)),
    ):
        if not section(name):
            continue
        try:
            fn()
        except Exception:
            report[name] = {"error": traceback.format_exc()}
            print(report[name]["error"], flush=True)

    report["timestamp"] = time.strftime("%Y-%m-%d %H:%M:%S")
    with open(OUT, "w") as f:
        json.dump(report, f, indent=1)
        f.write("\n")
    print("wrote", OUT)
    return 0


def _vpu_peak(jax, jnp, report):
    """Measured f32 FMA ceiling: a pure-FMA Pallas kernel on VMEM-resident
    [256,128] blocks, 512 dependent-chain-free FMAs per element. This is
    the denominator for every pct_vpu_peak below — a measured
    speed-of-light, not a datasheet guess."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from u_4a_2s_p3d_raytracer_template2_tpu.utils.timing import frame_time

    ROWS, N_FMA = 256, 512

    def kernel(x_ref, o_ref):
        a = x_ref[:]
        b = a * 1.0000001 + 0.3
        c = a * 0.9999999 - 0.2
        d = a + 0.1
        e = a - 0.1
        for _ in range(N_FMA // 8):
            b = b * a + 0.25
            c = c * a - 0.25
            d = d * a + 0.5
            e = e * a - 0.5
            b = b * 1.0000001 + c
            c = c * 0.9999998 + d
            d = d * 1.0000002 + e
            e = e * 0.9999997 + b
        o_ref[:] = b + c + d + e

    spec = pl.BlockSpec((ROWS, 128), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    grid_n = 64

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel, grid=(grid_n,), in_specs=[spec], out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((grid_n * ROWS, 128),
                                           jnp.float32),
        )(x)

    x = jnp.linspace(0.9, 1.1, grid_n * ROWS * 128,
                     dtype=jnp.float32).reshape(grid_n * ROWS, 128)
    dt = frame_time(lambda i: run(x + 1e-6 * i).sum(), n_lo=4, n_hi=40,
                    reps=3)
    flops = grid_n * ROWS * 128 * N_FMA * 2  # FMA = 2 FLOPs
    tflops = flops / dt / 1e12
    _MEASURED_VPU["flops"] = flops / dt
    report["vpu_peak"] = {
        "measured_f32_fma_tflops": round(tflops, 3),
        "method": f"{N_FMA} interleaved FMAs/element on [256,128] VMEM "
                  "blocks, slope-timed",
    }
    print("vpu_peak:", report["vpu_peak"], flush=True)


def _pct_peak(flops_per_s):
    peak = _MEASURED_VPU["flops"]
    return round(100 * flops_per_s / peak, 1) if peak else None


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
    agree_mask = (jnp.isclose(t_pk, t_ref, rtol=1e-5, atol=1e-4)
                  | ((t_pk >= 1e30) & (t_ref >= 1e30)))
    agree = float(jnp.mean(agree_mask))
    dt = frame_time(lambda i: pk.sphere_closest(
        centers, kc, ids, o + 1e-4 * i, d)[0].sum(), n_lo=2, n_hi=10, reps=3)
    row = {
        "rays": R, "prims": K, "t_agree_frac": agree,
        "sweep_ms": round(dt * 1e3, 2),
        "gtests_per_s": round(R * K / dt / 1e9, 1),
    }

    # Forensics on the disagreeing rays (the r3 verdict flagged the bare
    # 0.9943 as unexplained): for each, compute the exact f64 closest hit
    # on host, and record each implementation's error against it plus the
    # winner's discriminant. Measured cause: BOTH device paths use the
    # factored quadratic c = |o|^2 - 2 o.c + (|c|^2 - r^2) — the expansion
    # that makes precomputed chunk tables / MXU forms possible — which
    # catastrophically cancels ~8 bits at these ±12-unit origins against
    # sub-unit spheres; the two paths' different summation orders then
    # resolve near-ties to different winners. Neither is biased (median
    # |t - t_f64| is the same magnitude for both); the per-ray
    # differentiable path (ops/intersect._sphere_t_one) uses the
    # reference's direct (o-c) form and does not carry this error.
    bad = np.asarray(jnp.nonzero(~agree_mask, size=R, fill_value=-1)[0])
    bad = bad[bad >= 0]
    if len(bad):
        bad = bad[:4096]
        c64 = np.asarray(centers, np.float64)
        r64 = np.asarray(radii, np.float64)
        o64 = np.asarray(o, np.float64)[bad]
        d64 = np.asarray(d, np.float64)[bad]
        oc = o64[:, None, :] - c64[None, :, :]
        b = 2.0 * np.einsum("rk,rpk->rp", d64, oc)
        cc = (oc * oc).sum(-1) - (r64 ** 2)[None, :]
        disc = b * b - 4.0 * cc
        sq = np.sqrt(np.maximum(disc, 0.0))
        t0 = (-b - sq) / 2.0
        t1 = (-b + sq) / 2.0
        lo = np.minimum(t0, t1)
        hi = np.maximum(t0, t1)
        tt = np.where(lo < 0, hi, lo)
        tt = np.where((disc > 0) & (tt >= 0), tt, 1e30)
        t_true = tt.min(-1)
        win = tt.argmin(-1)
        margin = np.abs(disc[np.arange(len(bad)), win])
        # misses clamp to 1e6 so a hit/miss flip shows as a large-but-
        # finite error instead of swamping the medians
        tp = np.minimum(np.asarray(t_pk)[bad], 1e6)
        tr = np.minimum(np.asarray(t_ref)[bad], 1e6)
        tt6 = np.minimum(t_true, 1e6)
        err_pk = np.abs(tp - tt6)
        err_rf = np.abs(tr - tt6)
        row["disagree_forensics"] = {
            "n": int(len(bad)),
            "median_f64_disc_at_winner": float(np.median(margin)),
            "median_abs_t_err_pallas": float(np.median(err_pk)),
            "median_abs_t_err_mxu": float(np.median(err_rf)),
            "pallas_closer_to_f64_frac": round(
                float((err_pk <= err_rf).mean()), 4),
            "note": "cause: f32 catastrophic cancellation in the factored "
                    "quadratic both sweep paths share (see comment above); "
                    "error magnitudes are symmetric, winners flip on "
                    "near-ties. The differentiable per-ray path uses the "
                    "reference's direct (o-c) form instead.",
        }
    report["sphere_closest"] = row
    print("sphere_closest:", row, flush=True)

    # --- sphere any-hit: early-exit kernel vs closest-derived mask -------
    for max_t in (2.0, 1e30):
        occ = pk.sphere_any_hit(centers, kc, o, d, max_t)
        want_m = t_pk < max_t
        eq = float(jnp.mean(occ == want_m))
        dt = frame_time(lambda i: pk.sphere_any_hit(
            centers, kc, o + 1e-4 * i, d, max_t).sum().astype(jnp.float32),
            n_lo=2, n_hi=10, reps=3)
        report[f"sphere_any_hit_max_t_{max_t:g}"] = {
            "mask_equal_frac": eq, "sweep_ms": round(dt * 1e3, 2)}
        print(f"sphere_any_hit {max_t:g}:",
              report[f"sphere_any_hit_max_t_{max_t:g}"], flush=True)


# static per-primitive FLOP model (count of mul/add/div/sqrt treated as 1
# FLOP each, from the kernel fold bodies; ±30% is honest for select-heavy
# code): closest test per prim, occlusion per prim, Blinn-Phong per light,
# secondary-ray setup per node.
_FLOPS = dict(sphere=30, triangle=45, plane=12, aabox=40,
              blinn=70, setup=90)


def _mk_flops_per_lane(consts, cfg):
    """Whitted megakernel static FLOP count per ray lane."""
    per_prim = 0
    import u_4a_2s_p3d_raytracer_template2_tpu.core.constants as C

    names = {C.SPHERE: "sphere", C.TRIANGLE: "triangle", C.PLANE: "plane",
             C.AABOX: "aabox"}
    for ob in consts.objs:
        per_prim += _FLOPS[names[ob["ptype"]]]
    n_lights = len(consts.lights)
    branch = 2 if (consts.has_refl and consts.has_refr) else 1
    has_sec = consts.has_refl or consts.has_refr
    levels = cfg.max_depth if has_sec else 1
    nodes = sum(branch ** l for l in range(levels))
    per_node = per_prim + n_lights * (per_prim + _FLOPS["blinn"]) \
        + _FLOPS["setup"]
    return nodes * per_node


def _whitted_mk(jax, jnp, rt, whitted, mk, mount_scene, report):
    """Whitted megakernel: device image parity vs wavefront + timing +
    roofline row."""
    from u_4a_2s_p3d_raytracer_template2_tpu.models.whitted_megakernel import (
        _SceneConsts,
    )
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
    R = res * res
    flops = _mk_flops_per_lane(_SceneConsts(scene), cfg) * R
    hbm_bytes = R * (6 + 3) * 4  # rays in (o,d), color out — the design's
    #                              whole point: no intermediates
    report["megakernel_mount_512"] = {
        "parity_max": float(diff.max()),
        "parity_mean": float(diff.mean()),
        "frac_pixels_gt_2e-3": float((diff.max(-1) > 2e-3).mean()),
        "parity_note": "max-delta pixels sit on silhouette/TIR boundaries "
                       "where f32 reassociation flips a discrete branch; "
                       "mean delta is the frame-level statement",
        "frame_ms": round(dt * 1e3, 3),
        "mrays_per_s": round(res * res * 2 / dt / 1e6, 1),
        "roofline": {
            "flops_est_per_frame": int(flops),
            "achieved_tflops": round(flops / dt / 1e12, 3),
            "pct_measured_vpu_peak": _pct_peak(flops / dt),
            "flop_model_note": "static per-prim op counts, +-30%",
            "hbm_bytes": hbm_bytes,
            "hbm_gb_per_s": round(hbm_bytes / dt / 1e9, 2),
            "verdict": "compute-bound (HBM traffic is ~1% of peak; the "
                       "frame is VPU math on register-resident scene "
                       "constants)",
        },
    }
    print("megakernel:", report["megakernel_mount_512"], flush=True)


def _distribution(jax, jnp, rt, mk, report):
    """BASELINE distribution mode (spp 4 => 16 AA+DoF samples) + skybox on
    miss — balls_low.p3f on the deferred-sky megakernel."""
    from u_4a_2s_p3d_raytracer_template2_tpu.utils.timing import loop_time

    sd = rt.parse_p3f(f"{SCENES}/balls_low.p3f")
    scene = rt.build_scene(sd)
    cfg = rt.RenderConfig(engine="megakernel",
                          use_skybox=True).with_scene_flags(scene)
    assert mk.supports(scene, cfg)
    res = scene.camera.res_x
    ys, xs = np.meshgrid(np.arange(res, dtype=np.float32),
                         np.arange(res, dtype=np.float32), indexing="ij")
    px = jnp.asarray(xs.reshape(-1))
    py = jnp.asarray(ys.reshape(-1))
    key = jax.random.PRNGKey(0)
    tile = mk.make_render_tile(scene, cfg)
    img = tile(px, py, key)

    def step(i, carry):
        acc, sky = carry
        x = px + 0.37 * i.astype(jnp.float32)
        return acc + tile.inner(x, py, key, sky).sum(), sky

    dt = loop_time(step, (jnp.float32(0.0), tile.sky_operand),
                   n_lo=2, n_hi=8, reps=3)
    rays = res * res * cfg.spp * cfg.spp * (1 + scene.n_lights)

    # on-device parity vs the sweep engine at 64² (same key → same jitter
    # chain; interpret-mode parity is pinned in CI, this is the compiled-
    # kernel check)
    import dataclasses

    from u_4a_2s_p3d_raytracer_template2_tpu.models.whitted import (
        render_tile,
    )

    sub = 64
    ys2, xs2 = np.meshgrid(np.arange(sub, dtype=np.float32),
                           np.arange(sub, dtype=np.float32), indexing="ij")
    p2x = jnp.asarray(xs2.reshape(-1))
    p2y = jnp.asarray(ys2.reshape(-1))
    got = tile(p2x, p2y, key)
    want = render_tile(scene, p2x, p2y,
                       dataclasses.replace(cfg, engine="sweep"), key)
    diff = jnp.abs(got - want)
    report["distribution_balls_low_512"] = {
        "samples_per_pixel": cfg.spp * cfg.spp,
        "skybox": "2048^2 x6 u8, packed-u32 deferred-sky epilogue",
        "frame_ms": round(dt * 1e3, 2),
        "mrays_per_s": round(rays / dt / 1e6, 2),
        "image_mean": round(float(img.mean()), 5),
        "image_std": round(float(img.std()), 5),
        "device_parity_vs_sweep_64": {
            "max": float(diff.max()), "mean": float(diff.mean())},
    }
    print("distribution:", report["distribution_balls_low_512"], flush=True)


def _pt_mk(jax, jnp, report):
    """PT megakernel on the FULL glsl_world: draw-for-draw parity vs the
    XLA presampled integrator (same uniforms → elementwise comparison, see
    tests/test_pt_megakernel.py module doc) + frame timing + roofline."""
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
    n_sph = int(scene.sp_center0.shape[0])
    # static model: ~10 bounces degrade geometrically; measured average
    # ~3.2 live bounces/ray on this sky-heavy world. Per bounce: sphere
    # tests + 2 tris + 3 lights direct + scatter.
    flops_bounce = n_sph * 32 + 2 * 45 + 3 * (n_sph * 30 + 80) + 120
    flops = int(R * 3.2 * flops_bounce)
    report["pt_megakernel_glsl_256"] = {
        "spheres": n_sph,
        "parity_max": float(diff.max()),
        "parity_mean": float(diff.mean()),
        "frac_gt_2e-3": float((diff.max(-1) > 2e-3).mean()),
        "frac_gt_1e-2": float((diff.max(-1) > 1e-2).mean()),
        "parity_note": "the max-delta pixel is a dielectric "
                       "reflect-vs-refract probability threshold crossing "
                       "under f32 reassociation (the kernel and the XLA "
                       "twin order the Schlick compare differently); the "
                       "whole-path color then diverges for that one "
                       "sample. frac_gt_1e-2 counts such pixels.",
        "frame_ms": round(dt * 1e3, 3),
        "mpaths_per_s": round(res * res / dt / 1e6, 2),
        "roofline": {
            "flops_est_per_frame": flops,
            "achieved_tflops": round(flops / dt / 1e12, 3),
            "pct_measured_vpu_peak": _pct_peak(flops / dt),
            "note": "static flop model +-30%; estimate uses ~3.2 mean live bounces (block "
                    "early-exit); sky-heavy frames are latency-, not "
                    "bandwidth-bound",
        },
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


def _grid(jax, jnp, rt, report):
    """BASELINE config #4 qualification: the per-ray grid DDA vs the
    packet route on mount_high (the measured judgment behind the grid-mode
    TPU dispatch in models/whitted.trace_closest)."""
    from u_4a_2s_p3d_raytracer_template2_tpu.accel.packets import (
        packet_closest_hit,
    )
    from u_4a_2s_p3d_raytracer_template2_tpu.accel.traverse import (
        grid_closest_hit,
    )
    from u_4a_2s_p3d_raytracer_template2_tpu.core.types import Rays
    from u_4a_2s_p3d_raytracer_template2_tpu.ops.camera import primary_rays
    from u_4a_2s_p3d_raytracer_template2_tpu.utils.timing import loop_time

    sd = rt.parse_p3f(f"{SCENES}/mount_high.p3f")
    gscene = rt.build_scene(sd, accel=1)
    res = 256   # 128^2 put the packet pass under 1 ms — slope noise
    ys, xs = np.meshgrid(np.arange(res, dtype=np.float32),
                         np.arange(res, dtype=np.float32), indexing="ij")
    rays = primary_rays(gscene.camera, jnp.asarray(xs.reshape(-1)) + 0.5,
                        jnp.asarray(ys.reshape(-1)) + 0.5,
                        jax.random.PRNGKey(0))
    o0 = rays.origin

    def stepg(i, acc):
        r = Rays(o0 + i.astype(jnp.float32) * 1e-5, rays.direction,
                 rays.time)
        t, oid = grid_closest_hit(gscene.grid, gscene.prims, r)
        return acc + t.sum() + oid.sum().astype(jnp.float32)

    dtg = loop_time(stepg, jnp.float32(0.0), n_lo=1, n_hi=3, reps=3)

    def stepp(i, acc):
        r = Rays(o0 + i.astype(jnp.float32) * 1e-5, rays.direction,
                 rays.time)
        t, oid = packet_closest_hit(gscene.packets, gscene.prims, r)
        return acc + t.sum() + oid.sum().astype(jnp.float32)

    dtp = loop_time(stepp, jnp.float32(0.0), n_lo=2, n_hi=30, reps=3)

    tg, ig = jax.jit(lambda r: grid_closest_hit(
        gscene.grid, gscene.prims, r))(rays)
    tp_, ip_ = jax.jit(lambda r: packet_closest_hit(
        gscene.packets, gscene.prims, r))(rays)
    report["grid_mount_high_256"] = {
        "grid_dda_ms": round(dtg * 1e3, 2),
        "packets_ms": round(dtp * 1e3, 3),
        "speedup": round(dtg / dtp, 1),
        "id_agree_frac": float((ig == ip_).mean()),
        "note": "grid mode on TPU dispatches traversal to the packet "
                "kernel (identical physical closest hit, id_agree 1.0); "
                "the vmapped per-ray DDA stays dispatchable via "
                "accel_impl='perray' and is what this row measures",
    }
    print("grid:", report["grid_mount_high_256"], flush=True)


if __name__ == "__main__":
    raise SystemExit(main())
