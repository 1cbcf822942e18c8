"""Benchmark driver: Mrays/s/chip across the reference corpus workloads.

Prints one JSON line per scene; the LAST line is the driver-contract
headline:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Scenes (the three workload classes of BASELINE.md):
  mount_low   — 12 prims, refraction-heavy depth-4 Whitted (primary metric)
  balls_high  — 7,381-sphere brute force (Pallas fused-kernel path)
  dragon      — 100k-triangle mesh (tile-coherent clustered tracer)

``vs_baseline`` compares against a MEASURED single-core CPU anchor: a
minimal C++ tracer with the reference's exact semantics compiled -O3
(tools/baseline_ref.cpp), timed per scene by tools/measure_baseline.py —
method and raw numbers recorded in BASELINE.md. The reference itself
publishes no numbers (its only instrumentation is a wall-clock printf,
main.cpp:966-970).

Timing protocol: slope of an on-device frame loop with hard scalar-readback
sync (utils/timing.py). Through the remote-TPU tunnel, per-call
``block_until_ready`` can return before execution completes and identical
launches are deduped — both make naive per-call timing read absurdly low.
The slope method cancels every fixed per-dispatch cost and serializes frames
on-device with varying inputs, so the number is real chip throughput.
"""
import json
import os
import sys

import numpy as np

# Measured single-core CPU anchors, Mrays/s in the primary+shadow convention
# (pixels x (1 + n_lights) / wall-clock), from tools/measure_baseline.py,
# re-anchored 2026-08-20 on a quiet machine with >=3 repetitions (medians;
# raw runs + method in BASELINE.md). dragon/balls_high anchors are
# brute-force, as the reference ships them (accel 0 in the scene files; its
# BVH mode re-scans brute anyway, SURVEY.md quirk #1).
CPU_ANCHOR_MRAYS = {
    "mount_low": 9.14,
    "balls_medium": 3.66,
    "balls_high": 0.040,
    "dragon": 0.0015,
    # distribution-mode scenes (spp 4 => 16 AA+DoF samples/pixel): the
    # anchor is the PER-RAY rate measured pinhole-style on the same scene
    # (each AA sample = 1 primary + n_lights shadow rays, so the rate is
    # sample-count-invariant to first order; the skybox fetch the anchor
    # omits favors the anchor). Conservative maxima over 2x3 runs
    # (2026-08-20, see BASELINE.md).
    "balls_low": 9.0,
    "dof": 18.2,
    "mount_high": 0.0434,
}
# Measured single-core anchor for the GLSL path tracer (tools/baseline_pt.cpp
# via tools/measure_baseline_pt.py, 128^2 sub-raster x 8 spp, 2026-08-20):
# 0.88 Mpaths/s. The reference's own PT is a Shadertoy shader with no
# published numbers.
PT_ANCHOR_MPATHS = 0.88
# Fallback used if a scene has no measured anchor recorded yet.
_DEFAULT_ANCHOR = 1.0

SCENE_DIR = "/root/reference/P3D_RayTracer_Template2/P3D_Scenes"


def _bench_scene(rt, scene, cfg, label, res_x, res_y, n_lights, frame_time,
                 n_hi=10):
    import jax
    import jax.numpy as jnp

    from u_4a_2s_p3d_raytracer_template2_tpu.models.whitted import render_tile

    tile_fn = None
    if cfg.engine == "megakernel":
        from u_4a_2s_p3d_raytracer_template2_tpu.models import (
            whitted_megakernel as mk,
        )

        if mk.supports(scene, cfg) and jax.default_backend() == "tpu":
            tile_fn = mk.make_render_tile(scene, cfg)

    key = jax.random.PRNGKey(0)
    ys, xs = np.meshgrid(np.arange(res_y, dtype=np.float32),
                         np.arange(res_x, dtype=np.float32), indexing="ij")
    py = jnp.asarray(ys.reshape(-1))
    px = jnp.asarray(xs.reshape(-1))

    from u_4a_2s_p3d_raytracer_template2_tpu.utils.timing import loop_time

    has_sky_operand = (tile_fn is not None
                      and getattr(tile_fn, "sky_operand", None) is not None)
    if has_sky_operand:
        # skybox scenes: the 288 MB cubemap must ride the loop CARRY — a
        # closure capture becomes an XLA constant and the remote-compile
        # tunnel rejects the payload (HTTP 413)
        def step(i, carry):
            acc, sky = carry
            x = px + 0.37 * i.astype(jnp.float32)
            return acc + tile_fn.inner(x, py, key, sky).sum(), sky

        dt = loop_time(step, (jnp.float32(0.0), tile_fn.sky_operand),
                       n_lo=2, n_hi=n_hi, reps=3)
    elif tile_fn is None and cfg.use_skybox and scene.has_skybox:
        # non-baked engine + skybox: thread the whole scene through the
        # carry for the same reason
        def step(i, carry):
            acc, s = carry
            x = px + 0.37 * i.astype(jnp.float32)
            return acc + render_tile(s, x, py, cfg, key).sum(), s

        dt = loop_time(step, (jnp.float32(0.0), scene),
                       n_lo=2, n_hi=n_hi, reps=3)
    else:
        def render_scalar(i):
            # sub-pixel drift by loop index: every frame is distinct work,
            # the scalar fold makes each frame's completion observable
            x = px + 0.37 * i.astype(jnp.float32)
            if tile_fn is not None:
                return tile_fn(x, py, key).sum()
            return render_tile(scene, x, py, cfg, key).sum()

        dt = frame_time(render_scalar, n_lo=2, n_hi=n_hi, reps=3)

    # ray accounting (BASELINE.md): primary + per-light shadow at the top
    # level; secondary levels add reflect/refract + their shadow rays. We
    # report the *minimum* convention (primary + top-level shadow) so the
    # number is comparable and conservative. Distribution mode traces
    # spp*spp jittered AA samples per pixel — each is a primary+shadow set
    # (main.cpp:777-798), so they multiply the ray count.
    samples = cfg.spp * cfg.spp if cfg.anti_aliasing else 1
    rays = res_x * res_y * samples * (1 + n_lights)
    mrays = rays / dt / 1e6
    anchor = CPU_ANCHOR_MRAYS.get(label) or _DEFAULT_ANCHOR
    return {
        "metric": f"Mrays/s/chip (primary+shadow) on {label}",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "frame_ms": round(dt * 1e3, 2),
        "vs_baseline": round(mrays / anchor, 2),
    }


def main():
    import jax

    sys.path.insert(0, ".")
    from u_4a_2s_p3d_raytracer_template2_tpu.utils.profiling import (
        enable_compilation_cache,
    )

    enable_compilation_cache()

    import u_4a_2s_p3d_raytracer_template2_tpu as rt
    from u_4a_2s_p3d_raytracer_template2_tpu.models.scenes import mount_scene
    from u_4a_2s_p3d_raytracer_template2_tpu.utils.timing import frame_time

    results = []

    # --- secondary scenes first (headline line must be LAST) -------------
    # dragon and balls_high ride the packet-BVH Pallas kernel (accel_impl
    # auto on TPU, accel/packets.py, tuned leaf widths + depth-gated
    # coherence sort): dragon 114 ms/frame vs 6.28 s on cluster sweeps;
    # balls_high 2.8x the Pallas brute path (84 vs 234 ms at 256²,
    # tools/bench_packets.py). balls_medium (91 spheres) fits the raised
    # megakernel bake ceiling.
    # (scene, label, accel override, engine, n_hi, use_skybox)
    # balls_low/dof are the reference's distribution-ray-tracing showcase
    # (spp 4 => 16 jittered AA+DoF samples/pixel, main.cpp:939-946) with
    # skybox-on-miss — served by the deferred-sky megakernel. mount_high is
    # the 2k-triangle class on the packet-BVH path with skybox.
    for name, label, accel, engine, n_hi, sky in (
            ("balls_medium.p3f", "balls_medium", None, "megakernel", 30,
             False),
            # balls_high is reflective-only (chain recursion): nothing to
            # compact, so the sweep beats the wavefront's queue machinery
            # (330 vs 358 ms measured; docs/ARCHITECTURE.md round-4 #16)
            ("balls_high.p3f", "balls_high", 2, "sweep", 10, False),
            ("dragon.p3f", "dragon", 2, "wavefront", 4, False),
            ("balls_low.p3f", "balls_low", None, "megakernel", 6, True),
            ("dof.p3f", "dof", None, "megakernel", 6, True),
            ("mount_high.p3f", "mount_high", 2, "wavefront", 6, True)):
        path = os.path.join(SCENE_DIR, name)
        if not os.path.exists(path):
            continue
        sd = rt.parse_p3f(path)
        scene = rt.build_scene(sd, accel=accel)
        cfg = rt.RenderConfig(engine=engine,
                              use_skybox=sky).with_scene_flags(scene)
        r = _bench_scene(rt, scene, cfg, label, scene.camera.res_x,
                         scene.camera.res_y, scene.n_lights, frame_time,
                         n_hi=n_hi)
        results.append(r)
        print(json.dumps(r), flush=True)

    # --- GLSL path tracer (the reference's GPU showcase) ------------------
    # scene-baked PT megakernel (models/pt_megakernel.py): the whole
    # 10-bounce loop in one Pallas kernel, 7.5 ms/frame at 512^2 on v5e vs
    # 669 ms for the XLA integrator. Parity: tests/test_pt_megakernel.py
    # (elementwise, shared pre-drawn uniforms) + on-device 6-frame means
    # 0.5558 vs 0.5560.
    from u_4a_2s_p3d_raytracer_template2_tpu.models import pathtracer as pt
    from u_4a_2s_p3d_raytracer_template2_tpu.models.glsl_scene import (
        glsl_camera,
        glsl_world,
    )

    pt_scene = glsl_world()
    pt_cam = glsl_camera(512, 512)
    pt_cfg = pt.PTConfig()
    if jax.default_backend() == "tpu":
        from u_4a_2s_p3d_raytracer_template2_tpu.models import (
            pt_megakernel as mk,
        )

        pt_frame = mk.make_render_frame(pt_scene, pt_cam, pt_cfg)
    else:
        fn = jax.jit(pt.render_frame, static_argnums=(2,))
        pt_frame = lambda k: fn(pt_scene, pt_cam, pt_cfg, k)  # noqa: E731

    def pt_scalar(i):
        return pt_frame(jax.random.fold_in(jax.random.PRNGKey(7), i)).sum()

    dt = frame_time(pt_scalar, n_lo=2, n_hi=12, reps=3)
    mpaths = 512 * 512 / dt / 1e6
    r = {
        "metric": "Mpaths/s/chip on glsl_world (512^2, 10 bounces)",
        "value": round(mpaths, 3),
        "unit": "Mpaths/s",
        "frame_ms": round(dt * 1e3, 2),
        "vs_baseline": round(mpaths / PT_ANCHOR_MPATHS, 2),
    }
    results.append(r)
    print(json.dumps(r), flush=True)

    # --- gradient path: full train step on mount_low ---------------------
    # VERDICT r4 item 2 / BASELINE north star ("forward + backward kernels
    # profiled", "gradient all-reduce overlapped with the backward pass"):
    # one inverse-rendering step — sharded forward, backward through the
    # full depth-4 sweep, per-group psum all-reduce, SGD update — timed
    # with the same slope protocol. Anchor: the C++ reference has no
    # gradient path at all, so vs_baseline compares against the FORWARD
    # anchor (a train step costs forward+backward; beating the reference's
    # forward-only rate while also producing gradients is the honest bar).
    import jax.numpy as jnp

    from u_4a_2s_p3d_raytracer_template2_tpu.models.whitted import (
        render_image,
    )
    from u_4a_2s_p3d_raytracer_template2_tpu.parallel.dist import (
        default_mesh,
        lr_scales,
        train_step_full,
    )

    res = 512
    scene = rt.build_scene(mount_scene(res=res))
    # gradient path rides the compacted WAVEFRONT engine: its full-FitParams
    # jax.grad matches the sweep's to f32 noise (tests/test_gradients.py
    # test_wavefront_gradients_match_sweep) and the measured step is 1.46x
    # cheaper (178 vs 259 ms, tools/bench_r5.py part d — freeze variants and
    # the megakernel custom_vjp forward all measured flat: the cost IS the
    # render VJP, and the wavefront's compacted levels shrink it).
    cfg = rt.RenderConfig(engine="wavefront")
    mesh = default_mesh()
    key = jax.random.PRNGKey(0)
    target = render_image(scene, cfg)
    target.block_until_ready()
    scales = lr_scales(materials=1.0, light_pos=1.0, camera=1.0,
                       geometry=0.0)

    def train_scalar(i, carry):
        s, _ = carry
        tgt = target + 1e-7 * i.astype(jnp.float32)
        return train_step_full(s, tgt, cfg, mesh, 0.01, key, scales, ())

    from u_4a_2s_p3d_raytracer_template2_tpu.utils.timing import loop_time

    dt = loop_time(train_scalar, (scene, jnp.float32(0.0)), n_lo=2, n_hi=8,
                   reps=3)
    mrays = res * res * 2 / dt / 1e6
    r = {
        "metric": "train_step_full (fwd+bwd+psum) on mount_low",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "frame_ms": round(dt * 1e3, 2),
        "vs_baseline": round(mrays / CPU_ANCHOR_MRAYS["mount_low"], 2),
    }
    results.append(r)
    print(json.dumps(r), flush=True)

    # --- primary metric: mount_low --------------------------------------
    res = 512
    scene = rt.build_scene(mount_scene(res=res))
    # scene-baked Pallas megakernel (models/whitted_megakernel.py): the
    # whole depth-4 recursion in one kernel, 1.9 ms/frame on v5e vs the
    # wavefront engine's 61.8 ms. Image parity vs the XLA engines pinned by
    # tests/test_megakernel.py (CPU interpret) + on-device check (max pixel
    # delta 4.9e-3, mean 1.7e-7 vs the wavefront on the same frame).
    # Falls back to the wavefront engine off-TPU.
    cfg = rt.RenderConfig(engine="megakernel")
    # frame is ~2 ms: a longer loop keeps the slope well above tunnel noise
    r = _bench_scene(rt, scene, cfg, "mount_low", res, res, scene.n_lights,
                     frame_time, n_hi=110)
    results.append(r)
    print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
