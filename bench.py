"""Benchmark driver: Mrays/s/chip (primary+shadow) on the mount_low scene.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

The reference publishes no numbers (BASELINE.md): its only instrumentation is
a wall-clock printf (main.cpp:966-970). ``vs_baseline`` is therefore measured
against a recorded single-thread CPU-class anchor for the same workload: the
reference's per-ray C++ loop executes ~0.5-2 Mrays/s on one core for
mount_low-class scenes; we use 1.0 Mrays/s as the anchor (documented in
BASELINE.md's workload envelope).
"""
import json
import sys
import time

import numpy as np

CPU_ANCHOR_MRAYS = 1.0  # single-core reference-class anchor (see docstring)


def main():
    import jax

    sys.path.insert(0, ".")
    from u_4a_2s_p3d_raytracer_template2_tpu.utils.profiling import (
        enable_compilation_cache,
    )

    enable_compilation_cache()

    sys.path.insert(0, ".")
    import u_4a_2s_p3d_raytracer_template2_tpu as rt
    from u_4a_2s_p3d_raytracer_template2_tpu.models.scenes import mount_scene
    from u_4a_2s_p3d_raytracer_template2_tpu.models.whitted import (
        render_tile_jit,
    )

    res = 512
    scene = rt.build_scene(mount_scene(res=res))
    cfg = rt.RenderConfig()
    key = jax.random.PRNGKey(0)

    ys, xs = np.meshgrid(np.arange(res, dtype=np.float32),
                         np.arange(res, dtype=np.float32), indexing="ij")
    py = jax.numpy.asarray(ys.reshape(-1))

    # pre-stage varying inputs on device: identical (executable, inputs)
    # pairs get deduped by the remote-TPU tunnel (absurd 0.1 ms timings),
    # so each iteration gets a distinct sub-pixel-shifted px array — same
    # workload, different bits. Keys are pre-split for the same reason.
    n_iters = 12
    pxs = [jax.numpy.asarray(xs.reshape(-1) + i * 0.37) for i in range(n_iters)]
    keys = list(jax.random.split(key, n_iters))
    for a in pxs + keys:
        a.block_until_ready()

    # compile + warmup
    out = render_tile_jit(scene, pxs[0], py, cfg, keys[0])
    out.block_until_ready()

    # median per-call blocking latency over distinct-input frames. Distinct
    # inputs defeat the tunnel's (executable, inputs) dedup; per-call
    # blocking defeats multi-frame overlap illusions; the median rides out
    # link-latency spikes. Includes one tunnel RTT per frame, so this is a
    # conservative lower bound on chip throughput.
    times = []
    for i in range(n_iters):
        t0 = time.perf_counter()
        out = render_tile_jit(scene, pxs[i], py, cfg, keys[i])
        out.block_until_ready()
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))

    # ray accounting (BASELINE.md): primary + per-light shadow at the top
    # level; secondary levels add reflect/refract + their shadow rays. We
    # report the *minimum* convention (primary + top-level shadow) so the
    # number is comparable and conservative.
    n_pix = res * res
    rays = n_pix * (1 + scene.n_lights)
    mrays = rays / dt / 1e6

    print(json.dumps({
        "metric": "Mrays/s/chip (primary+shadow) on mount_low",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / CPU_ANCHOR_MRAYS, 2),
    }))


if __name__ == "__main__":
    main()
