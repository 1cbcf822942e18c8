"""Benchmark driver: Mrays/s/chip (primary+shadow) on the mount_low scene.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

The reference publishes no numbers (BASELINE.md): its only instrumentation is
a wall-clock printf (main.cpp:966-970). ``vs_baseline`` is therefore measured
against a recorded single-thread CPU-class anchor for the same workload: the
reference's per-ray C++ loop executes ~0.5-2 Mrays/s on one core for
mount_low-class scenes; we use 1.0 Mrays/s as the anchor (documented in
BASELINE.md's workload envelope).

Timing protocol: slope of an on-device frame loop with hard scalar-readback
sync (utils/timing.py). Through the remote-TPU tunnel, per-call
``block_until_ready`` can return before execution completes and identical
launches are deduped — both make naive per-call timing read absurdly low.
The slope method cancels every fixed per-dispatch cost and serializes frames
on-device, so the number is real chip throughput.
"""
import json
import sys

import numpy as np

CPU_ANCHOR_MRAYS = 1.0  # single-core reference-class anchor (see docstring)


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from u_4a_2s_p3d_raytracer_template2_tpu.utils.profiling import (
        enable_compilation_cache,
    )

    enable_compilation_cache()

    import u_4a_2s_p3d_raytracer_template2_tpu as rt
    from u_4a_2s_p3d_raytracer_template2_tpu.models.scenes import mount_scene
    from u_4a_2s_p3d_raytracer_template2_tpu.models.whitted import render_tile
    from u_4a_2s_p3d_raytracer_template2_tpu.utils.timing import frame_time

    res = 512
    scene = rt.build_scene(mount_scene(res=res))
    # compacted-wavefront engine: measured 86.8 ms vs the level sweep's
    # 101 ms for this frame on v5e (the sweep won before the dense one-hot
    # gather fix; with gathers fixed, the wavefront's 4x fewer lane-slots
    # beat its compaction overhead). Exact vs the sweep for this
    # deterministic config (tests/test_wavefront.py).
    cfg = rt.RenderConfig(engine="wavefront")
    key = jax.random.PRNGKey(0)

    ys, xs = np.meshgrid(np.arange(res, dtype=np.float32),
                         np.arange(res, dtype=np.float32), indexing="ij")
    py = jnp.asarray(ys.reshape(-1))
    px = jnp.asarray(xs.reshape(-1))

    def render_scalar(i):
        # sub-pixel drift by loop index: every frame is distinct work, the
        # scalar fold makes each frame's completion observable
        img = render_tile(scene, px + 0.37 * i.astype(jnp.float32), py, cfg,
                          key)
        return img.sum()

    dt = frame_time(render_scalar, n_lo=2, n_hi=10, reps=3)

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
