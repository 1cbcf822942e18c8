"""On-device measurements for the operand-streamed Whitted megakernel
(models/whitted_streamed.py): forward frame vs the baked kernel, the sharded
render path, and the full train step (forward + custom_vjp backward + psum).

Run ALONE on the TPU (one consumer at a time). Results land in
docs/ARCHITECTURE.md round-5 notes and bench.py's gradient line.
"""
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import u_4a_2s_p3d_raytracer_template2_tpu as rt
    from u_4a_2s_p3d_raytracer_template2_tpu.models.scenes import mount_scene
    from u_4a_2s_p3d_raytracer_template2_tpu.models import whitted
    from u_4a_2s_p3d_raytracer_template2_tpu.models import (
        whitted_megakernel as mk,
    )
    from u_4a_2s_p3d_raytracer_template2_tpu.utils.profiling import (
        enable_compilation_cache,
    )
    from u_4a_2s_p3d_raytracer_template2_tpu.utils.timing import (
        frame_time,
        loop_time,
    )

    enable_compilation_cache()
    out = {}
    res = 512
    scene = rt.build_scene(mount_scene(res=res))
    ys, xs = np.meshgrid(np.arange(res, dtype=np.float32),
                         np.arange(res, dtype=np.float32), indexing="ij")
    px = jnp.asarray(xs.reshape(-1))
    py = jnp.asarray(ys.reshape(-1))
    key = jax.random.PRNGKey(0)

    cfg_mk = rt.RenderConfig(engine="megakernel")
    cfg_sweep = rt.RenderConfig()

    # 1. streamed forward frame (render_tile dispatch -> pallas operand
    # kernel on TPU)
    t0 = time.time()

    def streamed_scalar(i):
        x = px + 0.37 * i.astype(jnp.float32)
        return whitted.render_tile(scene, x, py, cfg_mk, key).sum()

    dt = frame_time(streamed_scalar, n_lo=2, n_hi=110, reps=3)
    out["streamed_frame_ms"] = round(dt * 1e3, 3)
    out["streamed_compile_s"] = round(time.time() - t0 - 3 * dt * 112, 1)
    print(json.dumps(out), flush=True)

    # 2. baked kernel for comparison
    tile = mk.make_render_tile(scene, cfg_mk)

    def baked_scalar(i):
        x = px + 0.37 * i.astype(jnp.float32)
        return tile(x, py, key).sum()

    dt_b = frame_time(baked_scalar, n_lo=2, n_hi=110, reps=3)
    out["baked_frame_ms"] = round(dt_b * 1e3, 3)
    print(json.dumps(out), flush=True)

    # 3. sharded render (1-chip mesh, shard_map): the path that degraded to
    # the wavefront engine (61.8 ms) before round 5
    from u_4a_2s_p3d_raytracer_template2_tpu.parallel.dist import (
        default_mesh,
        lr_scales,
        render_image_sharded,
        train_step_full,
    )

    mesh = default_mesh()

    img = render_image_sharded(scene, cfg_mk, mesh)  # compile
    img.block_until_ready()

    from u_4a_2s_p3d_raytracer_template2_tpu.parallel.dist import (
        _render_sharded,
        _pixel_grid,
    )

    def sharded_scalar(i):
        x = px + 0.37 * i.astype(jnp.float32)
        return _render_sharded(scene, (x, py, key), cfg_mk, mesh).sum()

    dt_s = frame_time(sharded_scalar, n_lo=2, n_hi=60, reps=3)
    out["streamed_sharded_frame_ms"] = round(dt_s * 1e3, 3)
    print(json.dumps(out), flush=True)

    # parity spot-check on device: sharded streamed vs baked tile
    a = np.asarray(jax.device_get(img.reshape(-1, 3)[: 4 * 4096]))
    b = np.asarray(jax.device_get(
        tile(px[: 4 * 4096], py[: 4 * 4096], key)))
    out["sharded_vs_baked_maxdiff"] = float(np.abs(a - b).max())

    # 4. train_step_full: forward (pallas) + backward (twin vjp) + psum.
    # megakernel engine vs the sweep engine (what fit used before round 5).
    target = jax.device_put(np.asarray(img))

    for label, cfg in (("mk", cfg_mk), ("sweep", cfg_sweep)):
        t0 = time.time()

        def step(i, carry):
            s, loss = carry
            tgt = target + 1e-7 * i.astype(jnp.float32)
            s2, l2 = train_step_full(s, tgt, cfg, mesh, 0.01, key,
                                     lr_scales(materials=1.0, light_pos=1.0,
                                               camera=1.0))
            return (s2, l2)

        dt_t = loop_time(step, (scene, jnp.float32(0.0)), n_lo=2, n_hi=8,
                         reps=3)
        out[f"train_step_{label}_ms"] = round(dt_t * 1e3, 2)
        out[f"train_step_{label}_compile_s"] = round(time.time() - t0, 1)
        print(json.dumps(out), flush=True)

    print(json.dumps(out, indent=1), flush=True)


if __name__ == "__main__":
    main()
