"""Bisect mount_high's structural sky cost (bench_r5 parts e/f narrowed it:
depth-4 wavefront frame is 145 ms without sky, ~255-260 ms with sky EVEN
for a dummy 8x8 cubemap, with gathers barriered and dead-lane indices
clamped — so neither table size, gather locality, nor op fusion explains
the +110 ms).

Monkeypatches ops.shade.skybox_color (timing-only; images are wrong for
the ablated variants) to split the candidates:

  real      — unmodified lookup (the 260 ms baseline)
  const     — returns a broadcast constant: no index math, no gather
              (must reproduce the 145 ms no-sky figure: sanity)
  idx_only  — full cubemap_index math from d, NO gather (result is a
              select-chain function of d)
  gather0   — gather op kept, but indices are constant zeros (no
              dependence on d)

Usage: python -u tools/probe_sky_struct.py > log 2>&1  (one TPU consumer)
"""
import json
import os
import sys

sys.path.insert(0, ".")

import numpy as np

SCENES = "/root/reference/P3D_RayTracer_Template2/P3D_Scenes"


def main():
    import jax
    import jax.numpy as jnp

    import u_4a_2s_p3d_raytracer_template2_tpu as rt
    from u_4a_2s_p3d_raytracer_template2_tpu.models.whitted import (
        render_tile,
    )
    from u_4a_2s_p3d_raytracer_template2_tpu.ops import shade
    from u_4a_2s_p3d_raytracer_template2_tpu.utils.profiling import (
        enable_compilation_cache,
    )
    from u_4a_2s_p3d_raytracer_template2_tpu.utils.timing import loop_time

    enable_compilation_cache()
    sd = rt.parse_p3f(os.path.join(SCENES, "mount_high.p3f"))
    scene = rt.build_scene(sd, accel=2)
    res = 512
    ys, xs = np.meshgrid(np.arange(res, dtype=np.float32),
                         np.arange(res, dtype=np.float32), indexing="ij")
    px = jnp.asarray(xs.reshape(-1))
    py = jnp.asarray(ys.reshape(-1))
    key = jax.random.PRNGKey(0)
    real_lookup = shade.skybox_color

    def lk_const(skybox, d, valid=None):
        return jnp.broadcast_to(jnp.array([0.2, 0.3, 0.6], jnp.float32),
                                d.shape)

    def lk_idx_only(skybox, d, valid=None):
        side, yp, xp = shade.cubemap_index(d, skybox.shape[1],
                                           skybox.shape[2])
        v = (side * 7 + yp * 3 + xp).astype(jnp.float32) * 1e-9
        return jnp.stack([v, v, v], -1)

    def lk_gather0(skybox, d, valid=None):
        z = jnp.zeros(d.shape[0], jnp.int32)
        rgb = skybox[z, z, z]
        # keep a (trivial) dependence on d so nothing upstream is DCE'd
        return (shade.skybox_texel_to_float(rgb)
                + d[:, :1] * jnp.float32(1e-12))

    cfg = rt.RenderConfig(engine="wavefront", use_skybox=True, max_depth=4)
    for tag, fn in (("real", real_lookup), ("const", lk_const),
                    ("idx_only", lk_idx_only), ("gather0", lk_gather0)):
        shade.skybox_color = fn
        try:
            def frame(i, carry):
                acc, s = carry
                x = px + 0.37 * i.astype(jnp.float32)
                return (acc + render_tile(s, x, py, cfg, key).sum(), s)

            dt = loop_time(frame, (jnp.float32(0.0), scene), n_lo=1,
                           n_hi=6, reps=3)
            print(json.dumps({"what": f"mount_high d4 sky={tag}",
                              "ms": round(dt * 1e3, 2)}), flush=True)
        finally:
            shade.skybox_color = real_lookup


if __name__ == "__main__":
    main()
