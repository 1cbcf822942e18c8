"""On-device benchmark of the distribution-ray-tracing mode (spp>0 ⇒ 16
jittered AA+DoF samples/pixel, main.cpp:939-946) with skybox-on-miss — the
balls_low.p3f / dof.p3f configuration, served by the deferred-sky Whitted
megakernel (models/whitted_megakernel.py).

Usage: python -u tools/bench_distribution.py [scene ...]
Prints one JSON line per scene (slope-protocol frame time, utils/timing.py).
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCENE_DIR = "/root/reference/P3D_RayTracer_Template2/P3D_Scenes"


def main(names):
    import jax
    import jax.numpy as jnp

    import u_4a_2s_p3d_raytracer_template2_tpu as rt
    from u_4a_2s_p3d_raytracer_template2_tpu.models import (
        whitted_megakernel as mk,
    )
    from u_4a_2s_p3d_raytracer_template2_tpu.utils.profiling import (
        enable_compilation_cache,
    )
    from u_4a_2s_p3d_raytracer_template2_tpu.utils.timing import loop_time

    enable_compilation_cache()

    for name in names:
        sd = rt.parse_p3f(os.path.join(SCENE_DIR, name))
        scene = rt.build_scene(sd)
        cfg = rt.RenderConfig(engine="megakernel",
                              use_skybox=True).with_scene_flags(scene)
        assert cfg.anti_aliasing and cfg.depth_of_field and cfg.spp == 4
        assert scene.has_skybox
        assert mk.supports(scene, cfg)
        res_x, res_y = scene.camera.res_x, scene.camera.res_y
        tile = mk.make_render_tile(scene, cfg)

        ys, xs = np.meshgrid(np.arange(res_y, dtype=np.float32),
                             np.arange(res_x, dtype=np.float32),
                             indexing="ij")
        px = jnp.asarray(xs.reshape(-1))
        py = jnp.asarray(ys.reshape(-1))
        key = jax.random.PRNGKey(0)

        # image sanity before timing: scalar-only readback (the tunnel's
        # device->host link is ~20 KB/s — never pull the full frame)
        img = tile(px, py, key)
        stats = dict(mean=round(float(img.mean()), 5),
                     std=round(float(img.std()), 5),
                     min=round(float(img.min()), 5),
                     max=round(float(img.max()), 5))
        assert np.isfinite(list(stats.values())).all(), stats

        # the cubemap rides in the LOOP CARRY (a runtime operand): closing
        # over it inside the timing jit would embed 288 MB of constants in
        # the remote-compile payload (HTTP 413 — observed). tile.sky_operand
        # is the packed-u32 form the tile's own wrapper would pass.
        def step(i, carry):
            acc, sky = carry
            x = px + 0.37 * i.astype(jnp.float32)
            return acc + tile.inner(x, py, key, sky).sum(), sky

        dt = loop_time(step, (jnp.float32(0.0), tile.sky_operand),
                       n_lo=2, n_hi=8, reps=3)
        # per-ray convention: each AA sample = 1 primary + n_lights shadow
        rays = res_x * res_y * cfg.spp * cfg.spp * (1 + scene.n_lights)
        print(json.dumps({
            "scene": name, "frame_ms": round(dt * 1e3, 2),
            "mrays_per_s": round(rays / dt / 1e6, 2),
            "samples_per_pixel": cfg.spp * cfg.spp,
            "n_lights": scene.n_lights, **stats,
        }), flush=True)


if __name__ == "__main__":
    main(sys.argv[1:] or ["balls_low.p3f", "dof.p3f"])
