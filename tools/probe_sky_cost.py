"""Where do the 224 ms of a distribution-mode frame go? A/B the deferred-
sky megakernel frame against the same frame with a 1-texel dummy cubemap
(same program structure, cache-resident gather table) and against
use_skybox=False (no sky rows at all). Separates kernel cost, sky-row
traffic, and the 2048^2 cubemap gather.

Usage: python -u tools/probe_sky_cost.py > log 2>&1   (one TPU consumer!)
"""
import json
import os
import sys

sys.path.insert(0, ".")

import numpy as np

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

SCENES = "/root/reference/P3D_RayTracer_Template2/P3D_Scenes"


def main():
    enable_compilation_cache()
    import dataclasses

    sd = rt.parse_p3f(os.path.join(SCENES, "balls_low.p3f"))
    scene = rt.build_scene(sd)
    res = scene.camera.res_x
    ys, xs = np.meshgrid(np.arange(res, dtype=np.float32),
                         np.arange(res, dtype=np.float32), indexing="ij")
    px = jnp.asarray(xs.reshape(-1))
    py = jnp.asarray(ys.reshape(-1))
    key = jax.random.PRNGKey(0)

    def time_tile(tag, scn, cfg):
        tile = mk.make_render_tile(scn, cfg)
        sky = tile.sky_operand
        if sky is None:
            def step(i, acc):
                x = px + 0.37 * i.astype(jnp.float32)
                return acc + tile(x, py, key).sum()
            dt = loop_time(step, jnp.float32(0.0), n_lo=1, n_hi=5, reps=3)
        else:
            def step(i, carry):
                acc, sk = carry
                x = px + 0.37 * i.astype(jnp.float32)
                return acc + tile.inner(x, py, key, sk).sum(), sk
            dt = loop_time(step, (jnp.float32(0.0), sky),
                           n_lo=1, n_hi=5, reps=3)
        print(json.dumps({"what": tag, "frame_ms": round(dt * 1e3, 2)}),
              flush=True)

    cfg_sky = rt.RenderConfig(engine="megakernel",
                              use_skybox=True).with_scene_flags(scene)
    cfg_nosky = rt.RenderConfig(engine="megakernel",
                                use_skybox=False).with_scene_flags(scene)
    cfg_noaa = rt.RenderConfig(engine="megakernel", use_skybox=True)

    time_tile("full_sky_2048_aa16", scene, cfg_sky)
    tiny = dataclasses.replace(
        scene, skybox=jnp.ones((6, 1, 1, 3), jnp.float32))
    time_tile("dummy_sky_1px_aa16", tiny, cfg_sky)
    time_tile("no_sky_aa16", scene, cfg_nosky)
    time_tile("full_sky_2048_noaa", scene, cfg_noaa)


if __name__ == "__main__":
    main()
