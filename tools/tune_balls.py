"""balls_high packet-kernel tuning (VERDICT r3 next-round #6): the 7,381-
sphere scene builds a 17-node treelet whose walk is scalar-iteration-bound
at PACK=256 — every packet re-tests mostly the same 8-chunk leaves. Wider
packs amortize the per-iteration scalar/node cost over more rays.

A/B on the real chip: PACK in {256, 512, 1024} x {closest, anyhit} on
primary and incoherent batches, plus a full wavefront frame at the winner.

Usage: python -u tools/tune_balls.py > log 2>&1   (one TPU consumer!)
"""
import json
import os
import sys

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp

import u_4a_2s_p3d_raytracer_template2_tpu as rt
from u_4a_2s_p3d_raytracer_template2_tpu.accel.packets import (
    packet_any_hit,
    packet_closest_hit,
)
from u_4a_2s_p3d_raytracer_template2_tpu.core.types import Rays
from u_4a_2s_p3d_raytracer_template2_tpu.ops.camera import primary_rays
from u_4a_2s_p3d_raytracer_template2_tpu.utils.profiling import (
    enable_compilation_cache,
)
from u_4a_2s_p3d_raytracer_template2_tpu.utils.timing import loop_time

SCENES = "/root/reference/P3D_RayTracer_Template2/P3D_Scenes"


def time_fn(tag, fn, rays, n_hi=6):
    o0 = rays.origin

    def step(i, acc):
        r = Rays(o0 + i.astype(jnp.float32) * 1e-5, rays.direction,
                 rays.time)
        return acc + fn(r)

    dt = loop_time(step, jnp.float32(0.0), n_lo=1, n_hi=n_hi, reps=3)
    n = rays.origin.shape[0]
    print(json.dumps({"what": tag, "ms": round(dt * 1e3, 3),
                      "mrays_per_s": round(n / dt / 1e6, 2)}), flush=True)
    return dt


def main():
    enable_compilation_cache()
    sd = rt.parse_p3f(os.path.join(SCENES, "balls_high.p3f"))
    scene = rt.build_scene(sd, accel=2)
    res = 512
    ys, xs = np.meshgrid(np.arange(res, dtype=np.float32),
                         np.arange(res, dtype=np.float32), indexing="ij")
    pr = primary_rays(scene.camera, jnp.asarray(xs.reshape(-1)) + 0.5,
                      jnp.asarray(ys.reshape(-1)) + 0.5,
                      jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    o = rng.uniform(-2, 2, (res * res, 3)).astype(np.float32)
    d = rng.normal(size=(res * res, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    inc = Rays.make(o, d)

    for pack in (256, 512, 1024):
        for tag, rays in (("primary", pr), ("incoherent", inc)):
            cfn = jax.jit(lambda r, pk=scene.packets, p=scene.prims,
                          pa=pack: (lambda t_o: t_o[0].sum()
                                    + t_o[1].sum().astype(jnp.float32))(
                              packet_closest_hit(pk, p, r, pack=pa)))
            time_fn(f"closest_p{pack}_{tag}", cfn, rays)
            afn = jax.jit(lambda r, pk=scene.packets, p=scene.prims,
                          pa=pack: packet_any_hit(pk, p, r, 1.0, pack=pa)
                          .sum().astype(jnp.float32))
            time_fn(f"anyhit_p{pack}_{tag}", afn, rays)


if __name__ == "__main__":
    main()
