"""On-device qualification of BASELINE config #4: uniform-grid accelerator
on the mount mesh + skybox-on-miss (VERDICT r3 Missing #1 / next-round #2).

Measures, on the real chip:
  * the per-ray vmapped grid DDA (accel/traverse.py grid_closest_hit /
    grid_any_hit) — the reference-layout walk (grid.cpp:101-361);
  * the packet-BVH kernel on the same scene (accel/packets.py) — the
    TPU-native alternative the dispatcher can route grid mode to;
  * a full mount_high wavefront frame with skybox-on-miss.

Usage: python -u tools/bench_grid.py > log 2>&1   (one TPU consumer!)
"""
import json
import sys

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp

import u_4a_2s_p3d_raytracer_template2_tpu as rt
from u_4a_2s_p3d_raytracer_template2_tpu.core.types import Rays
from u_4a_2s_p3d_raytracer_template2_tpu.ops.camera import primary_rays
from u_4a_2s_p3d_raytracer_template2_tpu.utils.profiling import (
    enable_compilation_cache,
)
from u_4a_2s_p3d_raytracer_template2_tpu.utils.timing import loop_time

SCENES = "/root/reference/P3D_RayTracer_Template2/P3D_Scenes"


def res_rays(scene, res):
    ys, xs = np.meshgrid(np.arange(res, dtype=np.float32),
                         np.arange(res, dtype=np.float32), indexing="ij")
    px = jnp.asarray(xs.reshape(-1)) + 0.5
    py = jnp.asarray(ys.reshape(-1)) + 0.5
    return primary_rays(scene.camera, px, py, jax.random.PRNGKey(0))


def time_fn(tag, fn, rays, n_hi=6):
    """fn(rays) -> scalar-reducible output; scene data must ride inside fn
    as jitted-arg-sized closures (no 100MB+ constants)."""
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
    import os

    sd = rt.parse_p3f(os.path.join(SCENES, "mount_high.p3f"))
    grid_scene = rt.build_scene(sd, accel=1)
    bvh_scene = rt.build_scene(sd, accel=2)
    print(json.dumps({"what": "scene", "n_objects": grid_scene.n_objects,
                      "grid": [grid_scene.grid.nx, grid_scene.grid.ny,
                               grid_scene.grid.nz],
                      "max_per_cell": grid_scene.grid.max_per_cell}),
          flush=True)

    from u_4a_2s_p3d_raytracer_template2_tpu.accel.packets import (
        packet_any_hit,
        packet_closest_hit,
    )
    from u_4a_2s_p3d_raytracer_template2_tpu.accel.traverse import (
        grid_any_hit,
        grid_closest_hit,
    )

    for res in (128, 256):
        rays = res_rays(grid_scene, res)

        gfn = jax.jit(lambda r, g=grid_scene.grid, p=grid_scene.prims:
                      (lambda t_o: t_o[0].sum()
                       + t_o[1].sum().astype(jnp.float32))(
                          grid_closest_hit(g, p, r)))
        time_fn(f"grid_dda_closest_{res}", gfn, rays)

        sfn = jax.jit(lambda r, g=grid_scene.grid, p=grid_scene.prims:
                      grid_any_hit(g, p, r, 1.0).sum().astype(jnp.float32))
        time_fn(f"grid_dda_anyhit_{res}", sfn, rays)

        pfn = jax.jit(lambda r, pk=bvh_scene.packets, p=bvh_scene.prims:
                      (lambda t_o: t_o[0].sum()
                       + t_o[1].sum().astype(jnp.float32))(
                          packet_closest_hit(pk, p, r)))
        time_fn(f"packets_closest_{res}", pfn, rays)

        afn = jax.jit(lambda r, pk=bvh_scene.packets, p=bvh_scene.prims:
                      packet_any_hit(pk, p, r, 1.0).sum()
                      .astype(jnp.float32))
        time_fn(f"packets_anyhit_{res}", afn, rays)

        # agreement between the two paths on this batch (scalar readbacks)
        tg, ig = jax.jit(lambda r: grid_closest_hit(
            grid_scene.grid, grid_scene.prims, r))(rays)
        tp_, ip_ = jax.jit(lambda r: packet_closest_hit(
            bvh_scene.packets, bvh_scene.prims, r))(rays)
        agree = float((ig == ip_).mean())
        tdiff = float(jnp.nanmax(jnp.abs(jnp.where(
            (ig >= 0) & (ip_ >= 0), tg - tp_, 0.0))))
        print(json.dumps({"what": f"grid_vs_packets_agree_{res}",
                          "id_agree_frac": round(agree, 5),
                          "max_t_delta_on_hits": tdiff}), flush=True)


if __name__ == "__main__":
    main()
