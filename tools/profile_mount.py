"""Per-stage device timing of the mount_low frame (the headline benchmark).

Times each pipeline stage in isolation with the slope protocol so the
optimization work (VERDICT r1 item 3) targets measured costs, not guesses.

Usage: python tools/profile_mount.py [res]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(res: int = 512):
    import jax
    import jax.numpy as jnp

    import u_4a_2s_p3d_raytracer_template2_tpu as rt
    from u_4a_2s_p3d_raytracer_template2_tpu.core.types import Rays
    from u_4a_2s_p3d_raytracer_template2_tpu.models.scenes import mount_scene
    from u_4a_2s_p3d_raytracer_template2_tpu.models import whitted
    from u_4a_2s_p3d_raytracer_template2_tpu.ops import intersect
    from u_4a_2s_p3d_raytracer_template2_tpu.utils.profiling import (
        enable_compilation_cache,
    )
    from u_4a_2s_p3d_raytracer_template2_tpu.utils.timing import frame_time

    enable_compilation_cache()
    scene = rt.build_scene(mount_scene(res=res))
    R = res * res
    rng = np.random.default_rng(0)
    o = jnp.asarray(np.broadcast_to(np.asarray(scene.camera.eye), (R, 3)))
    d = jnp.asarray(rng.normal(size=(R, 3)).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    key = jax.random.PRNGKey(0)

    def stage(name, fn):
        dt = frame_time(fn, n_lo=2, n_hi=10, reps=3)
        print(f"{name:28s} {dt * 1e3:8.2f} ms  ({R / dt / 1e6:7.1f} Mray/s)",
              flush=True)
        return dt

    # vary rays per iteration (dedup-proof): rotate d by the loop index
    def vary(i):
        c = jnp.cos(i * 0.05)
        s = jnp.sin(i * 0.05)
        return jnp.stack([d[:, 0] * c - d[:, 1] * s,
                          d[:, 0] * s + d[:, 1] * c, d[:, 2]], -1)

    def t_closest(i):
        rays = Rays(o, vary(i), jnp.zeros(R))
        t, oid = whitted.trace_closest(scene, rays)
        return t.sum() + oid.sum().astype(jnp.float32)

    def t_shadow(i):
        rays = Rays(o, vary(i), jnp.zeros(R))
        occ = whitted.trace_shadow(scene, rays, 1.0, rt.RenderConfig())
        return occ.sum().astype(jnp.float32)

    cfg = rt.RenderConfig()

    def t_level_leaf(i):
        rays = Rays(o, vary(i), jnp.zeros(R))
        color, _ = whitted._level_step(
            scene, rays, jnp.ones(R, bool), jnp.ones(R, jnp.float32), cfg,
            key, False)
        return color.sum()

    def t_level_spawn(i):
        rays = Rays(o, vary(i), jnp.zeros(R))
        color, (children, fold) = whitted._level_step(
            scene, rays, jnp.ones(R, bool), jnp.ones(R, jnp.float32), cfg,
            key, True)
        (rr, ra, ri) = children["refl"]
        return color.sum() + rr.direction.sum() + fold["kr"].sum()

    def t_frame_sweep(i):
        img = whitted.render_tile(
            scene,
            jnp.tile(jnp.arange(res, dtype=jnp.float32), res) + 0.37 * i,
            jnp.repeat(jnp.arange(res, dtype=jnp.float32), res),
            cfg, key)
        return img.sum()

    wcfg = rt.RenderConfig(engine="wavefront")

    def t_frame_wave(i):
        img = whitted.render_tile(
            scene,
            jnp.tile(jnp.arange(res, dtype=jnp.float32), res) + 0.37 * i,
            jnp.repeat(jnp.arange(res, dtype=jnp.float32), res),
            wcfg, key)
        return img.sum()

    stage("closest-hit sweep", t_closest)
    stage("shadow any-hit", t_shadow)
    stage("level step (leaf)", t_level_leaf)
    stage("level step (spawn)", t_level_spawn)
    stage("frame (sweep engine)", t_frame_sweep)
    stage("frame (wavefront engine)", t_frame_wave)


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
