"""On-device validation artifact for the Pallas kernels (VERDICT r1 weak #9).

CI validates Pallas kernels in interpret mode on CPU; this script runs the
REAL compiled kernels on the TPU and records parity + timing into
``tools/device_validate.json`` so the numbers cited in docstrings are
reproducible from the repo.

Usage: python tools/device_validate.py   (needs the TPU backend)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "device_validate.json")


def main():
    import jax
    import jax.numpy as jnp

    import u_4a_2s_p3d_raytracer_template2_tpu as rt
    from u_4a_2s_p3d_raytracer_template2_tpu.models import (
        whitted,
        whitted_megakernel as mk,
    )
    from u_4a_2s_p3d_raytracer_template2_tpu.models.scenes import mount_scene
    from u_4a_2s_p3d_raytracer_template2_tpu.ops import (
        intersect,
        pallas_intersect as pk,
    )
    from u_4a_2s_p3d_raytracer_template2_tpu.core.types import Rays
    from u_4a_2s_p3d_raytracer_template2_tpu.utils.profiling import (
        enable_compilation_cache,
    )
    from u_4a_2s_p3d_raytracer_template2_tpu.utils.timing import frame_time

    enable_compilation_cache()
    backend = jax.default_backend()
    report = {"backend": backend, "device": str(jax.devices()[0])}
    if backend != "tpu":
        print("needs TPU; backend =", backend)
        return 1

    rng = np.random.default_rng(0)
    R, K = 262144, 7424
    centers = jnp.asarray(rng.uniform(-10, 10, (K, 3)), jnp.float32)
    radii = jnp.asarray(rng.uniform(0.2, 1.0, K), jnp.float32)
    kc = (centers ** 2).sum(-1) - radii ** 2
    ids = jnp.arange(K, dtype=jnp.int32)
    o = jnp.asarray(rng.uniform(-12, 12, (R, 3)), jnp.float32)
    d = jnp.asarray(rng.normal(size=(R, 3)), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    # --- sphere closest: Pallas vs MXU winners ---------------------------
    t_pk, id_pk = pk.sphere_closest(centers, kc, ids, o, d)
    from u_4a_2s_p3d_raytracer_template2_tpu.ops import mxu_intersect as mxu

    # reference winners, chunked over rays (a full [R, K] map is ~7.8 GB)
    @jax.jit
    def ref_min(o, d):
        def body(c):
            oc, dc = c
            return jnp.min(mxu.sphere_t(centers, kc, oc, dc), axis=-1)
        return jax.lax.map(
            body, (o.reshape(-1, 4096, 3), d.reshape(-1, 4096, 3))
        ).reshape(-1)

    t_ref = ref_min(o, d)
    agree = float(jnp.mean(jnp.isclose(t_pk, t_ref, rtol=1e-5, atol=1e-4)
                           | ((t_pk >= 1e30) & (t_ref >= 1e30))))
    dt = frame_time(lambda i: pk.sphere_closest(
        centers, kc, ids, o + 1e-4 * i, d)[0].sum(), n_lo=2, n_hi=10, reps=3)
    report["sphere_closest"] = {
        "rays": R, "prims": K, "t_agree_frac": agree,
        "sweep_ms": round(dt * 1e3, 2),
        "gtests_per_s": round(R * K / dt / 1e12, 3),
    }
    print("sphere_closest:", report["sphere_closest"], flush=True)

    # --- sphere any-hit: early-exit kernel vs closest-derived mask -------
    for max_t in (2.0, 1e30):
        occ = pk.sphere_any_hit(centers, kc, o, d, max_t)
        want = t_pk < max_t
        eq = float(jnp.mean(occ == want))
        dt = frame_time(lambda i: pk.sphere_any_hit(
            centers, kc, o + 1e-4 * i, d, max_t).sum().astype(jnp.float32),
            n_lo=2, n_hi=10, reps=3)
        report[f"sphere_any_hit_max_t_{max_t:g}"] = {
            "mask_equal_frac": eq, "sweep_ms": round(dt * 1e3, 2)}
        print(f"sphere_any_hit {max_t:g}:",
              report[f"sphere_any_hit_max_t_{max_t:g}"], flush=True)

    # --- megakernel: device image parity vs wavefront --------------------
    res = 512
    scene = rt.build_scene(mount_scene(res=res))
    cfg = rt.RenderConfig()
    px = jnp.tile(jnp.arange(res, dtype=jnp.float32), res)
    py = jnp.repeat(jnp.arange(res, dtype=jnp.float32), res)
    key = jax.random.PRNGKey(0)
    tile = mk.make_render_tile(scene, cfg)
    got = tile(px, py, key)
    import dataclasses

    want = jnp.clip(whitted.render_tile(
        scene, px, py, dataclasses.replace(cfg, engine="wavefront"), key),
        0, 1)
    diff = jnp.abs(got - want)
    dt = frame_time(lambda i: tile(px + 0.37 * i, py, key).sum(),
                    n_lo=10, n_hi=110, reps=3)
    report["megakernel_mount_512"] = {
        "parity_max": float(diff.max()),
        "parity_mean": float(diff.mean()),
        "frac_pixels_gt_2e-3": float((diff.max(-1) > 2e-3).mean()),
        "frame_ms": round(dt * 1e3, 3),
        "mrays_per_s": round(res * res * 2 / dt / 1e6, 1),
    }
    print("megakernel:", report["megakernel_mount_512"], flush=True)

    report["timestamp"] = time.strftime("%Y-%m-%d %H:%M:%S")
    with open(OUT, "w") as f:
        json.dump(report, f, indent=1)
    print("wrote", OUT)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
