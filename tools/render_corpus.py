"""Render the full reference .p3f corpus end-to-end on the current backend,
saving PNGs and a stats JSON — the framework's system-level exercise.

Usage: python tools/render_corpus.py [outdir]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(outdir="out/corpus"):
    import jax

    import u_4a_2s_p3d_raytracer_template2_tpu as rt
    from u_4a_2s_p3d_raytracer_template2_tpu.io.image import (
        save_png,
        to_u8_device,
    )
    from u_4a_2s_p3d_raytracer_template2_tpu.models.whitted import render_image
    from u_4a_2s_p3d_raytracer_template2_tpu.utils.profiling import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    os.makedirs(outdir, exist_ok=True)
    scene_dir = "/root/reference/P3D_RayTracer_Template2/P3D_Scenes"
    names = ["mount_low.p3f", "mount_high.p3f", "balls_low.p3f",
             "balls_medium.p3f", "balls_high.p3f", "balls_box.p3f",
             "dof.p3f", "dragon.p3f"]
    stats = []
    for name in names:
        path = os.path.join(scene_dir, name)
        if not os.path.exists(path):
            continue
        sd = rt.parse_p3f(path)
        # accel upgrades: big brute-force scenes benefit from the clustered
        # tracer; keep the scene's own choice otherwise
        accel = sd.accel_type
        if sd.accel_type == 0 and len(sd.objects) > 1000:
            accel = 2
        t0 = time.time()
        scene = rt.build_scene(sd, accel=accel)
        build_s = time.time() - t0
        cfg = rt.RenderConfig(use_skybox=scene.has_skybox)
        cfg = cfg.with_scene_flags(scene)
        t0 = time.time()
        img = render_image(scene, cfg, jax.random.PRNGKey(0), tile_rows=64)
        u8 = np.asarray(to_u8_device(img))
        dt = time.time() - t0
        out = os.path.join(outdir, name.replace(".p3f", ".png"))
        save_png(out, u8)
        rec = dict(scene=name, objects=scene.n_objects, accel=accel,
                   spp=scene.spp, res=[scene.camera.res_x, scene.camera.res_y],
                   build_s=round(build_s, 2), render_s=round(dt, 2),
                   mean=float(u8.mean() / 255), std=float(u8.std() / 255))
        stats.append(rec)
        print(json.dumps(rec), flush=True)
    with open(os.path.join(outdir, "stats.json"), "w") as f:
        json.dump(stats, f, indent=1)


if __name__ == "__main__":
    main(*sys.argv[1:])
