"""Measure the CPU path-tracer anchor for bench.py's ``vs_baseline``.

The reference's path tracer is a Shadertoy GLSL shader with no published
numbers (BASELINE.md), so the anchor is measured here: tools/baseline_pt.cpp
is a minimal single-threaded C++ path tracer with the GLSL template's exact
semantics, run single-core -O3 on the glsl_world on a sub-raster (per-path
cost is resolution-independent in a brute-force integrator).

Usage: python tools/measure_baseline_pt.py [sub_raster] [samples]
Prints the JSON; paste into BASELINE.md / bench.py when re-anchoring.
"""
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    from u_4a_2s_p3d_raytracer_template2_tpu.models.glsl_scene import (
        glsl_camera,
        glsl_world,
    )

    sub = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    samples = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    scene = glsl_world()
    cam = glsl_camera(512, 512)

    dump = "/tmp/pt_world.txt"
    with open(dump, "w") as f:
        out = (list(np.asarray(cam.eye)) + list(np.asarray(cam.u))
               + list(np.asarray(cam.v)) + list(np.asarray(cam.n))
               + [float(cam.plane_dist), float(cam.w), float(cam.h),
                  int(cam.res_x), int(cam.res_y)])
        f.write(" ".join(str(x) for x in out) + "\n")
        m = scene.materials
        K = int(np.asarray(m.mtype).shape[0])
        f.write(f"{K}\n")
        for i in range(K):
            row = ([int(np.asarray(m.mtype)[i])]
                   + list(np.asarray(m.albedo)[i])
                   + list(np.asarray(m.spec_color)[i])
                   + [float(np.asarray(m.roughness)[i]),
                      float(np.asarray(m.ref_idx)[i])]
                   + list(np.asarray(m.refract_color)[i]))
            f.write(" ".join(str(x) for x in row) + "\n")
        rad = np.asarray(scene.sp_radius)
        live = np.nonzero(rad != 0.0)[0]
        f.write(f"{len(live)}\n")
        for i in live:
            row = (list(np.asarray(scene.sp_center0)[i])
                   + list(np.asarray(scene.sp_center1)[i])
                   + [float(rad[i]), float(np.asarray(scene.sp_time0)[i]),
                      float(np.asarray(scene.sp_time1)[i]),
                      int(np.asarray(scene.sp_mat)[i])])
            f.write(" ".join(str(x) for x in row) + "\n")
        tv0 = np.asarray(scene.tri_v0)
        te1 = np.asarray(scene.tri_e1)
        te2 = np.asarray(scene.tri_e2)
        tlive = [i for i in range(tv0.shape[0])
                 if np.linalg.norm(np.cross(te1[i], te2[i])) > 0]
        f.write(f"{len(tlive)}\n")
        for i in tlive:
            row = (list(tv0[i]) + list(te1[i]) + list(te2[i])
                   + [int(np.asarray(scene.tri_mat)[i])])
            f.write(" ".join(str(x) for x in row) + "\n")
        lp = np.asarray(scene.light_pos)
        lc = np.asarray(scene.light_color)
        f.write(f"{lp.shape[0]}\n")
        for i in range(lp.shape[0]):
            f.write(" ".join(str(x) for x in list(lp[i]) + list(lc[i])) + "\n")

    exe = "/tmp/baseline_pt"
    src = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "baseline_pt.cpp")
    subprocess.run(["g++", "-O3", "-march=native", "-o", exe, src],
                   check=True)
    out = subprocess.run([exe, dump, str(sub), str(samples)],
                         capture_output=True, text=True, check=True)
    print(out.stdout.strip())


if __name__ == "__main__":
    main()
