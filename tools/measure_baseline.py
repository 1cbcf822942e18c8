"""Measure the CPU baseline anchor for bench.py's ``vs_baseline``.

The reference publishes no numbers (BASELINE.md), so the anchor is measured
here, on record, two ways:

  1. ``tools/baseline_ref.cpp`` — a minimal single-threaded C++ tracer with
     the reference's semantics (the reference-class anchor; same language,
     same recursion, -O3). This is what CPU_ANCHOR_MRAYS records.
  2. ``tests/oracle.py`` — the scalar Python oracle on a sub-raster,
     extrapolated (sanity cross-check only; Python is not a fair anchor).

Usage: python tools/measure_baseline.py [frames]
Writes nothing; paste the JSON into BASELINE.md / bench.py when re-anchoring.
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def dump_scene(sd, path):
    cam = sd.camera
    eye = np.asarray(cam["eye"], np.float64)
    at = np.asarray(cam["at"], np.float64)
    up = np.asarray(cam["up"], np.float64)
    n = eye - at
    plane_dist = np.linalg.norm(n)
    n = n / plane_dist
    u = np.cross(up, n)
    u /= np.linalg.norm(u)
    v = np.cross(n, u)
    h = 2 * plane_dist * np.tan(np.pi * cam["fov"] / 180 / 2)
    w = cam["res_x"] / cam["res_y"] * h
    with open(path, "w") as f:
        out = list(eye) + list(u) + list(v) + list(n) + [
            plane_dist, w, h, cam["res_x"], cam["res_y"]]
        f.write(" ".join(str(x) for x in out) + "\n")
        f.write(" ".join(str(x) for x in sd.bg_color) + "\n")
        f.write(f"{len(sd.materials)}\n")
        for m in sd.materials:
            f.write(" ".join(str(x) for x in m) + "\n")
        f.write(f"{len(sd.lights)}\n")
        for l in sd.lights:
            f.write(" ".join(str(x) for x in l) + "\n")
        f.write(f"{len(sd.objects)}\n")
        for o in sd.objects:
            f.write(f"{o.ptype} " + " ".join(str(x) for x in o.params)
                    + f" {max(o.mat_id, 0)}\n")


SCENE_DIR = "/root/reference/P3D_RayTracer_Template2/P3D_Scenes"

# (scene, sub-raster or None for native res, frames): heavy brute-force
# scenes run a sub-raster and report the RATE, which extrapolates — the
# per-ray cost is resolution-independent for a brute-force loop.
CASES = [
    ("mount_low.p3f", None, 3),
    ("balls_medium.p3f", None, 3),
    ("balls_high.p3f", 64, 6),
    # 96² x3: the 48²x1 anchor carried ~±20% run-to-run error — one digit
    # of precision on the bench's vs_baseline (VERDICT r2 weak #5)
    ("dragon.p3f", 96, 3),
    # distribution-mode scenes (spp 4 ⇒ 16 AA+DoF samples/pixel in the
    # reference, main.cpp:939-946): the anchor measures the PER-RAY rate
    # pinhole-style — each AA sample is one primary + n_lights shadow rays,
    # so Mrays/s is sample-count invariant to first order (the lens/jitter
    # draws and the skybox texel fetch it omits both favor the anchor).
    ("balls_low.p3f", None, 3),
    ("dof.p3f", None, 3),
    ("mount_high.p3f", 128, 3),
]


def main(frames: int = 3):
    import u_4a_2s_p3d_raytracer_template2_tpu as rt

    tools = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(tools, "baseline_ref.cpp")
    exe = "/tmp/baseline_ref"
    subprocess.run(["g++", "-O3", "-march=native", "-o", exe, src],
                   check=True)

    for name, sub, n_frames in CASES:
        sd = rt.parse_p3f(os.path.join(SCENE_DIR, name))
        if sub is not None:
            sd.camera["res_x"] = sd.camera["res_y"] = sub
        dump = "/tmp/baseline_scene.txt"
        dump_scene(sd, dump)
        out = subprocess.run([exe, dump, str(n_frames)], check=True,
                             capture_output=True, text=True).stdout.strip()
        cpp = json.loads(out)
        print(json.dumps({"anchor": "cpp_single_core", "scene": name,
                          "sub_raster": sub, **cpp}))

    scene_file = os.path.join(SCENE_DIR, "mount_low.p3f")

    # Python-oracle cross-check on a sub-raster, extrapolated
    from tests.oracle import Oracle

    sub = 48
    sd2 = rt.parse_p3f(scene_file)
    sd2.camera["res_x"] = sd2.camera["res_y"] = sub
    import dataclasses

    o = Oracle(sd2, rt.RenderConfig())
    t0 = time.perf_counter()
    o.render()
    dt = time.perf_counter() - t0
    conv = sub * sub * (1 + len(sd2.lights))
    print(json.dumps({
        "anchor": "python_oracle_extrapolated",
        "sub_raster": sub,
        "seconds": round(dt, 3),
        "mrays_per_s": round(conv / dt / 1e6, 4),
    }))


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
