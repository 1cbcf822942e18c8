"""Headless command-line driver.

The reference's driver is an interactive stdin prompt + GLUT window
(main.cpp:871-999); per SURVEY.md §7 item 10 this is the stdin-free
equivalent: ``render`` produces a PNG and timing/Mrays-s stats, ``bench``
runs the benchmark loop, ``fit`` demonstrates inverse rendering.

Usage::

    python -m u_4a_2s_p3d_raytracer_template2_tpu.cli render scene.p3f -o out.png
    python -m u_4a_2s_p3d_raytracer_template2_tpu.cli render --builtin mount -o out.png
    python -m u_4a_2s_p3d_raytracer_template2_tpu.cli bench --scene mount
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

import numpy as np


def _build_scene(args):
    import os

    from .core.build import build_scene, load_scene
    from .models import scenes as builders

    if args.scene and not args.builtin:
        if not os.path.exists(args.scene):
            print(f"Error opening P3F file: {args.scene}", file=sys.stderr)
            raise SystemExit(2)
        from .io.p3f import parse_p3f

        sd = parse_p3f(args.scene)
        if args.res:
            sd.camera["res_x"] = sd.camera["res_y"] = args.res
        scene = build_scene(sd, accel=args.accel)
    else:
        name = args.builtin or "mount"
        builder = {
            "mount": builders.mount_scene,
            "spheres": builders.sphere_field_scene,
            "random": builders.random_scene,
        }[name]
        sd = builder()
        if args.res:
            sd.camera["res_x"] = sd.camera["res_y"] = args.res
        scene = build_scene(sd, accel=args.accel)
    return scene


def _config(args, scene):
    from .core.types import RenderConfig

    cfg = RenderConfig(
        soft_shadow=args.soft_shadow,
        fuzzy_reflection=args.fuzzy_reflection,
        motion_blur=args.motion_blur,
        use_skybox=args.skybox,
        fresnel_mode=args.fresnel,
        refraction_mode=args.refraction,
        engine=getattr(args, "engine", "sweep") or "sweep",
        accel_impl=getattr(args, "accel_impl", "auto") or "auto",
    )
    cfg = cfg.with_scene_flags(scene)
    if args.spp is not None:
        cfg = dataclasses.replace(
            cfg, spp=args.spp, anti_aliasing=args.spp > 0,
            depth_of_field=args.spp > 0)
    return cfg


def cmd_render(args):
    import jax

    from .utils.profiling import enable_compilation_cache

    enable_compilation_cache()

    from .io.image import save_png, to_u8_device
    from .models.whitted import render_image

    scene = _build_scene(args)
    cfg = _config(args, scene)
    key = jax.random.PRNGKey(args.seed)

    cam = scene.camera
    print(f"Resolution {cam.res_x}x{cam.res_y}, {scene.n_objects} objects, "
          f"{scene.n_lights} lights, accel={scene.accel_type}")

    t0 = time.perf_counter()
    img_dev = render_image(scene, cfg, key, tile_rows=args.tile_rows)
    import jax as _jax

    _jax.block_until_ready(img_dev)
    dt_total = time.perf_counter() - t0

    # steady-state timing, compile excluded (first call pays jit compile)
    t0 = time.perf_counter()
    img2 = render_image(scene, cfg, key, tile_rows=args.tile_rows)
    _jax.block_until_ready(img2)
    dt = time.perf_counter() - t0
    # quantize on device: device->host readback may be very slow (tunnels)
    img = np.asarray(to_u8_device(img_dev))

    n_pix = cam.res_x * cam.res_y
    spp = max(cfg.spp, 1) ** 2 if cfg.anti_aliasing else 1
    # primary + per-light shadow rays at the top level, per SURVEY.md §6
    rays = n_pix * spp * (1 + scene.n_lights)
    print(f"Done: {dt_total:.2f} s first render (incl. compile); "
          f"{dt:.3f} s steady-state — {rays / dt / 1e6:.2f} Mrays/s "
          f"(primary+shadow)")
    save_png(args.output, img)
    print(f"Image file created: {args.output}")


def cmd_fit(args):
    import jax
    import jax.numpy as jnp

    from .utils.profiling import enable_compilation_cache

    enable_compilation_cache()

    from .models.whitted import render_image
    from .parallel.dist import (
        default_mesh,
        lr_scales,
        train_step,
        train_step_full,
    )

    scene = _build_scene(args)
    cfg = _config(args, scene)
    mesh = default_mesh()
    target = render_image(scene, cfg)

    what = args.fit
    if what == "materials":
        mats = dataclasses.replace(
            scene.materials,
            diff_color=np.clip(
                np.asarray(scene.materials.diff_color) + 0.3, 0, 1),
        )
        s = dataclasses.replace(scene, materials=mats)
        for i in range(args.steps):
            s, loss = train_step(s, target, cfg, mesh, args.lr,
                                 jax.random.PRNGKey(i))
            print(f"step {i}: loss {float(loss):.6f}")
        return

    if what == "geometry":
        # geometry inverse rendering (FitParams.prim_params): displace the
        # first sphere's center, recover it through the intersection
        # barycentrics (core/build.with_prim_params)
        from .core import constants as C
        from .core.build import with_prim_params
        from .parallel.dist import lr_scales as _lr_scales

        if scene.accel_type != C.ACCEL_NONE:
            # host-built accel tables carry baked GEOMETRY (packet chunk
            # params, grid cells, BVH boxes) that with_prim_params cannot
            # refresh — traversing them while moving primitives would
            # silently miss hits near the moved silhouette. Force the
            # accel-free brute path, which reads the live differentiable
            # per-type tables every step (ADVICE r4 medium).
            print("note: scene declares an accelerator; geometry fit "
                  "forces accel_impl='brute' (accel tables hold stale "
                  "geometry during a fit)")
            cfg = dataclasses.replace(cfg, accel_impl="brute")

        true_params = np.asarray(scene.prims.params)
        ptype = np.asarray(scene.prims.ptype)
        sph_rows = np.nonzero(ptype == C.SPHERE)[0]
        # largest sphere: the most screen coverage, the strongest smooth
        # gradient (a sub-pixel sphere at low res has loss == grad == 0)
        row = (int(sph_rows[np.argmax(true_params[sph_rows, 3])])
               if len(sph_rows) else 0)
        r = max(float(true_params[row, 3]), 1e-3)
        delta = np.zeros_like(true_params)
        # displace by ~40% of the radius so the sphere still overlaps its
        # true silhouette (the smooth gradient has no silhouette term)
        delta[row, 0:3] = np.array([0.8, -0.5, 0.6]) * (0.4 * r)
        s = with_prim_params(scene, jnp.asarray(true_params + delta))
        mask = np.zeros((true_params.shape[0], 1), np.float32)
        mask[row] = 1.0
        sc = dataclasses.replace(
            _lr_scales(materials=0.0, light_pos=0.0, light_color=0.0,
                       camera=0.0, geometry=0.0),
            prim_params=jnp.asarray(mask))
        for i in range(args.steps):
            s, loss = train_step_full(s, target, cfg, mesh, args.lr,
                                      jax.random.PRNGKey(i), sc)
            d = float(np.linalg.norm(
                np.asarray(s.prims.params)[row, 0:3]
                - true_params[row, 0:3]))
            print(f"step {i}: loss {float(loss):.6f}  center offset {d:.4f}")
            if i == 0 and float(loss) < 1e-7:
                print("note: displaced sphere does not affect the image at "
                      "this resolution — try a higher --res")
        return

    # light-position inverse rendering (FitParams / train_step_full):
    # displace the first light, recover it by psum'd gradient descent
    true_pos = np.asarray(scene.lights.position)
    delta = np.zeros_like(true_pos)
    delta[0] = [1.0, -0.7, 0.5]
    lights = dataclasses.replace(scene.lights,
                                 position=jnp.asarray(true_pos + delta))
    s = dataclasses.replace(scene, lights=lights)
    sc = lr_scales(materials=0.0, light_pos=1.0, light_color=0.0,
                   camera=1.0 if what == "all" else 0.0)
    for i in range(args.steps):
        s, loss = train_step_full(s, target, cfg, mesh, args.lr,
                                  jax.random.PRNGKey(i), sc)
        d = float(np.linalg.norm(np.asarray(s.lights.position) - true_pos))
        print(f"step {i}: loss {float(loss):.6f}  light offset {d:.3f}")


def cmd_pathtrace(args):
    """Progressive Monte Carlo path tracing of the GLSL showcase world
    (models/pathtracer.py, models/glsl_scene.py)."""
    import jax

    from .utils.profiling import enable_compilation_cache

    enable_compilation_cache()

    from .io.image import save_png, to_u8_device
    from .models import pathtracer as pt
    from .models.glsl_scene import glsl_camera, glsl_world

    scene = glsl_world(
        showcase_fuzzy_reflections=args.fuzzy_reflection,
        no_negative_sphere=False,
    )
    res = args.res or 256
    cam = glsl_camera(res, res, showcase_dof=args.dof)
    cfg = pt.PTConfig(russian_roulette=args.russian_roulette)

    frame_fn = None
    engine = getattr(args, "pt_engine", "auto")
    if engine != "xla":
        from .models import pt_megakernel as mk

        on_tpu = jax.default_backend() == "tpu"
        if engine == "megakernel" or (on_tpu and mk.supports(scene)):
            frame_fn = mk.make_render_frame(scene, cam, cfg,
                                            interpret=not on_tpu)
            print("engine: scene-baked Pallas megakernel")

    t0 = time.perf_counter()
    acc = None
    key = jax.random.PRNGKey(args.seed)
    if args.resume and (os.path.isdir(args.resume)
                        or os.path.exists(args.resume + ".npz")):
        from .utils.checkpoint import restore

        acc = restore(args.resume, pt.make_accumulator(res, res))
        print(f"resumed at {float(acc.count):.0f} spp")
    acc = pt.render_progressive(scene, cam, cfg, key, args.frames, acc=acc,
                                frame_fn=frame_fn)
    dt = time.perf_counter() - t0
    print(f"{float(acc.count):.0f} spp accumulated in {dt:.1f}s "
          f"({res}x{res})")
    if args.checkpoint:
        from .utils.checkpoint import save

        save(args.checkpoint, acc)
        print(f"checkpoint saved: {args.checkpoint}")
    img = np.asarray(to_u8_device(pt.to_image(acc)))
    save_png(args.output, img)
    print(f"Image file created: {args.output}")


def cmd_orbit(args):
    """Camera-orbit turntable — the headless equivalent of the reference's
    GLUT mouse-orbit viewer (main.cpp:357-433)."""
    import dataclasses as dc

    import jax

    from .utils.profiling import enable_compilation_cache

    enable_compilation_cache()

    from .io.image import save_png, to_u8_device
    from .models.whitted import render_image
    from .ops.camera import orbit_eye, with_eye

    scene = _build_scene(args)
    cfg = _config(args, scene)
    r = float(np.linalg.norm(np.asarray(scene.camera.eye)))
    for i in range(args.frames):
        alpha = 360.0 * i / args.frames
        cam = with_eye(scene.camera, orbit_eye(scene.camera, alpha,
                                               args.beta, r))
        s = dc.replace(scene, camera=cam)
        img = np.asarray(to_u8_device(
            render_image(s, cfg, jax.random.PRNGKey(i),
                         tile_rows=args.tile_rows)))
        path = args.output.replace("%d", str(i)) if "%d" in args.output             else f"{args.output.rsplit('.', 1)[0]}_{i:03d}.png"
        save_png(path, img)
        print(f"frame {i}: {path}")


def cmd_view(args):
    """Progressive interactive-equivalent session — the headless twin of the
    reference's GLUT idle-func viewer (main.cpp:835-868): re-render while the
    camera orbits (SetEye, camera.h:80-89), print a per-frame FPS/Mrays
    readout (the title-bar counter, main.cpp:280-289), then hold still and
    progressively accumulate jittered samples (the GLSL accumulator pattern,
    P3D_RT.glsl:345-365) until --still-frames are blended.
    """
    import dataclasses as dc

    import jax
    import jax.numpy as jnp

    from .utils.profiling import enable_compilation_cache

    enable_compilation_cache()

    from .io.image import save_png, to_u8_device
    from .models.whitted import render_image
    from .ops.camera import orbit_eye, with_eye

    scene = _build_scene(args)
    cfg = _config(args, scene)
    cam0 = scene.camera
    n_pix = cam0.res_x * cam0.res_y
    rays_per_frame = n_pix * (1 + scene.n_lights)
    r = float(np.linalg.norm(np.asarray(cam0.eye)))

    def frame(alpha, beta, key):
        cam = with_eye(cam0, orbit_eye(cam0, alpha, beta, r))
        s = dc.replace(scene, camera=cam)
        img = render_image(s, cfg, key, tile_rows=args.tile_rows)
        # sync on a scalar: device->host image readback can be very slow
        # through remote-TPU tunnels; the u8 readback happens once at the end
        jax.block_until_ready(img.sum())
        return img

    # warmup/compile frame (excluded from the FPS readout, like the
    # reference's first frame which pays scene build)
    img = frame(0.0, args.beta, jax.random.PRNGKey(0))
    print(f"session: {cam0.res_x}x{cam0.res_y}, {scene.n_objects} objects, "
          f"orbit {args.orbit_frames} frames over {args.sweep} deg, then "
          f"accumulate {args.still_frames} frames")

    for i in range(args.orbit_frames):
        alpha = args.sweep * (i + 1) / max(args.orbit_frames, 1)
        t0 = time.perf_counter()
        img = frame(alpha, args.beta, jax.random.PRNGKey(0))
        dt = time.perf_counter() - t0
        print(f"orbit frame {i}: alpha={alpha:7.2f}  {dt * 1e3:7.1f} ms  "
              f"{1.0 / dt:6.2f} FPS  {rays_per_frame / dt / 1e6:7.2f} Mrays/s")

    # camera still: progressive accumulation (jittered AA samples). The
    # orbit frames render withOUT AA, so they are NOT blended in — every
    # accumulated sample comes from the same acc_cfg distribution.
    alpha = args.sweep
    acc_cfg = dc.replace(cfg, anti_aliasing=True,
                         spp=max(cfg.spp, 1)) if args.still_frames else cfg
    cam = with_eye(cam0, orbit_eye(cam0, alpha, args.beta, r))
    still = dc.replace(scene, camera=cam)
    acc = jnp.zeros_like(img)
    for i in range(args.still_frames):
        t0 = time.perf_counter()
        img = render_image(still, acc_cfg, jax.random.PRNGKey(1 + i),
                           tile_rows=args.tile_rows)
        acc = acc + img
        jax.block_until_ready(acc.sum())
        dt = time.perf_counter() - t0
        print(f"still frame {i}: {i + 1} samples  {dt * 1e3:7.1f} ms  "
              f"{1.0 / dt:6.2f} FPS")
    acc = acc / args.still_frames if args.still_frames else img

    out = np.asarray(to_u8_device(acc))
    save_png(args.output, out)
    print(f"Image file created: {args.output}")


def _read_keys():
    """Yield single keypresses from stdin.

    On a tty, switch to cbreak so each keystroke arrives immediately (the
    GLUT-callback equivalent); on a pipe, every character of every line is a
    keypress — so the loop is drivable by scripts and the verify skill
    (`printf 'ad+q' | ... view --interactive`). Newlines are skipped.
    """
    if sys.stdin.isatty():
        import termios
        import tty

        fd = sys.stdin.fileno()
        old = termios.tcgetattr(fd)
        try:
            tty.setcbreak(fd)
            while True:
                ch = sys.stdin.read(1)
                if not ch:
                    return
                yield ch
        finally:
            termios.tcsetattr(fd, termios.TCSADRAIN, old)
    else:
        while True:
            ch = sys.stdin.read(1)
            if not ch:
                return
            if ch not in "\r\n":
                yield ch


def cmd_live(args):
    """Terminal-interactive viewer — the stdin twin of the reference's GLUT
    input loop: processKeys (main.cpp:327-349), the alpha/beta mouse orbit
    with the ±85° pitch clamp (main.cpp:395-421), and the 0.1-step wheel
    zoom with the 0.1 radius floor (main.cpp:425-431). Every keypress
    re-renders and prints the title-bar FPS/Mrays readout (main.cpp:280-289).

    Keys: a/d yaw ∓5°, w/s pitch ±5°, +/- zoom in/out, SPACE accumulate one
    jittered sample (camera moves reset the accumulator, the GLSL
    iFrame-reset pattern, P3D_RT.glsl:345-365), r reset camera, c print
    camera coordinates, q or ESC quit (writes the PNG).
    """
    import dataclasses as dc
    import math

    import jax
    import jax.numpy as jnp

    from .utils.profiling import enable_compilation_cache

    enable_compilation_cache()

    from .io.image import ansi_halfblock, preview_u8, save_png, to_u8_device
    from .models.whitted import render_image
    from .ops.camera import orbit_eye, with_eye

    scene = _build_scene(args)
    cfg = _config(args, scene)
    cam0 = scene.camera
    rays_per_frame = cam0.res_x * cam0.res_y * (1 + scene.n_lights)
    acc_cfg = dc.replace(cfg, anti_aliasing=True, spp=max(cfg.spp, 1))

    def spherical_of_eye():
        # the reference's 'r' reset handler math (main.cpp:334-341)
        ex, ey, ez = [float(v) for v in np.asarray(cam0.eye)]
        rr = math.sqrt(ex * ex + ey * ey + ez * ez)
        return (math.degrees(math.atan2(ex, ez)),
                math.degrees(math.asin(ey / rr)), rr)

    alpha, beta, r = spherical_of_eye()
    acc = None
    n_acc = 0

    def cur_scene():
        cam = with_eye(cam0, orbit_eye(cam0, alpha, beta, r))
        return dc.replace(scene, camera=cam)

    def render(use_cfg, key, show=None):
        t0 = time.perf_counter()
        img = render_image(cur_scene(), use_cfg, key,
                           tile_rows=args.tile_rows)
        jax.block_until_ready(img.sum())
        dt = time.perf_counter() - t0
        # the visible image: an ANSI 24-bit half-block blit of a
        # device-downsampled frame — the terminal twin of the reference
        # viewer's per-frame drawPoints blit (main.cpp:237-259). ~11 KB of
        # u8 through the ~20 KB/s tunnel at the default 80 columns.
        if args.preview_cols > 0:
            print(ansi_halfblock(preview_u8(show if show is not None
                                            else img, args.preview_cols)),
                  flush=True)
        print(f"alpha={alpha:7.2f} beta={beta:6.2f} r={r:6.2f}  "
              f"{dt * 1e3:7.1f} ms  {1.0 / dt:6.2f} FPS  "
              f"{rays_per_frame / dt / 1e6:7.2f} Mrays/s", flush=True)
        return img

    print(f"live: {cam0.res_x}x{cam0.res_y}, {scene.n_objects} objects — "
          "keys: a/d yaw, w/s pitch, +/- zoom, SPACE accumulate, r reset, "
          "c coords, q quit", flush=True)
    img = render(cfg, jax.random.PRNGKey(0))

    for ch in _read_keys():
        if ch in ("q", "\x1b"):          # ESC, main.cpp:331
            break
        if ch == "c":                     # main.cpp:343-347
            ex, ey, ez = [float(v) for v in
                          np.asarray(cur_scene().camera.eye)]
            print(f"Camera Spherical Coordinates ({r:f}, {beta:f}, "
                  f"{alpha:f})")
            print(f"Camera Cartesian Coordinates ({ex:f}, {ey:f}, {ez:f})",
                  flush=True)
            continue
        if ch == " ":
            n_acc += 1
            img = render(acc_cfg, jax.random.PRNGKey(n_acc), show=None)
            acc = img if acc is None else acc + img
            print(f"  accumulated {n_acc} samples", flush=True)
            continue
        if ch == "r":
            alpha, beta, r = spherical_of_eye()
        elif ch == "a":
            alpha -= 5.0
        elif ch == "d":
            alpha += 5.0
        elif ch == "w":
            beta = min(beta + 5.0, 85.0)   # pitch clamp, main.cpp:402-405
        elif ch == "s":
            beta = max(beta - 5.0, -85.0)
        elif ch == "+":
            r = max(r - 0.1, 0.1)          # radius floor, main.cpp:426-427
        elif ch == "-":
            r += 0.1
        else:
            continue
        acc = None
        n_acc = 0
        img = render(cfg, jax.random.PRNGKey(0))

    out = acc / n_acc if acc is not None else img
    out = np.asarray(to_u8_device(out))
    save_png(args.output, out)
    print(f"Image file created: {args.output}")


def main(argv=None):
    p = argparse.ArgumentParser(prog="u_4a_2s_p3d_raytracer_template2_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("scene", nargs="?", help=".p3f scene file")
        sp.add_argument("--builtin", choices=["mount", "spheres", "random"])
        sp.add_argument("--accel", type=int, default=None,
                        help="0 none, 1 grid, 2 bvh (default: scene's)")
        sp.add_argument("--res", type=int, default=None)
        sp.add_argument("--spp", type=int, default=None)
        sp.add_argument("--seed", type=int, default=0)
        sp.add_argument("--tile-rows", type=int, default=64)
        sp.add_argument("--soft-shadow", action="store_true")
        sp.add_argument("--fuzzy-reflection", action="store_true")
        sp.add_argument("--motion-blur", action="store_true")
        sp.add_argument("--skybox", action="store_true",
                        help="sample the env cubemap on miss")
        sp.add_argument("--fresnel", default="schlick",
                        choices=["schlick", "reference_schlick",
                                 "reference_exact"])
        sp.add_argument("--refraction", default="reference",
                        choices=["reference", "physical"])
        sp.add_argument("--engine", default="sweep",
                        choices=["sweep", "wavefront", "megakernel"],
                        help="secondary-ray engine; megakernel = "
                        "scene-baked Pallas kernel (TPU, small scenes)")
        sp.add_argument("--accel-impl", dest="accel_impl", default="auto",
                        choices=["auto", "packets", "clusters", "perray",
                                 "brute"],
                        help="BVH-mode traversal implementation (auto = "
                        "packet-BVH kernel on TPU, cluster sweeps "
                        "elsewhere)")

    pr = sub.add_parser("render", help="render a scene to PNG")
    common(pr)
    pr.add_argument("-o", "--output", default="RT_Output.png")
    pr.set_defaults(fn=cmd_render)

    pf = sub.add_parser("fit", help="inverse-rendering demo")
    common(pf)
    pf.add_argument("--steps", type=int, default=10)
    pf.add_argument("--lr", type=float, default=1.0)
    pf.add_argument("--fit", default="materials",
                    choices=["materials", "lights", "geometry", "all"],
                    help="parameter groups to optimize (lights/geometry/all "
                    "use train_step_full; lr ~100 recommended for lights, "
                    "~2 for geometry)")
    pf.set_defaults(fn=cmd_fit)

    pp = sub.add_parser("pathtrace",
                        help="progressive Monte Carlo path tracing")
    pp.add_argument("--res", type=int, default=256)
    pp.add_argument("--frames", type=int, default=16,
                    help="1-spp frames to accumulate")
    pp.add_argument("--seed", type=int, default=0)
    pp.add_argument("--dof", action="store_true")
    pp.add_argument("--fuzzy-reflection", action="store_true")
    pp.add_argument("--russian-roulette", action="store_true")
    pp.add_argument("--pt-engine", choices=("auto", "xla", "megakernel"),
                    default="auto",
                    help="auto = scene-baked Pallas megakernel on TPU "
                    "(models/pt_megakernel.py), XLA integrator otherwise")
    pp.add_argument("--checkpoint", help="save accumulation state here")
    pp.add_argument("--resume", help="resume accumulation state from here")
    pp.add_argument("-o", "--output", default="PT_Output.png")
    pp.set_defaults(fn=cmd_pathtrace)

    pv = sub.add_parser(
        "view", help="progressive viewer session: orbit + FPS readout + "
        "still-camera accumulation")
    common(pv)
    pv.add_argument("--orbit-frames", type=int, default=8,
                    help="frames rendered while the camera orbits")
    pv.add_argument("--still-frames", type=int, default=4,
                    help="jittered frames accumulated once the camera stops")
    pv.add_argument("--sweep", type=float, default=90.0,
                    help="total orbit sweep in degrees")
    pv.add_argument("--beta", type=float, default=20.0)
    pv.add_argument("-o", "--output", default="View_Output.png")
    pv.set_defaults(fn=cmd_view)

    pl = sub.add_parser(
        "live", help="terminal-interactive viewer: ANSI half-block image "
        "per frame + stdin key loop (a/d/w/s orbit, +/- zoom, SPACE "
        "accumulate, r reset, c coords, q quit)")
    common(pl)
    pl.add_argument("--preview-cols", type=int, default=80,
                    help="terminal preview width in characters "
                    "(0 disables the preview)")
    pl.add_argument("-o", "--output", default="Live_Output.png")
    pl.set_defaults(fn=cmd_live)

    po = sub.add_parser("orbit", help="camera-orbit turntable frames")
    common(po)
    po.add_argument("--frames", type=int, default=8)
    po.add_argument("--beta", type=float, default=20.0)
    po.add_argument("-o", "--output", default="orbit.png")
    po.set_defaults(fn=cmd_orbit)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
