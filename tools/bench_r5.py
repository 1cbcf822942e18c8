"""Round-5 on-device measurements (VERDICT r4 items 3-5):

  A. balls_high: fused 3-light any-hit (packet_any_hit_multi) vs three
     separate walks, isolated AND end-to-end (sweep-engine frame).
  B. mount_high: frame decomposition — per-phase isolated costs vs the
     wavefront/sweep engine frames, to locate the glue.
  C. balls_low/dof distribution mode: where the 4.9 ms/sample goes
     (sky rows? ray gen? accumulation scan) by config ablation.

Usage: python -u tools/bench_r5.py [a|b|c ...] > log  (one TPU consumer!)
"""
import json
import os
import sys

sys.path.insert(0, ".")

import numpy as np

SCENES = "/root/reference/P3D_RayTracer_Template2/P3D_Scenes"


def _grid_px(res):
    import jax.numpy as jnp

    ys, xs = np.meshgrid(np.arange(res, dtype=np.float32),
                         np.arange(res, dtype=np.float32), indexing="ij")
    return jnp.asarray(xs.reshape(-1)), jnp.asarray(ys.reshape(-1))


def out(tag, dt_s, n_rays=None):
    rec = {"what": tag, "ms": round(dt_s * 1e3, 3)}
    if n_rays:
        rec["mrays_per_s"] = round(n_rays / dt_s / 1e6, 2)
    print(json.dumps(rec), flush=True)


def part_a():
    import jax
    import jax.numpy as jnp

    import u_4a_2s_p3d_raytracer_template2_tpu as rt
    from u_4a_2s_p3d_raytracer_template2_tpu.accel.packets import (
        multi_supported,
        packet_any_hit,
        packet_any_hit_multi,
        packet_closest_hit,
    )
    from u_4a_2s_p3d_raytracer_template2_tpu.core.types import Rays
    from u_4a_2s_p3d_raytracer_template2_tpu.models.whitted import (
        render_tile,
    )
    from u_4a_2s_p3d_raytracer_template2_tpu.ops.camera import primary_rays
    from u_4a_2s_p3d_raytracer_template2_tpu.utils.timing import loop_time

    sd = rt.parse_p3f(os.path.join(SCENES, "balls_high.p3f"))
    scene = rt.build_scene(sd, accel=2)
    assert multi_supported(scene.packets)
    res = 512
    px, py = _grid_px(res)
    R = res * res
    key = jax.random.PRNGKey(0)
    pr = primary_rays(scene.camera, px + 0.5, py + 0.5, key)

    # realistic shadow segments: from the primary HIT POINTS to each light
    t, oid = packet_closest_hit(scene.packets, scene.prims, pr)
    hit = oid >= 0
    tt = jnp.where(hit, t, 1.0)
    hp = pr.origin + pr.direction * tt[:, None]
    lights = np.asarray(scene.lights.position)
    dirs = [jnp.asarray(lights[l])[None, :] - hp for l in range(3)]

    def sep(i, acc):
        o = hp + i.astype(jnp.float32) * 1e-6
        s = acc
        for l in range(3):
            s = s + packet_any_hit(scene.packets, scene.prims,
                                   Rays(o, dirs[l], pr.time), 1.0).sum()
        return s

    dt = loop_time(sep, jnp.float32(0.0), n_lo=1, n_hi=8, reps=3)
    out("balls_high 3x separate any-hit (hitpoint->light)", dt, 3 * R)

    def fused(i, acc):
        o = hp + i.astype(jnp.float32) * 1e-6
        return acc + packet_any_hit_multi(
            scene.packets, scene.prims, o, dirs, 1.0).sum()

    dt = loop_time(fused, jnp.float32(0.0), n_lo=1, n_hi=8, reps=3)
    out("balls_high fused 3-light any-hit (hitpoint->light)", dt, 3 * R)

    # end-to-end frame, sweep engine (bench.py's balls_high route): the
    # fused path is picked automatically by direct_lighting
    cfg = rt.RenderConfig(engine="sweep")

    def frame(i, acc):
        x = px + 0.37 * i.astype(jnp.float32)
        return acc + render_tile(scene, x, py, cfg, key).sum()

    dt = loop_time(frame, jnp.float32(0.0), n_lo=1, n_hi=6, reps=3)
    out("balls_high sweep frame (fused shadows)", dt, R * 4)


def part_b():
    import jax
    import jax.numpy as jnp

    import u_4a_2s_p3d_raytracer_template2_tpu as rt
    from u_4a_2s_p3d_raytracer_template2_tpu.accel.packets import (
        packet_any_hit,
        packet_closest_hit,
    )
    from u_4a_2s_p3d_raytracer_template2_tpu.core.types import Rays
    from u_4a_2s_p3d_raytracer_template2_tpu.models.whitted import (
        render_tile,
    )
    from u_4a_2s_p3d_raytracer_template2_tpu.ops.camera import primary_rays
    from u_4a_2s_p3d_raytracer_template2_tpu.utils.timing import loop_time

    sd = rt.parse_p3f(os.path.join(SCENES, "mount_high.p3f"))
    scene = rt.build_scene(sd, accel=2)
    res = 512
    px, py = _grid_px(res)
    R = res * res
    key = jax.random.PRNGKey(0)
    pr = primary_rays(scene.camera, px + 0.5, py + 0.5, key)

    def closest(i, acc):
        o = pr.origin + i.astype(jnp.float32) * 1e-6
        t, oid = packet_closest_hit(scene.packets, scene.prims,
                                    Rays(o, pr.direction, pr.time))
        return acc + t.sum()

    dt = loop_time(closest, jnp.float32(0.0), n_lo=1, n_hi=10, reps=3)
    out("mount_high packet closest (primary)", dt, R)

    t, oid = packet_closest_hit(scene.packets, scene.prims, pr)
    hit = oid >= 0
    hp = pr.origin + pr.direction * jnp.where(hit, t, 1.0)[:, None]
    lpos = jnp.asarray(np.asarray(scene.lights.position)[0])
    Lv = lpos[None, :] - hp

    def anyh(i, acc):
        o = hp + i.astype(jnp.float32) * 1e-6
        return acc + packet_any_hit(scene.packets, scene.prims,
                                    Rays(o, Lv, pr.time), 1.0).sum()

    dt = loop_time(anyh, jnp.float32(0.0), n_lo=1, n_hi=10, reps=3)
    out("mount_high packet any-hit (hitpoint->light)", dt, R)

    # NOTE: the sweep engine at depth 4 OOMs HBM on this scene (measured:
    # 16.24G needed of 15.75G — level 3 holds 2M ray slots x the 15-node
    # tree's buffers); the wavefront engine's compaction is what makes
    # mount_high fit. Kept out of the loop.
    for engine, depth, n_hi in (("wavefront", 1, 8), ("wavefront", 4, 6)):
        cfg = rt.RenderConfig(engine=engine, use_skybox=True,
                              max_depth=depth)

        def frame(i, acc, cfg=cfg):
            x = px + 0.37 * i.astype(jnp.float32)
            return acc + render_tile(scene, x, py, cfg, key).sum()

        dt = loop_time(frame, jnp.float32(0.0), n_lo=1, n_hi=n_hi, reps=3)
        out(f"mount_high {engine} frame depth={depth}", dt, R * 2)


def part_c():
    import jax
    import jax.numpy as jnp

    import u_4a_2s_p3d_raytracer_template2_tpu as rt
    from u_4a_2s_p3d_raytracer_template2_tpu.models import (
        whitted_megakernel as mk,
    )
    from u_4a_2s_p3d_raytracer_template2_tpu.utils.timing import loop_time

    for name in ("balls_low.p3f",):
        sd = rt.parse_p3f(os.path.join(SCENES, name))
        scene = rt.build_scene(sd)
        res = scene.camera.res_x
        px, py = _grid_px(res)
        R = res * res
        key = jax.random.PRNGKey(0)

        variants = (
            ("full distribution (spp4 x AA+DoF, skybox)", True, True),
            ("distribution, NO skybox (black miss)", True, False),
            ("single sample, skybox", False, True),
            ("single sample, no skybox", False, False),
        )
        for tag, dist, sky in variants:
            cfg = rt.RenderConfig(engine="megakernel", use_skybox=sky)
            if dist:
                cfg = cfg.with_scene_flags(scene)
            tile = mk.make_render_tile(scene, cfg)
            samples = 16 if dist else 1
            if tile.sky_operand is not None:
                def step(i, carry, tile=tile):
                    acc, so = carry
                    x = px + 0.37 * i.astype(jnp.float32)
                    return (acc + tile.inner(x, py, key, so).sum(), so)

                dt = loop_time(step, (jnp.float32(0.0), tile.sky_operand),
                               n_lo=1, n_hi=6 if dist else 30, reps=3)
            else:
                def step(i, acc, tile=tile):
                    x = px + 0.37 * i.astype(jnp.float32)
                    return acc + tile(x, py, key).sum()

                dt = loop_time(step, jnp.float32(0.0),
                               n_lo=1, n_hi=6 if dist else 30, reps=3)
            out(f"{name} {tag}", dt, R * samples * 4)


def part_e():
    """mount_high glue ablations: skybox on/off x depth, wavefront engine.
    Together with part_b's isolated traversal numbers this splits the
    261 ms frame into traversal / per-level sky gathers / rest."""
    import jax
    import jax.numpy as jnp

    import u_4a_2s_p3d_raytracer_template2_tpu as rt
    from u_4a_2s_p3d_raytracer_template2_tpu.models.whitted import (
        render_tile,
    )
    from u_4a_2s_p3d_raytracer_template2_tpu.utils.timing import loop_time

    sd = rt.parse_p3f(os.path.join(SCENES, "mount_high.p3f"))
    scene = rt.build_scene(sd, accel=2)
    res = 512
    px, py = _grid_px(res)
    R = res * res
    key = jax.random.PRNGKey(0)

    for depth, sky, n_hi in ((4, True, 6), (4, False, 6), (1, False, 8),
                             (2, True, 6), (2, False, 6)):
        cfg = rt.RenderConfig(engine="wavefront", use_skybox=sky,
                              max_depth=depth)

        def frame(i, carry, cfg=cfg):
            acc, s = carry
            x = px + 0.37 * i.astype(jnp.float32)
            return (acc + render_tile(s, x, py, cfg, key).sum(), s)

        dt = loop_time(frame, (jnp.float32(0.0), scene), n_lo=1, n_hi=n_hi,
                       reps=3)
        out(f"mount_high wavefront depth={depth} sky={sky}", dt, R * 2)


def part_s():
    """Isolated sky-lookup costs at R=512^2 (the 64-of-78 ms distribution
    sink from part_c): pure flat gather vs index math vs the full packed
    lookup vs the u8 3-channel lookup the wavefront engine uses."""
    import jax
    import jax.numpy as jnp

    import u_4a_2s_p3d_raytracer_template2_tpu as rt
    from u_4a_2s_p3d_raytracer_template2_tpu.ops.shade import (
        cubemap_index,
        pack_skybox_u32,
        skybox_color,
        skybox_color_packed,
    )
    from u_4a_2s_p3d_raytracer_template2_tpu.utils.timing import loop_time

    sd = rt.parse_p3f(os.path.join(SCENES, "balls_low.p3f"))
    scene = rt.build_scene(sd)
    sky_u8 = scene.skybox                       # [6,H,W,3] u8
    packed = pack_skybox_u32(sky_u8)            # [6,H,W] u32
    H, W = packed.shape[1], packed.shape[2]
    R = 512 * 512
    rng = np.random.default_rng(0)
    d0 = jnp.asarray(rng.normal(size=(R, 3)).astype(np.float32))

    def vary(i):
        c = jnp.cos(i.astype(jnp.float32) * 0.05)
        s = jnp.sin(i.astype(jnp.float32) * 0.05)
        return jnp.stack([d0[:, 0] * c - d0[:, 1] * s,
                          d0[:, 0] * s + d0[:, 1] * c, d0[:, 2]], -1)

    flat = packed.reshape(-1)
    idx0 = jnp.asarray(rng.integers(0, flat.shape[0], R).astype(np.int32))

    def g_flat(i, carry):
        acc, fl = carry
        ix = (idx0 + i) % fl.shape[0]
        return acc + fl[ix].astype(jnp.float32).sum(), fl

    dt = loop_time(g_flat, (jnp.float32(0.0), flat), n_lo=2, n_hi=12, reps=3)
    out(f"flat u32 gather {R} random rows from {flat.size*4>>20} MB", dt, R)

    def g_idx(i, acc):
        side, yp, xp = cubemap_index(vary(i), H, W)
        return acc + (side + yp + xp).astype(jnp.float32).sum()

    dt = loop_time(g_idx, jnp.float32(0.0), n_lo=2, n_hi=12, reps=3)
    out("cubemap_index math only", dt, R)

    def g_flatidx(i, carry):
        acc, fl = carry
        side, yp, xp = cubemap_index(vary(i), H, W)
        ix = (side * H + yp) * W + xp
        v = fl[ix]
        rgb = jnp.stack([(v >> 16) & 0xFF, (v >> 8) & 0xFF, v & 0xFF], -1)
        return acc + (rgb.astype(jnp.float32) / 255.99).sum(), fl

    dt = loop_time(g_flatidx, (jnp.float32(0.0), flat), n_lo=2, n_hi=12,
                   reps=3)
    out("packed lookup via SELF-COMPUTED flat index", dt, R)

    def g_packed(i, carry):
        acc, pk = carry
        return acc + skybox_color_packed(pk, vary(i)).sum(), pk

    dt = loop_time(g_packed, (jnp.float32(0.0), packed), n_lo=2, n_hi=12,
                   reps=3)
    out("skybox_color_packed (3-array fancy index)", dt, R)

    def g_u8(i, carry):
        acc, sk = carry
        return acc + skybox_color(sk, vary(i)).sum(), sk

    dt = loop_time(g_u8, (jnp.float32(0.0), sky_u8), n_lo=2, n_hi=12, reps=3)
    out("skybox_color u8 3-channel (wavefront per-level path)", dt, R)


def part_f():
    """mount_high sky anomaly bisect: the depth-4 frame pays ~114 ms for
    use_skybox=True yet the isolated per-level gather is ~2-4 ms (part_s)
    and gating dead-lane indices changed nothing (part_e after the fix).
    Variants: dummy 8x8 cubemap (same program, tiny table) -> is it the
    75 MB operand? depth=3 -> where does it explode?"""
    import dataclasses

    import jax
    import jax.numpy as jnp

    import u_4a_2s_p3d_raytracer_template2_tpu as rt
    from u_4a_2s_p3d_raytracer_template2_tpu.models.whitted import (
        render_tile,
    )
    from u_4a_2s_p3d_raytracer_template2_tpu.utils.timing import loop_time

    sd = rt.parse_p3f(os.path.join(SCENES, "mount_high.p3f"))
    scene = rt.build_scene(sd, accel=2)
    rng = np.random.default_rng(0)
    tiny = dataclasses.replace(
        scene, skybox=jnp.asarray(
            rng.integers(0, 256, (6, 8, 8, 3)).astype(np.uint8)))
    res = 512
    px, py = _grid_px(res)
    R = res * res
    key = jax.random.PRNGKey(0)

    for tag, scn, depth, sky in (
            ("real sky, depth=4 (post-barrier)", scene, 4, True),
            ("dummy 8x8 sky, depth=4", tiny, 4, True),
            ("real sky, depth=3", scene, 3, True),
            ("no sky, depth=3", scene, 3, False),
    ):
        cfg = rt.RenderConfig(engine="wavefront", use_skybox=sky,
                              max_depth=depth)

        def frame(i, carry, cfg=cfg):
            acc, s = carry
            x = px + 0.37 * i.astype(jnp.float32)
            return (acc + render_tile(s, x, py, cfg, key).sum(), s)

        dt = loop_time(frame, (jnp.float32(0.0), scn), n_lo=1, n_hi=6,
                       reps=3)
        out(f"mount_high wavefront {tag}", dt, R * 2)


def part_g():
    """mount_high queue-capacity sweep: levels >=2 are sparse after
    compaction, so a smaller static queue capacity means fewer packets per
    traversal. Checks losslessness (vs factor-1 image) before timing."""
    import jax
    import jax.numpy as jnp

    import u_4a_2s_p3d_raytracer_template2_tpu as rt
    from u_4a_2s_p3d_raytracer_template2_tpu.models.whitted import (
        render_tile,
    )
    from u_4a_2s_p3d_raytracer_template2_tpu.utils.timing import loop_time

    sd = rt.parse_p3f(os.path.join(SCENES, "mount_high.p3f"))
    scene = rt.build_scene(sd, accel=2)
    res = 512
    px, py = _grid_px(res)
    R = res * res
    key = jax.random.PRNGKey(0)

    ref_img = None
    for factor in (1.0, 0.5, 0.25):
        cfg = rt.RenderConfig(engine="wavefront", use_skybox=True,
                              wavefront_capacity=factor)

        @jax.jit
        def render(s, cfg=cfg):
            return render_tile(s, px, py, cfg, key)

        img = render(scene)  # stays on device (20 KB/s readback link)
        if factor == 1.0:
            ref_img = img
        else:
            ad = jnp.abs(img - ref_img).max(axis=-1)
            print(json.dumps({
                "what": f"capacity {factor} vs 1.0",
                "max_delta": float(ad.max()),
                "frac_gt_2e-3": float((ad > 2e-3).mean())}), flush=True)

        def frame(i, carry, cfg=cfg):
            acc, s = carry
            x = px + 0.37 * i.astype(jnp.float32)
            return (acc + render_tile(s, x, py, cfg, key).sum(), s)

        dt = loop_time(frame, (jnp.float32(0.0), scene), n_lo=1, n_hi=6,
                       reps=3)
        out(f"mount_high wavefront sky capacity={factor}", dt, R * 2)


def part_d():
    """Train-step optimization A/B (VERDICT r4 item 2): static freeze of
    unused parameter groups vs zero-scale-only."""
    import jax
    import jax.numpy as jnp

    import u_4a_2s_p3d_raytracer_template2_tpu as rt
    from u_4a_2s_p3d_raytracer_template2_tpu.models.scenes import mount_scene
    from u_4a_2s_p3d_raytracer_template2_tpu.models.whitted import (
        render_image,
    )
    from u_4a_2s_p3d_raytracer_template2_tpu.parallel.dist import (
        default_mesh,
        lr_scales,
        train_step_full,
    )
    from u_4a_2s_p3d_raytracer_template2_tpu.utils.timing import loop_time

    res = 512
    scene = rt.build_scene(mount_scene(res=res))
    mesh = default_mesh()
    key = jax.random.PRNGKey(0)
    target = render_image(scene, rt.RenderConfig())
    target.block_until_ready()

    for tag, engine, scales, freeze in (
            ("sweep, all groups live",
             "sweep", lr_scales(materials=1.0, light_pos=1.0,
                                camera=1.0, geometry=0.0), ()),
            ("wavefront, all groups live",
             "wavefront", lr_scales(materials=1.0, light_pos=1.0,
                                    camera=1.0, geometry=0.0), ()),
            ("wavefront, freeze geometry (static)",
             "wavefront", lr_scales(materials=1.0, light_pos=1.0,
                                    camera=1.0, geometry=0.0),
             ("geometry",)),
            ("megakernel fwd (custom_vjp), all groups live",
             "megakernel", lr_scales(materials=1.0, light_pos=1.0,
                                     camera=1.0, geometry=0.0), ()),
            ("sweep, freeze geometry+camera (static)",
             "sweep", lr_scales(materials=1.0, light_pos=1.0, camera=0.0,
                                geometry=0.0), ("geometry", "camera")),
            ("sweep, materials only (freeze rest)",
             "sweep", lr_scales(materials=1.0, light_pos=0.0, camera=0.0,
                                geometry=0.0), ("geometry", "camera",
                                                "lights")),
    ):
        cfg = rt.RenderConfig(engine=engine)

        def step(i, carry, cfg=cfg, scales=scales, freeze=freeze):
            s, _ = carry
            tgt = target + 1e-7 * i.astype(jnp.float32)
            s2, l2 = train_step_full(s, tgt, cfg, mesh, 0.01, key, scales,
                                     freeze)
            return (s2, l2)

        dt = loop_time(step, (scene, jnp.float32(0.0)), n_lo=2, n_hi=8,
                       reps=3)
        out(f"train_step_full mount_low 512^2: {tag}", dt, res * res * 2)


if __name__ == "__main__":
    from u_4a_2s_p3d_raytracer_template2_tpu.utils.profiling import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    parts = sys.argv[1:] or ["a", "b", "c", "d"]
    for p in parts:
        {"a": part_a, "b": part_b, "c": part_c, "d": part_d,
         "e": part_e, "f": part_f, "g": part_g, "s": part_s}[p]()
