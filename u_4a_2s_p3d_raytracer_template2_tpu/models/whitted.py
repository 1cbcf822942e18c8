"""Whitted distribution ray tracer — the reference's rayTracing/renderScene
(main.cpp:530-832) re-architected as an iterative, fully-vectorized level
sweep over a static binary recursion tree.

Recursion → wavefront: depth-``D`` recursion with (reflection, refraction)
children becomes ``D`` levels; level ``l`` holds ``R·2^l`` ray slots (slot
``2i`` = reflection child, ``2i+1`` = refraction child of slot ``i``). The
forward sweep traces and locally shades each level; the backward sweep folds
children into parents with ``local + KR·specColor·refl + (1-KR)·refr``
(main.cpp:719). The in-repo GLSL iterative rayColor (P3D_RT.glsl:236-282) is
the reference's own proof this flattening preserves the capability
(SURVEY.md §3.3).

Everything is masked rather than branched: inactive slots trace with
direction (0,0,1) and contribute zero. Static shapes throughout — XLA sees
one straight-line program per level.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..core import constants as C
from ..core.types import (
    RenderConfig,
    Rays,
    Scene,
    clamp01,
    dot,
    normalize,
)
from ..ops import intersect, shade
from ..ops.camera import primary_rays
from ..ops.sampling import sample_unit_disk

_EPS = C.EPSILON


# ---------------------------------------------------------------------------
# closest-hit dispatch


def _bvh_impl(scene: Scene, cfg: RenderConfig = None) -> str:
    """Resolve the BVH-mode traversal implementation (RenderConfig.accel_impl).

    "auto" picks the packet-BVH Pallas kernel on TPU backends when the scene
    carries packet tables (the measured winner on large scenes — see
    docs/ARCHITECTURE.md), and the XLA cluster sweeps everywhere else
    (CPU tests, virtual meshes, scenes too small for a tree)."""
    impl = getattr(cfg, "accel_impl", "auto") if cfg is not None else "auto"
    if impl in ("auto", "multi"):
        # "multi" only opts shadow queries into the fused multi-light
        # kernel (_shadow_multi_rows); closest-hit routes like "auto"
        if scene.packets is not None and jax.default_backend() == "tpu":
            return "packets"
        return "clusters"
    return impl


def trace_closest(scene: Scene, rays: Rays, cfg: RenderConfig = None):
    """Closest hit via the scene's accelerator; returns (t, obj_id).

    Traversal indices are discrete (gradients stop there); shading re-derives
    t differentiably from the gathered winner primitive (see whitted level
    step below), mirroring the custom-VJP split of SURVEY.md §7.
    """
    if scene.accel_type == C.ACCEL_BVH:
        impl = _bvh_impl(scene, cfg)
        if impl == "packets" and scene.packets is not None:
            from ..accel.packets import packet_closest_hit

            return packet_closest_hit(scene.packets, scene.prims, rays)
        if impl == "perray" and scene.bvh is not None:
            from ..accel.traverse import bvh_closest_hit

            return bvh_closest_hit(scene.bvh, scene.prims, rays)
        if impl != "brute" and scene.clusters is not None:
            from ..accel.clusters import clustered_closest_hit

            return clustered_closest_hit(scene.clusters, scene.prims, rays)
    if scene.accel_type == C.ACCEL_GRID and scene.grid is not None:
        # On TPU, grid mode ROUTES to the packet-BVH kernel when the scene
        # carries packet tables: the vmapped per-ray DDA runs all rays to
        # the worst trip count and gathers cell lists per iteration —
        # measured 100x+ slower than the packet walk on mount_high (see
        # tools/bench_grid.py / docs/ARCHITECTURE.md). Both paths return
        # the physical closest hit, so images are identical.
        # accel_impl="perray" forces the real DDA (its cost stays
        # measurable, not dead weight); "brute" skips the grid entirely
        # (geometry fits: accel tables hold stale geometry).
        impl = _bvh_impl(scene, cfg)
        if (impl not in ("perray", "brute") and scene.packets is not None
                and jax.default_backend() == "tpu"):
            from ..accel.packets import packet_closest_hit

            return packet_closest_hit(scene.packets, scene.prims, rays)
        if impl != "brute":
            from ..accel.traverse import grid_closest_hit

            return grid_closest_hit(scene.grid, scene.prims, rays)
    return intersect.closest_hit_brute(scene.prims, rays)


def trace_shadow(scene: Scene, rays: Rays, max_t, cfg: RenderConfig = None,
                 dead=None):
    """Any-hit occlusion via the scene's accelerator — every path is a
    dedicated early-exit shadow traversal (bvh.cpp:348-416 /
    grid.cpp:313-361 capability), never a closest-hit.

    ``dead`` [R] bool marks lanes whose result the caller masks downstream
    (inactive wavefront entries, back-facing N·L<=0 lanes): the packet
    kernel reports them occluded WITHOUT traversing, so all-dead packets
    early-exit instantly. Measured: free to apply, but no frame-level win
    on balls_high — compaction keeps queues alive-dense, so whole-dead
    packets are rare there (docs/ARCHITECTURE.md round-4 #14). Only the
    packet path exploits it; other impls ignore the hint.
    """
    if scene.accel_type == C.ACCEL_BVH:
        impl = _bvh_impl(scene, cfg)
        if impl == "packets" and scene.packets is not None:
            from ..accel.packets import packet_any_hit

            return packet_any_hit(scene.packets, scene.prims, rays,
                                  float(max_t), dead=dead)
        if impl == "perray" and scene.bvh is not None:
            from ..accel.traverse import bvh_any_hit

            return bvh_any_hit(scene.bvh, scene.prims, rays, max_t)
        if impl != "brute" and scene.clusters is not None:
            from ..accel.clusters import clustered_any_hit

            return clustered_any_hit(scene.clusters, scene.prims, rays,
                                     max_t)
    if scene.accel_type == C.ACCEL_GRID and scene.grid is not None:
        initfail = bool(cfg.reference_grid_shadow_initfail) if cfg else False
        # same TPU routing as trace_closest — EXCEPT when the reference's
        # init-failure quirk is requested, which only the real DDA models
        impl = _bvh_impl(scene, cfg)
        if (not initfail and impl not in ("perray", "brute")
                and scene.packets is not None
                and jax.default_backend() == "tpu"):
            from ..accel.packets import packet_any_hit

            return packet_any_hit(scene.packets, scene.prims, rays,
                                  float(max_t), dead=dead)
        if impl != "brute" or initfail:
            from ..accel.traverse import grid_any_hit

            return grid_any_hit(scene.grid, scene.prims, rays, max_t,
                                init_fail_occludes=initfail)
    return intersect.any_hit_brute(scene.prims, rays, max_t)


# ---------------------------------------------------------------------------
# direct lighting (processLight + the soft-shadow variants, main.cpp:593-630)


def _shadow_multi_rows(scene: Scene, cfg: RenderConfig, hit_point, precise,
                       normal, active, rays: Rays, n_lights: int):
    """[L, R] occlusion via the fused multi-query any-hit kernel
    (accel/packets.packet_any_hit_multi) — OPT-IN via
    ``accel_impl="multi"``, measured SLOWER than per-light stack walks on
    the scene it targeted: balls_high hitpoint->light queries run 53 ms as
    3 separate walks vs 169 ms fused (tools/bench_r5.py, v5e). The static
    chunk unroll pays ~0.6 us of slab+guard machinery for each of its
    72 chunks x 3 lights on EVERY packet, while the stack walk's
    whole-packet early exit (all 256 lanes occluded -> stop) finishes most
    from-inside-the-cloud packets in ~25 node visits per light. Kept
    dispatchable + tested so the negative result stays measurable
    (VERDICT r4 #3 lever, tried and rejected)."""
    if getattr(cfg, "accel_impl", "auto") != "multi":
        return None
    if n_lights < 2 or scene.n_lights < 2:
        return None
    if scene.accel_type not in (C.ACCEL_BVH, C.ACCEL_GRID):
        return None
    if scene.packets is None or jax.default_backend() != "tpu":
        return None
    impl = _bvh_impl(scene, cfg)
    if impl in ("perray", "brute", "clusters"):
        return None
    if (scene.accel_type == C.ACCEL_GRID and cfg is not None
            and cfg.reference_grid_shadow_initfail):
        return None  # only the real DDA models the init-failure quirk
    from ..accel.packets import multi_supported, packet_any_hit_multi

    if not multi_supported(scene.packets):
        return None
    Lvs = []
    deads = []
    for li in range(n_lights):
        Lv = scene.lights.position[li][None, :] - hit_point
        Lvs.append(Lv)
        deads.append(~(active & (dot(Lv, normal) > 0.0)))
    max_t = C.BIG if cfg.shadow_unbounded else 1.0
    return packet_any_hit_multi(scene.packets, scene.prims, precise, Lvs,
                                float(max_t), dead=deads)


def direct_lighting(scene: Scene, rays: Rays, hit_point, precise, normal,
                    mat: shade.MatView, active, cfg: RenderConfig, key,
                    shadow_offsets=None):
    color = jnp.zeros_like(hit_point)
    n_lights = max(scene.n_lights, 1)

    multi_occ = None
    if not cfg.soft_shadow:
        multi_occ = _shadow_multi_rows(scene, cfg, hit_point, precise,
                                       normal, active, rays, n_lights)

    for li in range(n_lights):
        lpos = scene.lights.position[li]
        lcol = scene.lights.color[li][None, :]

        def one_sample(position, light_color, occluded=None, li=li):
            Lv = position - hit_point  # unnormalized (main.cpp:627)
            facing = dot(Lv, normal) > 0.0
            if occluded is None:
                shadow_rays = Rays(precise, Lv, rays.time)
                max_t = C.BIG if cfg.shadow_unbounded else 1.0
                # lanes whose contribution is masked below need no traversal
                occluded = trace_shadow(scene, shadow_rays, max_t, cfg,
                                        dead=~(active & facing))
            lit = active & facing & ~occluded
            return shade.blinn_phong(Lv, lit, light_color, mat,
                                     rays.direction, normal)

        if cfg.soft_shadow and not cfg.anti_aliasing:
            # 4x4 grid of light positions, each 1/16 of the color
            # (main.cpp:601-618): spacing 0.125, start at pos - 0.25.
            shadow_w = 0.5
            distance = shadow_w / 4.0
            start = -distance * shadow_w * 4.0
            avg_col = lcol / 16.0
            for i in range(4):
                for j in range(4):
                    off = jnp.array(
                        [start + j * distance, start + i * distance, 0.0],
                        jnp.float32,
                    )
                    color += one_sample(lpos[None, :] + off, avg_col)
        elif cfg.soft_shadow and cfg.anti_aliasing:
            # jittered single sample tied to the AA subpixel indices
            # (main.cpp:621-624)
            key, sub = jax.random.split(key)
            spp = max(cfg.spp, 1)
            r2 = jax.random.uniform(sub, hit_point.shape[:-1] + (2,), jnp.float32)
            ox, oy = shadow_offsets if shadow_offsets is not None else (0.0, 0.0)
            jx = 0.5 * ((ox + r2[..., 0]) / spp)
            jy = 0.5 * ((oy + r2[..., 1]) / spp)
            pos = (lpos[None, :]
                   + jnp.stack([jx, jy, jnp.zeros_like(jx)], axis=-1))
            color += one_sample(pos, lcol)
        else:
            color += one_sample(
                lpos[None, :], lcol,
                occluded=None if multi_occ is None else multi_occ[li])
    return color


# ---------------------------------------------------------------------------
# one recursion level


def _level_step(scene: Scene, rays: Rays, active, ior_in, cfg: RenderConfig,
                key, spawn: bool, shadow_offsets=None, defer_sky=False):
    """Trace + locally shade one level; optionally emit children.

    Returns (local_color, miss_color_mask, KR, spec_color, child rays/masks).

    ``defer_sky``: miss lanes shade BLACK here and the caller adds the
    skybox term itself from the returned ``miss`` mask (spawn levels:
    ``fold["miss"]``; leaf levels: the second return is ``{"miss": ...}``).
    The wavefront engine uses this to keep every level's program free of
    gather ops and evaluate all sky lookups in one post-loop epilogue —
    the per-level lookups measured ~4-6 ms each, but their presence also
    cost the depth-4 mount_high program ~90 ms of XLA scheduling luck
    (tools/bench_r5.py parts e/f: 145 ms without sky vs 253 ms with a
    DUMMY 8x8 cubemap)."""
    R = rays.origin.shape[0]
    t_disc, obj_id = trace_closest(scene, rays, cfg)
    obj_id = jax.lax.stop_gradient(obj_id)
    hit = active & (obj_id >= 0)

    params, ptype, mat_id = intersect.gather_prims(scene.prims, obj_id)
    # static type presence prunes absent-type formulas from the jit program
    present = (scene.prims.n_sph > 0, scene.prims.n_tri > 0,
               scene.prims.n_pl > 0, scene.prims.n_box > 0)
    # differentiable re-intersection of the winner primitive
    t = intersect.per_ray_t(params, ptype, rays.origin, rays.direction,
                            present)
    # borderline hits (tangential spheres, ε-edge triangles) can be accepted
    # by the traversal's formula but rejected by the re-derivation under f32
    # re-association; t would then be BIG and the hit point ~1e30, whose
    # square overflows to inf downstream — masked in the forward pass but a
    # NaN factory in reverse (0·inf cotangents). Fall back to the discrete
    # winner t for those lanes (their gradient is unbounded at the tangency
    # anyway, so dropping it is the correct smooth-gradient semantics).
    t = jnp.where(t >= C.BIG, jax.lax.stop_gradient(t_disc), t)
    t = jnp.where(hit, t, 1.0)

    hit_point = rays.origin + rays.direction * t[:, None]
    # The reference evaluates the normal at the hit point and AGAIN at the
    # ε-offset point (main.cpp:587-589), but the two are mathematically
    # identical for every primitive type: sphere — p+εn̂−c is parallel to
    # p−c; triangle/plane — stored constant normal; aaBox — depends only on
    # (o, d), not the query point. One evaluation suffices (saves a full
    # per_ray_normal pass per level; VERDICT r1 weak #5).
    normal = normalize(
        intersect.per_ray_normal(params, ptype, hit_point, rays.origin,
                                 rays.direction, present), eps=1e-20)
    precise = hit_point + normal * _EPS

    mat = shade.gather_materials(scene.materials, mat_id)

    key, klight = jax.random.split(key)
    local = direct_lighting(scene, rays, hit_point, precise, normal, mat,
                            hit, cfg, klight, shadow_offsets)

    # miss color: flat background, or skybox lookup when wired in
    # (main.cpp:581-584; capability per BASELINE config #4). Hit lanes'
    # texel reads are clamped to index 0 (their bg is discarded): deep
    # levels' refraction-scattered directions otherwise turn the per-level
    # gather into random access over the whole cubemap (see skybox_color).
    miss = active & (obj_id < 0)
    if defer_sky:
        bg = jnp.zeros_like(local)
    elif cfg.use_skybox and scene.has_skybox:
        bg = shade.skybox_color(scene.skybox, rays.direction, valid=miss)
    else:
        bg = jnp.broadcast_to(scene.bg_color[None, :], local.shape)

    if not spawn:
        # depth == MAX_DEPTH leaf: clamp local color (main.cpp:632-634)
        color = jnp.where(hit[:, None], clamp01(local), 0.0)
        color = jnp.where(miss[:, None], bg, color)
        return color, {"miss": miss}

    # flip the normal for secondary-ray math only (main.cpp:639-643)
    inside = dot(rays.direction, normal) > 0.0
    nf = jnp.where(inside[:, None], -normal, normal)

    # reflection child (main.cpp:646-667)
    refl_dir = shade.reflect_dir(rays.direction, nf)
    refl_dir = normalize(refl_dir, eps=1e-20)
    if cfg.fuzzy_reflection:
        key, kf = jax.random.split(key)
        refl_dir = shade.fuzzy_reflect_dir(kf, refl_dir, nf, cfg.roughness)
    refl_active = hit & (mat.ks > 0.0)
    refl_rays = Rays(precise, refl_dir, rays.time)

    # refraction child (main.cpp:671-697)
    ro = shade.refract(rays.direction, nf, inside, ior_in, mat.ior,
                       cfg.refraction_mode)
    refr_active = hit & (mat.transmit != 0.0) & ro.can_refract
    # sanitize inactive lanes: a non-finite direction would still poison
    # gradients through the downstream masking (0·inf = NaN in cotangents)
    default_dir = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 1.0], jnp.float32), ro.direction.shape)
    refr_dir = jnp.where(refr_active[:, None], ro.direction, default_dir)
    refr_origin = jnp.where(refr_active[:, None],
                            hit_point + refr_dir * 0.001, precise)
    refr_rays = Rays(refr_origin, refr_dir, rays.time)

    kr = shade.fresnel_kr(ro, ior_in, mat.transmit, mat.ks, cfg.fresnel_mode)

    local_color = jnp.where(hit[:, None], local, 0.0)
    local_color = jnp.where(miss[:, None], bg, local_color)

    children = dict(
        refl=(refl_rays, refl_active, ior_in),
        refr=(refr_rays, refr_active, ro.new_ior),
    )
    fold = dict(kr=kr, spec_color=mat.spec_color, hit=hit, miss=miss)
    return local_color, (children, fold)


def _interleave(a, b):
    """[R,...],[R,...] -> [2R,...] with a at even, b at odd slots."""
    return jnp.stack([a, b], axis=1).reshape((-1,) + a.shape[1:])


def trace_rays(scene: Scene, rays: Rays, cfg: RenderConfig, key,
               shadow_offsets=None) -> jnp.ndarray:
    """Color for a batch of primary rays — the full Whitted tree. [R,3]

    Subtrees that can never activate are pruned statically: reflection
    children exist only if some material has Ks>0 (main.cpp:646), refraction
    children only if some material has T!=0 (main.cpp:671). A diffuse-only
    scene therefore traces one level; a reflective-only scene traces a
    depth-D chain (D·R slots) instead of the full binary tree (2^D·R slots).
    """
    R = rays.origin.shape[0]
    spawn_refl = scene.has_reflective
    spawn_refr = scene.has_transmissive

    if not (spawn_refl or spawn_refr):
        # no secondary rays possible: single unclamped local+bg level
        key, sub = jax.random.split(key)
        local_color, _ = _level_step(scene, rays, jnp.ones((R,), bool),
                                     jnp.ones((R,), jnp.float32), cfg, sub,
                                     True, shadow_offsets)
        return local_color

    levels = []
    cur_rays = rays
    cur_active = jnp.ones((R,), bool)
    cur_ior = jnp.ones((R,), jnp.float32)

    for lvl in range(cfg.max_depth):
        key, sub = jax.random.split(key)
        spawn = lvl < cfg.max_depth - 1
        out = _level_step(scene, cur_rays, cur_active, cur_ior, cfg, sub,
                          spawn, shadow_offsets)
        if spawn:
            local_color, (children, fold) = out
            levels.append((local_color, fold))
            (refl_rays, refl_act, refl_ior) = children["refl"]
            (refr_rays, refr_act, refr_ior) = children["refr"]
            if spawn_refl and spawn_refr:
                cur_rays = Rays(
                    _interleave(refl_rays.origin, refr_rays.origin),
                    _interleave(refl_rays.direction, refr_rays.direction),
                    _interleave(refl_rays.time, refr_rays.time),
                )
                cur_active = _interleave(refl_act, refr_act)
                cur_ior = _interleave(refl_ior, refr_ior)
            elif spawn_refl:
                cur_rays, cur_active, cur_ior = refl_rays, refl_act, refl_ior
            else:
                cur_rays, cur_active, cur_ior = refr_rays, refr_act, refr_ior
            # shadow_offsets are the reference's global (i, j) subpixel
            # indices (main.cpp:779-780): identical at every recursion level,
            # so they pass through unchanged as scalars.
        else:
            leaf_color = out[0]

    # backward fold: children -> parents (main.cpp:719)
    child_color = leaf_color
    for local_color, fold in reversed(levels):
        if spawn_refl and spawn_refr:
            refl = child_color[0::2]
            refr = child_color[1::2]
        elif spawn_refl:
            refl = child_color
            refr = 0.0
        else:
            refl = 0.0
            refr = child_color
        kr = fold["kr"][:, None]
        combined = (local_color
                    + refl * kr * fold["spec_color"]
                    + refr * (1.0 - kr))
        # only hits spawn children; misses keep their bg color untouched
        child_color = jnp.where(fold["hit"][:, None], combined, local_color)
    return child_color


# ---------------------------------------------------------------------------
# pixel loop (renderScene, main.cpp:732-832)


def _trace_fn(cfg: RenderConfig):
    if cfg.engine == "megakernel":
        # render_tile sees the scene as a traced pytree: the operand-STREAMED
        # megakernel (models/whitted_streamed.py) serves exactly that case —
        # scene tables ride as SMEM operands, custom_vjp makes it
        # differentiable — so sharded renders (parallel/dist.py) and fit
        # forwards run at megakernel speed. Scenes over the unroll ceiling,
        # and non-TPU backends (unless megakernel_interpret explicitly opts
        # into interpret mode for tests/dryruns), degrade to wavefront.
        from .whitted_streamed import supports as _ws_supports
        from .whitted_streamed import trace_rays_streamed

        def fn(scene, rays, cfg, key, shadow_offsets=None):
            if _ws_supports(scene, cfg) and (
                    cfg.megakernel_interpret
                    or jax.default_backend() == "tpu"):
                return trace_rays_streamed(scene, rays, cfg, key,
                                           shadow_offsets)
            from .whitted_wavefront import trace_rays_wavefront

            return trace_rays_wavefront(
                scene, rays, cfg, key, shadow_offsets,
                capacity_factor=cfg.wavefront_capacity)
        return fn
    if cfg.engine == "wavefront":
        from .whitted_wavefront import trace_rays_wavefront

        def fn(scene, rays, cfg, key, shadow_offsets=None):
            return trace_rays_wavefront(
                scene, rays, cfg, key, shadow_offsets,
                capacity_factor=cfg.wavefront_capacity)
        return fn
    if cfg.engine != "sweep":
        raise ValueError(f"unknown engine {cfg.engine!r}")
    return trace_rays


def render_tile(scene: Scene, px, py, cfg: RenderConfig, key) -> jnp.ndarray:
    """Render a flat batch of pixel centers px,py -> [R,3] colors in [0,1]."""
    R = px.shape[0]
    trace = _trace_fn(cfg)
    if not cfg.anti_aliasing:
        key, kcam, ktrace = jax.random.split(key, 3)
        rays = primary_rays(scene.camera, px + 0.5, py + 0.5, kcam,
                            depth_of_field=cfg.depth_of_field,
                            motion_blur=cfg.motion_blur)
        color = clamp01(trace(scene, rays, cfg, ktrace))
        return color

    # spp*spp jittered subpixels (main.cpp:777-798), folded into a lax.scan so
    # the compiled program stays one-sample-sized regardless of spp.
    spp = max(cfg.spp, 1)
    ij = jnp.array(
        [(float(i), float(j)) for i in range(spp) for j in range(spp)],
        jnp.float32,
    )
    keys = jax.random.split(key, spp * spp)

    def body(acc, inp):
        (i, j), k = inp
        kj, kcam, ktrace = jax.random.split(k, 3)
        r2 = jax.random.uniform(kj, (R, 2), jnp.float32)
        sx = px + (i + r2[:, 0]) / spp
        sy = py + (j + r2[:, 1]) / spp
        rays = primary_rays(scene.camera, sx, sy, kcam,
                            depth_of_field=cfg.depth_of_field,
                            motion_blur=cfg.motion_blur)
        offsets = (i, j)  # the reference's global subpixel indices
        acc = acc + clamp01(trace(scene, rays, cfg, ktrace, offsets))
        return acc, None

    color, _ = jax.lax.scan(body, jnp.zeros((R, 3), jnp.float32), (ij, keys))
    # reference divides by 4*4 regardless of spp (main.cpp:800)
    denom = 16.0 if cfg.reference_aa_div16 else float(spp * spp)
    return color / denom


render_tile_jit = jax.jit(render_tile, static_argnums=(3,))


def render_image(scene: Scene, cfg: RenderConfig, key=None, *,
                 tile_rows: int = 0) -> jnp.ndarray:
    """Full-frame render -> [res_y, res_x, 3] float image in [0,1].

    Row y=0 is the bottom scanline, as in the reference's framebuffer
    (main.cpp:749-805 fills bottom-up; DevIL saves lower-left origin).
    """
    cam = scene.camera
    if key is None:
        key = jax.random.PRNGKey(0)
    ys, xs = jnp.meshgrid(
        jnp.arange(cam.res_y, dtype=jnp.float32),
        jnp.arange(cam.res_x, dtype=jnp.float32),
        indexing="ij",
    )
    px = xs.reshape(-1)
    py = ys.reshape(-1)

    tile_fn = None
    if cfg.engine == "megakernel":
        # scene-baked Pallas megakernel when the (scene, cfg) qualifies;
        # otherwise degrade to the wavefront engine (same images for the
        # deterministic configs the megakernel serves)
        import dataclasses as _dc

        from . import whitted_megakernel as mk

        if mk.supports(scene, cfg) and jax.default_backend() == "tpu":
            tile_fn = mk.make_render_tile(scene, cfg)
        else:
            cfg = _dc.replace(cfg, engine="wavefront")

    n = cam.res_y * cam.res_x
    tile = n if tile_rows <= 0 else tile_rows * cam.res_x
    chunks = []
    for start in range(0, n, tile):
        key, sub = jax.random.split(key)
        end = min(start + tile, n)
        if tile_fn is not None:
            chunks.append(tile_fn(px[start:end], py[start:end], sub))
        else:
            chunks.append(render_tile_jit(scene, px[start:end],
                                          py[start:end], cfg, sub))
    return jnp.concatenate(chunks, axis=0).reshape(cam.res_y, cam.res_x, 3)
