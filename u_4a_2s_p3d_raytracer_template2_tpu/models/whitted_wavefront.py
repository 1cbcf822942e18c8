"""Compacted wavefront Whitted tracer — the level sweep without dead lanes.

The level sweep (models/whitted.py) allocates 2^l ray slots per level; on
real scenes almost all of them are inactive (mount_low measured: level-2
45%, level-3 5.7%, level-4 1.6% active — a 6.6x lane waste at depth 4).
This module exploits the linearity of the Whitted combine
``color = local + KR·specColor·refl + (1-KR)·refr`` (main.cpp:719): instead
of a backward fold over the full binary tree, each queue entry carries a
*throughput weight* (the product of fold coefficients along its path) and
adds ``weight · local`` straight into its pixel. Between rounds the child
candidates are stream-compacted (cumsum destinations, ``.at[].set(mode=
"drop")`` — no sort) into a fixed-capacity queue, so every round costs one
primary-batch's worth of lanes instead of 2^l.

Exactness: identical to the level sweep for deterministic configs — the
only nonlinearities in the reference recursion are the depth-cap clamp
(main.cpp:632-634), applied here on the final round, and the top-level
clamp in render_tile. Stochastic features (soft-shadow jitter) consume RNG
in a different order, so those match only in distribution.

On-chip standings (v5e, mount_low 512² depth-4): before the dense one-hot
gather fix (ops/intersect.gather_prims) the sweep won; after it, this engine
renders the frame in 86.8 ms vs the sweep's 101 ms — the 4x fewer lane-slots
now beat the compaction scatters. bench.py uses engine='wavefront'; the
library default stays 'sweep' (exact for every config, including the
stochastic ones where the wavefront only matches in distribution).

Capacity: ``ceil(R · capacity_factor)``. A child beyond capacity is dropped
(its throughput is lost). factor=1 is lossless whenever active children per
level never exceed the primary count — true for every corpus scene
(measured; level-2 actives = hit ∩ (Ks>0 ∪ T≠0) ≤ R by construction, and
deeper levels decay geometrically). Use factor=2 for a guaranteed-lossless
second level on pathological all-specular-all-transmissive scenes.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..core.types import RenderConfig, Rays, Scene
from . import whitted


def _interleave(a, b):
    return jnp.stack([a, b], axis=1).reshape((-1,) + a.shape[1:])


def trace_rays_wavefront(scene: Scene, rays: Rays, cfg: RenderConfig, key,
                         shadow_offsets=None,
                         capacity_factor: float = 1.0) -> jnp.ndarray:
    """Color for a batch of primary rays via the compacted wavefront. [R,3]"""
    R = rays.origin.shape[0]
    spawn_refl = scene.has_reflective
    spawn_refr = scene.has_transmissive
    out = jnp.zeros((R, 3), jnp.float32)

    # DEFERRED sky (cfg.wavefront_defer_sky, opt-in): every level shades
    # misses black and records (pixel, miss, weight, direction); one
    # post-loop epilogue does all the cubemap lookups. Built as a lever
    # against mount_high's +110 ms sky delta — measured NEUTRAL-to-worse
    # (272 vs 260 ms): the delta turned out to be an XLA scheduling
    # artifact of the no-sky program shape, not lookup cost (a
    # constant-sky ablation still measured ~255 ms, and no-sky depth 3 is
    # SLOWER than no-sky depth 4; tools/probe_sky_struct.py + bench_r5
    # parts e/f). Kept dispatchable + parity-tested
    # (test_wavefront_skybox_deferred_matches_sweep): only the f32 add
    # order changes vs the in-level form.
    defer_sky = bool(cfg.wavefront_defer_sky and cfg.use_skybox
                     and scene.has_skybox)
    sky_jobs = []  # (pix, miss, weight, directions)

    def sky_epilogue(acc):
        from ..ops import shade

        for pix, miss, w, dirs in sky_jobs:
            rgb = shade.skybox_color(scene.skybox, dirs, valid=miss)
            term = jnp.where(miss[:, None], w * rgb, 0.0)
            acc = acc.at[pix].add(term) if pix is not None else acc + term
        return acc

    if not (spawn_refl or spawn_refr) or cfg.max_depth <= 1:
        key, sub = jax.random.split(key)
        local, extra = whitted._level_step(
            scene, rays, jnp.ones((R,), bool), jnp.ones((R,), jnp.float32),
            cfg, sub, True, shadow_offsets, defer_sky=defer_sky)
        if defer_sky:
            _, fold = extra
            sky_jobs.append((None, fold["miss"],
                             jnp.ones((R, 3), jnp.float32), rays.direction))
            local = sky_epilogue(local)
        return local

    C = int(math.ceil(R * capacity_factor))

    # round-1 queue is the primary batch itself
    q_rays = rays
    q_active = jnp.ones((R,), bool)
    q_ior = jnp.ones((R,), jnp.float32)
    q_w = jnp.ones((R, 3), jnp.float32)
    q_pix = jnp.arange(R, dtype=jnp.int32)

    for lvl in range(cfg.max_depth):
        key, sub = jax.random.split(key)
        spawn = lvl < cfg.max_depth - 1
        step = whitted._level_step(scene, q_rays, q_active, q_ior, cfg, sub,
                                   spawn, shadow_offsets,
                                   defer_sky=defer_sky)
        local_color = step[0]  # local on hit, bg on miss, 0 inactive
        out = out.at[q_pix].add(q_w * local_color)
        if defer_sky:
            fold_like = step[1][1] if spawn else step[1]
            sky_jobs.append((q_pix, fold_like["miss"], q_w,
                             q_rays.direction))
        if not spawn:
            break

        children, fold = step[1]
        kr = fold["kr"][:, None]
        (refl_rays, refl_act, refl_ior) = children["refl"]
        (refr_rays, refr_act, refr_ior) = children["refr"]
        refl_w = q_w * kr * fold["spec_color"]
        refr_w = q_w * (1.0 - kr)
        # zero-throughput children contribute exactly nothing — don't queue
        refl_act = refl_act & (jnp.max(refl_w, axis=-1) > 0.0)
        refr_act = refr_act & (jnp.max(refr_w, axis=-1) > 0.0)

        if spawn_refl and spawn_refr:
            c_o = _interleave(refl_rays.origin, refr_rays.origin)
            c_d = _interleave(refl_rays.direction, refr_rays.direction)
            c_t = _interleave(refl_rays.time, refr_rays.time)
            c_act = _interleave(refl_act, refr_act)
            c_ior = _interleave(refl_ior, refr_ior)
            c_w = _interleave(refl_w, refr_w)
            c_pix = _interleave(q_pix, q_pix)
        elif spawn_refl:
            c_o, c_d, c_t = refl_rays.origin, refl_rays.direction, refl_rays.time
            c_act, c_ior, c_w, c_pix = refl_act, refl_ior, refl_w, q_pix
        else:
            c_o, c_d, c_t = refr_rays.origin, refr_rays.direction, refr_rays.time
            c_act, c_ior, c_w, c_pix = refr_act, refr_ior, refr_w, q_pix

        # stream compaction: cumsum destinations; inactive and overflow
        # lanes get index C which .at[...](mode="drop") discards. The whole
        # queue payload is packed into ONE [*, 12] block so the round costs a
        # single scatter instead of six (scatters carry a fixed per-op cost
        # on TPU on top of the per-element traffic).
        dest = jnp.cumsum(c_act.astype(jnp.int32)) - 1
        dest = jnp.where(c_act, jnp.minimum(dest, C), C)
        n_act = jnp.minimum(jnp.sum(c_act.astype(jnp.int32)), C)

        payload = jnp.concatenate(
            [c_o, c_d, c_t[:, None], c_ior[:, None], c_w,
             c_pix.astype(jnp.float32)[:, None]], axis=-1)  # [*, 12]
        # defaults on empty lanes: origin FAR outside every scene's world
        # box (finite 1e8 — no f32 overflow in the slab math even against
        # a 1e30 safe-inverse), unit +z direction, ior 1, zero weight.
        # A (0,0,0) origin sat INSIDE the corpus scenes' bounds, so dead
        # lanes did full packet-BVH walks at every level; pushed outside,
        # their packets miss the root box and exit after one iteration
        # (measured: dragon 256^2 depth-4 frame 149 -> 114 ms, balls_high
        # 512^2 378 -> 347 ms). Shading stays finite and is masked by
        # q_active as before.
        q_default = jnp.broadcast_to(
            jnp.array([1e8, 1e8, 1e8, 0, 0, 1, 0, 1, 0, 0, 0, 0],
                      jnp.float32), (C, 12))
        q = q_default.at[dest].set(payload, mode="drop")

        q_rays = Rays(q[:, 0:3], q[:, 3:6], q[:, 6])
        q_ior = q[:, 7]
        q_w = q[:, 8:11]
        # pixel ids round-trip exactly through f32 (ids < 2^24 — holds to
        # 4096x4096 frames even with refl/refr interleaving)
        q_pix = q[:, 11].astype(jnp.int32)
        q_active = jnp.arange(C, dtype=jnp.int32) < n_act

    if defer_sky:
        out = sky_epilogue(out)
    return out
