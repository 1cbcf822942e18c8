"""Operand-STREAMED Whitted megakernel — the baked kernel's recursion tree
(models/whitted_megakernel.py) with the scene arriving as SMEM *operands*
instead of immediate constants.

Why a second megakernel exists (VERDICT r4 top item): the baked kernel keys
its compile on the scene's VALUES, so it cannot serve

  (a) the multi-chip path — under ``shard_map`` the scene is a traced pytree
      (parallel/dist.py ships it as an `in_specs=P()` replicated operand);
      the baked engine had to degrade to the wavefront engine there, a 32x
      cliff the moment a render scaled out (61.8 ms vs 1.9 ms on mount_low);
  (b) the differentiable path — gradients cannot flow through baked
      immediates, so ``fit`` forwarded through the ~50x-slower sweep engine.

The kernel keeps the exact same unrolled recursion tree (it *reuses*
``whitted_megakernel._node`` and friends), but every scene number is a
scalar read from a small SMEM table:

  * one flat f32 table ``[N x 23]`` — 12 primitive params (core/types.py
    layout) + 11 pre-gathered material fields per primitive, type-grouped in
    the baked kernel's (TRIANGLE, SPHERE, PLANE, AABOX) order;
  * one ``[L x 6]`` light table and the ``[3]`` background color.

Static *structure* (per-type counts, light count, the material-population
facts that prune subtrees) comes from the Scene pytree's static meta fields,
so ONE compile serves every scene of the same shape — a geometry/material
fit re-uses the compiled kernel across steps, where the baked kernel would
recompile per step (60-120 s each through the remote-compile tunnel).
Measured (v5e, mount_low 512² depth 4): streamed 2.08 ms vs baked 1.93 ms —
the SMEM scalar reads cost ~8%; the sharded frame drops 61.8 -> 2.15 ms.

Differentiability: the trace is wrapped in ``jax.custom_vjp``. The forward
is the Pallas kernel (+ the deferred-sky epilogue); the backward runs
``jax.vjp`` of a *twin*: the tested SWEEP engine (``whitted.trace_rays``)
evaluated on a Scene pytree RECONSTRUCTED from the very same operand tables
(grouped order, accel-free brute traversal — exactly the kernel's
semantics). The sweep redraws the identical stochastic sample values from
the same key (``_draw_stream`` mirrors its ``jax.random`` chain split for
split — the established baked-kernel property), so the twin computes the
same function and its VJP is the correct gradient. Crucially the sweep is
VECTORIZED — its VJP compiles like the normal train step. (A first design
used a scalar-unrolled twin structurally identical to the kernel; its
XLA graph was ~30x larger and the train-step compile ran for tens of
minutes on both CPU and the TPU tunnel. Kept out; do not resurrect.)

Deferred-sky (skybox-on-miss) runs the baked kernel's scheme (misses shade
black + weight/direction rows, cubemap gather in an XLA epilogue — see
whitted_megakernel's module doc); here the epilogue lives INSIDE the
custom_vjp so the twin (whose sweep consumes the cubemap directly) matches
the forward's final color.

Reference semantics served: the full rayTracing/processLight recursion
(main.cpp:471-721) in every RenderConfig, exactly like the baked kernel —
pinned elementwise against the sweep engine by tests/test_streamed.py.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as onp

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import constants as C
from . import whitted_megakernel as mk

SUB = mk.SUB
LANE = mk.LANE

# same unroll budget as the baked kernel (compile time scales identically)
STREAM_MAX_PRIMS = mk.BAKE_MAX_PRIMS

TBL_W = 23  # 12 params + diff(3) spec(3) kd ks shine transmit ior


class _StaticShape(NamedTuple):
    """Everything the kernel needs to know at COMPILE time — all of it
    derivable from the Scene pytree's static meta fields, none of it scene
    values. Duck-types as `consts` for whitted_megakernel's layout helpers
    (_stream_layout/_sky_layout/_draw_stream use only these facts)."""

    n_tri: int
    n_sph: int
    n_pl: int
    n_box: int
    n_lights: int
    has_refl: bool
    has_refr: bool
    has_sky: bool

    @property
    def n(self):
        return self.n_tri + self.n_sph + self.n_pl + self.n_box

    @property
    def lights(self):  # len() is all the layout helpers use
        return (None,) * self.n_lights


def shape_of(scene, cfg=None) -> _StaticShape:
    has_sky = bool(scene.has_skybox)
    if cfg is not None:
        has_sky = has_sky and bool(cfg.use_skybox)
    return _StaticShape(
        n_tri=scene.prims.n_tri, n_sph=scene.prims.n_sph,
        n_pl=scene.prims.n_pl, n_box=scene.prims.n_box,
        n_lights=scene.n_lights,
        has_refl=bool(scene.has_reflective),
        has_refr=bool(scene.has_transmissive),
        has_sky=has_sky,
    )


def supports(scene, cfg) -> bool:
    """Same envelope as the baked kernel: every RenderConfig up to the
    unroll ceiling."""
    return 0 < scene.n_objects <= STREAM_MAX_PRIMS


def scene_tables(scene):
    """Differentiable [N*23] / [L*6] / [3] operand views of the scene.

    Built from the pre-gathered per-type tables (core/build.py `group`) in
    the baked kernel's type order, so cross-type closest-hit ties break
    identically. Gradients flow back to prims.params (via the
    with_prim_params views), materials, and lights.
    """
    p = scene.prims
    m = scene.materials

    def mat_block(ids):
        mi = p.mat_id[jnp.maximum(ids, 0)]
        return jnp.concatenate([
            m.diff_color[mi], m.spec_color[mi], m.kd[mi][:, None],
            m.ks[mi][:, None], m.shine[mi][:, None],
            m.transmit[mi][:, None], m.ior[mi][:, None]], axis=-1)

    segs = []
    for tp, ids, n, width in ((p.tri_p, p.tri_ids, p.n_tri, 12),
                              (p.sph_p, p.sph_ids, p.n_sph, 4),
                              (p.pl_p, p.pl_ids, p.n_pl, 4),
                              (p.box_p, p.box_ids, p.n_box, 6)):
        if n == 0:
            continue
        pr = tp[:n]
        if width < 12:
            pr = jnp.concatenate(
                [pr, jnp.zeros((n, 12 - width), jnp.float32)], axis=-1)
        segs.append(jnp.concatenate([pr, mat_block(ids[:n])], axis=-1))
    tbl = jnp.concatenate(segs, axis=0).reshape(-1)
    L = max(1, scene.n_lights)
    lt = jnp.concatenate([scene.lights.position[:L],
                          scene.lights.color[:L]], axis=-1).reshape(-1)
    return tbl, lt, jnp.asarray(scene.bg_color, jnp.float32)


def _round_up(n, m):
    return max(m, ((n + m - 1) // m) * m)


def reconstruct_scene(shape: _StaticShape, tbl, lt, bg, skybox):
    """Grouped-order Scene pytree rebuilt from the operand tables — the
    backward twin's view. Accel-free (brute traversal == the kernel's
    unrolled closest hit); materials become a one-row-per-primitive table
    with mat_id = arange, so every gradient lands back in `tbl`."""
    import dataclasses as _dc

    from ..core.types import (Camera, Lights, Materials, Primitives, Scene)
    from ..ops.mxu_intersect import triangle_functionals_jnp

    N = shape.n
    tblm = tbl.reshape(N, TBL_W)
    params12 = tblm[:, :12]
    Npad = _round_up(N, 8)
    pad = Npad - N
    params = (jnp.concatenate(
        [params12, jnp.zeros((pad, 12), jnp.float32)]) if pad else params12)
    codes = ([C.TRIANGLE] * shape.n_tri + [C.SPHERE] * shape.n_sph
             + [C.PLANE] * shape.n_pl + [C.AABOX] * shape.n_box
             + [C.INVALID] * pad)
    ptype = jnp.asarray(onp.array(codes, onp.int32))
    mat_id = jnp.arange(Npad, dtype=jnp.int32) % max(N, 1)

    def view(start, n, width):
        k = _round_up(max(n, 1), 8)
        rows = jnp.zeros((k, width), jnp.float32)
        gi = onp.full(k, -1, onp.int32)
        if n:
            rows = rows.at[:n].set(params12[start:start + n, :width])
            gi[:n] = onp.arange(start, start + n)
        return rows, jnp.asarray(gi)

    a = 0
    tri_p, tri_ids = view(a, shape.n_tri, 12)
    a += shape.n_tri
    sph_p, sph_ids = view(a, shape.n_sph, 4)
    a += shape.n_sph
    pl_p, pl_ids = view(a, shape.n_pl, 4)
    a += shape.n_pl
    box_p, box_ids = view(a, shape.n_box, 6)

    sph_k = jnp.sum(sph_p[:, 0:3] ** 2, -1) - sph_p[:, 3] ** 2
    tri_mo, tri_md = triangle_functionals_jnp(tri_p)

    mats = Materials(
        diff_color=tblm[:, 12:15], spec_color=tblm[:, 15:18],
        kd=tblm[:, 18], ks=tblm[:, 19], shine=tblm[:, 20],
        transmit=tblm[:, 21], ior=tblm[:, 22])
    Lp = lt.reshape(-1, 6)
    lights = Lights(position=Lp[:, 0:3], color=Lp[:, 3:6])
    z = jnp.float32
    cam = Camera(eye=jnp.zeros(3), u=jnp.array([1.0, 0, 0]),
                 v=jnp.array([0, 1.0, 0]), n=jnp.array([0, 0, 1.0]),
                 w=z(1), h=z(1), plane_dist=z(1), focal_ratio=z(1),
                 aperture=z(0), time0=z(0), time1=z(0), res_x=1, res_y=1)
    prims = Primitives(
        params=params, ptype=ptype, mat_id=mat_id,
        tri_p=tri_p, tri_ids=tri_ids, tri_mo=tri_mo, tri_md=tri_md,
        sph_p=sph_p, sph_ids=sph_ids, sph_k=sph_k,
        pl_p=pl_p, pl_ids=pl_ids, box_p=box_p, box_ids=box_ids,
        n_tri=shape.n_tri, n_sph=shape.n_sph, n_pl=shape.n_pl,
        n_box=shape.n_box)
    sky = skybox if skybox is not None else jnp.zeros((6, 1, 1, 3),
                                                      jnp.float32)
    return Scene(
        prims=prims, materials=mats, lights=lights, camera=cam,
        bg_color=bg, skybox=sky, bvh=None, grid=None, clusters=None,
        packets=None, accel_type=C.ACCEL_NONE, spp=0,
        has_skybox=shape.has_sky, n_objects=N, n_lights=shape.n_lights,
        has_reflective=shape.has_refl, has_transmissive=shape.has_refr)


class _RefConsts:
    """Duck-type of whitted_megakernel._SceneConsts whose every value is a
    scalar READ from the SMEM operand refs instead of a Python float.
    Static structure comes from `shape`."""

    def __init__(self, shape: _StaticShape, tbl, lt, bg):
        types = ([C.TRIANGLE] * shape.n_tri + [C.SPHERE] * shape.n_sph
                 + [C.PLANE] * shape.n_pl + [C.AABOX] * shape.n_box)
        self.objs = []
        for i, tk in enumerate(types):
            b = i * TBL_W
            self.objs.append(dict(
                ptype=tk,
                p=[tbl[b + k] for k in range(12)],
                diff=[tbl[b + 12 + k] for k in range(3)],
                spec=[tbl[b + 15 + k] for k in range(3)],
                kd=tbl[b + 18], ks=tbl[b + 19], shine=tbl[b + 20],
                transmit=tbl[b + 21], ior=tbl[b + 22],
            ))
        self.lights = [([lt[6 * l + k] for k in range(3)],
                        [lt[6 * l + 3 + k] for k in range(3)])
                       for l in range(shape.n_lights)]
        self.bg = [bg[0], bg[1], bg[2]]
        self.has_refl = shape.has_refl
        self.has_refr = shape.has_refr
        self.has_sky = shape.has_sky
        self.n = shape.n


def _build_streamed_kernel(shape: _StaticShape, cfg):
    n_rows, rowmap = mk._stream_layout(shape, cfg)
    n_sky, skymap = mk._sky_layout(shape, cfg)
    need_inv = shape.n_box > 0

    def kernel(*refs):
        tbl, lt, bg = refs[0:3]
        i = 3
        ox, oy, oz, dx, dy, dz = refs[i:i + 6]
        i += 6
        uni = None
        if n_rows:
            uni = refs[i]
            i += 1
        r_out, g_out, b_out = refs[i:i + 3]
        sky_out = refs[i + 3] if n_sky else None

        consts = _RefConsts(shape, tbl, lt, bg)
        o = (ox[:], oy[:], oz[:])
        d = (dx[:], dy[:], dz[:])
        stream = ((lambda r: uni[r]), rowmap) if n_rows else None
        col, sky = mk._node(consts, cfg, o, d, jnp.ones_like(o[0]), 1,
                            need_inv, stream, 0, skymap if n_sky else None)
        if n_sky:
            for row, (sw, sd) in mk._merge_sky(sky).items():
                for ax in range(3):
                    sky_out[row + ax] = sw[ax]
                    sky_out[row + 3 + ax] = sd[ax]
            # UNclamped: the epilogue adds the sky terms, then clamps
            r_out[:] = col[0]
            g_out[:] = col[1]
            b_out[:] = col[2]
        else:
            r_out[:] = jnp.clip(col[0], 0.0, 1.0)
            g_out[:] = jnp.clip(col[1], 0.0, 1.0)
            b_out[:] = jnp.clip(col[2], 0.0, 1.0)

    return kernel, n_rows, n_sky


@functools.lru_cache(maxsize=32)
def _streamed_trace(shape: _StaticShape, cfg, mode: str, sub: int,
                    has_offsets: bool, sky_dtype):
    """custom_vjp'd (tbl, lt, bg, o, d, key, offsets, skybox) -> [R,3].

    o/d are UNPADDED; the stochastic stream is drawn inside (from ``key``,
    mirroring the sweep's chain) so the kernel image stays elementwise
    equal to the sweep's. ``mode``:
      "pallas"    — compiled Pallas kernel (TPU)
      "interpret" — Pallas interpret emulation (kernel-parity tests)
      "twin"      — the backward twin as the primal too (non-TPU backends:
                    the sweep engine over the reconstructed scene)
    In every mode the backward is jax.vjp of the twin (module doc).
    """
    kernel, n_rows, n_sky = _build_streamed_kernel(shape, cfg)

    spec = pl.BlockSpec((sub, LANE), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    uspec = pl.BlockSpec((max(n_rows, 1), sub, LANE), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM)
    skyspec = pl.BlockSpec((max(n_sky, 1), sub, LANE), lambda i: (0, i, 0),
                           memory_space=pltpu.VMEM)

    def pallas_fwd(tbl, lt, bg, o, d, key, offsets, skybox):
        R = o.shape[0]
        uni = mk._draw_stream(shape, cfg, R, key, offsets)
        pad = (-R) % (sub * LANE)
        if pad:
            o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
            d = jnp.concatenate(
                [d, jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], d.dtype),
                                     (pad, 3))])
            if uni is not None:
                uni = jnp.concatenate(
                    [uni, jnp.zeros((n_rows, pad), uni.dtype)], axis=-1)
        rows = o.shape[0] // LANE
        cols = [a.reshape(rows, LANE) for a in
                (o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2])]
        extra = [uni.reshape(n_rows, rows, LANE)] if n_rows else []
        out_shape = [jax.ShapeDtypeStruct((rows, LANE), jnp.float32)
                     for _ in range(3)]
        out_specs = [spec, spec, spec]
        if n_sky:
            out_shape.append(
                jax.ShapeDtypeStruct((n_sky, rows, LANE), jnp.float32))
            out_specs.append(skyspec)
        outs = pl.pallas_call(
            kernel,
            grid=(rows // sub,),
            in_specs=[smem, smem, smem] + [spec] * 6
                     + ([uspec] if n_rows else []),
            out_specs=tuple(out_specs),
            out_shape=tuple(out_shape),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=(mode == "interpret"),
        )(tbl, lt, bg, *cols, *extra)
        color = jnp.stack([a.reshape(-1) for a in outs[:3]], -1)
        if n_sky:
            # deferred-sky epilogue — identical to the baked kernel's: one
            # batched cubemap gather over every recorded miss direction,
            # weighted add, clamp; u8 cubemaps packed to u32 (the measured
            # optimum — see whitted_megakernel's epilogue note for the r5
            # A/B matrix; plane-wise and raw-u8 variants both lost
            # in-frame).
            from ..ops.shade import (pack_skybox_u32, skybox_color,
                                     skybox_color_packed)

            sky_op = skybox
            if jnp.issubdtype(sky_op.dtype, jnp.integer):
                sky_op = pack_skybox_u32(sky_op)
                lookup = skybox_color_packed
            else:
                lookup = skybox_color
            sk = outs[3].reshape(n_sky // 6, 6, rows * LANE)
            w = sk[:, 0:3].transpose(0, 2, 1)            # [E, Rpad, 3]
            dv = sk[:, 3:6].transpose(0, 2, 1)           # [E, Rpad, 3]
            rgb = lookup(sky_op, dv.reshape(-1, 3))
            color = color + (w * rgb.reshape(w.shape)).sum(axis=0)
            color = jnp.clip(color, 0.0, 1.0)
        return color[:R]

    def twin(tbl, lt, bg, o, d, key, offsets, skybox):
        from ..core.types import Rays, clamp01
        from .whitted import trace_rays

        scene = reconstruct_scene(shape, tbl, lt, bg, skybox)
        rays = Rays(o, d, jnp.zeros(o.shape[0], jnp.float32))
        return clamp01(trace_rays(scene, rays, cfg, key, offsets))

    primal = twin if mode == "twin" else pallas_fwd

    @jax.custom_vjp
    def traced(tbl, lt, bg, o, d, key, offsets, skybox):
        return primal(tbl, lt, bg, o, d, key, offsets, skybox)

    def fwd(tbl, lt, bg, o, d, key, offsets, skybox):
        return (primal(tbl, lt, bg, o, d, key, offsets, skybox),
                (tbl, lt, bg, o, d, key, offsets, skybox))

    def bwd(res, ct):
        tbl, lt, bg, o, d, key, offsets, skybox = res
        _, vjp = jax.vjp(
            lambda tbl_, lt_, bg_, o_, d_: twin(tbl_, lt_, bg_, o_, d_,
                                                key, offsets, skybox),
            tbl, lt, bg, o, d)
        cts = vjp(ct)
        f0 = onp.zeros(key.shape, jax.dtypes.float0)
        ct_off = (jax.tree.map(jnp.zeros_like, offsets)
                  if offsets is not None else None)
        if skybox is None:
            ct_sky = None
        elif jnp.issubdtype(skybox.dtype, jnp.integer):
            ct_sky = onp.zeros(skybox.shape, jax.dtypes.float0)
        else:
            # a float cubemap is a synthetic/test asset, never a fit
            # parameter — zero cotangent by design
            ct_sky = jnp.zeros_like(skybox)
        return cts + (f0, ct_off, ct_sky)

    traced.defvjp(fwd, bwd)
    return traced, n_rows, n_sky


def trace_rays_streamed(scene, rays, cfg, key, shadow_offsets=None,
                        impl=None):
    """Drop-in for whitted.trace_rays (but returns CLAMPED color): [R,3],
    differentiable through scene parameters, scene may be a traced pytree
    (shard_map / grad).

    ``impl``: None = auto ("pallas" on TPU, the sweep-over-reconstructed
    "twin" elsewhere); "interpret" forces the Pallas emulation
    (kernel-parity tests)."""
    if impl is None:
        impl = "pallas" if jax.default_backend() == "tpu" else "twin"
    shape = shape_of(scene, cfg)
    R = rays.origin.shape[0]
    # adaptive sublane rows: small batches (sharded test tiles, dryruns)
    # should not pad to 64x128 rays
    rows_needed = -(-R // LANE)
    sub = min(SUB, max(8, -(-rows_needed // 8) * 8))
    skybox = scene.skybox if shape.has_sky else None
    sky_dtype = None if skybox is None else jnp.asarray(skybox).dtype
    if shadow_offsets is not None:
        shadow_offsets = tuple(
            jnp.asarray(x, jnp.float32) for x in shadow_offsets)
    fn, n_rows, n_sky = _streamed_trace(shape, cfg, impl, sub,
                                        shadow_offsets is not None,
                                        str(sky_dtype))
    tbl, lt, bg = scene_tables(scene)
    return fn(tbl, lt, bg, rays.origin, rays.direction, key,
              shadow_offsets, skybox)
