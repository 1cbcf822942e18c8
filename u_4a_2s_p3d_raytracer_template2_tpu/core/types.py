"""Core pytree types: SoA scene arrays, rays, camera, render config.

The reference stores its scene as a vector of polymorphic ``Object*``
(reference: scene.h:67-145, scene.cpp:285-331). The TPU-native design replaces
pointer-chasing AoS with a single unified SoA primitive table — one ``[N, 12]``
parameter block plus type/material id vectors — so every intersection test is a
dense vectorized op over padded, statically-shaped buffers.

Parameter block layout by type (``ptype``):
  PLANE    : pn(3), d(1)                      — scene.cpp:90-147
  TRIANGLE : v0(3), e1(3), e2(3), normal(3)   — scene.cpp:10-88
  SPHERE   : center(3), radius(1)             — scene.cpp:149-186
  AABOX    : min(3), max(3)                   — scene.cpp:188-283
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import constants as C

# ---------------------------------------------------------------------------
# pytree registration helper


def pytree(cls=None, *, meta: tuple[str, ...] = ()):
    """Register a dataclass as a JAX pytree with the given static meta fields."""
    if cls is None:
        return partial(pytree, meta=meta)
    cls = dataclasses.dataclass(frozen=True)(cls)
    fields = [f.name for f in dataclasses.fields(cls)]
    data_fields = [f for f in fields if f not in meta]
    jax.tree_util.register_dataclass(
        cls, data_fields=data_fields, meta_fields=list(meta)
    )
    return cls


# ---------------------------------------------------------------------------
# Scene SoA


@pytree
class Materials:
    """SoA material table (reference: scene.h:23-55).

    ``reflection`` coefficient equals ``ks`` by construction (scene.h:31).
    """

    diff_color: jnp.ndarray  # [M, 3]
    kd: jnp.ndarray          # [M]
    spec_color: jnp.ndarray  # [M, 3]
    ks: jnp.ndarray          # [M]
    shine: jnp.ndarray       # [M]
    transmit: jnp.ndarray    # [M]  (T)
    ior: jnp.ndarray         # [M]


@pytree
class Lights:
    """Point lights (reference: scene.h:57-65)."""

    position: jnp.ndarray  # [L, 3]
    color: jnp.ndarray     # [L, 3]


@pytree(meta=("n_tri", "n_sph", "n_pl", "n_box"))
class Primitives:
    """Unified SoA primitive table, padded to a static size, plus
    type-grouped views for dense brute-force intersection.

    The unified table (``params``/``ptype``/``mat_id``) serves gather-style
    access (BVH leaves, shade-time re-intersection). The per-type tables are
    pre-gathered at build so the hot brute-force path runs each intersection
    formula only over primitives of its own type — no type select, no wasted
    lanes. ``*_ids`` map rows back to global object indices (-1 = padding).
    """

    params: jnp.ndarray  # [N, 12] f32
    ptype: jnp.ndarray   # [N] i32
    mat_id: jnp.ndarray  # [N] i32
    tri_p: jnp.ndarray   # [Kt, 12] (v0, e1, e2, normal)
    tri_ids: jnp.ndarray # [Kt]
    tri_mo: jnp.ndarray  # [3Kt, 4] Baldwin-Weber origin-side functionals
    tri_md: jnp.ndarray  # [3Kt, 3] Baldwin-Weber direction-side functionals
    sph_p: jnp.ndarray   # [Ks, 4]  (center, radius)
    sph_ids: jnp.ndarray # [Ks]
    sph_k: jnp.ndarray   # [Ks]     |c|² - r²
    pl_p: jnp.ndarray    # [Kp, 4]  (pn, d)
    pl_ids: jnp.ndarray  # [Kp]
    box_p: jnp.ndarray   # [Kb, 6]  (min, max)
    box_ids: jnp.ndarray # [Kb]
    n_tri: int = 0
    n_sph: int = 0
    n_pl: int = 0
    n_box: int = 0


@pytree(meta=("res_x", "res_y"))
class Camera:
    """uvn camera frame with thin-lens + shutter support (reference: camera.h:12-128).

    All geometric fields are traced arrays so camera parameters are
    differentiable end-to-end.
    """

    eye: jnp.ndarray          # [3]
    u: jnp.ndarray            # [3]
    v: jnp.ndarray            # [3]
    n: jnp.ndarray            # [3]
    w: jnp.ndarray            # [] view-plane width
    h: jnp.ndarray            # [] view-plane height
    plane_dist: jnp.ndarray   # []
    focal_ratio: jnp.ndarray  # []
    aperture: jnp.ndarray     # [] lens aperture = aperture_ratio * pixel size
    time0: jnp.ndarray        # [] shutter open
    time1: jnp.ndarray        # [] shutter close
    res_x: int = 512
    res_y: int = 512


@pytree(meta=("n_nodes", "n_bounded"))
class BvhArrays:
    """Flat linearized BVH (reference layout: rayAccelerator.h:52-69, bvh.cpp:149-153).

    ``index`` points at the left child pair for internal nodes and at the first
    object (in ``order``) for leaves; children are contiguous pairs. Unbounded
    primitives (planes — scene.h:75) cannot live in the tree and are tested
    brute-force alongside via ``unbounded_ids``.
    """

    bbox_min: jnp.ndarray       # [K, 3]
    bbox_max: jnp.ndarray       # [K, 3]
    leaf: jnp.ndarray           # [K] bool
    index: jnp.ndarray          # [K] i32
    n_objs: jnp.ndarray         # [K] i32
    order: jnp.ndarray          # [Npad] i32 — sorted object ids (bvh.cpp:55)
    unbounded_ids: jnp.ndarray  # [Ppad] i32, -1 padded
    n_nodes: int = 0
    n_bounded: int = 0


@pytree(meta=("nx", "ny", "nz", "max_per_cell"))
class GridArrays:
    """Uniform grid (reference: grid.cpp:30-98) in dense padded layout."""

    bbox_min: jnp.ndarray       # [3]
    bbox_max: jnp.ndarray       # [3]
    cell_items: jnp.ndarray     # [ncells, max_per_cell] i32, -1 padded
    cell_count: jnp.ndarray     # [ncells] i32
    unbounded_ids: jnp.ndarray  # [Ppad] i32, -1 padded (planes)
    nx: int = 1
    ny: int = 1
    nz: int = 1
    max_per_cell: int = 1


@pytree(meta=("accel_type", "spp", "has_skybox", "n_objects", "n_lights",
              "has_reflective", "has_transmissive"))
class Scene:
    """Full scene as a device pytree; replicated per chip under sharding."""

    prims: Primitives
    materials: Materials
    lights: Lights
    camera: Camera
    bg_color: jnp.ndarray           # [3]
    # [6, H, W, 3] cubemap: uint8 when loaded from disk (io/skybox.py —
    # reference u8 semantics, rides the packed-u32 gather path), f32 for
    # synthetic/test cubemaps; dummy f32 [6,1,1,3] when absent. Downstream
    # code branches on dtype (ops/shade.skybox_color vs the packed path).
    skybox: jnp.ndarray
    bvh: Optional[BvhArrays]
    grid: Optional[GridArrays]
    clusters: Optional[Any]         # accel.clusters.ClusterTables
    packets: Optional[Any] = None   # accel.packets.PacketTables
    accel_type: int = C.ACCEL_NONE
    spp: int = 0
    has_skybox: bool = False
    n_objects: int = 0
    n_lights: int = 0
    # static material-population facts: when False, the corresponding child
    # subtree of the Whitted recursion can never activate and is pruned at
    # trace time (main.cpp:646 spawns reflection only for Ks>0; main.cpp:671
    # refraction only for T!=0)
    has_reflective: bool = True
    has_transmissive: bool = True


# ---------------------------------------------------------------------------
# Rays


@pytree
class Rays:
    """SoA ray batch (reference: ray.h:6-21; no mailbox id — stateless design)."""

    origin: jnp.ndarray     # [R, 3]
    direction: jnp.ndarray  # [R, 3]
    time: jnp.ndarray       # [R]

    @staticmethod
    def make(origin, direction, time=None):
        origin = jnp.asarray(origin, jnp.float32)
        direction = jnp.asarray(direction, jnp.float32)
        if time is None:
            time = jnp.zeros(origin.shape[:-1], jnp.float32)
        return Rays(origin, direction, time)


# ---------------------------------------------------------------------------
# Render configuration (static, hashable — safe as a jit static arg)


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Feature flags mirroring the reference's compile-time bools (main.cpp:40-48)
    plus explicit switches for the reference's quirks (SURVEY.md §7).

    Modes marked ``reference_*`` replicate shipped reference behavior including
    its bugs; the defaults are the physically-correct variants.
    """

    max_depth: int = C.MAX_DEPTH
    anti_aliasing: bool = False
    soft_shadow: bool = False
    depth_of_field: bool = False
    fuzzy_reflection: bool = False
    motion_blur: bool = False
    spp: int = 0                    # grid side; samples = spp*spp (main.cpp:777-798)
    roughness: float = 0.3          # fuzzy reflection roughness (main.cpp:653)

    # Fresnel handling at transmissive hits (main.cpp:699-716):
    #   "schlick"           — physical Schlick; KR=1 on total internal reflection
    #   "reference_schlick" — Schlick, but KR=0 on TIR (int-division bug path)
    #   "reference_exact"   — KR=0 always (dead exact-Fresnel branch, main.cpp:711)
    fresnel_mode: str = "schlick"

    # Refraction direction (main.cpp:671-697):
    #   "physical"  — Snell's law transmitted direction
    #   "reference" — the reference's tangent*sin_t + unit-normal formula
    refraction_mode: str = "reference"

    # NONE-mode shadow rays use unnormalized L and unbounded max-t
    # (main.cpp:476-509, SURVEY.md quirk #6). False = bound by light distance.
    shadow_unbounded: bool = False

    # Grid shadow rays whose Init_Traverse fails are treated as occluded by
    # the reference (grid.cpp:326-328). False = physical (grid miss = lit).
    reference_grid_shadow_initfail: bool = False

    # AA averaging: reference divides by 4*4 regardless of spp (main.cpp:800).
    reference_aa_div16: bool = False

    # Use the skybox cubemap on miss when the scene has one. The shipped
    # reference always returns the flat bg color (main.cpp:581-584) even though
    # GetSkyboxColor exists (scene.cpp:383-461); wiring it in is capability
    # parity with BASELINE config #4.
    use_skybox: bool = False

    shutter: tuple[float, float] = (0.0, 1.0)  # main.cpp:47-48

    # Secondary-ray engine: "sweep" = full 2^l level sweep (exact for every
    # scene); "wavefront" = stream-compacted queue (models/whitted_wavefront
    # .py) — identical images for deterministic configs, ~the active-lane
    # fraction cheaper on real scenes; "megakernel" = scene-baked Pallas
    # kernel (models/whitted_megakernel.py) — the whole recursion tree in
    # one kernel for small scenes/deterministic configs, falling back to
    # wavefront when unsupported (render_image-level dispatch).
    engine: str = "sweep"
    # queue capacity = ceil(primary_count * this) in wavefront mode
    wavefront_capacity: float = 1.0
    # Wavefront skybox handling: False (default) = per-level cubemap
    # lookup; True = record (pixel, miss, weight, direction) per level and
    # do every lookup in one post-loop epilogue. Measured NEUTRAL-to-worse
    # on mount_high depth 4 (272 vs 260 ms) — the apparent "sky cost" there
    # is an XLA scheduling artifact of the no-sky program, not lookup work
    # (a constant-sky ablation still measured ~255 ms; tools/
    # probe_sky_struct.py) — kept dispatchable + parity-tested.
    wavefront_defer_sky: bool = False
    # Route engine="megakernel" through the operand-streamed path even off
    # TPU (models/whitted_streamed.py; the primal runs as the kernel's
    # pure-XLA twin there — same math, CPU-fast). For CPU tests and the
    # multichip dryrun; on TPU the flag is irrelevant.
    megakernel_interpret: bool = False

    # BVH-mode traversal implementation (closest + any-hit dispatch in
    # models/whitted.trace_closest/trace_shadow):
    #   "auto"     — packet-BVH Pallas kernel on TPU when the scene carries
    #                packet tables, tile-coherent cluster sweeps otherwise
    #   "packets"  — force the packet-BVH kernel (accel/packets.py)
    #   "clusters" — force the cluster sweeps (accel/clusters.py)
    #   "perray"   — per-ray lax.while_loop BVH walk (accel/traverse.py);
    #                the reference-layout walk, kept dispatchable so its
    #                cost is measurable, not dead weight (VERDICT r2 1c)
    #   "brute"    — dense brute force (ops/intersect.py)
    #   "multi"    — like "auto", plus multi-light hard shadows ride the
    #                fused multi-query any-hit kernel (measured SLOWER than
    #                per-light walks on balls_high — kept dispatchable as a
    #                reproducible negative result, accel/packets.py)
    # GRID-mode scenes build no clusters, so there only "perray" and "brute"
    # opt out of the TPU packet routing; any other value (incl. an explicit
    # "clusters") rides the packet kernel — see trace_closest.
    accel_impl: str = "auto"

    def with_scene_flags(self, scene: Scene) -> "RenderConfig":
        """Apply the reference's init-time coupling: spp>0 enables AA+DoF
        ("Distribution Ray-Tracing", main.cpp:939-946)."""
        if scene.spp > 0:
            return dataclasses.replace(
                self, spp=scene.spp, anti_aliasing=True, depth_of_field=True
            )
        return self


# ---------------------------------------------------------------------------
# small vector helpers (the Vector/Color algebra of vector.cpp / color.h)


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def cross(a, b):
    return jnp.cross(a, b)


def norm(a, axis=-1, keepdims=False):
    return jnp.sqrt(jnp.sum(a * a, axis=axis, keepdims=keepdims))


def normalize(a, eps=0.0):
    """Safe normalize: zero vectors map to zero (double-where so the sqrt in
    the norm has no infinite gradient at 0)."""
    n2 = jnp.sum(a * a, axis=-1, keepdims=True)
    ok = n2 > 0.0
    n = jnp.where(ok, jnp.sqrt(jnp.where(ok, n2, 1.0)), 1.0)
    return jnp.where(ok, a / n, 0.0)


def clamp01(c):
    """Color::clamp (color.h:38-43)."""
    return jnp.clip(c, 0.0, 1.0)
