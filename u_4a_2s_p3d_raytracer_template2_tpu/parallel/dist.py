"""Multi-chip execution: pixel/ray sharding over a device mesh.

The reference is single-threaded on one CPU core (SURVEY.md §2 'Parallelism —
ABSENT'); the TPU-native design defines parallelism from scratch:

  * rays/pixels are the batch axis → sharded over the mesh ('rays' axis is
    the ray-tracing analogue of data parallelism),
  * the scene (geometry, BVH, materials) is replicated per chip — the
    analogue of replicated model state,
  * differentiable-render gradients for material/light/camera parameters are
    all-reduced with ``jax.lax.psum`` over ICI — the analogue of the NCCL
    all-reduce backend,
  * image assembly is a deterministic all-gather of per-shard tiles.

Everything compiles under ``jit`` over a ``jax.sharding.Mesh``; the same code
runs on one chip, a v5e slice, or a CPU mesh of virtual devices
(``--xla_force_host_platform_device_count``).
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.types import RenderConfig, Scene
from ..models.whitted import render_tile

AXIS = "rays"


def default_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (AXIS,))


def _pixel_grid(scene: Scene):
    cam = scene.camera
    ys, xs = jnp.meshgrid(
        jnp.arange(cam.res_y, dtype=jnp.float32),
        jnp.arange(cam.res_x, dtype=jnp.float32),
        indexing="ij",
    )
    return xs.reshape(-1), ys.reshape(-1)


def _pad_to(x, m):
    r = x.shape[0] % m
    if r == 0:
        return x, x.shape[0]
    pad = m - r
    return jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)]), x.shape[0]


@partial(jax.jit, static_argnums=(2, 3))
def _render_sharded(scene: Scene, ppk, cfg: RenderConfig, mesh: Mesh):
    px, py, key = ppk

    def shard_fn(scene, px, py, key):
        # decorrelate stochastic sampling across shards
        key = jax.random.fold_in(key[0], jax.lax.axis_index(AXIS))
        return render_tile(scene, px, py, cfg, key)

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(AXIS), P(AXIS), P()),
        out_specs=P(AXIS),
        check_vma=False,
    )
    return fn(scene, px, py, key[None])


def render_image_sharded(scene: Scene, cfg: RenderConfig, mesh: Mesh,
                         key=None) -> jnp.ndarray:
    """Full-frame render with pixels sharded across the mesh. [H, W, 3]"""
    if key is None:
        key = jax.random.PRNGKey(0)
    n = mesh.devices.size
    px, py = _pixel_grid(scene)
    px, true_n = _pad_to(px, n)
    py, _ = _pad_to(py, n)
    out = _render_sharded(scene, (px, py, key), cfg, mesh)
    cam = scene.camera
    return out[:true_n].reshape(cam.res_y, cam.res_x, 3)


# ---------------------------------------------------------------------------
# differentiable rendering: sharded loss + psum'd parameter gradients


def _scene_with_materials(scene: Scene, materials) -> Scene:
    return dataclasses.replace(scene, materials=materials)


@partial(jax.jit, static_argnums=(2, 3))
def train_step(scene: Scene, target, cfg: RenderConfig, mesh: Mesh,
               lr: float = 0.05, key=None):
    """One step of inverse rendering: fit material parameters so the render
    matches ``target`` ([H,W,3], row 0 = bottom). Returns (scene', loss).

    Pixels shard over the mesh; material gradients are computed per shard and
    all-reduced with psum — gradient all-reduce over ICI per SURVEY.md §5.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    n = mesh.devices.size
    px, py = _pixel_grid(scene)
    tgt = target.reshape(-1, 3)
    px, true_n = _pad_to(px, n)
    py, _ = _pad_to(py, n)
    tgt, _ = _pad_to(tgt, n)
    total = float(true_n)

    def shard_fn(scene, px, py, tgt, key):
        key = jax.random.fold_in(key[0], jax.lax.axis_index(AXIS))

        def local_loss(materials):
            s = _scene_with_materials(scene, materials)
            img = render_tile(s, px, py, cfg, key)
            return jnp.sum((img - tgt) ** 2) / total

        loss, grads = jax.value_and_grad(local_loss)(scene.materials)

        # explicit gradient all-reduce — the NCCL-allreduce analogue
        grads = jax.tree.map(lambda g: jax.lax.psum(g, AXIS), grads)
        loss = jax.lax.psum(loss, AXIS)
        return loss[None], jax.tree.map(lambda g: g[None], grads)


    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(AXIS), P(AXIS), P(AXIS), P()),
        out_specs=(P(AXIS), P(AXIS)),
        check_vma=False,
    )
    loss, grads = fn(scene, px, py, tgt, key[None])
    loss = loss[0]
    grads = jax.tree.map(lambda g: g[0], grads)
    new_mats = jax.tree.map(lambda p, g: p - lr * g, scene.materials, grads)
    # project back to the valid material domain so SGD can't step into
    # regions where the forward pass is undefined (ior<1 → negative eta,
    # shine<0 → pow NaN, colors outside [0,1])
    new_mats = dataclasses.replace(
        new_mats,
        diff_color=jnp.clip(new_mats.diff_color, 0.0, 1.0),
        spec_color=jnp.clip(new_mats.spec_color, 0.0, 1.0),
        kd=jnp.clip(new_mats.kd, 0.0, 1.0),
        ks=jnp.clip(new_mats.ks, 0.0, 1.0),
        transmit=jnp.clip(new_mats.transmit, 0.0, 1.0),
        shine=jnp.maximum(new_mats.shine, 1.0),
        ior=jnp.maximum(new_mats.ior, 1.0),
    )
    return _scene_with_materials(scene, new_mats), loss


# ---------------------------------------------------------------------------
# full-parameter inverse rendering: materials + lights + camera
# (SURVEY.md §2 'Parallelism — ABSENT' / §7 item 8: material/light/camera
# gradient all-reduce is the NCCL-backend analogue this design defines)


from ..core.types import pytree


@pytree
class FitParams:
    """Every differentiable scene parameter group. Camera is parameterized
    by (eye, focal_ratio); the uvn frame is re-derived differentiably from
    the eye inside _apply_params (SetEye semantics, camera.h:80-89).
    ``prim_params`` is the unified [N, 12] geometry table — sphere
    center/radius, triangle vertices (as v0/e1/e2; the flat normal is
    re-derived), plane/box parameters — applied via
    core.build.with_prim_params so every derived view refreshes
    differentiably (north star: gradients through intersection
    barycentrics)."""

    materials: "object"        # core.types.Materials
    light_pos: jnp.ndarray     # [L, 3]
    light_color: jnp.ndarray   # [L, 3]
    cam_eye: jnp.ndarray       # [3]
    cam_focal: jnp.ndarray     # []
    prim_params: jnp.ndarray   # [N, 12]


def params_of(scene: Scene) -> FitParams:
    return FitParams(
        materials=scene.materials,
        light_pos=scene.lights.position,
        light_color=scene.lights.color,
        cam_eye=scene.camera.eye,
        cam_focal=scene.camera.focal_ratio,
        prim_params=scene.prims.params,
    )


def _apply_params(scene: Scene, p: FitParams) -> Scene:
    from ..core.build import with_prim_params
    from ..ops.camera import with_eye

    lights = dataclasses.replace(scene.lights, position=p.light_pos,
                                 color=p.light_color)
    cam = with_eye(scene.camera, p.cam_eye)
    cam = dataclasses.replace(cam, focal_ratio=p.cam_focal)
    scene = dataclasses.replace(scene, materials=p.materials, lights=lights,
                                camera=cam)
    return with_prim_params(scene, p.prim_params)


def _project_materials(m):
    return dataclasses.replace(
        m,
        diff_color=jnp.clip(m.diff_color, 0.0, 1.0),
        spec_color=jnp.clip(m.spec_color, 0.0, 1.0),
        kd=jnp.clip(m.kd, 0.0, 1.0),
        ks=jnp.clip(m.ks, 0.0, 1.0),
        transmit=jnp.clip(m.transmit, 0.0, 1.0),
        shine=jnp.maximum(m.shine, 1.0),
        ior=jnp.maximum(m.ior, 1.0),
    )


def lr_scales(materials: float = 1.0, light_pos: float = 1.0,
              light_color: float = 1.0, camera: float = 1.0,
              geometry: float = 0.0) -> FitParams:
    """Per-group learning-rate multipliers for train_step_full. Parameter
    groups live on very different scales (colors in [0,1], light/eye
    positions in world units), so a single lr cannot fit them jointly.
    Pass 0.0 to freeze a group. ``geometry`` (the [N,12] primitive table)
    defaults FROZEN: its sensible lr is orders of magnitude below the
    light/camera groups', so it must be opted in explicitly."""
    f32 = lambda v: jnp.asarray(v, jnp.float32)
    return FitParams(
        materials=jax.tree.map(lambda _: f32(materials),
                               _EMPTY_MAT_TEMPLATE),
        light_pos=f32(light_pos), light_color=f32(light_color),
        cam_eye=f32(camera), cam_focal=f32(camera),
        prim_params=f32(geometry),
    )


from ..core.types import Materials as _Materials

_EMPTY_MAT_TEMPLATE = _Materials(
    diff_color=0.0, kd=0.0, spec_color=0.0, ks=0.0, shine=0.0,
    transmit=0.0, ior=0.0)


# friendly freeze-group names -> FitParams field names
_FREEZE_GROUPS = {
    "materials": ("materials",),
    "lights": ("light_pos", "light_color"),
    "camera": ("cam_eye", "cam_focal"),
    "geometry": ("prim_params",),
}


def _freeze_params(params: FitParams, freeze) -> FitParams:
    reps = {}
    for name in freeze:
        for field in _FREEZE_GROUPS[name]:
            reps[field] = jax.tree.map(jax.lax.stop_gradient,
                                       getattr(params, field))
    return dataclasses.replace(params, **reps)


@partial(jax.jit, static_argnums=(2, 3, 7))
def train_step_full(scene: Scene, target, cfg: RenderConfig, mesh: Mesh,
                    lr: float = 0.05, key=None, scales: FitParams = None,
                    freeze: tuple = ()):
    """One inverse-rendering step over ALL parameter groups (materials,
    light position/color, camera eye/focal). Pixels shard over the mesh;
    per-group gradients are psum-all-reduced over ICI exactly like
    train_step. ``scales`` (see lr_scales) multiplies lr per group — pass
    0.0 to freeze a group's UPDATE. ``freeze`` (STATIC tuple of
    "materials"/"lights"/"camera"/"geometry") additionally stop-gradients
    those groups so XLA dead-code-eliminates their backward work — a
    zero scale alone still pays for the gradient computation (e.g. the
    geometry group's per-step table-rebuild VJP). Returns (scene', loss)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    if scales is None:
        scales = lr_scales()
    n = mesh.devices.size
    px, py = _pixel_grid(scene)
    tgt = target.reshape(-1, 3)
    px, true_n = _pad_to(px, n)
    py, _ = _pad_to(py, n)
    tgt, _ = _pad_to(tgt, n)
    total = float(true_n)

    def shard_fn(scene, px, py, tgt, key):
        key = jax.random.fold_in(key[0], jax.lax.axis_index(AXIS))

        def local_loss(params: FitParams):
            s = _apply_params(scene, _freeze_params(params, freeze))
            img = render_tile(s, px, py, cfg, key)
            return jnp.sum((img - tgt) ** 2) / total

        loss, grads = jax.value_and_grad(local_loss)(params_of(scene))
        grads = jax.tree.map(lambda g: jax.lax.psum(g, AXIS), grads)
        loss = jax.lax.psum(loss, AXIS)
        return loss[None], jax.tree.map(lambda g: g[None], grads)

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(AXIS), P(AXIS), P(AXIS), P()),
        out_specs=(P(AXIS), P(AXIS)),
        check_vma=False,
    )
    loss, grads = fn(scene, px, py, tgt, key[None])
    loss = loss[0]
    grads = jax.tree.map(lambda g: g[0], grads)
    new = jax.tree.map(lambda p, g, s: p - lr * s * g,
                       params_of(scene), grads, scales)
    # geometry projection: sphere radii must stay positive (a zero/negative
    # radius makes the quadratic degenerate)
    from ..core import constants as C

    is_sph = scene.prims.ptype == C.SPHERE
    pp = new.prim_params
    r_safe = jnp.maximum(pp[:, 3], 1e-3)
    pp = pp.at[:, 3].set(jnp.where(is_sph, r_safe, pp[:, 3]))
    new = dataclasses.replace(
        new,
        materials=_project_materials(new.materials),
        cam_focal=jnp.maximum(new.cam_focal, 0.05),
        prim_params=pp,
    )
    return _apply_params(scene, new), loss


# ---------------------------------------------------------------------------
# path tracer sharding: frames are embarrassingly parallel over pixels


@partial(jax.jit, static_argnums=(2, 3))
def pt_frame_sharded(scene, cam: "object", cfg, mesh: Mesh, key=None):
    """One 1-spp path-traced frame with pixels sharded over the mesh.
    Returns the full [H, W, 3] linear frame (gathered)."""
    from ..models.pathtracer import ray_color
    from ..ops.camera import thin_lens_rays
    from ..ops.sampling import sample_unit_disk

    if key is None:
        key = jax.random.PRNGKey(0)
    n = mesh.devices.size
    ys, xs = jnp.meshgrid(
        jnp.arange(cam.res_y, dtype=jnp.float32),
        jnp.arange(cam.res_x, dtype=jnp.float32),
        indexing="ij",
    )
    px, true_n = _pad_to(xs.reshape(-1), n)
    py, _ = _pad_to(ys.reshape(-1), n)

    def shard_fn(scene, px, py, key):
        k = jax.random.fold_in(key[0], jax.lax.axis_index(AXIS))
        kj, kl, kt, kc = jax.random.split(k, 4)
        R = px.shape[0]
        jit2 = jax.random.uniform(kj, (R, 2), jnp.float32)
        lens = sample_unit_disk(kl, (R,)) * (cam.aperture * 0.5)
        time = cam.time0 + jax.random.uniform(kt, (R,)) * (cam.time1 - cam.time0)
        rays = thin_lens_rays(cam, px + jit2[:, 0], py + jit2[:, 1], lens,
                              time)
        return ray_color(scene, cfg, rays, kc)

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(AXIS), P(AXIS), P()),
        out_specs=P(AXIS),
        check_vma=False,
    )
    out = fn(scene, px, py, key[None])
    return out[:true_n].reshape(cam.res_y, cam.res_x, 3)


# ---------------------------------------------------------------------------
# multi-host bootstrap (SURVEY.md §5 'distributed communication backend')


def initialize_multihost(coordinator_address=None, num_processes=None,
                         process_id=None):
    """jax.distributed bootstrap for multi-host pods: call once per host
    before device use; afterwards jax.devices() spans the slice and the same
    Mesh/shard_map code paths run with DCN across hosts and ICI within
    (SURVEY.md §5). No-op when running single-process."""
    import jax

    if num_processes is None or num_processes <= 1:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True
