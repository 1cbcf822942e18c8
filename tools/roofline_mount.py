"""Instruction-level roofline for the mount_low Whitted megakernel
(VERDICT r4 item 8: "is there a 1.5x left, or document why this IS
speed-of-light").

Two parts:

  mix   (CPU, no device) — jaxpr-trace the EXACT kernel body
         (whitted_megakernel._node with mount_low's baked consts, the same
         code object pallas lowers) and count vector ops per ray by class:
         fused-multiply-add candidates (mul/add/sub), cheap elementwise
         (min/max/abs/neg), compare/select/logic, and transcendental-class
         (div, rsqrt, sqrt, pow->exp/log). This replaces the +-30% static
         flop model in tools/device_validate.py with an exact count.

  rates (TPU) — microbench each op class at the kernel's own vector shape
         ([SUB,128] VMEM blocks inside a Pallas kernel, slope-timed) to get
         measured per-class throughput, then solve the mix-weighted roofline:

             t_floor = sum_class ops_class / rate_class

         and compare against the measured frame. If t_frame ~= t_floor the
         kernel is issue-bound at its instruction mix — i.e. speed of light
         for this algorithm — and the only levers left are *algorithmic*
         (fewer ops), not scheduling.

Usage: python tools/roofline_mount.py mix|rates|all
"""
import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# op classification: jax primitive name -> class
FMA = {"mul", "add", "sub"}
CHEAP = {"min", "max", "abs", "neg", "floor", "sign", "clamp",
         "convert_element_type", "select_n", "eq", "ne", "lt", "le", "gt",
         "ge", "and", "or", "not", "xor", "integer_pow"}
TRANS = {"div", "rsqrt", "sqrt", "exp", "log", "pow", "tan", "sin", "cos",
         "atan2"}


def count_ops(jaxpr, counts, mul=1):
    """Weighted per-element op counts over a closed jaxpr (recursing into
    control-flow sub-jaxprs is unnecessary: the kernel body is straight-line
    except the soft-shadow fori_loop, absent in mount_low's config)."""
    for eqn in jaxpr.eqns:
        subs = [s for s in (eqn.params.get("jaxpr"),
                            eqn.params.get("call_jaxpr")) if s is not None]
        if subs:
            # call wrappers (pjit, custom_jvp_call, ...): count the body
            # once, not the wrapper eqn itself
            for sub in subs:
                count_ops(getattr(sub, "jaxpr", sub), counts, mul)
            continue
        prim = eqn.primitive.name
        if prim in ("broadcast_in_dim", "squeeze", "reshape", "copy"):
            continue  # layout ops: free after fusion (scalar splats)
        # elements written by this eqn (vector width); scalars count ~0
        n = max((int(np.prod(v.aval.shape)) for v in eqn.outvars
                 if hasattr(v.aval, "shape")), default=0)
        counts[prim] += mul * n


def part_mix():
    import jax
    import jax.numpy as jnp

    import u_4a_2s_p3d_raytracer_template2_tpu as rt
    from u_4a_2s_p3d_raytracer_template2_tpu.models import (
        whitted_megakernel as mk,
    )
    from u_4a_2s_p3d_raytracer_template2_tpu.models.scenes import mount_scene

    jax.config.update("jax_platforms", "cpu")
    scene = rt.build_scene(mount_scene(res=512))
    cfg = rt.RenderConfig(engine="megakernel")
    consts = mk._SceneConsts(scene)
    W = 128  # trace at one lane-row: counts scale per element

    def body(o0, o1, o2, d0, d1, d2):
        col, _ = mk._node(consts, cfg, (o0, o1, o2), (d0, d1, d2),
                          jnp.ones((W,), jnp.float32), 1, False, None, 0,
                          None)
        return jnp.clip(col[0], 0, 1), jnp.clip(col[1], 0, 1), \
            jnp.clip(col[2], 0, 1)

    args = [jnp.zeros((W,), jnp.float32)] * 6
    jaxpr = jax.make_jaxpr(body)(*args)
    counts = Counter()
    count_ops(jaxpr.jaxpr, counts)

    per_ray = {k: v / W for k, v in counts.items()}
    cls = {"fma_class": 0.0, "cheap_class": 0.0, "trans_class": 0.0,
           "other": 0.0}
    detail = {"trans": {}, "other": {}}
    for k, v in per_ray.items():
        if k in FMA:
            cls["fma_class"] += v
        elif k in CHEAP:
            cls["cheap_class"] += v
        elif k in TRANS:
            cls["trans_class"] += v
            detail["trans"][k] = detail["trans"].get(k, 0) + v
        else:
            cls["other"] += v
            detail["other"][k] = detail["other"].get(k, 0) + v

    print("== mount_low megakernel per-ray vector-op mix (exact jaxpr count)")
    for k, v in sorted(cls.items()):
        print(f"  {k:12s} {v:9.1f} ops/ray")
    print("  transcendental detail:",
          {k: round(v, 1) for k, v in sorted(detail["trans"].items())})
    print("  other detail:",
          {k: round(v, 1) for k, v in sorted(detail["other"].items(),
                                             key=lambda kv: -kv[1])[:8]})
    total = sum(cls.values())
    print(f"  TOTAL {total:9.1f} vector ops/ray "
          f"({total * 512 * 512 / 1e9:.2f} Gops/frame at 512^2)")
    return cls


def part_rates():
    import functools

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from u_4a_2s_p3d_raytracer_template2_tpu.utils.profiling import (
        enable_compilation_cache,
    )
    from u_4a_2s_p3d_raytracer_template2_tpu.utils.timing import loop_time

    enable_compilation_cache()
    # sized so one call is ~1 ms of pure VPU work — well above tunnel noise
    # (sub-ms kernels slope-time to negative/absurd values, CLAUDE.md)
    SUB, LANE, K, G = 256, 128, 512, 96  # G grid programs per call

    def make(opname):
        # every chain must be serially dependent AND algebraically opaque:
        # the first rates run measured 36 Top/s for chained max (idempotent
        # collapse) and negative for select (folded) — constants or
        # idempotent ops let Mosaic/LLVM collapse the chain.
        def kernel(x_ref, o_ref):
            x = x_ref[:]
            a = x * np.float32(1e-9) + np.float32(0.9999)  # data-dep factor
            acc = x
            for i in range(K):
                if opname == "fma":
                    acc = acc * a + x
                elif opname == "cheap":
                    acc = jnp.abs(acc - x)           # non-idempotent chain
                elif opname == "div":
                    acc = x / (acc + np.float32(1.5))
                elif opname == "rsqrt":
                    acc = jax.lax.rsqrt(jnp.abs(acc) + np.float32(1.1))
                elif opname == "select":
                    acc = jnp.where(acc > x, acc - x, acc + x)
            o_ref[:] = acc

        f = pl.pallas_call(
            kernel,
            grid=(G,),
            in_specs=[pl.BlockSpec((SUB, LANE), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((SUB, LANE), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((G * SUB, LANE), jnp.float32),
        )
        return jax.jit(f)

    n_el = G * SUB * LANE
    rates = {}
    for op in ("fma", "cheap", "div", "rsqrt", "select"):
        f = make(op)

        def step(i, acc, f=f):
            return f(acc + i.astype(jnp.float32) * 1e-9)

        dt = loop_time(step, jnp.ones((G * SUB, LANE), jnp.float32),
                       n_lo=2, n_hi=20, reps=3)
        gops = n_el * K / dt / 1e9
        rates[op] = gops
        # chain-iterations per second; ops/iter: fma=1 fused, cheap=2
        # (sub+abs), div=1, rsqrt=2 (abs+rsqrt), select=2 (cmp+sel)
        print(f"  {op:7s} {gops:9.1f} G chain-iter/s", flush=True)
    return rates


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    cls = rates = None
    if which in ("mix", "all"):
        cls = part_mix()
    if which in ("rates", "all"):
        print("== measured per-class VPU rates ([256,128] f32 blocks)")
        rates = part_rates()
    if cls and rates:
        R = 512 * 512
        # mix-weighted issue floor: FMA+cheap+select issue ~1/cycle,
        # div/rsqrt at their measured rates. Use measured rates directly.
        t = (cls["fma_class"] / rates["fma"]
             + cls["cheap_class"] / rates["cheap"]
             + cls["other"] / rates["cheap"]
             + cls["trans_class"] / rates["div"]) * R / 1e9
        print(f"== mix-weighted issue floor: {t * 1e3:.2f} ms/frame at 512^2")


if __name__ == "__main__":
    main()
