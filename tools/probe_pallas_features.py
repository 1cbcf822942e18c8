"""Probe the Pallas/Mosaic features the packet-BVH traversal kernel needs,
on the real TPU (compile + run + numeric check):

  1. SMEM *input* arrays (f32 + i32) read with dynamic scalar indices.
  2. Dynamic leading-dim reads from a 3D VMEM ref (leaf chunk fetch).
  3. SMEM *scratch* used as a traversal stack (read/write at dynamic index).
  4. A scalar-carried `lax.while_loop` whose body mutates VMEM scratch
     under `pl.when`, with a cross-lane reduce feeding the scalar control.

Each feature is exercised in one tiny kernel that walks a 3-node "tree"
(root + two leaves) over a 2-chunk table, so success means the real kernel's
building blocks all lower through Mosaic.  Run:
    python -u tools/probe_pallas_features.py        # on-device
    python -u tools/probe_pallas_features.py cpu    # interpret mode
"""
import sys

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = len(sys.argv) > 1 and sys.argv[1] == "cpu"
if INTERPRET:
    jax.config.update("jax_platforms", "cpu")

PACK = 256
LANE = 128


def kernel(nbox_ref, nmeta_ref, table_ref, rays_ref, out_ref,
           stack_ref, best_ref):
    # feature 4: scalar while loop, VMEM scratch init
    best_ref[:] = jnp.full((PACK, LANE), 1e30, jnp.float32)

    def body(state):
        cur, sp, acc = state
        # feature 1: SMEM dynamic scalar reads
        is_leaf = nmeta_ref[2 * cur + 1]
        a = nmeta_ref[2 * cur]
        b0 = nbox_ref[6 * cur]

        # feature 3: SMEM scratch stack push
        @pl.when(is_leaf == 0)
        def _():
            stack_ref[sp] = a + 1

        # feature 2: dynamic leading-dim VMEM read + fold into scratch
        @pl.when(is_leaf == 1)
        def _():
            chunk = table_ref[a]          # [8, LANE]
            t = chunk[0:1, :] + rays_ref[:, 0:1] + b0
            best_ref[:] = jnp.minimum(best_ref[:], t)

        # scalar control from a cross-lane reduce
        t_far = jnp.max(jnp.min(best_ref[:], axis=-1))
        next_cur = jnp.where(is_leaf == 0, a, jnp.int32(-1))
        sp = jnp.where(is_leaf == 0, sp + 1, sp)

        # single-level pop (one masked attempt per iteration; a NESTED
        # scalar while_loop here compiles but HANGS on real hardware —
        # wedged the chip for minutes, 2026-08-20)
        do_pop = (next_cur < 0) & (sp > 0)
        spm = jnp.maximum(sp - 1, 0)
        next_cur = jnp.where(do_pop, stack_ref[spm], next_cur)
        sp = jnp.where(do_pop, spm, sp)
        return next_cur, sp, acc + t_far

    def cond(state):
        return state[0] >= 0

    _, _, acc = jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(0),
                                                jnp.float32(0.0)))
    out_ref[:] = best_ref[:] + acc * 0.0


def main():
    nn = 3
    nbox = np.arange(nn * 6, dtype=np.float32) * 0.001
    # node 0: internal, left child 1 (we push 2, descend 1); 1,2: leaves 0,1
    nmeta = np.array([1, 0, 0, 1, 1, 1], np.int32)
    table = np.random.RandomState(0).rand(2, 8, LANE).astype(np.float32)
    rays = np.random.RandomState(1).rand(PACK, 8).astype(np.float32)

    out = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((PACK, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((PACK, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((PACK, LANE), jnp.float32),
        scratch_shapes=[
            pltpu.SMEM((64,), jnp.int32),
            pltpu.VMEM((PACK, LANE), jnp.float32),
        ],
        interpret=INTERPRET,
    )(jnp.asarray(nbox), jnp.asarray(nmeta), jnp.asarray(table),
      jnp.asarray(rays))
    out = np.asarray(out)

    # oracle: leaves 0 then 1 folded, b0 per leaf node (nodes 1, 2)
    t1 = table[0, 0:1, :] + rays[:, 0:1] + nbox[6 * 1]
    t2 = table[1, 0:1, :] + rays[:, 0:1] + nbox[6 * 2]
    want = np.minimum(np.minimum(1e30, t1), t2)
    err = np.abs(out - want).max()
    print("backend:", jax.default_backend(), "max_err:", err)
    assert err < 1e-5, "MISMATCH"
    print("ALL FEATURES OK")


if __name__ == "__main__":
    main()
