"""Trustworthy device timing through the remote-TPU tunnel.

Two infrastructure hazards make naive timing lie (both observed on the axon
tunnel, see CLAUDE.md):

  1. ``block_until_ready`` can return before remote execution completes, so
     per-call "blocking" latencies under-read by orders of magnitude (60 us
     "frames" that really take hundreds of ms). The only reliable barrier is
     a data-dependent scalar readback (``float(x)``).
  2. Identical (executable, inputs) launches are deduped, so repeat-timing
     the same call measures cache hits.

The slope protocol here defeats both plus the unknown fixed costs (dispatch,
readback RTT): run the workload N_lo and N_hi times *inside one jitted
lax.fori_loop* (single dispatch, iterations serialized on-device by a carry
dependency, each iteration's inputs varied by the loop index so nothing can
be folded), hard-sync each run with a scalar readback, and report

    (T(N_hi) - T(N_lo)) / (N_hi - N_lo)

so every per-dispatch constant cancels. The loop bound is a *traced* scalar
(one executable for both runs — no recompile between them; XLA lowers the
dynamic-bound fori_loop to a while_loop).
"""
from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp


def _hard_sync(x) -> float:
    """Barrier that cannot lie: a data-dependent scalar readback."""
    return float(jnp.asarray(x).reshape(-1)[0])


def make_loop_runner(step: Callable):
    """Build a jitted runner for ``step(i, carry) -> carry`` iterated n times.

    ``carry`` must be a small pytree (it is returned to the host for the
    sync readback — keep it scalar-sized; the 20 KB/s device->host link
    makes anything larger part of the measurement).
    """

    @jax.jit
    def run(n, carry):
        return jax.lax.fori_loop(0, n, step, carry)

    return run


def _salt(carry, k: int):
    """Perturb the first float leaf so every launch's inputs are unique —
    the tunnel dedups repeated (executable, inputs) pairs, returning cached
    results in ~0 time (negative slopes observed without this)."""
    leaves, treedef = jax.tree_util.tree_flatten(carry)
    salted = False
    out = []
    for leaf in leaves:
        arr = jnp.asarray(leaf)
        if not salted and jnp.issubdtype(arr.dtype, jnp.floating):
            arr = arr + jnp.asarray(k * 1e-7, arr.dtype)
            salted = True
        out.append(arr)
    return jax.tree_util.tree_unflatten(treedef, out)


def loop_time(step: Callable, carry0, n_lo: int = 2, n_hi: int = 12,
              reps: int = 3) -> float:
    """Seconds per iteration of ``step`` on device, fixed costs cancelled.

    Warms up (compiles) first; returns the median slope over ``reps``
    (lo, hi) pairs. Every launch gets uniquely salted inputs (dedup defense).
    """
    run = make_loop_runner(step)
    _hard_sync(jax.tree_util.tree_leaves(run(jnp.int32(1), carry0))[0])

    slopes = []
    k = 1
    for _ in range(reps):
        t0 = time.perf_counter()
        _hard_sync(jax.tree_util.tree_leaves(
            run(jnp.int32(n_lo), _salt(carry0, k)))[0])
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        _hard_sync(jax.tree_util.tree_leaves(
            run(jnp.int32(n_hi), _salt(carry0, k + 1)))[0])
        t_hi = time.perf_counter() - t0
        slopes.append((t_hi - t_lo) / (n_hi - n_lo))
        k += 2
    slopes.sort()
    return slopes[len(slopes) // 2]


def frame_time(render_scalar: Callable, n_lo: int = 2, n_hi: int = 12,
               reps: int = 3) -> float:
    """Seconds per frame for ``render_scalar(i) -> f32 scalar``.

    The returned scalar must depend on the whole frame (e.g. ``img.sum()``
    or ``img[0, 0] + img[-1, -1]``); it is folded into the loop carry so
    frames are serialized and cannot be elided.
    """

    def step(i, acc):
        return acc + render_scalar(i)

    return loop_time(step, jnp.float32(0.0), n_lo=n_lo, n_hi=n_hi, reps=reps)
