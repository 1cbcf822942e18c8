"""Observability: timers, Mrays/s counters, XLA profiler traces.

The reference's only instrumentation is a wall-clock printf around the render
(main.cpp:966-970) and an FPS title counter (main.cpp:280-289) — SURVEY.md §5
'Tracing/profiling: ABSENT'. This module is the TPU framework's first-class
replacement: structured per-phase timing, ray-throughput accounting, and
``jax.profiler`` trace capture for per-kernel roofline inspection.
"""
from __future__ import annotations

import contextlib
import dataclasses
import json
import time
from typing import Optional


def enable_compilation_cache(path: str = "/tmp/jax_rt_cache") -> None:
    """Persistent XLA compilation cache: first compile of each shape is slow
    (remote-compile tunnels take 60-120 s); cached reloads are instant."""
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


@dataclasses.dataclass
class PhaseTiming:
    name: str
    seconds: float
    rays: int = 0

    @property
    def mrays_per_s(self) -> float:
        return self.rays / self.seconds / 1e6 if self.seconds > 0 else 0.0


class RenderStats:
    """Accumulates per-phase timings; emits the structured metrics line."""

    def __init__(self):
        self.phases: list[PhaseTiming] = []

    @contextlib.contextmanager
    def phase(self, name: str, rays: int = 0):
        t0 = time.perf_counter()
        yield
        self.phases.append(PhaseTiming(name, time.perf_counter() - t0, rays))

    def report(self) -> str:
        lines = []
        for p in self.phases:
            extra = f" — {p.mrays_per_s:.2f} Mrays/s" if p.rays else ""
            lines.append(f"{p.name}: {p.seconds:.3f}s{extra}")
        return "\n".join(lines)

    def json(self) -> str:
        return json.dumps([dataclasses.asdict(p) for p in self.phases])


@contextlib.contextmanager
def xla_trace(log_dir: Optional[str]):
    """Capture a jax.profiler trace (view with tensorboard / xprof)."""
    if not log_dir:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield


def ray_count(res_x: int, res_y: int, n_lights: int, spp: int = 0,
              max_depth: int = 4) -> dict:
    """Ray accounting for the Whitted pipeline (SURVEY.md §6 envelope).

    Returns counts for the minimum convention (primary + top-level shadow)
    and the full tree upper bound (every slot active)."""
    samples = max(spp, 1) ** 2 if spp > 0 else 1
    base = res_x * res_y * samples
    primary_shadow = base * (1 + n_lights)
    slots = (2 ** max_depth) - 1
    upper = base * slots * (1 + n_lights)
    return dict(primary=base, primary_shadow=primary_shadow,
                tree_upper_bound=upper)
