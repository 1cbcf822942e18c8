import os
import sys

# Force the CPU backend with a virtual 8-device mesh for sharding tests
# (SURVEY.md §4 multi-chip test pattern). The ambient environment may have
# already registered a remote-TPU jax plugin via sitecustomize (so jax can be
# imported before this file runs); jax.config.update still wins as long as no
# backend has been touched yet.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pytest  # noqa: E402


REF_SCENES = "/root/reference/P3D_RayTracer_Template2/P3D_Scenes"


def ref_scene_path(name: str):
    path = os.path.join(REF_SCENES, name)
    if not os.path.exists(path):
        pytest.skip(f"reference scene corpus not available: {name}")
    return path


import numpy as np  # noqa: E402


def assert_images_close(img, want, atol=2e-3, max_bad_frac=0.01):
    """Image comparison robust to f32-vs-f64 discrete-decision flips at
    object silhouettes: all but a small fraction of pixels must match."""
    img = np.asarray(img, np.float64)
    want = np.asarray(want, np.float64)
    assert img.shape == want.shape
    diff = np.abs(img - want).max(axis=-1)
    bad_frac = float((diff > atol).mean())
    assert bad_frac <= max_bad_frac, (
        f"{bad_frac*100:.2f}% of pixels differ by more than {atol} "
        f"(max diff {diff.max():.4f})"
    )


# NO persistent compilation cache for the CPU suite. It was enabled for
# repeat-run speed, but jaxlib's executable serialization SEGFAULTS the
# worker on one of the suite's large CPU executables
# (compilation_cache.put_executable_and_time, observed three times in r5
# at ~80% of the suite, reproduced with per-worker cache dirs — so not a
# writer race). The TPU/bench paths keep their cache
# (utils/profiling.enable_compilation_cache); CPU compiles are cheap
# enough without one.
