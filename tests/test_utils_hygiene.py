"""Unit tests for the auxiliary runtime pieces: the multi-host bootstrap
(parallel/dist.initialize_multihost) and checkpoint failure behavior
(utils/checkpoint) — a corrupt or mismatched checkpoint must raise, never
silently resume wrong state.
"""
import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from u_4a_2s_p3d_raytracer_template2_tpu.parallel.dist import (
    initialize_multihost,
)
from u_4a_2s_p3d_raytracer_template2_tpu.utils import checkpoint


def test_multihost_noop_single_process():
    assert initialize_multihost() is False
    assert initialize_multihost(num_processes=1) is False
    assert initialize_multihost(num_processes=0) is False


def test_multihost_calls_jax_distributed(monkeypatch):
    calls = {}

    def fake_init(coordinator_address=None, num_processes=None,
                  process_id=None):
        calls.update(coordinator_address=coordinator_address,
                     num_processes=num_processes, process_id=process_id)

    import jax

    monkeypatch.setattr(jax.distributed, "initialize", fake_init)
    out = initialize_multihost(coordinator_address="10.0.0.1:8476",
                               num_processes=4, process_id=2)
    assert out is True
    assert calls == dict(coordinator_address="10.0.0.1:8476",
                         num_processes=4, process_id=2)


# ---------------------------------------------------------------------------
# checkpoint


@dataclasses.dataclass
class _State:
    a: jnp.ndarray
    b: jnp.ndarray


import jax

jax.tree_util.register_dataclass(_State, data_fields=["a", "b"],
                                 meta_fields=[])


def _mk(val=1.0):
    return _State(a=jnp.full((4, 4), val, jnp.float32),
                  b=jnp.asarray(7.0, jnp.float32))


def test_checkpoint_roundtrip(tmp_path):
    p = str(tmp_path / "ck")
    st = _mk(3.0)
    checkpoint.save(p, st)
    out = checkpoint.restore(p, _mk(0.0))
    assert np.allclose(np.asarray(out.a), 3.0)
    assert float(out.b) == 7.0


def test_checkpoint_missing_raises(tmp_path):
    with pytest.raises((FileNotFoundError, ValueError, Exception)):
        checkpoint.restore(str(tmp_path / "nope"), _mk())


def test_checkpoint_npz_leaf_mismatch_raises(tmp_path):
    p = str(tmp_path / "bad.npz")
    np.savez(p, np.zeros((4, 4), np.float32))  # one leaf, target has two
    with pytest.raises(ValueError, match="leaves|leaf"):
        checkpoint.restore(p, _mk())


def test_checkpoint_npz_shape_mismatch_raises(tmp_path):
    p = str(tmp_path / "bad2.npz")
    np.savez(p, np.zeros((2, 2), np.float32), np.float32(1.0))
    with pytest.raises(ValueError, match="shape"):
        checkpoint.restore(p, _mk())
