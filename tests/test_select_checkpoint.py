"""Unit tests for the unbiased checkpoint-selection tooling
(scripts/select_checkpoint.py): numbered-checkpoint discovery and SWA
state averaging."""
import importlib.util
import sys
from pathlib import Path

import numpy as np
import jax.numpy as jnp

REPO = Path(__file__).resolve().parent.parent
spec = importlib.util.spec_from_file_location(
    "select_checkpoint", REPO / "scripts" / "select_checkpoint.py")
sc = importlib.util.module_from_spec(spec)
sys.modules["select_checkpoint"] = sc
spec.loader.exec_module(sc)


def test_numbered_checkpoint_discovery(tmp_path):
    for ep in (8, 120, 16):
        (tmp_path / f"checkpoint_epoch{ep}.msgpack").write_bytes(b"x")
    (tmp_path / "model_best.msgpack").write_bytes(b"x")
    (tmp_path / "checkpoint.msgpack").write_bytes(b"x")
    found = sc.numbered_checkpoints(tmp_path)
    assert [ep for ep, _ in found] == [8, 16, 120]  # numeric, not lexical


def test_average_states_means_params():
    from gnn_pathplanning_tpu.train.trainer import TrainState
    def mk(v):
        return TrainState(
            params={"w": jnp.full((2, 2), v, jnp.float32)},
            batch_stats={"mean": jnp.full((3,), v, jnp.float32)},
            opt_state=(), step=jnp.asarray(int(v), jnp.int32),
            epoch=jnp.asarray(int(v), jnp.int32))
    avg = sc.average_states([mk(1.0), mk(3.0)])
    np.testing.assert_allclose(np.asarray(avg.params["w"]), 2.0)
    np.testing.assert_allclose(np.asarray(avg.batch_stats["mean"]), 2.0)
    assert np.asarray(avg.params["w"]).dtype == np.float32
    assert np.asarray(avg.step).dtype == np.int32  # dtype preserved
