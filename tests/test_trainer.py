"""Trainer integration tests on a tiny generated dataset."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gnn_pathplanning_tpu.data import generate_dataset, load_split
from gnn_pathplanning_tpu.models import DCPNet, DCPConfig
from gnn_pathplanning_tpu.train import (Trainer, TrainConfig, load_checkpoint,
                                        latest_checkpoint, save_checkpoint)
from gnn_pathplanning_tpu.train.trainer import cosine_lr, make_optimizer, set_lr


@pytest.fixture(scope="module")
def tiny_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    generate_dataset(root, map_w=10, map_h=10, num_agents=3,
                     splits={"train": (2, 4), "valid": (1, 3)},
                     workers=1, seed=3)
    base = root / "map10x10_density_p1" / "3_Agent"
    return load_split(base / "train"), load_split(base / "valid")


@pytest.fixture()
def trainer(tiny_data, tmp_path):
    train_set, valid_set = tiny_data
    cfg = TrainConfig(batch_size=8, max_epoch=10, num_valid_rollouts=3)
    return Trainer(DCPNet(DCPConfig(num_taps=2)), cfg, tmp_path / "exp",
                   train_set, valid_set)


def test_cosine_schedule_endpoints():
    cfg = TrainConfig(learning_rate=1e-3, eta_min=1e-6, max_epoch=150)
    assert float(cosine_lr(cfg, 0)) == pytest.approx(1e-3)
    assert float(cosine_lr(cfg, 150)) == pytest.approx(1e-6)
    assert float(cosine_lr(cfg, 75)) == pytest.approx((1e-3 + 1e-6) / 2)


def test_set_lr_applies(trainer):
    st = set_lr(trainer.state.opt_state, 0.123)
    assert float(st[2].hyperparams["lr"]) == pytest.approx(0.123)


def test_train_reduces_loss(trainer):
    losses = [trainer.train_one_epoch(e) for e in range(3)]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_validate_rollout_summary(trainer):
    s = trainer.validate_rollout()
    assert 0.0 <= s["rate_ReachGoal"] <= 1.0
    assert s["num_validset"] == 3
    assert len(s["hist_numAgentReachGoal"]) == 4


def test_checkpoint_roundtrip(trainer, tmp_path):
    trainer.train_one_epoch(0)
    save_checkpoint(tmp_path / "ck", trainer.state, epoch=0, is_best=True)
    p = latest_checkpoint(tmp_path / "ck", "best")
    assert p is not None
    restored, meta = load_checkpoint(p, trainer.state)
    assert meta["epoch"] == 0
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
                 trainer.state.params, restored.params)


def test_resume(trainer):
    trainer.train_one_epoch(0)
    from gnn_pathplanning_tpu.train import save_checkpoint as sc
    sc(trainer.exp_dir / "checkpoints", trainer.state, epoch=0)
    step_before = int(trainer.state.step)
    trainer.train_one_epoch(1)
    assert trainer.try_resume("latest")
    assert int(trainer.state.step) == step_before


def test_weight_decay_is_l2_into_grad():
    """torch Adam semantics: with zero gradient, decay still moves params
    through the Adam moments (unlike zero-update)."""
    cfg = TrainConfig(weight_decay=0.1, learning_rate=0.01)
    opt = make_optimizer(cfg)
    params = {"w": jnp.ones((3,))}
    st = opt.init(params)
    grads = {"w": jnp.zeros((3,))}
    updates, _ = opt.update(grads, st, params)
    assert float(jnp.abs(updates["w"]).sum()) > 0


def test_validate_step_accuracy(trainer):
    trainer.train_one_epoch(0)
    s = trainer.validate_step(trainer.train_set, batch_size=8, max_batches=5)
    assert np.isfinite(s["step_loss"])
    assert 0.0 <= s["step_accuracy"] <= 1.0


def test_export_rollouts(trainer, tmp_path):
    n = trainer.export_rollouts(trainer.valid_set, tmp_path / "anime", limit=2)
    assert n == 2
    files = list((tmp_path / "anime" / "predict").glob("*.yaml"))
    assert len(files) == 2
    assert (tmp_path / "anime" / "GSO").exists()


def test_ensemble_policy(trainer):
    """Ensembling (framework extension): an ensemble of the same member is
    argmax-equivalent to the single policy, and a 2-member ensemble of
    different weights averages action distributions."""
    obs = jnp.zeros((2, 3, 3, 11, 11), jnp.float32)
    gso = jnp.eye(3, dtype=jnp.float32)[None].repeat(2, 0)
    single = trainer.policy()(obs, gso)

    trainer.ensemble_states = [trainer.state]
    same = trainer.policy()(obs, gso)
    np.testing.assert_array_equal(np.argmax(single, -1), np.argmax(same, -1))
    np.testing.assert_allclose(np.asarray(jax.nn.softmax(same, -1)),
                               np.asarray(jax.nn.softmax(single, -1)),
                               atol=1e-6)

    trainer.train_one_epoch(0)  # perturb live state away from the member
    mixed = trainer.policy()(obs, gso)
    a = jax.nn.softmax(trainer.model.apply(
        {"params": trainer.state.params,
         "batch_stats": trainer.state.batch_stats}, obs, gso, train=False))
    b = jax.nn.softmax(trainer.model.apply(
        {"params": trainer.ensemble_states[0].params,
         "batch_stats": trainer.ensemble_states[0].batch_stats},
        obs, gso, train=False))
    np.testing.assert_allclose(np.asarray(jax.nn.softmax(mixed, -1)),
                               np.asarray((a + b) / 2), atol=1e-6)
