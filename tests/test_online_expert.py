"""Online expert (DAgger) loop tests."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gnn_pathplanning_tpu.data import generate_dataset, load_split
from gnn_pathplanning_tpu.env.simulator import SimCase, rollout_batch
from gnn_pathplanning_tpu.models import DCPNet, DCPConfig
from gnn_pathplanning_tpu.oe import (GenPool, OnlineExpert,
                                     OnlineExpertConfig, OnlineExpertTrainer,
                                     harvest_failures)
from gnn_pathplanning_tpu.train import TrainConfig


def _stuck_policy(obs, gso):
    """Always try to move up — guarantees failures on most maps."""
    b, n = obs.shape[:2]
    return jnp.tile(jax.nn.one_hot(0, 5) * 10.0, (b, n, 1))


def _cases():
    grid = np.zeros((3, 8, 8), np.float32)
    starts = np.array([[[4, 1], [4, 6]], [[5, 2], [5, 5]], [[3, 3], [6, 6]]], np.int32)
    goals = np.array([[[7, 1], [7, 6]], [[7, 2], [7, 5]], [[7, 3], [7, 6]]], np.int32)
    return SimCase(grid=jnp.asarray(grid), starts=jnp.asarray(starts),
                   goals=jnp.asarray(goals),
                   target_makespan=jnp.asarray([4, 4, 4], np.int32),
                   target_flowtime=jnp.asarray([8, 8, 8], np.int32))


def test_harvest_failures_builds_new_cases():
    cases = _cases()
    out = rollout_batch(_stuck_policy, cases, 8, 6.0, jax.random.PRNGKey(0))
    assert not np.asarray(out.metrics.all_reached).any()
    pool = harvest_failures(out, cases)
    assert len(pool.grids) == 3
    # new starts are the final (stuck-at-top) positions, goals unchanged
    np.testing.assert_array_equal(pool.goals[0], np.asarray(cases.goals[0]))
    assert (np.asarray(pool.starts[0])[:, 0] == 0).all()  # marched to row 0


def test_solve_and_cache_writes_records(tmp_path):
    cases = _cases()
    out = rollout_batch(_stuck_policy, cases, 8, 6.0, jax.random.PRNGKey(0))
    pool = harvest_failures(out, cases)
    oe = OnlineExpert(tmp_path / "cache", OnlineExpertConfig(workers=1))
    saved = oe.solve_and_cache(pool, epoch=4)
    assert saved == 3
    files = list((tmp_path / "cache" / "epoch_4").glob("*.npz"))
    assert len(files) == 3
    assert oe.cache_dirs() == [tmp_path / "cache" / "epoch_4"]


def test_harvest_counts_reported():
    cases = _cases()
    out = rollout_batch(_stuck_policy, cases, 8, 6.0, jax.random.PRNGKey(0))
    counts = {}
    harvest_failures(out, cases, counts)
    assert counts["failed"] == 3
    assert counts["dropped_overlap"] == 0


def test_oe_trainer_gen_pools_mixes_regimes(tmp_path):
    """Round-5 recipe: gen-regime harvest pools produce per-regime failure
    caches that enter training as weighted MixedDataset components."""
    from gnn_pathplanning_tpu.data.dataset import MixedDataset
    generate_dataset(tmp_path / "data", map_w=10, map_h=10, num_agents=3,
                     splits={"train": (2, 4), "valid": (1, 2)},
                     workers=1, seed=21)
    generate_dataset(tmp_path / "data", map_w=12, map_h=12, num_agents=4,
                     splits={"train": (2, 4)}, workers=1, seed=22)
    base = tmp_path / "data" / "map10x10_density_p1" / "3_Agent"
    gen_dir = (tmp_path / "data" / "map12x12_density_p1" / "4_Agent"
               / "train")
    train_set = load_split(base / "train")
    valid_set = load_split(base / "valid")

    cfg = TrainConfig(batch_size=8, max_epoch=2, validate_every=1,
                      num_valid_rollouts=2)
    oe_cfg = OnlineExpertConfig(
        start_epoch=0, workers=1, num_rollouts=8,
        gen_pools=[GenPool(train_dir=gen_dir, num_rollouts=4, weight=2.0,
                           timeout=20.0)])
    tr = OnlineExpertTrainer(DCPNet(DCPConfig(num_taps=2)), cfg,
                             tmp_path / "exp", train_set, valid_set,
                             oe_cfg=oe_cfg, train_dir=base / "train")
    saved = tr.run_online_expert(0)  # untrained net fails nearly everywhere
    gen_cache = tr.exp_dir / "failure_cache_gen0"
    if any(gen_cache.glob("epoch_*/*.npz")):
        assert isinstance(tr.train_set, MixedDataset)
        comps = tr.train_set.components
        assert comps[0].num_agents == 3
        assert comps[-1].num_agents == 4
        assert tr.train_set.weights[-1] == 2.0
        # training over the mixed pool runs (retraces once per regime shape)
        tr.train_one_epoch(0)
    # resume path: a fresh trainer picks the gen caches back up
    if saved:
        tr2 = OnlineExpertTrainer(DCPNet(DCPConfig(num_taps=2)), cfg,
                                  tmp_path / "exp", train_set, valid_set,
                                  oe_cfg=oe_cfg, train_dir=base / "train")
        assert tr2.train_set.num_cases == tr.train_set.num_cases


def test_oe_trainer_aggregates_data(tmp_path):
    generate_dataset(tmp_path / "data", map_w=10, map_h=10, num_agents=3,
                     splits={"train": (2, 4), "valid": (1, 2)},
                     workers=1, seed=21)
    base = tmp_path / "data" / "map10x10_density_p1" / "3_Agent"
    train_set = load_split(base / "train")
    valid_set = load_split(base / "valid")
    n_before = train_set.num_cases

    cfg = TrainConfig(batch_size=8, max_epoch=2, validate_every=1,
                      num_valid_rollouts=2)
    oe_cfg = OnlineExpertConfig(start_epoch=0, workers=1, num_rollouts=8)
    tr = OnlineExpertTrainer(DCPNet(DCPConfig(num_taps=2)), cfg,
                             tmp_path / "exp", train_set, valid_set,
                             oe_cfg=oe_cfg, train_dir=base / "train")
    tr.train_one_epoch(0)  # untrained net fails most rollouts
    saved = tr.run_online_expert(0)
    if saved:  # untrained policies fail nearly always, so normally > 0
        assert tr.train_set.num_cases > n_before
    cache = tr.exp_dir / "failure_cache"
    assert cache.exists()
