"""Multi-device sharding tests on the 8-device virtual CPU mesh."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gnn_pathplanning_tpu.models import DCPNet, DCPConfig
from gnn_pathplanning_tpu.ops import graph_filter, compute_gso
from gnn_pathplanning_tpu.parallel import (graph_filter_sharded, make_mesh,
                                           make_dp_train_step, replicate,
                                           rollout_gso_sharded, shard_batch)
from gnn_pathplanning_tpu.train import TrainState
from gnn_pathplanning_tpu.train.trainer import make_train_step


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    return make_mesh(8, ("data",))


@pytest.fixture(scope="module")
def mesh_agents():
    return make_mesh(8, ("agents",))


def test_dp_train_step_matches_single_device(mesh8, rng):
    import optax
    model = DCPNet(DCPConfig(num_taps=2))
    # SGD makes the update linear in the gradient, so a tight tolerance
    # actually verifies the cross-device gradient all-reduce (Adam's
    # first-step normalization amplifies reduction-order noise to ~1e-4).
    opt = optax.sgd(0.1)
    variables = model.init_variables(jax.random.PRNGKey(0), num_agents=4)
    state = TrainState(params=variables["params"],
                       batch_stats=variables["batch_stats"],
                       opt_state=opt.init(variables["params"]),
                       step=jnp.asarray(0, jnp.int32),
                       epoch=jnp.asarray(0, jnp.int32))

    b, n, w, h = 16, 4, 10, 10
    grids = (rng.rand(b, w, h) < 0.1).astype(np.float32)
    goals = rng.randint(0, 10, (b, n, 2)).astype(np.int32)
    pos = rng.randint(0, 10, (b, n, 2)).astype(np.int32)
    actions = rng.randint(0, 5, (b, n)).astype(np.int32)
    radius = np.full((b,), 6.0, np.float32)
    args = (jnp.asarray(grids), jnp.asarray(goals), jnp.asarray(pos),
            jnp.asarray(actions), jnp.asarray(radius))

    single = make_train_step(model, opt)
    st1, loss1 = single(state, *args)

    dp = make_dp_train_step(model, opt, mesh8)
    st_r = replicate(mesh8, state)
    sharded_args = tuple(shard_batch(mesh8, a) for a in args)
    st2, loss2 = dp(st_r, *sharded_args)

    assert np.allclose(float(loss1), float(loss2), rtol=1e-5)
    # atol covers fp32 cross-device reduction-order noise (~1e-4 observed, from batch-norm statistics computed over the sharded batch);
    # a missing all-reduce would diverge by the full update magnitude (~1e-2).
    jax.tree.map(lambda a, b_: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b_), rtol=1e-3, atol=3e-4),
        st1.params, st2.params)


def test_graph_filter_sharded_matches_dense(mesh_agents, rng):
    n, g, f, k = 16, 8, 8, 3
    x = rng.randn(n, g).astype(np.float32)
    s = (rng.rand(n, n) / n).astype(np.float32)
    w = rng.randn(k, g, f).astype(np.float32)
    b = rng.randn(f).astype(np.float32)
    want = np.asarray(graph_filter(jnp.array(x[None]), jnp.array(s[None]),
                                   jnp.array(w), jnp.array(b)))[0]
    got = np.asarray(graph_filter_sharded(mesh_agents, jnp.array(x),
                                          jnp.array(s), jnp.array(w),
                                          jnp.array(b)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_rollout_gso_sharded_matches_dense(mesh_agents, rng):
    n = 16
    pos = rng.randint(0, 20, (n, 2)).astype(np.float32)
    want, _, _ = compute_gso(jnp.array(pos), jnp.float32(6.0), grow=False)
    got = np.asarray(rollout_gso_sharded(mesh_agents, jnp.array(pos),
                                         jnp.float32(6.0)))
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-5, atol=1e-6)


def test_sharded_filter_end_to_end(mesh_agents, rng):
    """GSO sharded build feeding the sharded filter == dense pipeline."""
    n, g, f, k = 24, 4, 4, 2
    pos = rng.randint(0, 30, (n, 2)).astype(np.float32)
    x = rng.randn(n, g).astype(np.float32)
    w = rng.randn(k, g, f).astype(np.float32)
    s_dense, _, _ = compute_gso(jnp.array(pos), jnp.float32(8.0), grow=False)
    want = np.asarray(graph_filter(jnp.array(x[None]), s_dense[None],
                                   jnp.array(w)))[0]
    s_sh = rollout_gso_sharded(mesh_agents, jnp.array(pos), jnp.float32(8.0))
    got = np.asarray(graph_filter_sharded(mesh_agents, jnp.array(x), s_sh,
                                          jnp.array(w), None))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_multihost_helpers_single_process(mesh8, tmp_path, rng):
    """Single-process exercise of the multi-host recipe: initialize no-op,
    per-host dataset sharding, global batch assembly."""
    from gnn_pathplanning_tpu.parallel.multihost import global_batch, initialize
    from gnn_pathplanning_tpu.data import load_split
    from gnn_pathplanning_tpu.data.transform import CaseRecord, save_record

    idx, count = initialize()
    assert idx == 0 and count == 1

    # dataset sharding: 6 records, 3 shards -> 2 each, disjoint
    d = tmp_path / "train"
    d.mkdir()
    for i in range(6):
        states = np.tile(np.array([[[1 + i, 1]]], np.int16), (3, 1, 1))
        states[1, 0, 1] = 2
        states[2, 0, 1] = 3
        rec = CaseRecord(grid=np.zeros((8, 8), np.uint8),
                         goals=states[-1].astype(np.int16), states=states,
                         actions=np.full((2, 1), 3, np.int8), radius=6.0,
                         makespan=2, target_makespan=2, target_flowtime=2)
        save_record(d / f"train_IDMap0_IDCase{i}_MP2.npz", rec)
    shards = [load_split(d, shard_index=s, num_shards=3) for s in range(3)]
    assert all(s.num_cases == 2 for s in shards)
    starts = {tuple(s.states[c, 0, 0]) for s in shards for c in range(2)}
    assert len(starts) == 6  # disjoint coverage

    # global batch assembly (1 process -> identity, but sharded placement)
    local = {"pos": rng.randint(0, 8, (16, 4, 2)).astype(np.int32)}
    global_arrays = global_batch(mesh8, local)
    assert global_arrays["pos"].shape == (16, 4, 2)
    np.testing.assert_array_equal(np.asarray(global_arrays["pos"]), local["pos"])
