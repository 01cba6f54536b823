"""Agent-sharded swarm rollout: parity vs the unsharded simulator."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gnn_pathplanning_tpu.models import DCPNet, DCPConfig
from gnn_pathplanning_tpu.parallel import make_mesh
from gnn_pathplanning_tpu.parallel.swarm_rollout import (dcp_act, dcp_encode,
                                                         dcp_gfl,
                                                         swarm_rollout)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8, ("agents",))


@pytest.fixture(scope="module")
def model_vars():
    model = DCPNet(DCPConfig(num_taps=3))
    variables = model.init_variables(jax.random.PRNGKey(42), num_agents=16)
    return model, variables


def test_pure_jax_forward_matches_flax(model_vars, rng):
    """dcp_encode/act/gfl reproduce DCPNet.apply exactly (eval mode)."""
    from gnn_pathplanning_tpu.ops import graph_filter
    model, variables = model_vars
    b, n = 2, 16
    obs = jnp.asarray(rng.rand(b, n, 3, 11, 11).astype(np.float32))
    s = jnp.asarray((rng.rand(b, n, n) < 0.3).astype(np.float32) / n)
    want = model.apply(variables, obs, s, train=False)

    feat = dcp_encode(variables, obs.reshape(b * n, 3, 11, 11))
    taps, bias = dcp_gfl(variables)
    y = jax.nn.relu(graph_filter(feat.reshape(b, n, -1), s, taps, bias))
    got = dcp_act(variables, y.reshape(b * n, -1)).reshape(b, n, 5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_swarm_rollout_matches_unsharded(mesh, model_vars, rng):
    """Sharded rollout == dense rollout_batch with a fixed radius."""
    from gnn_pathplanning_tpu.env import SimCase, rollout
    model, variables = model_vars

    n, w = 16, 24
    grid = (rng.rand(w, w) < 0.08).astype(np.float32)
    # Starts clustered in a free 8x8 block so the graph is already connected
    # at the test radius — the dense rollout's t=0 growth then keeps the
    # radius, matching the swarm version's fixed-radius semantics. Radius
    # 5.5: no integer-coordinate pair sits exactly on the threshold, so the
    # (r/1.1)*1.1 round-off cannot flip edges either.
    grid[4:12, 4:12] = 0.0
    block = np.array([(x, y) for x in range(4, 12) for y in range(4, 12)])
    idx = rng.choice(len(block), n, replace=False)
    starts = block[idx].astype(np.int32)
    free = np.argwhere(grid == 0)
    gidx = rng.choice(len(free), n, replace=False)
    goals = free[gidx].astype(np.int32)
    steps = 8
    radius = 5.5

    out = swarm_rollout(mesh, variables, grid, starts, goals, radius,
                        steps, jax.random.PRNGKey(3))
    assert out.paths.shape == (steps + 1, n, 2)

    policy = lambda obs, gso: model.apply(variables, obs, gso, train=False)
    case = SimCase(grid=jnp.asarray(grid), starts=jnp.asarray(starts),
                   goals=jnp.asarray(goals),
                   target_makespan=jnp.asarray(steps, jnp.int32),
                   target_flowtime=jnp.asarray(steps * n, jnp.int32))
    dense = rollout(policy, case, max_steps=steps, comm_radius=radius,
                    key=jax.random.PRNGKey(3), record_paths=True)

    # Compare while the dense rollout is active (it stops stepping once all
    # agents reach; the swarm version keeps stepping — positions still match
    # until that point).
    t_stop = int(dense.metrics.steps)
    np.testing.assert_array_equal(np.asarray(out.paths[:t_stop + 1]),
                                  np.asarray(dense.paths[:t_stop + 1]))


def test_swarm_rollout_reaches_goals_with_greedyish_weights(mesh, model_vars):
    """Smoke: trivial single-agent-per-shard case terminates at goals
    latched, no exceptions, on an obstacle-free map."""
    model, variables = model_vars
    grid = np.zeros((16, 16), np.float32)
    starts = np.stack([np.arange(8) * 2, np.zeros(8, int)], -1).astype(np.int32)
    goals = starts.copy()
    goals[:, 1] += 3
    out = swarm_rollout(mesh, variables, grid, starts, goals, 6.0, 5,
                        jax.random.PRNGKey(0))
    assert out.reached.shape == (8,)
    assert out.final_pos.shape == (8, 2)


def test_swarm_rollout_geometric_matches_dense_path(mesh, model_vars, rng):
    """geometric=True (fused Pallas position->SpMM path, interpret mode)
    produces the same trajectories as the dense gso_cols_body path."""
    model, variables = model_vars
    n, w = 16, 24
    grid = (rng.rand(w, w) < 0.08).astype(np.float32)
    grid[4:12, 4:12] = 0.0
    block = np.array([(x, y) for x in range(4, 12) for y in range(4, 12)])
    idx = rng.choice(len(block), n, replace=False)
    starts = block[idx].astype(np.int32)
    free = np.argwhere(grid == 0)
    gidx = rng.choice(len(free), n, replace=False)
    goals = free[gidx].astype(np.int32)
    steps, radius = 6, 5.5

    dense = swarm_rollout(mesh, variables, grid, starts, goals, radius,
                          steps, jax.random.PRNGKey(3))
    geo = swarm_rollout(mesh, variables, grid, starts, goals, radius,
                        steps, jax.random.PRNGKey(3), geometric=True,
                        interpret=True)
    np.testing.assert_array_equal(np.asarray(geo.paths),
                                  np.asarray(dense.paths))


@pytest.mark.slow  # ~8 min: interpret-mode pallas at N=1024 on the CPU mesh
def test_swarm_rollout_geometric_parity_n1024(mesh, model_vars, rng):
    """BASELINE.md stress regime: N=1024 agents sharded 8 ways, the
    geometric path (no [N, N/d] dense block on any chip) matches the dense
    column-block path step for step."""
    model, variables = model_vars
    n, w = 1024, 96
    grid = np.zeros((w, w), np.float32)
    free = np.array([(x, y) for x in range(w) for y in range(w)])
    idx = rng.choice(len(free), 2 * n, replace=False)
    starts = free[idx[:n]].astype(np.int32)
    goals = free[idx[n:]].astype(np.int32)
    steps, radius = 2, 6.0

    dense = swarm_rollout(mesh, variables, grid, starts, goals, radius,
                          steps, jax.random.PRNGKey(7))
    geo = swarm_rollout(mesh, variables, grid, starts, goals, radius,
                        steps, jax.random.PRNGKey(7), geometric=True,
                        interpret=True)
    np.testing.assert_array_equal(np.asarray(geo.paths),
                                  np.asarray(dense.paths))


def test_swarm_rollout_halo_matches_dense_path(mesh, model_vars, rng):
    """swarm_rollout_halo (neighbor-only feature exchange, per-step strip
    re-partitioning) matches the dense path's trajectories while the strip
    invariant holds."""
    from gnn_pathplanning_tpu.parallel.swarm_rollout import swarm_rollout_halo
    model, variables = model_vars
    n, W, H = 32, 96, 12
    grid = np.zeros((W, H), np.float32)
    # agents spread along x (3 apart) so every strip of 4 spans ~12 >> r;
    # goals within +-2 keep the invariant across all steps
    xs = 3 * np.arange(n)
    ys = rng.randint(0, H, n)
    starts = np.stack([xs, ys], -1).astype(np.int32)
    goals = starts + rng.randint(-2, 3, (n, 2)).astype(np.int32)
    goals = np.clip(goals, 0, [W - 1, H - 1]).astype(np.int32)
    steps, radius = 6, 2.5

    dense = swarm_rollout(mesh, variables, grid, starts, goals, radius,
                          steps, jax.random.PRNGKey(5))
    halo = swarm_rollout_halo(mesh, variables, grid, starts, goals, radius,
                              steps, jax.random.PRNGKey(5))
    assert halo.exact.shape == (steps,)
    assert bool(np.asarray(halo.exact).all()), \
        "test construction must keep the strip invariant"
    np.testing.assert_array_equal(np.asarray(halo.paths),
                                  np.asarray(dense.paths))
    np.testing.assert_array_equal(np.asarray(halo.reached),
                                  np.asarray(dense.reached))


def test_swarm_rollout_geometric_compact_matches_dense_path(mesh, model_vars,
                                                            rng):
    """cap=... routes the sharded geometric path through the compacted
    scalar-prefetch kernels; trajectories must stay identical. cap=1 forces
    the in-jit overflow fallback (16 agents pad to one sender block, so the
    true per-receiver sender count is 1 — use a crowded N to overflow)."""
    model, variables = model_vars
    n, w = 16, 24
    grid = (rng.rand(w, w) < 0.08).astype(np.float32)
    grid[4:12, 4:12] = 0.0
    block = np.array([(x, y) for x in range(4, 12) for y in range(4, 12)])
    idx = rng.choice(len(block), n, replace=False)
    starts = block[idx].astype(np.int32)
    free = np.argwhere(grid == 0)
    gidx = rng.choice(len(free), n, replace=False)
    goals = free[gidx].astype(np.int32)
    steps, radius = 4, 5.5

    dense = swarm_rollout(mesh, variables, grid, starts, goals, radius,
                          steps, jax.random.PRNGKey(3))
    compact = swarm_rollout(mesh, variables, grid, starts, goals, radius,
                            steps, jax.random.PRNGKey(3), geometric=True,
                            interpret=True, cap=1)
    np.testing.assert_array_equal(np.asarray(compact.paths),
                                  np.asarray(dense.paths))


def test_swarm_rollout_halo_geometric_matches_dense_path(mesh, model_vars,
                                                         rng):
    """The fully weak-scaling form — neighbor-only halo exchange + fused
    Pallas strip kernels (geometric=True, compact grid via cap) — must
    still reproduce the dense path's trajectories exactly."""
    from gnn_pathplanning_tpu.parallel.swarm_rollout import swarm_rollout_halo
    model, variables = model_vars
    n, W, H = 32, 96, 12
    grid = np.zeros((W, H), np.float32)
    xs = 3 * np.arange(n)
    ys = rng.randint(0, H, n)
    starts = np.stack([xs, ys], -1).astype(np.int32)
    goals = starts + rng.randint(-2, 3, (n, 2)).astype(np.int32)
    goals = np.clip(goals, 0, [W - 1, H - 1]).astype(np.int32)
    steps, radius = 4, 2.5

    dense = swarm_rollout(mesh, variables, grid, starts, goals, radius,
                          steps, jax.random.PRNGKey(5))
    halo = swarm_rollout_halo(mesh, variables, grid, starts, goals, radius,
                              steps, jax.random.PRNGKey(5), geometric=True,
                              cap=1, interpret=True)
    assert bool(np.asarray(halo.exact).all())
    np.testing.assert_array_equal(np.asarray(halo.paths),
                                  np.asarray(dense.paths))


def test_swarm_rollout_halo_inexact_gate(mesh, model_vars, rng):
    """When agents crowd so strips are narrower than the comm radius, the
    invariant check must trip — and the default on_inexact="fallback" must
    keep trajectories exactly equal to the dense path anyway (the silent-
    wrong-answer mode of the pure-halo exchange is gated off)."""
    from gnn_pathplanning_tpu.parallel.swarm_rollout import swarm_rollout_halo
    model, variables = model_vars
    n = 32
    grid = np.zeros((16, 16), np.float32)
    # 8 tight x-columns of 4 agents: strip width 1 << radius 4, so agents
    # 2+ strips apart are within the radius -> halo exactness is violated.
    xs = np.arange(n) // 4
    ys = (np.arange(n) % 4) * 3
    starts = np.stack([xs, ys], -1).astype(np.int32)
    goals = starts + rng.randint(-1, 2, (n, 2)).astype(np.int32)
    goals = np.clip(goals, 0, 15).astype(np.int32)
    steps, radius = 4, 4.0

    dense = swarm_rollout(mesh, variables, grid, starts, goals, radius,
                          steps, jax.random.PRNGKey(9))

    flagged = swarm_rollout_halo(mesh, variables, grid, starts, goals,
                                 radius, steps, jax.random.PRNGKey(9),
                                 on_inexact="flag")
    assert not bool(np.asarray(flagged.exact).all()), \
        "test construction must break the strip invariant"

    gated = swarm_rollout_halo(mesh, variables, grid, starts, goals,
                               radius, steps, jax.random.PRNGKey(9),
                               on_inexact="fallback")
    np.testing.assert_array_equal(np.asarray(gated.paths),
                                  np.asarray(dense.paths))
    np.testing.assert_array_equal(np.asarray(gated.reached),
                                  np.asarray(dense.reached))

    with pytest.raises(ValueError):
        swarm_rollout_halo(mesh, variables, grid, starts, goals, radius,
                           steps, jax.random.PRNGKey(9), on_inexact="typo")
