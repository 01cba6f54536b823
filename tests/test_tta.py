"""D4 test-time ensembling (rollout_batch tta=True).

The ensemble averages the policy over all 8 square symmetries with action
labels permuted back, so the resulting *policy* is exactly D4-equivariant
by construction. With the deterministic "index" winner rule every other
rollout component (shield, OOB/obstacle revert, radius growth, maxstep)
commutes with the group action too — therefore rolling out the TTA policy
on a transformed world must yield exactly the transformed trajectories.
A wrong permutation direction or a mis-wired transform breaks this
invariance immediately.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gnn_pathplanning_tpu.env.simulator import SimCase, rollout_batch
from gnn_pathplanning_tpu.models.dcp import DCPConfig, DCPNet
from gnn_pathplanning_tpu.ops.augment import _points, apply_d4


@pytest.fixture(scope="module")
def policy():
    model = DCPNet(DCPConfig(num_taps=2))
    variables = model.init_variables(jax.random.PRNGKey(3), num_agents=4)

    def f(obs, gso):
        return model.apply(variables, obs, gso, train=False)

    return f


def make_world(rng, n=4, w=12):
    grid = (rng.rand(w, w) < 0.1).astype(np.float32)
    free = np.argwhere(grid == 0)
    idx = rng.choice(len(free), 2 * n, replace=False)
    return grid, free[idx[:n]].astype(np.int32), free[idx[n:]].astype(np.int32)


def case_of(grid, starts, goals):
    n = starts.shape[0]
    return SimCase(grid=jnp.asarray(grid)[None],
                   starts=jnp.asarray(starts)[None],
                   goals=jnp.asarray(goals)[None],
                   target_makespan=jnp.asarray([8.0]),
                   target_flowtime=jnp.asarray([8.0 * n]),
                   solution_makespan=jnp.asarray([8.0]))


@pytest.mark.parametrize("g", [1, 3, 5, 6])
def test_tta_rollout_is_d4_equivariant(policy, g):
    rng = np.random.RandomState(0)
    grid, starts, goals = make_world(rng)
    w = grid.shape[0]
    steps = 4

    base = rollout_batch(policy, case_of(grid, starts, goals), steps, 5.0,
                         jax.random.PRNGKey(0), winner="index",
                         record_paths=True, tta=True)

    grid_g, starts_g, goals_g, _ = apply_d4(
        jnp.asarray(grid), jnp.asarray(starts), jnp.asarray(goals),
        jnp.zeros((starts.shape[0],), jnp.int32), jnp.int32(g))
    moved = rollout_batch(policy, case_of(np.asarray(grid_g),
                                          np.asarray(starts_g),
                                          np.asarray(goals_g)),
                          steps, 5.0, jax.random.PRNGKey(0), winner="index",
                          record_paths=True, tta=True)

    want = np.asarray(_points(jnp.asarray(base.paths), w, g % 4, g >= 4))
    np.testing.assert_array_equal(np.asarray(moved.paths), want)


def test_tta_changes_logits_vs_plain(policy):
    """Sanity: the ensemble is not a no-op for a generic (non-equivariant)
    network — trajectories may or may not differ, but the run must work and
    produce the same metric structure."""
    rng = np.random.RandomState(1)
    grid, starts, goals = make_world(rng)
    case = case_of(grid, starts, goals)
    plain = rollout_batch(policy, case, 4, 5.0, jax.random.PRNGKey(0),
                          winner="index")
    tta = rollout_batch(policy, case, 4, 5.0, jax.random.PRNGKey(0),
                        winner="index", tta=True)
    assert plain.metrics.all_reached.shape == tta.metrics.all_reached.shape
