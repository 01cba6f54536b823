"""D4 augmentation: group-consistency properties.

The decisive property: replaying the permuted expert actions from the
transformed starts on the transformed map reproduces the transformed expert
trajectory (i.e. the augmented sample is a genuinely valid MAPF imitation
sample, not just plausible-looking tensors).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnn_pathplanning_tpu.ops.augment import (ACTION_PERM, apply_d4,
                                              augment_batch)

DELTAS = np.array([[-1, 0], [0, -1], [1, 0], [0, 1], [0, 0]], np.int32)


def _random_case(rng, w=12, n=4, t=9):
    grid = (rng.rand(w, w) < 0.15).astype(np.float32)
    # a valid trajectory: random walk avoiding nothing in particular — we
    # only need positional consistency, so carve the walked cells free.
    pos = np.stack([rng.randint(1, w - 1, size=n),
                    rng.randint(1, w - 1, size=n)], -1).astype(np.int32)
    traj = [pos.copy()]
    acts = []
    p = pos.copy()
    for _ in range(t):
        a = rng.randint(0, 5, size=n)
        nxt = np.clip(p + DELTAS[a], 0, w - 1)
        a = np.where((nxt == p).all(-1) & (a != 4), 4, a)  # clamp -> stop
        acts.append(a)
        p = nxt
        traj.append(p.copy())
    traj = np.stack(traj)          # [T+1, N, 2]
    acts = np.stack(acts)          # [T, N]
    for q in traj.reshape(-1, 2):
        grid[q[0], q[1]] = 0.0
    goals = traj[-1]
    return grid, traj, acts, goals


def test_identity_element():
    rng = np.random.RandomState(0)
    grid, traj, acts, goals = _random_case(rng)
    g2, p2, q2, a2 = apply_d4(jnp.asarray(grid), jnp.asarray(traj[0]),
                              jnp.asarray(goals), jnp.asarray(acts),
                              jnp.int32(0))
    np.testing.assert_array_equal(np.asarray(g2), grid)
    np.testing.assert_array_equal(np.asarray(p2), traj[0])
    np.testing.assert_array_equal(np.asarray(a2), acts)


def test_perm_table_is_permutation_and_fixes_stop():
    t = np.asarray(ACTION_PERM)
    assert t.shape == (8, 5)
    for g in range(8):
        assert sorted(t[g]) == [0, 1, 2, 3, 4]
        assert t[g, 4] == 4


@pytest.mark.parametrize("g", range(8))
def test_replay_consistency(g):
    """Transformed actions replayed from transformed starts = transformed
    trajectory; transformed positions land on the same map content."""
    rng = np.random.RandomState(41 + g)
    grid, traj, acts, goals = _random_case(rng)
    w = grid.shape[0]

    tg, tpos, tgoals, tacts = jax.jit(apply_d4)(
        jnp.asarray(grid), jnp.asarray(traj), jnp.asarray(goals),
        jnp.asarray(acts), jnp.int32(g))
    tg, tpos, tgoals, tacts = map(np.asarray, (tg, tpos, tgoals, tacts))

    # map content preserved under the point transform
    flat = traj.reshape(-1, 2)
    tflat = tpos.reshape(-1, 2)
    assert (tflat >= 0).all() and (tflat < w).all()
    np.testing.assert_array_equal(grid[flat[:, 0], flat[:, 1]],
                                  tg[tflat[:, 0], tflat[:, 1]])

    # distances preserved (GSO invariance)
    d0 = np.linalg.norm(traj[0][:, None] - traj[0][None], axis=-1)
    d1 = np.linalg.norm(tpos[0][:, None] - tpos[0][None], axis=-1)
    np.testing.assert_allclose(d0, d1, atol=1e-5)

    # replay
    p = tpos[0].copy()
    for t in range(acts.shape[0]):
        p = p + DELTAS[tacts[t]]
        np.testing.assert_array_equal(p, tpos[t + 1])
    np.testing.assert_array_equal(tgoals, tpos[-1])


def test_augment_batch_shapes_and_determinism():
    rng = np.random.RandomState(7)
    cases = [_random_case(rng) for _ in range(6)]
    grids = jnp.asarray(np.stack([c[0] for c in cases]))
    pos = jnp.asarray(np.stack([c[1][0] for c in cases]))
    goals = jnp.asarray(np.stack([c[3] for c in cases]))
    acts = jnp.asarray(np.stack([c[2][0] for c in cases]))
    key = jax.random.PRNGKey(3)
    out1 = augment_batch(key, grids, goals, pos, acts)
    out2 = augment_batch(key, grids, goals, pos, acts)
    for a, b in zip(out1, out2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert out1[0].shape == grids.shape
    # with 6 samples and 8 group elements, some sample should change
    assert any(not np.array_equal(np.asarray(a), np.asarray(b))
               for a, b in zip(out1, (grids, goals, pos, acts)))


def test_augmented_train_step_survives_mixed_shape_retrace():
    """Regression (round 4): ops.augment is imported lazily INSIDE the first
    train_step trace; a module-level jnp constant created there becomes a
    tracer owned by that trace and raises UnexpectedTracerError on the first
    retrace — exactly what the mixed-distribution leg's second component
    shape triggers. ACTION_PERM must therefore stay numpy at module level."""
    import optax
    from gnn_pathplanning_tpu.models.dcp import DCPConfig, DCPNet
    from gnn_pathplanning_tpu.train.trainer import TrainState, make_train_step

    model = DCPNet(DCPConfig(num_taps=2))
    v = model.init_variables(jax.random.PRNGKey(0), num_agents=4)
    opt = optax.adam(1e-3)
    state = TrainState(params=v["params"], batch_stats=v["batch_stats"],
                       opt_state=opt.init(v["params"]),
                       step=jnp.asarray(0, jnp.int32),
                       epoch=jnp.asarray(0, jnp.int32))
    step_fn = make_train_step(model, opt, augment=True, seed=0)

    def batch(n, w, b=2):
        return (jnp.zeros((b, w, w), jnp.float32),
                jnp.ones((b, n, 2), jnp.int32),
                jnp.zeros((b, n, 2), jnp.int32),
                jnp.zeros((b, n), jnp.int32),
                jnp.full((b,), 6.0))

    state, _ = step_fn(state, *batch(4, 12))
    state, _ = step_fn(state, *batch(8, 20))   # retrace must not leak
    _, loss = step_fn(state, *batch(4, 12))    # cache hit still valid
    assert np.isfinite(float(loss))
