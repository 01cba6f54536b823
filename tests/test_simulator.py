import numpy as np
import jax
import jax.numpy as jnp

from gnn_pathplanning_tpu.env import (SimCase, collision_shield, rollout,
                                      rollout_batch, step_state)
from gnn_pathplanning_tpu.env.simulator import SimState, _init_state


KEY = jax.random.PRNGKey(7)


def shield(cur, prop, key=KEY):
    nxt, shielded, unresolved, _ = collision_shield(
        jnp.array(cur, jnp.int32), jnp.array(prop, jnp.int32), key)
    return np.asarray(nxt), bool(shielded), bool(unresolved)


def test_shield_no_conflict():
    cur = [[0, 0], [5, 5]]
    prop = [[0, 1], [5, 6]]
    nxt, shielded, unresolved = shield(cur, prop)
    np.testing.assert_array_equal(nxt, prop)
    assert not shielded and not unresolved


def test_shield_swap_conflict():
    cur = [[0, 0], [0, 1]]
    prop = [[0, 1], [0, 0]]  # head-on swap
    nxt, shielded, unresolved = shield(cur, prop)
    np.testing.assert_array_equal(nxt, cur)
    assert shielded and not unresolved


def test_shield_vertex_two_movers_one_wins():
    cur = [[0, 0], [0, 2]]
    prop = [[0, 1], [0, 1]]
    nxt, shielded, unresolved = shield(cur, prop)
    moved = [(nxt[i] == [0, 1]).all() for i in range(2)]
    assert sum(moved) == 1          # exactly one winner
    assert shielded and not unresolved


def test_shield_vertex_with_stopped_agent_stops_all():
    # Agent 0 is stopped on (0,1); agent 1 tries to enter (0,1).
    cur = [[0, 1], [0, 3]]
    prop = [[0, 1], [0, 2]]
    nxt, shielded, unresolved = shield(cur, prop)
    # no conflict at all here: prop cells are distinct
    np.testing.assert_array_equal(nxt, prop)
    cur = [[0, 1], [0, 3]]
    prop = [[0, 1], [0, 1]]  # 1 tries to move onto stopped 0
    nxt, shielded, unresolved = shield(cur, prop)
    np.testing.assert_array_equal(nxt, cur)
    assert shielded and not unresolved


def test_shield_stop_propagates_down_chain():
    # 0 stopped; 1 follows into 0's cell; 2 follows into 1's cell.
    cur = [[0, 0], [0, 1], [0, 2]]
    prop = [[0, 0], [0, 0], [0, 1]]
    nxt, shielded, unresolved = shield(cur, prop)
    np.testing.assert_array_equal(nxt, cur)
    assert shielded and not unresolved


def test_shield_rotating_cycle_resolves():
    # 3-cycle rotation: each moves into next's current cell; no vertex or
    # swap pair conflicts — rotation is actually collision-free and allowed
    # (matches reference: no vertex duplicate, no pairwise swap).
    cur = [[0, 0], [0, 1], [1, 1]]
    prop = [[0, 1], [1, 1], [0, 0]]
    nxt, shielded, unresolved = shield(cur, prop)
    np.testing.assert_array_equal(nxt, prop)
    assert not shielded and not unresolved


def _case(grid, starts, goals, mp=5, ft=10):
    return SimCase(grid=jnp.array(grid, jnp.float32),
                   starts=jnp.array(starts, jnp.int32),
                   goals=jnp.array(goals, jnp.int32),
                   target_makespan=jnp.asarray(mp, jnp.int32),
                   target_flowtime=jnp.asarray(ft, jnp.int32))


def _logits(actions, n=None):
    a = np.asarray(actions)
    out = np.zeros((len(a), 5), np.float32)
    out[np.arange(len(a)), a] = 10.0
    return jnp.array(out)


def test_step_blocks_obstacle_and_edge():
    grid = np.zeros((4, 4), np.float32)
    grid[1, 2] = 1.0
    case = _case(grid, [[1, 1], [0, 0]], [[3, 3], [3, 0]])
    st = _init_state(case)
    # agent0 right into obstacle; agent1 up off the map
    st2 = step_state(st, _logits([3, 0]), case, jnp.asarray(10), KEY)
    np.testing.assert_array_equal(np.asarray(st2.pos), [[1, 1], [0, 0]])
    assert bool(st2.predict_collision)
    # blocked moves still count as "started moving" (non-stop action)
    np.testing.assert_array_equal(np.asarray(st2.start_step), [0, 0])


def test_step_start_step_unset_until_first_move():
    grid = np.zeros((4, 4), np.float32)
    case = _case(grid, [[0, 0], [3, 3]], [[0, 3], [3, 0]])
    st = _init_state(case)
    st = step_state(st, _logits([4, 4]), case, jnp.asarray(10), KEY)  # both stop
    np.testing.assert_array_equal(np.asarray(st.start_step), [-1, -1])
    st = step_state(st, _logits([3, 1]), case, jnp.asarray(10), KEY)
    np.testing.assert_array_equal(np.asarray(st.start_step), [1, 1])


def _greedy_policy(obs, gso):
    """Move toward the goal marker in the FOV window: x first, then y."""
    goal_ch = obs[..., 1, :, :]                       # [B, N, 11, 11]
    flat = goal_ch.reshape(*goal_ch.shape[:-2], 121)
    idx = jnp.argmax(flat, axis=-1)
    gi = idx // 11 - 5
    gj = idx % 11 - 5
    # prefer x-axis moves; 0=up(-x) 2=down(+x) 1=left(-y) 3=right(+y) 4=stop
    act = jnp.where(gi < 0, 0,
          jnp.where(gi > 0, 2,
          jnp.where(gj < 0, 1,
          jnp.where(gj > 0, 3, 4))))
    return jax.nn.one_hot(act, 5) * 10.0


def test_rollout_single_agent_reaches_goal():
    grid = np.zeros((8, 8), np.float32)
    case = _case(grid, [[0, 0]], [[3, 2]], mp=5, ft=5)
    out = rollout(_greedy_policy, case, max_steps=10, comm_radius=6.0, key=KEY)
    m = out.metrics
    assert bool(m.all_reached) and bool(m.success)
    assert int(m.num_agents_reached) == 1
    # Manhattan distance 5, moving every step from t=0: makespan == 5
    assert int(m.makespan_predict) == 5
    assert int(m.flowtime_predict) == 5
    assert not bool(m.predict_collision)


def test_rollout_two_agents_cross_shielded():
    grid = np.zeros((8, 8), np.float32)
    # Both want to traverse the same column in opposite directions.
    case = _case(grid, [[0, 0], [4, 0]], [[4, 0], [0, 0]], mp=8, ft=16)
    out = rollout(_greedy_policy, case, max_steps=24, comm_radius=6.0, key=KEY)
    m = out.metrics
    # Head-on swap on a single column can never pass: shielding must fire and
    # the case must NOT end in an actual collision.
    assert bool(m.predict_collision)
    assert not bool(m.move_collision)
    assert not bool(m.all_reached)   # deadlock -> timeout (greedy can't sidestep)
    assert bool(m.no_reach_by_shielding)


def test_rollout_timeout_metrics():
    grid = np.zeros((6, 6), np.float32)
    case = _case(grid, [[0, 0]], [[5, 5]], mp=1, ft=1)  # maxstep = 2: too short
    out = rollout(_greedy_policy, case, max_steps=4, comm_radius=6.0, key=KEY)
    m = out.metrics
    assert not bool(m.all_reached)
    assert int(m.steps) == 2                  # rate_maxstep * mp
    assert int(m.makespan_predict) == 2       # end=maxstep, start=0
    assert int(m.num_agents_reached) == 0


def test_rollout_batch_shapes_and_paths():
    grid = np.zeros((8, 8), np.float32)
    cases = SimCase(
        grid=jnp.stack([jnp.array(grid)] * 3),
        starts=jnp.array([[[0, 0], [7, 7]], [[1, 1], [6, 6]], [[2, 2], [5, 5]]], jnp.int32),
        goals=jnp.array([[[0, 3], [7, 4]], [[1, 4], [6, 3]], [[2, 5], [5, 2]]], jnp.int32),
        target_makespan=jnp.array([3, 3, 3], jnp.int32),
        target_flowtime=jnp.array([6, 6, 6], jnp.int32))
    out = rollout_batch(_greedy_policy, cases, max_steps=6, comm_radius=6.0,
                        key=KEY, record_paths=True)
    assert out.metrics.all_reached.shape == (3,)
    assert np.asarray(out.metrics.all_reached).all()
    assert out.paths.shape == (3, 7, 2, 2)
    # paths start at starts and end at goals
    np.testing.assert_array_equal(np.asarray(out.paths[:, 0]), np.asarray(cases.starts))
    np.testing.assert_array_equal(np.asarray(out.final_pos), np.asarray(cases.goals))


def test_rollout_agents_can_leave_goal_but_stay_latched():
    """Reference latches reached; agents may wander off the goal afterwards."""
    grid = np.zeros((6, 6), np.float32)

    def restless_policy(obs, gso):
        # always move right
        b, n = obs.shape[:2]
        return jnp.tile(jax.nn.one_hot(3, 5) * 10.0, (b, n, 1))

    case = _case(grid, [[0, 0]], [[0, 1]], mp=4, ft=4)
    out = rollout(restless_policy, case, max_steps=8, comm_radius=6.0, key=KEY)
    m = out.metrics
    assert bool(m.all_reached)          # latched at step 1
    assert int(m.num_agents_reached) == 1
    # done latched at step 1 -> rollout stops stepping
    assert int(m.steps) == 1


def test_shield_invariants_random(rng):
    """Property test: after shielding — no vertex conflicts, no swaps, and
    every agent either keeps its proposal or reverts to its current cell."""
    for trial in range(20):
        n = rng.randint(2, 12)
        # distinct current positions on a small grid
        cells = rng.choice(36, size=n, replace=False)
        cur = np.stack([cells // 6, cells % 6], -1).astype(np.int32)
        deltas = np.array([[-1, 0], [0, -1], [1, 0], [0, 1], [0, 0]])
        prop = cur + deltas[rng.randint(0, 5, size=n)]
        nxt, shielded, unresolved, rounds = collision_shield(
            jnp.array(cur), jnp.array(prop), jax.random.PRNGKey(trial))
        assert 0 <= int(rounds) <= n + 1
        nxt = np.asarray(nxt)
        assert not bool(unresolved)
        # no vertex conflicts
        assert len({tuple(p) for p in nxt}) == n
        # no swaps
        for i in range(n):
            for j in range(i + 1, n):
                assert not ((nxt[i] == cur[j]).all() and (nxt[j] == cur[i]).all()
                            and (nxt[i] != cur[i]).any())
        # each agent: proposal or revert
        for i in range(n):
            assert (nxt[i] == prop[i]).all() or (nxt[i] == cur[i]).all()


def _fixed_pref_policy(prefs):
    """Policy ignoring observations: per-agent fixed action preferences."""
    base = jnp.asarray(np.asarray(prefs, np.float32))

    def policy(obs, gso):
        b = obs.shape[0]
        return jnp.tile(base[None], (b, 1, 1))
    return policy


def test_deadlock_break_escapes_obstacle_stall():
    """An agent forever proposing a blocked move escapes with the opt-in
    deadlock_break (next-best action after k stalled steps); without it the
    reference semantics hold (it stays put to maxstep)."""
    grid = np.zeros((4, 4), np.float32)
    grid[1, 1] = 1.0  # wall directly 'up' of the agent
    # prefers up (blocked by the wall), then left
    policy = _fixed_pref_policy([[10.0, 5.0, 0.0, 0.0, -5.0]])
    case = _case(grid, [[2, 1]], [[0, 1]], mp=5, ft=5)
    cases = jax.tree.map(lambda x: x[None], case)

    off = rollout_batch(policy, cases, max_steps=10, comm_radius=6.0,
                        key=KEY)
    np.testing.assert_array_equal(np.asarray(off.final_pos[0]), [[2, 1]])

    on = rollout_batch(policy, cases, max_steps=10, comm_radius=6.0,
                       key=KEY, deadlock_break=2)
    assert not np.array_equal(np.asarray(on.final_pos[0]), [[2, 1]])


def test_deadlock_break_escapes_swap_standoff():
    """Two agents in a persistent head-on swap standoff dodge once the
    stall counter trips; with deadlock_break=0 they are frozen forever."""
    grid = np.zeros((5, 5), np.float32)
    # agent0 at (1,1) wants right (y+1); agent1 at (1,2) wants left (y-1);
    # both dodge down (x+1) as second choice.
    policy = _fixed_pref_policy([[0.0, -1.0, 5.0, 10.0, -5.0],
                                 [0.0, 10.0, 5.0, -1.0, -5.0]])
    case = _case(grid, [[1, 1], [1, 2]], [[1, 4], [1, 0]], mp=6, ft=12)
    cases = jax.tree.map(lambda x: x[None], case)

    off = rollout_batch(policy, cases, max_steps=12, comm_radius=6.0,
                        key=KEY)
    np.testing.assert_array_equal(np.asarray(off.final_pos[0]),
                                  [[1, 1], [1, 2]])

    on = rollout_batch(policy, cases, max_steps=12, comm_radius=6.0,
                       key=KEY, deadlock_break=2)
    assert not np.array_equal(np.asarray(on.final_pos[0]),
                              [[1, 1], [1, 2]])


def test_collision_shield_grid_matches_dense():
    """extent= (grid scatter) shield must make decisions identical to the
    dense O(N^2) route: fuzzed swarms plus crafted vertex/swap/chain
    cases. Exactness matters — the swarm rollouts use the grid route while
    the reference-parity suites pin the dense route's behavior."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from gnn_pathplanning_tpu.env.simulator import collision_shield

    w = h = 12
    rng = np.random.RandomState(7)
    deltas = np.array([[0, 1], [-1, 0], [0, -1], [1, 0], [0, 0]], np.int32)

    def run_case(cur, prop, pri, n):
        key = jax.random.PRNGKey(0)
        outs = []
        for extent in (None, (w, h)):
            nxt, sh, unres, rounds = collision_shield(
                jnp.asarray(cur), jnp.asarray(prop), key,
                pri=jnp.asarray(pri), extent=extent)
            outs.append((np.asarray(nxt), bool(sh), bool(unres),
                         int(rounds)))
        (nd, sd, ud, rd), (ng, sg, ug, rg) = outs
        np.testing.assert_array_equal(nd, ng)
        assert (sd, ud, rd) == (sg, ug, rg)

    # fuzz: dense-ish swarms with many conflicts
    for trial in range(25):
        n = rng.randint(2, 40)
        cells = rng.choice(w * h, size=n, replace=False)
        cur = np.stack([cells // h, cells % h], -1).astype(np.int32)
        prop = cur + deltas[rng.randint(0, 5, n)]
        prop = np.clip(prop, 0, [[w - 1, h - 1]]).astype(np.int32)
        pri = rng.rand(n).astype(np.float32)
        run_case(cur, prop, pri, n)

    # crafted: vertex conflict with a stopped occupant + swap pair + a
    # chain that needs multiple rounds
    cur = np.array([[5, 5], [5, 4], [5, 6], [2, 2], [2, 3],
                    [8, 8], [8, 7]], np.int32)
    prop = np.array([[5, 5],            # stays (stopped occupant)
                     [5, 5], [5, 5],    # both into the stopped agent's cell
                     [2, 3], [2, 2],    # swap pair
                     [8, 7], [8, 6]],   # chain: 5 follows 6's vacated cell
                    np.int32)
    pri = np.arange(7, dtype=np.float32)
    run_case(cur, prop, pri, 7)
