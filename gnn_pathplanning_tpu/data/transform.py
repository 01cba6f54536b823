"""Expert solution -> training record transformation.

Capability parity with the reference transformer
(/root/reference/offlineExpert/DataGen_Transformer.py), re-designed for TPU:

The reference pre-renders every FOV tensor and GSO matrix into per-case
``.mat`` files (pathtransformer_RelativeCoordinate, :352-371). We instead
store the *compact generators* of those tensors — map, goals, the state
sequence, action indices, and the per-case communication radius — and render
FOV windows / GSOs **on device inside the jitted train step** (ops.fov /
ops.gso). A training sample then costs ~N*6 bytes of host->device traffic
instead of N*3*11*11 floats, and the rendering fuses into the forward pass.

Semantics preserved:
- action extraction from consecutive schedule positions, agents padded at
  goal with 'stop' (obtainSchedule, :295-338); delta order
  [up,left,down,right,stop].
- trajectory-level communication radius: grown 1.1x until EVERY timestep's
  graph is connected, then shared across the trajectory
  (computeAdjacencyMatrix, :466-517). Stored as ``radius``; the training
  GSO for step t is normalize(adjacency(pos_t, radius)) — bit-identical to
  the reference's stored GSO sequence.
- target makespan/flowtime replay semantics of the simulator's
  ``getPathTarget`` (multirobotsim_dcenlocal.py:159-230): start = first
  non-stop action step, end = first arrival step, flowtime = sum(end-start),
  makespan = max(end) - min(start).
"""
from __future__ import annotations

import dataclasses
from pathlib import Path

import numpy as np

# delta order matches the reference (statetransformer / simulator)
_DELTAS = np.array([[-1, 0], [0, -1], [1, 0], [0, 1], [0, 0]], np.int32)
STOP = 4


def _np_connected(w: np.ndarray) -> bool:
    """Exact connectivity via boolean reachability doubling (numpy; keeps
    data-generation workers free of jax)."""
    n = w.shape[0]
    if n <= 1:
        return True
    reach = ((w + w.T) > 0) | np.eye(n, dtype=bool)
    for _ in range(max(1, (n - 1).bit_length())):
        reach = reach @ reach
    return bool(reach[0].all())


@dataclasses.dataclass
class CaseRecord:
    """One solved MAPF case in compact generator form."""
    grid: np.ndarray       # [W, H] uint8
    goals: np.ndarray      # [N, 2] int16
    states: np.ndarray     # [T+1, N, 2] int16 — positions at steps 0..T
    actions: np.ndarray    # [T, N] int8 — action indices (state t -> t+1)
    radius: float          # trajectory communication radius
    makespan: int          # T (solution makespan)
    target_makespan: int   # replayed metric (max end - min start)
    target_flowtime: int   # replayed metric (sum of end - start)
    hash_ids: np.ndarray | None = None  # [N] per-agent sha256-derived ids

    @property
    def num_agents(self) -> int:
        return self.goals.shape[0]


def agent_hash_ids(map_id: int, case_id: int, num_agents: int) -> np.ndarray:
    """Per-agent sha256-derived ids (reference DataGen_Transformer.py:287-289:
    int(sha256(f'{map}_{case}_{agent}').hexdigest(), 16) % 10**5)."""
    import hashlib
    out = np.zeros((num_agents,), np.int64)
    for a in range(num_agents):
        s = f"{map_id}_{case_id}_{a}".encode()
        out[a] = int(hashlib.sha256(s).hexdigest(), 16) % (10 ** 5)
    return out


def actions_from_states(states: np.ndarray) -> np.ndarray:
    """Action indices [T, N] from a position sequence [T+1, N, 2]."""
    diff = states[1:] - states[:-1]                       # [T, N, 2]
    match = (diff[..., None, :] == _DELTAS).all(-1)       # [T, N, 5]
    if not match.any(-1).all():
        raise ValueError("non-unit move in schedule")
    return match.argmax(-1).astype(np.int8)


def trajectory_radius(states: np.ndarray, comm_radius: float) -> float:
    """Grow the radius 1.1x until every timestep's graph is connected
    (DataGen_Transformer.py:466-503 semantics)."""
    r = float(comm_radius)
    n = states.shape[1]
    if n == 1:
        return r
    for t in range(states.shape[0]):
        pos = states[t].astype(np.float64)
        diff = pos[:, None] - pos[None]
        dist = np.sqrt((diff * diff).sum(-1))
        while True:
            w = (dist < r).astype(np.float64)
            np.fill_diagonal(w, 0.0)
            if _np_connected(w):
                break
            r *= 1.1
    return r


def replay_targets(states: np.ndarray, actions: np.ndarray,
                   goals: np.ndarray) -> tuple[int, int]:
    """(makespan, flowtime) with getPathTarget start/end semantics."""
    t_steps, n = actions.shape
    starts = np.zeros(n, np.int64)
    ends = np.zeros(n, np.int64)
    for a in range(n):
        moving = np.nonzero(actions[:, a] != STOP)[0]
        starts[a] = moving[0] if len(moving) else 0
        at_goal = np.nonzero((states[1:, a] == goals[a]).all(-1))[0]
        ends[a] = (at_goal[0] + 1) if len(at_goal) else t_steps
    makespan = int(ends.max() - starts.min())
    flowtime = int((ends - starts).sum())
    return makespan, flowtime


def record_from_solution(grid: np.ndarray, goals: np.ndarray,
                         schedule: np.ndarray,
                         comm_radius: float = 6.0) -> CaseRecord:
    """Build a CaseRecord from a dense expert schedule [T+1, N, 2]."""
    states = np.asarray(schedule, np.int16)
    actions = actions_from_states(states.astype(np.int32))
    makespan = states.shape[0] - 1
    radius = trajectory_radius(states.astype(np.float32), comm_radius)
    tm, tf = replay_targets(states.astype(np.int32), actions, np.asarray(goals))
    return CaseRecord(
        grid=np.asarray(grid, np.uint8), goals=np.asarray(goals, np.int16),
        states=states, actions=actions, radius=radius, makespan=makespan,
        target_makespan=tm, target_flowtime=tf)


def save_record(path: str | Path, rec: CaseRecord) -> None:
    extra = {}
    if rec.hash_ids is not None:
        extra["hash_ids"] = rec.hash_ids
    np.savez_compressed(
        path, grid=rec.grid, goals=rec.goals, states=rec.states,
        actions=rec.actions, radius=np.float64(rec.radius),
        makespan=np.int32(rec.makespan),
        target_makespan=np.int32(rec.target_makespan),
        target_flowtime=np.int32(rec.target_flowtime), **extra)


def load_record(path: str | Path) -> CaseRecord:
    with np.load(path) as z:
        return CaseRecord(
            grid=z["grid"], goals=z["goals"], states=z["states"],
            actions=z["actions"], radius=float(z["radius"]),
            makespan=int(z["makespan"]),
            target_makespan=int(z["target_makespan"]),
            target_flowtime=int(z["target_flowtime"]),
            hash_ids=z["hash_ids"] if "hash_ids" in z.files else None)


def load_reference_mat(path: str | Path) -> CaseRecord:
    """Read a reference-format ``.mat`` training case
    (DataGen_Transformer.py:352-371 field names) into a CaseRecord — gives
    drop-in use of datasets produced by the reference pipeline."""
    import scipy.io as sio
    d = sio.loadmat(path)
    states = np.asarray(d["inputState"], np.int16)      # [T+1, N, 2]
    grid = np.asarray(d["map"], np.uint8)
    goals = np.asarray(d["goal"], np.int16)
    actions = actions_from_states(states.astype(np.int32))
    makespan = int(np.asarray(d["makespan"]).ravel()[0]) if "makespan" in d \
        else states.shape[0] - 1
    tm, tf = replay_targets(states.astype(np.int32), actions, goals)
    # Radius is implicit in the stored GSO; re-derive via trajectory growth.
    radius = trajectory_radius(states.astype(np.float32), 6.0)
    return CaseRecord(grid=grid, goals=goals, states=states, actions=actions,
                      radius=radius, makespan=makespan, target_makespan=tm,
                      target_flowtime=tf)
