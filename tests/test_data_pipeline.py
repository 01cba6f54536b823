"""End-to-end data pipeline tests: mapgen -> expert -> records -> dataset."""
import numpy as np
import pytest

from gnn_pathplanning_tpu.data import (
    CaseDataset, generate_case_pool, generate_dataset, load_record,
    load_split, record_from_solution, save_record, solve_case,
)
from gnn_pathplanning_tpu.data.mapgen import (fill_unreachable,
                                              generate_map,
                                              generate_random_map)
from gnn_pathplanning_tpu.data.transform import (actions_from_states,
                                                 replay_targets,
                                                 trajectory_radius)

DELTAS = np.array([[-1, 0], [0, -1], [1, 0], [0, 1], [0, 0]])


def test_generate_map_connected_free_space(rng):
    for _ in range(5):
        grid = generate_map(16, 16, complexity=0.02, density=0.3, rng=rng)
        # Every free cell must be reachable from every other: re-filling
        # changes nothing.
        np.testing.assert_array_equal(fill_unreachable(grid), grid)
        assert 0 < grid.sum() < grid.size



def test_generate_random_map_family(rng):
    """BMAP 'random' family: uniform obstacles near the target density,
    single connected free region, no maze structure requirement."""
    for _ in range(5):
        grid = generate_random_map(40, 40, density=0.1, rng=rng)
        np.testing.assert_array_equal(fill_unreachable(grid), grid)
        assert 0 < grid.sum() < grid.size
        # density lands near 10% (+ fill-in of unreachable pockets)
        assert 0.05 <= grid.mean() <= 0.25


def test_case_pool_map_type_random(rng):
    from gnn_pathplanning_tpu.data.cases import generate_case_pool
    pool = generate_case_pool(2, 3, 24, 24, 8, seed=5, map_type="random")
    assert len(pool.grids) == 6

def test_actions_roundtrip(rng):
    # random unit-step walk
    t, n = 12, 5
    states = np.zeros((t + 1, n, 2), np.int32)
    states[0] = rng.randint(5, 15, size=(n, 2))
    acts = rng.randint(0, 5, size=(t, n))
    for i in range(t):
        states[i + 1] = states[i] + DELTAS[acts[i]]
    got = actions_from_states(states)
    np.testing.assert_array_equal(got, acts)


def test_replay_targets_semantics():
    # agent0 moves at steps 0-2 and arrives; agent1 waits 2 steps, moves 1.
    states = np.array([
        [[0, 0], [5, 5]],
        [[0, 1], [5, 5]],
        [[0, 2], [5, 5]],
        [[0, 3], [5, 6]],
    ], np.int32)
    goals = np.array([[0, 3], [5, 6]])
    actions = actions_from_states(states)
    mp, ft = replay_targets(states, actions, goals)
    # agent0: start 0, end 3; agent1: start 2, end 3
    assert ft == 3 + 1
    assert mp == 3 - 0


def test_trajectory_radius_grows_until_all_steps_connected():
    states = np.array([
        [[0, 0], [0, 3]],     # connected at r=6
        [[0, 0], [0, 9]],     # needs r > 9
    ], np.float32)
    r = trajectory_radius(states, 6.0)
    assert r > 9.0
    ladder = 6.0 * 1.1 ** np.arange(30)
    assert np.min(np.abs(ladder - r)) < 1e-6


def test_record_roundtrip(tmp_path, rng):
    grid = generate_map(10, 10, rng=rng)
    pool = generate_case_pool(1, 1, 10, 10, 3, seed=5)
    res = solve_case(pool.grids[0], pool.starts[0], pool.goals[0],
                     algo="ecbs", timeout=60)
    assert res.ok
    rec = record_from_solution(pool.grids[0], pool.goals[0],
                               res.schedule_array())
    p = tmp_path / "case_MP{}.npz".format(rec.makespan)
    save_record(p, rec)
    rec2 = load_record(p)
    np.testing.assert_array_equal(rec.states, rec2.states)
    np.testing.assert_array_equal(rec.actions, rec2.actions)
    assert rec.radius == rec2.radius
    assert rec.target_makespan == rec2.target_makespan


def test_generate_dataset_and_load(tmp_path):
    counts = generate_dataset(tmp_path, map_w=10, map_h=10, num_agents=3,
                              splits={"train": (2, 3), "valid": (1, 2)},
                              workers=1, seed=11)
    assert counts["train"] > 0 and counts["valid"] > 0
    root = tmp_path / "map10x10_density_p1" / "3_Agent"
    ds = load_split(root / "train")
    assert ds.num_agents == 3
    assert ds.num_samples == int(ds.makespans.sum())

    batch = next(ds.batches(4, np.random.RandomState(0), drop_last=False))
    assert batch.grids.shape[1:] == (10, 10)
    assert batch.goals.shape[1:] == (3, 2)
    assert batch.pos.shape[1:] == (3, 2)
    assert batch.actions.shape[1:] == (3,)
    assert (batch.actions >= 0).all() and (batch.actions <= 4).all()

    sim = ds.sim_cases(limit=2)
    assert sim["grid"].shape == (2, 10, 10)
    assert (sim["target_makespan"] > 0).all()


def test_reference_mat_compat(tmp_path, rng):
    """Round-trip through the reference .mat schema."""
    import scipy.io as sio
    t, n = 6, 3
    states = np.zeros((t + 1, n, 2), np.int32)
    states[0] = np.array([[0, 0], [3, 3], [5, 1]])
    acts = rng.randint(0, 5, size=(t, n))
    for i in range(t):
        nxt = states[i] + DELTAS[acts[i]]
        nxt = np.clip(nxt, 0, 7)
        states[i + 1] = nxt
    grid = np.zeros((8, 8), np.int64)
    goals = states[-1]
    onehot = np.zeros((t, n, 5))
    real_acts = actions_from_states(states)
    for i in range(t):
        onehot[i, np.arange(n), real_acts[i]] = 1
    p = tmp_path / "train_IDMap0_IDCase0_MP{}.mat".format(t)
    sio.savemat(p, {"map": grid, "goal": goals, "inputState": states,
                    "target": onehot, "makespan": t, "GSO": np.zeros((t, n, n))})
    from gnn_pathplanning_tpu.data import load_reference_mat
    rec = load_reference_mat(p)
    np.testing.assert_array_equal(rec.states, states)
    np.testing.assert_array_equal(rec.actions, real_acts)
    assert rec.makespan == t


def test_hash_ids_roundtrip(tmp_path):
    from gnn_pathplanning_tpu.data.transform import agent_hash_ids
    ids = agent_hash_ids(3, 7, 5)
    assert ids.shape == (5,) and (ids >= 0).all() and (ids < 10 ** 5).all()
    # deterministic and per-agent distinct with overwhelming likelihood
    np.testing.assert_array_equal(ids, agent_hash_ids(3, 7, 5))
    import hashlib
    want = int(hashlib.sha256(b"3_7_2").hexdigest(), 16) % 10 ** 5
    assert ids[2] == want


def test_statistics_mat_archive(tmp_path):
    import scipy.io as sio
    from gnn_pathplanning_tpu.train.metrics import save_statistics_mat
    summary = {"rate_ReachGoal": 0.9, "mean_deltaFT": 0.1,
               "list_reachGoal": [1, 0, 1], "num_validset": 3}
    meta = {"exp_net": "dcp", "commRadius": 6.0, "K": 3,
            "num_agents_testing": 10}
    p = tmp_path / "statistics_test.mat"
    save_statistics_mat(p, summary, meta)
    back = sio.loadmat(p)
    assert float(back["rate_ReachGoal"]) == 0.9
    assert back["exp_net"][0] == "dcp"


def test_map_set_png_export(tmp_path, rng):
    """mapSet/IDMap{m:05d}.png per distinct map (CasesSolver.py:384)."""
    from gnn_pathplanning_tpu.data.cases import (export_map_set,
                                                 generate_case_pool)
    pool = generate_case_pool(2, 2, 12, 12, 2, seed=3)
    n = export_map_set(pool, tmp_path)
    pngs = sorted((tmp_path / "mapSet").glob("IDMap*.png"))
    assert n == len(pngs) == len(set(pool.map_ids))
    assert pngs[0].name == "IDMap00000.png"
    assert pngs[0].stat().st_size > 100


def test_mixed_dataset_interleaves_shapes(rng):
    """MixedDataset: batches of DIFFERENT (map, N) shapes interleave in a
    shuffled schedule; proportions follow sample counts (and weights);
    primary attributes drive validation/init."""
    from gnn_pathplanning_tpu.data.dataset import CaseDataset, MixedDataset
    from gnn_pathplanning_tpu.data.transform import CaseRecord

    def make(n_cases, w, n_agents, t):
        recs = []
        for i in range(n_cases):
            states = rng.randint(0, w, (t + 1, n_agents, 2)).astype(np.int16)
            recs.append(CaseRecord(
                grid=np.zeros((w, w), np.uint8),
                goals=states[-1].copy(),
                states=states,
                actions=rng.randint(0, 5, (t, n_agents)).astype(np.int8),
                radius=5.0, makespan=t, target_makespan=t,
                target_flowtime=t * n_agents))
        return CaseDataset(recs)

    ds20 = make(12, 20, 10, 8)   # 96 samples
    ds28 = make(6, 28, 20, 8)    # 48 samples
    mixed = MixedDataset(ds20, ds28)
    assert mixed.num_agents == 10 and mixed.map_shape == (20, 20)
    assert mixed.num_cases == 18

    shapes = []
    for batch in mixed.batches(16, np.random.RandomState(0)):
        shapes.append((batch.grids.shape[1], batch.pos.shape[1]))
    # natural proportion: 96//16=6 primary batches, 48//16=3 secondary
    assert shapes.count((20, 10)) == 6
    assert shapes.count((28, 20)) == 3
    # shuffled: the secondary batches are not all at one end
    first_28 = [i for i, s in enumerate(shapes) if s == (28, 20)]
    assert first_28 != [6, 7, 8] and first_28 != [0, 1, 2]

    # weights rescale epoch shares (w=2 doubles the secondary component,
    # restarting its shuffled pass)
    mixed_w = MixedDataset(ds20, ds28, weights=[1.0, 2.0])
    shapes_w = [(b.grids.shape[1], b.pos.shape[1])
                for b in mixed_w.batches(16, np.random.RandomState(0))]
    assert shapes_w.count((28, 20)) == 6

    # sim_cases: primary only
    sc = mixed.sim_cases(limit=4)
    assert sc["grid"].shape == (4, 20, 20)


def test_mixed_dataset_train_step_smoke(rng):
    """A jitted train step runs over mixed-shape batches (retrace per
    shape) and the loss stays finite for both regimes."""
    import jax
    from gnn_pathplanning_tpu.data.dataset import CaseDataset, MixedDataset
    from gnn_pathplanning_tpu.data.transform import CaseRecord
    from gnn_pathplanning_tpu.models.dcp import DCPConfig, DCPNet
    from gnn_pathplanning_tpu.train.trainer import TrainConfig, Trainer

    def make(n_cases, w, n_agents, t, seed):
        r = np.random.RandomState(seed)
        recs = []
        for _ in range(n_cases):
            states = r.randint(0, w, (t + 1, n_agents, 2)).astype(np.int16)
            recs.append(CaseRecord(
                grid=np.zeros((w, w), np.uint8), goals=states[-1].copy(),
                states=states,
                actions=r.randint(0, 5, (t, n_agents)).astype(np.int8),
                radius=5.0, makespan=t, target_makespan=t,
                target_flowtime=t * n_agents))
        return CaseDataset(recs)

    ds20 = make(4, 12, 4, 4, 1)
    ds16 = make(2, 16, 6, 4, 2)
    mixed = MixedDataset(ds20, ds16)
    model = DCPNet(DCPConfig(num_taps=2))
    trainer = Trainer(model, TrainConfig(batch_size=4, max_epoch=2),
                      "/tmp/mixed_smoke_exp", train_set=mixed,
                      valid_set=ds20)
    loss = trainer.train_one_epoch(0)
    assert np.isfinite(loss)


def test_load_split_extra_repeat(tmp_path):
    """DAgger oversampling: extra_repeat appends the extra-dir (OE cache)
    records that many times; repeat=1 is the reference-proportional merge."""
    import numpy as np

    from gnn_pathplanning_tpu.data.dataset import load_split
    from gnn_pathplanning_tpu.data.transform import (record_from_solution,
                                                     save_record)

    deltas = np.array([[-1, 0], [0, -1], [1, 0], [0, 1], [0, 0]])

    def rec(seed):
        rng = np.random.RandomState(seed)
        grid = np.zeros((8, 8), np.uint8)
        p0 = rng.randint(1, 7, (3, 2))
        sched = [p0]
        for _ in range(3):   # unit random walk (clip -> stop, still valid)
            sched.append(np.clip(sched[-1] + deltas[rng.randint(0, 5, 3)],
                                 0, 7))
        sched = np.stack(sched)
        return record_from_solution(grid, sched[-1], sched)

    base, extra = tmp_path / "base", tmp_path / "extra"
    base.mkdir(), extra.mkdir()
    for i in range(3):
        save_record(base / f"b{i}.npz", rec(i))
    save_record(extra / "oe0.npz", rec(99))

    plain = load_split(base, extra_dirs=[extra])
    heavy = load_split(base, extra_dirs=[extra], extra_repeat=5)
    assert plain.num_cases == 4
    assert heavy.num_cases == 3 + 5
    extra_samples = plain.num_samples - load_split(base).num_samples
    assert heavy.num_samples == plain.num_samples + 4 * extra_samples
