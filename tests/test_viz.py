"""Visualization artifacts tests (YAML contracts + figure rendering)."""
import numpy as np
import pytest

from gnn_pathplanning_tpu.data.solvers import (parse_solution_yaml, solve_case,
                                               write_case_yaml)
from gnn_pathplanning_tpu.viz import (Animation, draw_paths_figure,
                                      load_case_yaml, load_schedule_yaml)
from gnn_pathplanning_tpu.viz.animate import comm_links_k_hops


@pytest.fixture(scope="module")
def solved(tmp_path_factory):
    td = tmp_path_factory.mktemp("case")
    grid = np.zeros((8, 8), np.int64)
    grid[3, 2:5] = 1
    starts = np.array([[0, 0], [7, 7], [0, 7]])
    goals = np.array([[7, 0], [0, 3], [7, 4]])
    write_case_yaml(td / "in.yaml", grid, starts, goals)
    res = solve_case(grid, starts, goals, algo="ecbs", timeout=30)
    assert res.ok
    return td, grid, starts, goals, res


def test_case_yaml_roundtrip(solved):
    td, grid, starts, goals, _ = solved
    case = load_case_yaml(td / "in.yaml")
    np.testing.assert_array_equal(case["grid"], grid)
    np.testing.assert_array_equal(case["starts"], starts)
    np.testing.assert_array_equal(case["goals"], goals)
    assert case["names"] == ["agent0", "agent1", "agent2"]


def test_schedule_yaml_roundtrip(solved, tmp_path):
    td, grid, starts, goals, res = solved
    # write the solver's own output again through our emitters
    from gnn_pathplanning_tpu.data.solvers import ensure_built
    import subprocess
    out = tmp_path / "out.yaml"
    bin_dir = ensure_built()
    subprocess.run([str(bin_dir / "ecbs"), "-i", str(td / "in.yaml"),
                    "-o", str(out), "-w", "1.1"], check=True)
    sched = load_schedule_yaml(out)
    np.testing.assert_array_equal(sched[0], starts)
    np.testing.assert_array_equal(sched[-1], goals)
    parsed = parse_solution_yaml(out)
    np.testing.assert_array_equal(sched, parsed.schedule_array())


def test_comm_links_bfs():
    gso = np.zeros((4, 4))
    gso[0, 1] = gso[1, 0] = 0.5
    gso[1, 2] = gso[2, 1] = 0.5
    gso[2, 3] = gso[3, 2] = 0.5
    one_hop = comm_links_k_hops(gso, 0, 1)
    assert (0, 1) in one_hop and len(one_hop) == 1
    three_hop = comm_links_k_hops(gso, 0, 3)
    assert {(0, 1), (1, 2), (2, 3)} <= {tuple(sorted(e)) for e in three_hop}


def test_paths_figure_and_animation(solved, tmp_path):
    pytest.importorskip("matplotlib")
    td, grid, starts, goals, res = solved
    sched = res.schedule_array()
    fig = draw_paths_figure(grid, sched, sched, tmp_path / "paths.png")
    assert fig.exists() and fig.stat().st_size > 0
    gso_seq = np.tile(np.eye(3) * 0, (sched.shape[0], 1, 1))
    anim = Animation(grid, goals, sched, gso_seq, k_hops=2, chosen_agent=0)
    out = anim.render(tmp_path / "roll.gif", fps=5)
    assert out.exists() and out.stat().st_size > 0


def test_rollout_export_and_animation_cli(tmp_path):
    """save_rollout_case artifacts feed the animation CLI end to end."""
    pytest.importorskip("matplotlib")
    import jax
    import jax.numpy as jnp
    from gnn_pathplanning_tpu.env import (SimCase, gso_sequence_from_paths,
                                          rollout, save_rollout_case)
    from gnn_pathplanning_tpu.viz.animate import main as viz_main

    grid = np.zeros((8, 8), np.float32)
    starts = np.array([[0, 0], [7, 7]], np.int32)
    goals = np.array([[0, 3], [7, 4]], np.int32)
    case = SimCase(grid=jnp.array(grid), starts=jnp.array(starts),
                   goals=jnp.array(goals),
                   target_makespan=jnp.asarray(3, np.int32),
                   target_flowtime=jnp.asarray(6, np.int32))

    def greedy(obs, gso):
        goal_ch = obs[..., 1, :, :].reshape(*obs.shape[:2], 121)
        idx = jnp.argmax(goal_ch, axis=-1)
        gi, gj = idx // 11 - 5, idx % 11 - 5
        act = jnp.where(gi < 0, 0, jnp.where(gi > 0, 2,
              jnp.where(gj < 0, 1, jnp.where(gj > 0, 3, 4))))
        return jax.nn.one_hot(act, 5) * 10.0

    out = rollout(greedy, case, max_steps=6, comm_radius=6.0,
                  key=jax.random.PRNGKey(0), record_paths=True)
    paths = np.asarray(out.paths)
    gso_seq = gso_sequence_from_paths(paths, 6.0)
    arts = save_rollout_case(tmp_path, 7, "success", grid, starts, goals,
                             paths, out.metrics,
                             target_schedule=paths, gso_seq=gso_seq,
                             comm_radius=6.0)
    assert arts["input"].exists() and arts["predict"].exists()
    # the exported schedule round-trips through the YAML loader
    sched = load_schedule_yaml(arts["predict"])
    np.testing.assert_array_equal(sched, paths)
    # and the CLI renders an animation from the artifacts
    video = tmp_path / "out.gif"
    rc = viz_main(["--map", str(arts["input"]),
                   "--schedule", str(arts["predict"]),
                   "--GSO", str(arts["gso"]),
                   "--id_chosenAgent", "0", "--video", str(video),
                   "--speed", "5"])
    assert rc == 0 and video.exists() and video.stat().st_size > 0
