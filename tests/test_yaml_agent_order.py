"""Agent-order regression: schedule YAML parsers must preserve the file's
agent insertion order (the reference keeps dict insertion order; digit-based
sorting collapsed non-'agent{i}' names to key 0 and scrambled schedules)."""
import numpy as np

from gnn_pathplanning_tpu.data.solvers import parse_solution_yaml
from gnn_pathplanning_tpu.viz.animate import load_schedule_yaml

YAML = """statistics:
  cost: 4
  makespan: 2
schedule:
  robotB:
    - x: 1
      y: 1
      t: 0
    - x: 1
      y: 2
      t: 1
  alpha:
    - x: 3
      y: 3
      t: 0
    - x: 4
      y: 3
      t: 1
"""


def test_parse_solution_preserves_file_order(tmp_path):
    p = tmp_path / "out.yaml"
    p.write_text(YAML)
    res = parse_solution_yaml(p)
    assert res.ok
    # robotB first (file order), then alpha
    np.testing.assert_array_equal(res.paths[0], [[1, 1], [1, 2]])
    np.testing.assert_array_equal(res.paths[1], [[3, 3], [4, 3]])


def test_load_schedule_preserves_file_order(tmp_path):
    p = tmp_path / "out.yaml"
    p.write_text(YAML)
    sched = load_schedule_yaml(p)          # [T, N, 2]
    np.testing.assert_array_equal(sched[:, 0], [[1, 1], [1, 2]])
    np.testing.assert_array_equal(sched[:, 1], [[3, 3], [4, 3]])
