from .simulator import (
    Rollout,
    RolloutMetrics,
    SimCase,
    collision_shield,
    rollout,
    rollout_batch,
    step_state,
)
from .export import (gso_sequence_from_paths, save_rollout_case,
                     write_schedule_yaml)

__all__ = [
    "gso_sequence_from_paths",
    "save_rollout_case",
    "write_schedule_yaml",
    "Rollout",
    "RolloutMetrics",
    "SimCase",
    "collision_shield",
    "rollout",
    "rollout_batch",
    "step_state",
]
