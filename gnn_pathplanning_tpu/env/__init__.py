from .simulator import (
    Rollout,
    RolloutMetrics,
    SimCase,
    collision_shield,
    rollout,
    rollout_batch,
    step_state,
)

__all__ = [
    "Rollout",
    "RolloutMetrics",
    "SimCase",
    "collision_shield",
    "rollout",
    "rollout_batch",
    "step_state",
]
