from .mesh import make_mesh, replicate, shard_batch
from .data_parallel import make_dp_train_step
from .swarm import graph_filter_sharded, rollout_gso_sharded

__all__ = [
    "make_mesh",
    "replicate",
    "shard_batch",
    "make_dp_train_step",
    "graph_filter_sharded",
    "rollout_gso_sharded",
]
