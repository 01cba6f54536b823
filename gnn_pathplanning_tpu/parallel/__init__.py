from .mesh import make_mesh, replicate, shard_batch
from .data_parallel import make_dp_train_step
from .swarm import graph_filter_sharded, rollout_gso_sharded
from .halo import (halo_graph_filter_sharded, strip_partition,
                   strip_halo_exact)

__all__ = [
    "make_mesh",
    "replicate",
    "shard_batch",
    "make_dp_train_step",
    "graph_filter_sharded",
    "rollout_gso_sharded",
    "halo_graph_filter_sharded",
    "strip_partition",
    "strip_halo_exact",
]
