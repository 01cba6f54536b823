"""gnn_pathplanning_tpu — TPU-native framework for decentralized multi-robot path planning.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
proroklab/gnn_pathplanning (Li, Gama, Ribeiro, Prorok — arXiv:1912.06095):
imitation-learned decentralized MAPF policies with CNN encoders, K-hop graph
neural networks over the time-varying agent communication graph, a fully
batched jit-compiled closed-loop simulator with collision shielding, native
C++ expert solvers (ECBS / CBS / prioritized SIPP), and an online-expert
(DAgger) data aggregation loop.

Layout
------
- ``ops``      core array kernels: K-tap graph filter, GSO construction,
               field-of-view observation encoding (dense + Pallas paths).
- ``models``   the DCP policy network family (flax) + torch weight import.
- ``env``      batched closed-loop MAPF simulator (lax.scan over steps,
               vmap over cases) with collision shielding.
- ``data``     map/case generation, C++ expert solver drivers, dataset
               transformation and loading.
- ``train``    jit train step, optimizer/schedule, checkpointing, metrics.
- ``oe``       online expert (DAgger) failure-harvest loop.
- ``parallel`` device-mesh sharding: data-parallel training, agent-partitioned
               rollouts with K-hop halo exchange.
- ``viz``      rollout / communication-graph animation.
- ``cli``      config system + command line entry points.
"""

__version__ = "0.1.0"
