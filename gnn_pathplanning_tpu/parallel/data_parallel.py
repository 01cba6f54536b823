"""Data-parallel training over a device mesh.

One jitted train step with NamedSharding constraints: the batch shards over
the "data" mesh axis, parameters/optimizer state replicate, and XLA inserts
the gradient all-reduce over ICI — the TPU-native replacement for the
DDP/NCCL layer the reference never had (SURVEY §2.3: DP "No" -> pjit over
batch axis).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.dcp import DCPNet
from ..train.trainer import TrainState, render_batch


def make_dp_train_step(model: DCPNet, optimizer, mesh: Mesh,
                       data_axis: str = "data") -> Callable:
    """Build a sharded train step: (state, grids, goals, pos, actions, radius)
    -> (state, loss), with batch inputs sharded over ``data_axis``."""
    repl = NamedSharding(mesh, P())
    batched = NamedSharding(mesh, P(data_axis))

    def step(state: TrainState, grids, goals, pos, actions, radius):
        obs, gso = render_batch(grids, goals, pos, radius)

        def loss_fn(params):
            logits, updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                obs, gso, train=True, mutable=["batch_stats"])
            logp = jax.nn.log_softmax(logits, axis=-1)
            nll = -jnp.take_along_axis(logp, actions[..., None], axis=-1)
            return nll.mean(), updates["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, new_opt = optimizer.update(grads, state.opt_state,
                                            state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(params=new_params, batch_stats=new_bs,
                                  opt_state=new_opt, step=state.step + 1)
        return new_state, loss

    return jax.jit(
        step,
        in_shardings=(repl, batched, batched, batched, batched, batched),
        out_shardings=(repl, repl))
