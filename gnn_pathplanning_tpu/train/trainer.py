"""Imitation-learning trainer for the DCP policy.

Capability parity with the reference agent
(/root/reference/agents/decentralplannerlocal.py), re-designed for TPU:

- one jitted train step over [B, N, ...]: FOV render + GSO build happen on
  device (the reference ships pre-rendered tensors from 4 dataloader
  workers), then CNN/GNN forward, cross-entropy averaged over agents
  (:305-312 semantics: sum of per-agent batch-mean CE / N == mean over B*N),
  Adam(lr 1e-3, weight_decay 1e-5 — torch-style L2-into-gradient) update.
- CosineAnnealingLR stepped per epoch, eta_min 1e-6 (:58-61).
- validation-by-rollout cadence (`validate_every`, plus every epoch for the
  first 4 when N < 10) and model_best selection on rate_ReachGoal
  (:249-273).
- checkpoint latest/best/numbered semantics via train.checkpoint.
"""
from __future__ import annotations

import dataclasses
import time
from pathlib import Path
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.dataset import CaseDataset
from ..env.simulator import SimCase, rollout_batch
from ..models.dcp import DCPNet
from ..ops.fov import render_fov
from ..ops.gso import adjacency_from_positions, normalize_adjacency
from .checkpoint import latest_checkpoint, load_checkpoint, save_checkpoint
from .metrics import MetricsLogger, PerformanceRecorder
from flax import struct


class TrainState(struct.PyTreeNode):
    params: dict
    batch_stats: dict
    opt_state: optax.OptState
    step: jax.Array
    epoch: jax.Array


@dataclasses.dataclass
class TrainConfig:
    learning_rate: float = 1e-3
    eta_min: float = 1e-6           # cosine floor (reference :58-61)
    weight_decay: float = 1e-5
    max_epoch: int = 150
    batch_size: int = 64
    validate_every: int = 4
    comm_radius: float = 6.0
    rate_maxstep: int = 2
    num_valid_rollouts: int = 200
    seed: int = 1337
    # D4 symmetry augmentation of training samples (square maps only) — a
    # framework-native addition over the reference recipe (ops/augment.py).
    augment: bool = False
    # D4 test-time ensembling in rollout validation (env/simulator.py
    # rollout_batch tta=...) — framework-native, 8x eval forward cost.
    tta: bool = False
    # Decentralized stall escape in rollouts (env/simulator.py rollout_batch
    # deadlock_break=...) — framework-native; 0 = reference semantics.
    deadlock_break: int = 0
    # Mirror scalar metrics to a TensorBoard event stream under
    # exp_dir/tb (the reference always writes TB scalars,
    # agents/decentralplannerlocal.py:105,326; finalize also exports
    # all_scalars.json, :661).
    tensorboard: bool = False


def cosine_lr(cfg: TrainConfig, epoch) -> jax.Array:
    """CosineAnnealingLR(T_max=max_epoch, eta_min) evaluated at `epoch`."""
    frac = jnp.asarray(epoch, jnp.float32) / cfg.max_epoch
    return cfg.eta_min + 0.5 * (cfg.learning_rate - cfg.eta_min) * (
        1.0 + jnp.cos(jnp.pi * frac))


def make_optimizer(cfg: TrainConfig, trainable_filter=None):
    """torch.optim.Adam(lr, weight_decay): L2 added to the gradient before
    the Adam moments (NOT decoupled AdamW).

    ``trainable_filter(path_tuple) -> bool`` freezes parameters it rejects —
    the transfer-learning mode of the reference freezes everything except
    ``*GFL*`` and ``*actions*`` (decentralplannerlocal.py:168-179); pass
    :func:`tl_trainable` for that behavior.
    """
    parts = [
        optax.add_decayed_weights(cfg.weight_decay),
        optax.scale_by_adam(),
        optax.inject_hyperparams(lambda lr: optax.scale(-lr))(
            lr=jnp.asarray(cfg.learning_rate, jnp.float32)),
    ]
    if trainable_filter is not None:
        def frozen_mask(params):
            def mark(tree, prefix=()):
                if isinstance(tree, dict):
                    return {k: mark(v, prefix + (k,)) for k, v in tree.items()}
                return not trainable_filter(prefix)
            return mark(params)
        # zero out the final updates of frozen params (== torch's
        # requires_grad=False: no gradient step, no decay)
        parts.append(optax.masked(optax.set_to_zero(), frozen_mask))
    return optax.chain(*parts)


def tl_trainable(path: tuple[str, ...]) -> bool:
    """Reference TL filter: train only the graph-filter and action-MLP
    parameters (fnmatch '*GFL*' / '*actions*')."""
    return any(("gfl" in p.lower()) or ("action" in p.lower()) for p in path)


def set_lr(opt_state, lr):
    """Rewrite the injected lr hyperparameter (per-epoch schedule step).
    Walks the (possibly nested/masked) optax state for the
    InjectHyperparamsState."""
    def walk(s):
        if hasattr(s, "hyperparams") and "lr" in getattr(s, "hyperparams", {}):
            return s._replace(
                hyperparams={"lr": jnp.asarray(lr, jnp.float32)})
        if hasattr(s, "_fields"):
            return type(s)(*(walk(getattr(s, f)) for f in s._fields))
        if isinstance(s, tuple):
            return tuple(walk(x) for x in s)
        return s
    return walk(opt_state)


def render_batch(grids, goals, pos, radius):
    """Device-side batch rendering: FOV observations + normalized GSO."""
    obs = jax.vmap(render_fov)(grids, pos, goals)
    adj = jax.vmap(adjacency_from_positions)(pos.astype(jnp.float32), radius)
    gso = jax.vmap(normalize_adjacency)(adj)
    return obs, gso


def make_train_step(model: DCPNet, optimizer, augment: bool = False,
                    seed: int = 0) -> Callable:
    @jax.jit
    def train_step(state: TrainState, grids, goals, pos, actions, radius):
        if augment:
            from ..ops.augment import augment_batch
            key = jax.random.fold_in(jax.random.PRNGKey(seed), state.step)
            grids, goals, pos, actions = augment_batch(
                key, grids, goals, pos, actions)
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
        return state.replace(params=new_params, batch_stats=new_bs,
                             opt_state=new_opt, step=state.step + 1), loss

    return train_step


def make_eval_step(model: DCPNet) -> Callable:
    @jax.jit
    def eval_step(state: TrainState, grids, goals, pos, actions, radius):
        obs, gso = render_batch(grids, goals, pos, radius)
        logits = model.apply({"params": state.params,
                              "batch_stats": state.batch_stats},
                             obs, gso, train=False)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, actions[..., None], axis=-1)
        acc = (logits.argmax(-1) == actions).mean()
        return nll.mean(), acc

    return eval_step


class Trainer:
    def __init__(self, model: DCPNet, cfg: TrainConfig, exp_dir: str | Path,
                 train_set: CaseDataset | None = None,
                 valid_set: CaseDataset | None = None,
                 trainable_filter=None):
        self.model = model
        self.cfg = cfg
        self.exp_dir = Path(exp_dir)
        self.exp_dir.mkdir(parents=True, exist_ok=True)
        self.train_set = train_set
        self.valid_set = valid_set
        self.optimizer = make_optimizer(cfg, trainable_filter)
        self.train_step = make_train_step(model, self.optimizer,
                                          augment=cfg.augment, seed=cfg.seed)
        self.eval_step = make_eval_step(model)
        self.logger = MetricsLogger(self.exp_dir / "metrics.jsonl",
                                    tensorboard=cfg.tensorboard)
        self.rng = np.random.RandomState(cfg.seed)
        self.best_reach_rate = -1.0
        # Extra member states for test-time policy ensembling (averaged
        # action distributions; framework extension — the reference
        # evaluates a single checkpoint). Populated by the CLI's
        # --ensemble_checkpoints flag.
        self.ensemble_states: list[TrainState] = []
        # per-phase wall-time accounting (reference per-phase time record,
        # decentralplannerlocal.py:537-592)
        from .profiling import PhaseTimer
        self.timer = PhaseTimer()

        key = jax.random.PRNGKey(cfg.seed)
        n = train_set.num_agents if train_set else 10
        variables = model.init_variables(key, num_agents=n)
        self.state = TrainState(
            params=variables["params"],
            batch_stats=variables["batch_stats"],
            opt_state=self.optimizer.init(variables["params"]),
            step=jnp.asarray(0, jnp.int32),
            epoch=jnp.asarray(0, jnp.int32))

    # ------------------------------------------------------------- policy
    def policy(self):
        if self.ensemble_states:
            members = [{"params": s.params, "batch_stats": s.batch_stats}
                       for s in (self.state, *self.ensemble_states)]
            apply_fn = self.model.apply

            def ensemble_policy(obs, gso):
                # Mean action distribution over members; log() keeps the
                # logits contract (argmax-equivalent, TTA-composable).
                probs = sum(jax.nn.softmax(
                    apply_fn(v, obs, gso, train=False), axis=-1)
                    for v in members)
                return jnp.log(probs / len(members))
            return ensemble_policy
        variables = {"params": self.state.params,
                     "batch_stats": self.state.batch_stats}
        apply_fn = self.model.apply
        def policy(obs, gso):
            return apply_fn(variables, obs, gso, train=False)
        return policy

    # ------------------------------------------------------------ resume
    def try_resume(self, which: str = "latest") -> bool:
        path = latest_checkpoint(self.exp_dir / "checkpoints", which)
        if path is None:
            return False
        self.state, meta = load_checkpoint(path, self.state)
        self.best_reach_rate = meta.get("best_reach_rate", -1.0)
        # The checkpoint's epoch is *completed* — resume at the next one
        # (reference: current_epoch = checkpoint['epoch'] + 1,
        # decentralplannerlocal.py:199-200).
        self.state = self.state.replace(
            epoch=jnp.asarray(int(self.state.epoch) + 1, jnp.int32))
        return True

    # ------------------------------------------------------------- train
    def train_one_epoch(self, epoch: int) -> float:
        assert self.train_set is not None
        lr = cosine_lr(self.cfg, epoch)
        self.state = self.state.replace(
            opt_state=set_lr(self.state.opt_state, lr),
            epoch=jnp.asarray(epoch, jnp.int32))
        losses = []
        with self.timer.phase("train_epoch"):
            for batch in self.train_set.batches(self.cfg.batch_size, self.rng):
                self.state, loss = self.train_step(
                    self.state, jnp.asarray(batch.grids),
                    jnp.asarray(batch.goals), jnp.asarray(batch.pos),
                    jnp.asarray(batch.actions), jnp.asarray(batch.radius))
                losses.append(loss)
        mean_loss = float(jnp.stack(losses).mean()) if losses else float("nan")
        self.logger.log("train_epoch", epoch, loss=mean_loss, lr=float(lr))
        return mean_loss

    # ---------------------------------------------------------- validate
    def validate_step(self, dataset: CaseDataset | None = None,
                      batch_size: int | None = None,
                      max_batches: int = 50) -> dict:
        """Per-step action accuracy / CE on held-out expert states — the
        reference's ``test_step`` over the validStep loader
        (decentralplannerlocal.py:431-482)."""
        ds = dataset or self.valid_set
        assert ds is not None
        bs = batch_size or self.cfg.batch_size
        losses, accs = [], []
        rng = np.random.RandomState(self.cfg.seed)
        for i, batch in enumerate(ds.batches(bs, rng, drop_last=False)):
            if i >= max_batches:
                break
            loss, acc = self.eval_step(
                self.state, jnp.asarray(batch.grids), jnp.asarray(batch.goals),
                jnp.asarray(batch.pos), jnp.asarray(batch.actions),
                jnp.asarray(batch.radius))
            losses.append(float(loss))
            accs.append(float(acc))
        out = {"step_loss": float(np.mean(losses)) if losses else float("nan"),
               "step_accuracy": float(np.mean(accs)) if accs else float("nan")}
        self.logger.log("valid_step", int(self.state.epoch), **out)
        return out

    def validate_rollout(self, dataset: CaseDataset | None = None,
                         limit: int | None = None, label: str = "valid") -> dict:
        ds = dataset or self.valid_set
        assert ds is not None
        limit = limit or self.cfg.num_valid_rollouts
        arrs = ds.sim_cases(limit=limit)
        cases = SimCase(
            grid=jnp.asarray(arrs["grid"]),
            starts=jnp.asarray(arrs["starts"]),
            goals=jnp.asarray(arrs["goals"]),
            target_makespan=jnp.asarray(arrs["target_makespan"]),
            target_flowtime=jnp.asarray(arrs["target_flowtime"]),
            solution_makespan=jnp.asarray(arrs["solution_makespan"]))
        n = ds.num_agents
        rate = 3 if n >= 20 else self.cfg.rate_maxstep
        max_steps = int(arrs["solution_makespan"].max()) * rate
        with self.timer.phase("rollout_validation"):
            out = rollout_batch(self.policy(), cases, max_steps,
                                self.cfg.comm_radius,
                                jax.random.PRNGKey(self.cfg.seed),
                                self.cfg.rate_maxstep, tta=self.cfg.tta,
                                deadlock_break=self.cfg.deadlock_break)
            jax.block_until_ready(out.metrics.all_reached)
        rec = PerformanceRecorder(n)
        rec.update_from_rollout(out.metrics)
        summary = rec.summary()
        summary["phase_times"] = self.timer.summary()
        self.logger.log(f"{label}_rollout", int(self.state.epoch), **{
            k: v for k, v in summary.items()
            if not isinstance(v, (list, dict))})
        return summary

    def export_rollouts(self, dataset: CaseDataset, out_dir: str | Path,
                        limit: int = 10) -> int:
        """Roll out `limit` cases and write the animation artifact set
        (input/predict/target YAML + GSO) — the reference's
        ``log_anime``/``save_success_cases`` capability
        (decentralplannerlocal.py:615-626). Returns #cases written."""
        from ..env.export import gso_sequence_from_paths, save_rollout_case
        arrs = dataset.sim_cases(limit=limit)
        cases = SimCase(
            grid=jnp.asarray(arrs["grid"]), starts=jnp.asarray(arrs["starts"]),
            goals=jnp.asarray(arrs["goals"]),
            target_makespan=jnp.asarray(arrs["target_makespan"]),
            target_flowtime=jnp.asarray(arrs["target_flowtime"]),
            solution_makespan=jnp.asarray(arrs["solution_makespan"]))
        n = dataset.num_agents
        rate = 3 if n >= 20 else self.cfg.rate_maxstep
        max_steps = int(arrs["solution_makespan"].max()) * rate
        out = rollout_batch(self.policy(), cases, max_steps,
                            self.cfg.comm_radius,
                            jax.random.PRNGKey(self.cfg.seed),
                            self.cfg.rate_maxstep, record_paths=True)
        count = 0
        for i in range(out.paths.shape[0]):
            m = jax.tree.map(lambda x: x[i], out.metrics)
            paths = np.asarray(out.paths[i])
            mode = "success" if bool(m.all_reached) else "failure"
            target = dataset.states[i]  # [T_max+1, N, 2] padded at goal
            save_rollout_case(
                out_dir, i, mode, arrs["grid"][i], arrs["starts"][i],
                arrs["goals"][i], paths, m,
                target_schedule=target,
                gso_seq=gso_sequence_from_paths(paths, float(m.comm_radius)),
                comm_radius=float(m.comm_radius))
            count += 1
        return count

    def post_validation(self, epoch: int) -> None:
        """Hook invoked on validation epochs after the rollout validation —
        the Online Expert trainer overrides this (the reference's
        ``excuation_onlineExport`` cadence, decentralplannerlocal_OnlineExpert
        .py:287-299 shares the validation gating)."""

    def run(self, max_epoch: int | None = None) -> dict:
        """Full training loop with validation cadence + checkpointing."""
        max_epoch = max_epoch or self.cfg.max_epoch
        n = self.train_set.num_agents
        last_summary = {}
        start_epoch = int(self.state.epoch)
        for epoch in range(start_epoch, max_epoch + 1):
            t0 = time.time()
            loss = self.train_one_epoch(epoch)
            reach = None
            early = n < 10 and epoch <= 4  # reference :256-267
            if early or (epoch % self.cfg.validate_every == 0):
                last_summary = self.validate_rollout()
                reach = last_summary["rate_ReachGoal"]
                self.validate_step()  # per-step accuracy (reference :431-482)
                save_checkpoint(self.exp_dir / "checkpoints", self.state,
                                epoch, numbered=True,
                                extra_meta={"best_reach_rate": self.best_reach_rate})
                self.post_validation(epoch)
            is_best = reach is not None and reach > self.best_reach_rate
            if is_best:
                self.best_reach_rate = reach
            save_checkpoint(self.exp_dir / "checkpoints", self.state, epoch,
                            is_best=is_best,
                            extra_meta={"best_reach_rate": self.best_reach_rate})
            self.logger.log("epoch_done", epoch, loss=loss,
                            seconds=time.time() - t0,
                            rate_ReachGoal=reach if reach is not None else -1)
        # finalize semantics (reference agent.finalize,
        # decentralplannerlocal.py:651-667): scalar JSON export + TB close
        self.logger.export_scalars_json()
        self.logger.close()
        return last_summary
