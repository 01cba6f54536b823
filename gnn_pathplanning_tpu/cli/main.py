"""CLI entry point.

Capability parity with the reference CLI (/root/reference/main.py:34-87):
``python -m gnn_pathplanning_tpu.cli.main <config.json> --mode train|test
[overrides]`` plus framework-native subcommands for dataset generation.
"""
from __future__ import annotations

import argparse
import logging
import sys

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="TPU-native DCP MAPF framework")
    p.add_argument("config", nargs="?", default=None,
                   help="JSON config file (reference-compatible keys)")
    p.add_argument("--mode", type=str, default=None,
                   choices=["train", "test", "gen_data"],)
    p.add_argument("--num_agents", type=int, default=None)
    p.add_argument("--map_w", type=int, default=None)
    p.add_argument("--map_h", type=int, default=None)
    p.add_argument("--map_density", type=int, default=None)
    p.add_argument("--map_type", type=str, default=None)
    p.add_argument("--nGraphFilterTaps", type=int, default=None)
    p.add_argument("--hiddenFeatures", type=int, default=None)
    p.add_argument("--num_testset", type=int, default=None)
    p.add_argument("--num_validset", type=int, default=None)
    p.add_argument("--max_epoch", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--learning_rate", type=float, default=None)
    p.add_argument("--commR", type=float, default=None)
    p.add_argument("--rate_maxstep", type=int, default=None)
    p.add_argument("--data_root", type=str, default=None)
    p.add_argument("--save_root", type=str, default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--online_expert", action="store_true", default=None)
    p.add_argument("--oe_cache_weight", type=int, default=None,
                   help="repeat the OE failure cache this many times in "
                        "the rebuilt training set (DAgger oversampling; "
                        "1 = reference-proportional merge)")
    p.add_argument("--oe_gen_pools", type=str, default=None,
                   help="comma-separated train dirs of OTHER regimes used "
                        "as additional online-expert harvest pools (round-5 "
                        "generalization recipe); per-regime failure caches "
                        "are mixed into training as weighted components")
    p.add_argument("--oe_gen_rollouts", type=str, default=None,
                   help="comma-separated per-pool rollout sample sizes for "
                        "--oe_gen_pools (default 256 each)")
    p.add_argument("--oe_gen_commR", type=str, default=None,
                   help="comma-separated per-pool comm radii for "
                        "--oe_gen_pools (default 6 each; the 64-agent "
                        "regime uses 11 per the reference protocol)")
    p.add_argument("--oe_gen_algos", type=str, default=None,
                   help="comma-separated per-pool expert algorithms for "
                        "--oe_gen_pools: ecbs (adaptive) or prioritized "
                        "(pure SIPP; ~100x faster on congested 64-agent "
                        "harvests)")
    p.add_argument("--oe_gen_weight", type=float, default=4.0,
                   help="MixedDataset epoch-share weight of each gen-regime "
                        "failure cache (default 4)")
    p.add_argument("--oe_gen_timeout", type=float, default=60.0,
                   help="per-case expert budget (s) for gen-pool harvests")
    p.add_argument("--data_augment", action="store_true", default=None,
                   help="D4 symmetry augmentation of training samples")
    p.add_argument("--deadlock_break", type=int, default=None,
                   help="opt-in decentralized stall escape: agents stuck "
                        ">= K steps take their next-best action (0 = off, "
                        "reference semantics)")
    p.add_argument("--tta", action="store_true", default=None,
                   help="D4 test-time ensembling during rollout eval")
    p.add_argument("--tensorboard", action="store_true", default=None,
                   help="mirror scalar metrics to a TensorBoard event "
                        "stream under the experiment dir (reference "
                        "behavior; JSONL stays the source of truth)")
    p.add_argument("--log_anime", action="store_true", default=None,
                   help="export rollout YAML/GSO artifact sets in --mode test "
                        "(reference log_anime flow)")
    p.add_argument("--train_TL", action="store_true", default=None,
                   help="transfer learning: freeze all but GFL/action params")
    p.add_argument("--pretrained", type=str, default=None,
                   help="checkpoint to initialize from (for --train_TL)")
    p.add_argument("--con_train", action="store_true", default=None)
    p.add_argument("--log_time_trained", type=str, default=None,
                   help="existing experiment timestamp to resume into "
                        "(reference main.py:45 flag)")
    p.add_argument("--best_epoch", action="store_true", default=None)
    p.add_argument("--test_epoch", type=int, default=None)
    p.add_argument("--test_checkpoint", type=str, default=None,
                   help="explicit checkpoint path for --mode test")
    p.add_argument("--test_split", type=str, default="test",
                   help="dataset split dir evaluated by --mode test "
                        "(e.g. test_big — the 200-case 64-agent pools)")
    p.add_argument("--ensemble_checkpoints", type=str, default=None,
                   help="comma-separated extra checkpoints whose action "
                        "distributions are averaged with --test_checkpoint "
                        "at rollout time (framework extension)")
    # gen_data options
    p.add_argument("--num_maps", type=int, default=None)
    p.add_argument("--cases_per_map", type=int, default=None)
    p.add_argument("--solver", type=str, default="ecbs",
                   choices=["ecbs", "cbs", "prioritized"])
    p.add_argument("--workers", type=int, default=4)
    p.add_argument("--mix_train_dirs", type=str, default=None,
                   help="comma-separated extra train split dirs of OTHER "
                        "regimes (map size / agent count) mixed into "
                        "training — framework-native mixed-distribution "
                        "experiment; incompatible with --online_expert")
    p.add_argument("--mix_weights", type=str, default=None,
                   help="comma-separated per-component weights for "
                        "--mix_train_dirs (primary first; 1 = natural "
                        "proportion)")
    p.add_argument("--cpu", action="store_true", default=False,
                   help="force the CPU jax backend (this rig's "
                        "sitecustomize pins the tunneled TPU; the env var "
                        "does not work — only the post-import config "
                        "switch does). Lets evals/smoke runs proceed "
                        "during chip outages or alongside a training run")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    # Persistent compilation cache: every CLI invocation is a fresh process
    # and first-compiles of the rollout/train programs cost minutes over the
    # tunneled TPU; the eval sweep alone runs 9+ invocations.
    try:
        from pathlib import Path as _P
        jax.config.update("jax_compilation_cache_dir",
                          str(_P(__file__).resolve().parents[2]
                              / ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    from ..utils.config import load_config, process_config
    overrides = {k: v for k, v in vars(args).items()
                 if k not in ("config", "test_checkpoint", "pretrained",
                              "ensemble_checkpoints", "cpu",
                              "mix_train_dirs", "mix_weights",
                              "num_maps", "cases_per_map", "solver",
                              "workers", "log_time_trained",
                              "oe_gen_pools", "oe_gen_rollouts",
                              "oe_gen_commR", "oe_gen_algos",
                              "oe_gen_weight", "oe_gen_timeout",
                              "test_split")}
    cfg = load_config(args.config, overrides)
    np.random.seed(cfg.seed)

    if cfg.mode == "gen_data":
        from ..data.cases import generate_dataset
        counts = generate_dataset(
            cfg.data_root, map_w=cfg.map_w, map_h=cfg.map_h,
            num_agents=cfg.num_agents, density_label=cfg.map_density,
            splits={"train": (args.num_maps or 4, args.cases_per_map or 16),
                    "valid": (1, args.cases_per_map or 16),
                    "test": (1, args.cases_per_map or 16)},
            algo=args.solver, comm_radius=cfg.commR, workers=args.workers,
            seed=cfg.seed, map_type=cfg.map_type)
        print("generated:", counts)
        return 0

    timestamp = int(args.log_time_trained) if args.log_time_trained else None
    cfg = process_config(cfg, timestamp=timestamp)
    log = logging.getLogger("main")

    from ..data.dataset import load_split
    from ..models.dcp import DCPConfig, DCPNet
    from ..train.trainer import TrainConfig, Trainer

    tcfg = TrainConfig(
        learning_rate=cfg.learning_rate, weight_decay=cfg.weight_decay,
        max_epoch=cfg.max_epoch, batch_size=cfg.batch_size,
        validate_every=cfg.validate_every, comm_radius=cfg.commR,
        rate_maxstep=cfg.rate_maxstep, num_valid_rollouts=cfg.num_validset,
        seed=cfg.seed, augment=cfg.data_augment, tta=cfg.tta,
        deadlock_break=cfg.deadlock_break, tensorboard=cfg.tensorboard)
    model = DCPNet(DCPConfig(num_taps=cfg.nGraphFilterTaps))

    if cfg.mode == "train":
        train_set = load_split(f"{cfg.dataset_root}/train")
        if args.mix_train_dirs:
            if cfg.online_expert:
                log.error("--mix_train_dirs is incompatible with "
                          "--online_expert (the OE rebuild would drop the "
                          "mixed components)")
                return 1
            from ..data.dataset import MixedDataset
            extras = [load_split(d.strip())
                      for d in args.mix_train_dirs.split(",")]
            weights = None
            if args.mix_weights:
                weights = [float(w) for w in args.mix_weights.split(",")]
            train_set = MixedDataset(train_set, *extras, weights=weights)
            log.info("mixed training pool: %s",
                     [(c.map_shape, c.num_agents, c.num_samples)
                      for c in train_set.components])
        valid_set = load_split(f"{cfg.dataset_root}/valid",
                               limit=cfg.num_validset)
        # transfer learning (reference --train_TL): freeze everything but the
        # graph filter and action head (decentralplannerlocal.py:168-179)
        trainable_filter = None
        if cfg.train_TL:
            from ..train.trainer import tl_trainable
            trainable_filter = tl_trainable
        if cfg.online_expert:
            from ..oe.online_expert import (GenPool, OnlineExpertConfig,
                                            OnlineExpertTrainer)
            gen_pools = []
            if args.oe_gen_pools:
                dirs = [d.strip() for d in args.oe_gen_pools.split(",")]
                rollouts = ([int(r) for r in args.oe_gen_rollouts.split(",")]
                            if args.oe_gen_rollouts else [256] * len(dirs))
                radii = ([float(r) for r in args.oe_gen_commR.split(",")]
                         if args.oe_gen_commR else [6.0] * len(dirs))
                algos = ([a.strip() for a in args.oe_gen_algos.split(",")]
                         if args.oe_gen_algos else ["ecbs"] * len(dirs))
                if len(rollouts) != len(dirs) or len(radii) != len(dirs) \
                        or len(algos) != len(dirs):
                    log.error("--oe_gen_rollouts/--oe_gen_commR/"
                              "--oe_gen_algos must match --oe_gen_pools")
                    return 1
                gen_pools = [GenPool(train_dir=d, num_rollouts=r,
                                     comm_radius=cr, algo=al,
                                     weight=args.oe_gen_weight,
                                     timeout=args.oe_gen_timeout)
                             for d, r, cr, al in zip(dirs, rollouts, radii,
                                                     algos)]
                log.info("gen-regime OE harvest pools: %s",
                         [(g.train_dir, g.num_rollouts) for g in gen_pools])
            trainer = OnlineExpertTrainer(
                model, tcfg, cfg.exp_dir, train_set, valid_set,
                trainable_filter=trainable_filter,
                oe_cfg=OnlineExpertConfig(start_epoch=cfg.Start_onlineExpert,
                                          num_rollouts=cfg.num_test_trainingSet,
                                          cache_repeat=cfg.oe_cache_weight,
                                          gen_pools=gen_pools),
                train_dir=f"{cfg.dataset_root}/train")
        else:
            trainer = Trainer(model, tcfg, cfg.exp_dir, train_set, valid_set,
                              trainable_filter=trainable_filter)
        if args.pretrained:
            from ..train.checkpoint import load_pretrained_params
            trainer.state = load_pretrained_params(args.pretrained,
                                                   trainer.state)
        if cfg.con_train:
            trainer.try_resume("latest")
        summary = trainer.run()
        log.info("final validation: %s", summary)
        return 0

    if cfg.mode == "test":
        test_set = load_split(f"{cfg.dataset_root}/{args.test_split}",
                              limit=cfg.num_testset)
        trainer = Trainer(model, tcfg, cfg.exp_dir, valid_set=test_set)
        which = "best" if cfg.best_epoch else "latest"
        if args.test_checkpoint:
            from pathlib import Path as _P
            if not _P(args.test_checkpoint).exists():
                log.error("checkpoint not found: %s", args.test_checkpoint)
                return 1
            from ..train.checkpoint import load_checkpoint
            trainer.state, _ = load_checkpoint(args.test_checkpoint,
                                               trainer.state)
        elif not trainer.try_resume(which):
            log.error("no checkpoint found in %s", cfg.exp_dir)
            return 1
        if args.ensemble_checkpoints:
            from ..train.checkpoint import load_checkpoint
            for path in args.ensemble_checkpoints.split(","):
                member, _ = load_checkpoint(path.strip(), trainer.state)
                trainer.ensemble_states.append(member)
        summary = trainer.validate_rollout(test_set, limit=cfg.num_testset,
                                           label="test")
        # Reference test-flow artifacts (decentralplannerlocal.py:615-626 +
        # utils/metrics.py:226-288): rollout YAML/GSO sets for the animation
        # pipeline, and the .mat statistics archive the reference's
        # statistic_analysis scripts load.
        from ..train.metrics import save_statistics_mat
        from pathlib import Path as _Path
        meta = dict(exp_net=cfg.exp_net, map_w=cfg.map_w, map_h=cfg.map_h,
                    num_agents=cfg.num_agents, K=cfg.nGraphFilterTaps,
                    commRadius=cfg.commR, num_testset=cfg.num_testset,
                    map_type=cfg.map_type, test_split=args.test_split,
                    deadlock_break=cfg.deadlock_break or 0)
        split_tag = "" if args.test_split == "test" else f"_{args.test_split}"
        save_statistics_mat(
            _Path(cfg.result_statistics_dir) /
            f"statistics_{cfg.map_w}x{cfg.map_h}_{cfg.num_agents}Agent"
            f"_K{cfg.nGraphFilterTaps}{split_tag}.mat", summary, meta)
        if cfg.log_anime:
            n_exported = trainer.export_rollouts(
                test_set, cfg.result_AnimeDemo_dir,
                limit=min(cfg.num_testset, 10))
            log.info("exported %d rollout artifact sets to %s",
                     n_exported, cfg.result_AnimeDemo_dir)
        print({k: v for k, v in summary.items() if not isinstance(v, list)})
        return 0

    raise SystemExit(f"unknown mode {cfg.mode}")


if __name__ == "__main__":
    sys.exit(main())
