"""Config system: JSON + CLI overrides + derived experiment directories.

Capability parity with /root/reference/utils/config.py: a JSON config file
merged with command-line overrides into one attribute-style object that is
threaded through every component, plus the derived experiment directory tree
``{exp_net}_{map_type}{W}x{H}_rho{density}_{N}Agent/K{K}_HS{HS}/{timestamp}``
(utils/config.py:135-199) with checkpoints/logs/failure-cache subdirs, and
root-logger setup with console + debug/error file handlers (:16-38).
"""
from __future__ import annotations

import json
import logging
import sys
import time
from logging.handlers import RotatingFileHandler
from pathlib import Path


class Config(dict):
    """Attribute-style dict (stand-in for the reference's EasyDict)."""

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name, value):
        self[name] = value


DEFAULTS = Config(
    exp_net="dcp",
    agent="DecentralPlanner",
    mode="train",
    map_type="map",
    map_w=20,
    map_h=20,
    map_density=1,
    num_agents=10,
    nGraphFilterTaps=3,
    hiddenFeatures=0,
    commR=6.0,
    rate_maxstep=2,
    learning_rate=1e-3,
    weight_decay=1e-5,
    max_epoch=150,
    batch_size=64,
    validate_every=4,
    num_validset=200,
    num_testset=4500,
    num_test_trainingSet=500,
    Start_onlineExpert=20,
    online_expert=False,
    oe_cache_weight=1,
    data_augment=False,
    tta=False,
    deadlock_break=0,
    seed=1337,
    data_root="data",
    save_root="experiments",
    con_train=False,
    test_general=False,
    train_TL=False,
    log_anime=False,
    best_epoch=False,
    test_epoch=0,
    # TensorBoard scalar export alongside the JSONL stream (the reference
    # always writes TB, agents/decentralplannerlocal.py:105,326)
    tensorboard=False,
)


def load_config(json_path: str | Path | None = None,
                overrides: dict | None = None) -> Config:
    cfg = Config(DEFAULTS)
    if json_path:
        with open(json_path) as f:
            cfg.update(json.load(f))
    if overrides:
        cfg.update({k: v for k, v in overrides.items() if v is not None})
    return cfg


def experiment_name(cfg: Config) -> str:
    return "{}_{}{:02d}x{:02d}_rho{}_{}Agent/K{}_HS{}".format(
        cfg.exp_net, cfg.map_type, cfg.map_w, cfg.map_h, cfg.map_density,
        cfg.num_agents, cfg.nGraphFilterTaps, cfg.hiddenFeatures)


def process_config(cfg: Config, timestamp: int | None = None) -> Config:
    """Derive + create the experiment directory tree."""
    stamp = timestamp if timestamp is not None else int(time.time())
    cfg.exp_time = str(stamp)
    cfg.exp_name = experiment_name(cfg)
    exp_dir = Path(cfg.save_root) / cfg.exp_name / cfg.exp_time
    cfg.exp_dir = str(exp_dir)
    cfg.checkpoint_dir = str(exp_dir / "checkpoints")
    cfg.log_dir = str(exp_dir / "logs")
    cfg.failCases_dir = str(exp_dir / "failure_cache")
    cfg.result_statistics_dir = str(exp_dir / "statistics")
    cfg.result_AnimeDemo_dir = str(exp_dir / "anime")
    for d in (cfg.checkpoint_dir, cfg.log_dir, cfg.failCases_dir,
              cfg.result_statistics_dir, cfg.result_AnimeDemo_dir):
        Path(d).mkdir(parents=True, exist_ok=True)
    cfg.dataset_root = str(
        Path(cfg.data_root) /
        f"{cfg.map_type}{cfg.map_w:02d}x{cfg.map_h:02d}_density_p{cfg.map_density}"
        / f"{cfg.num_agents}_Agent")
    setup_logging(cfg.log_dir)
    # Persist the resolved config for provenance (the reference logs the
    # merged EasyDict at startup, utils/config.py:93-99); a timestamped name
    # keeps resume invocations from clobbering the original.
    dump = exp_dir / f"config_{int(time.time())}.json"
    with open(dump, "w") as f:
        json.dump({k: v for k, v in cfg.items()
                   if isinstance(v, (str, int, float, bool, type(None)))},
                  f, indent=2, sort_keys=True)
    return cfg


def setup_logging(log_dir: str | Path) -> None:
    fmt = logging.Formatter(
        "%(asctime)s %(name)s %(levelname)s %(message)s")
    root = logging.getLogger()
    root.setLevel(logging.INFO)
    root.handlers = []
    console = logging.StreamHandler(sys.stdout)
    console.setFormatter(fmt)
    root.addHandler(console)
    debug = RotatingFileHandler(Path(log_dir) / "debug.log",
                                maxBytes=10 ** 7, backupCount=3)
    debug.setLevel(logging.DEBUG)
    debug.setFormatter(fmt)
    root.addHandler(debug)
    errors = RotatingFileHandler(Path(log_dir) / "error.log",
                                 maxBytes=10 ** 6, backupCount=3)
    errors.setLevel(logging.ERROR)
    errors.setFormatter(fmt)
    root.addHandler(errors)
