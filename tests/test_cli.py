"""CLI end-to-end: gen_data -> train -> test on a tiny config."""
import json
import numpy as np

from gnn_pathplanning_tpu.cli.main import main
from gnn_pathplanning_tpu.utils.config import (Config, experiment_name,
                                               load_config, process_config)


def test_config_defaults_and_overrides(tmp_path):
    p = tmp_path / "c.json"
    p.write_text(json.dumps({"num_agents": 4, "max_epoch": 7}))
    cfg = load_config(p, {"map_w": 12, "mode": None})
    assert cfg.num_agents == 4 and cfg.max_epoch == 7
    assert cfg.map_w == 12
    assert cfg.mode == "train"  # None override ignored, default kept
    assert experiment_name(cfg) == "dcp_map12x20_rho1_4Agent/K3_HS0"


def test_process_config_creates_dirs(tmp_path):
    cfg = load_config(None, {"save_root": str(tmp_path / "exp"),
                             "data_root": str(tmp_path / "data")})
    cfg = process_config(cfg, timestamp=123)
    assert (tmp_path / "exp").exists()
    assert cfg.exp_time == "123"
    assert "checkpoints" in cfg.checkpoint_dir


def test_cli_full_cycle(tmp_path, capsys):
    data_root = str(tmp_path / "data")
    save_root = str(tmp_path / "exp")
    base = ["--data_root", data_root, "--save_root", save_root,
            "--map_w", "10", "--map_h", "10", "--num_agents", "3",
            "--num_validset", "2", "--num_testset", "2",
            "--batch_size", "8", "--max_epoch", "1",
            "--nGraphFilterTaps", "2"]
    assert main(base + ["--mode", "gen_data", "--num_maps", "2",
                        "--cases_per_map", "3", "--workers", "1"]) == 0
    assert main(base + ["--mode", "train"]) == 0
    # find the produced experiment dir and reuse it for test mode by pointing
    # at the best/latest checkpoint explicitly
    import glob
    ckpts = glob.glob(f"{save_root}/**/checkpoint.msgpack", recursive=True)
    assert ckpts
    assert main(base + ["--mode", "test", "--test_checkpoint", ckpts[0],
                        "--log_anime"]) == 0
    out = capsys.readouterr().out
    assert "rate_ReachGoal" in out

    # test-flow artifacts: .mat statistics archive + anime YAML/GSO sets
    # (reference decentralplannerlocal.py:615-626, utils/metrics.py:226-288)
    import scipy.io as sio
    mats = glob.glob(f"{save_root}/**/statistics/*.mat", recursive=True)
    assert mats
    rec = sio.loadmat(mats[0])
    assert "rate_ReachGoal" in rec and "commRadius" in rec
    anime = glob.glob(f"{save_root}/**/anime/**/*.yaml", recursive=True)
    assert anime


def test_cli_transfer_learning(tmp_path):
    data_root = str(tmp_path / "data")
    save_root = str(tmp_path / "exp")
    base = ["--data_root", data_root, "--save_root", save_root,
            "--map_w", "10", "--map_h", "10", "--num_agents", "3",
            "--num_validset", "2", "--batch_size", "8", "--max_epoch", "1",
            "--nGraphFilterTaps", "2"]
    assert main(base + ["--mode", "gen_data", "--num_maps", "2",
                        "--cases_per_map", "3", "--workers", "1"]) == 0
    assert main(base + ["--mode", "train"]) == 0
    import glob
    ckpt = glob.glob(f"{save_root}/**/checkpoint.msgpack", recursive=True)[0]
    assert main(base + ["--mode", "train", "--train_TL",
                        "--pretrained", ckpt]) == 0
