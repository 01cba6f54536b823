"""Multi-config test archive: ONE keyed record across (map, N) eval legs.

The reference's ``test_summary`` (/root/reference/utils/metrics.py:204-288)
dumps each tested configuration's full statistics into one ``.mat`` record
keyed by the experiment metadata (trained setup, tested setup, K, commR)
so the ``statistic_analysis/`` figure scripts can load a whole sweep from
one place.  In this framework every ``--mode test`` invocation writes its
own ``statistics_{W}x{H}_{N}Agent_K{K}.mat`` into its run dir
(cli/main.py:175-183); this module aggregates those per-leg records into a
single keyed archive (``.json`` + ``.mat`` struct) that
:class:`..stats.analysis.StatisticAnalysis` consumes directly — replacing
the hand-glued ``{label -> {"W_N" -> summary}}`` JSON the round-2 figure
script needed.

CLI::

    python -m gnn_pathplanning_tpu.stats.archive <save_root> \
        [-o artifacts/test_archive] [--label dcpOE-K3]

scans ``save_root`` recursively for per-leg statistics ``.mat`` files,
keeps the newest record per (map, agents, K, commR, deadlock_break)
configuration, and writes ``<out>.json`` and ``<out>.mat``.
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def _unmat(value):
    """Undo scipy.io round-tripping: 0-d / [1,1] arrays -> scalars,
    [1,n] -> list, bytes/str arrays -> str."""
    a = np.asarray(value)
    if a.dtype.kind in "US":
        return str(a.reshape(-1)[0]) if a.size else ""
    a = np.squeeze(a)
    if a.ndim == 0:
        return a.item()
    return a.tolist()


def load_leg_mat(path: str | Path) -> dict:
    """Load one per-leg statistics ``.mat`` back into a plain dict."""
    import scipy.io as sio
    raw = sio.loadmat(str(path))
    return {k: _unmat(v) for k, v in raw.items() if not k.startswith("__")}


def leg_key(rec: dict) -> str:
    """Reference-style configuration key:
    ``TE_{M|R}{W}x{H}_{N}Agent_K{K}_comR{r}`` — M = maze maps, R = the
    BMAP "random" family (the reference keys its archives per map set too)
    — plus ``_{split}`` for non-default eval splits (e.g. the 200-case
    ``test_big`` pools) and ``_dlb{k}`` for the framework-native
    deadlock-break legs. Absent metadata degrades to the old key so
    pre-round-5 statistics files keep their identities."""
    fam = "R" if str(rec.get("map_type", "map")) == "random" else "M"
    key = (f"TE_{fam}{int(rec.get('map_w', 0))}x{int(rec.get('map_h', 0))}"
           f"_{int(rec.get('num_agents', 0))}Agent"
           f"_K{int(rec.get('K', 0))}"
           f"_comR{int(rec.get('commRadius', 0))}")
    split = str(rec.get("test_split", "test") or "test")
    if split != "test":
        key += f"_{split}"
    dlb = int(rec.get("deadlock_break", 0) or 0)
    if dlb:
        key += f"_dlb{dlb}"
    return key


def collect_statistics(save_root: str | Path) -> dict[str, dict]:
    """Scan ``save_root`` recursively for per-leg statistics ``.mat`` files
    and return ``{leg_key: record}``, keeping the newest file per key."""
    root = Path(save_root)
    newest: dict[str, tuple[float, dict]] = {}
    for path in sorted(root.rglob("statistics_*.mat")):
        try:
            rec = load_leg_mat(path)
        except Exception:
            continue
        if "rate_ReachGoal" not in rec:
            continue
        rec["source"] = str(path)
        # Legs written before round 5 lack map_type/test_split metadata —
        # recover both from the path (exp dir carries the map family, the
        # filename carries the split tag) so maze/random and test/test_big
        # legs of the same shape don't collide on one key.
        if "map_type" not in rec and any(
                "_random" in part for part in path.parts):
            rec["map_type"] = "random"
        if "test_split" not in rec:
            stem_tail = path.stem.split(f"_K{int(rec.get('K', 0))}")[-1]
            tag = stem_tail.lstrip("_")
            if tag and not tag.startswith("dlb"):
                rec["test_split"] = tag
        key = leg_key(rec)
        mtime = path.stat().st_mtime
        if key not in newest or mtime > newest[key][0]:
            newest[key] = (mtime, rec)
    return {k: rec for k, (_, rec) in sorted(newest.items())}


def write_archive(out_base: str | Path, legs: dict[str, dict],
                  meta: dict | None = None) -> tuple[Path, Path]:
    """Write the keyed archive as ``<out_base>.json`` + ``<out_base>.mat``
    (one struct per leg, mirroring the reference's single-record shape)."""
    import scipy.io as sio
    out_base = Path(out_base)
    out_base.parent.mkdir(parents=True, exist_ok=True)
    payload = {"meta": dict(meta or {}), "legs": legs}
    jpath = out_base.with_suffix(".json")
    jpath.write_text(json.dumps(payload, indent=1, default=str))
    # .mat struct field names must be valid identifiers <= 31 chars.
    mat = {k.replace("TE_M", "M")[:31]: v for k, v in legs.items()}
    mpath = out_base.with_suffix(".mat")
    sio.savemat(str(mpath), mat, long_field_names=True)
    return jpath, mpath


def load_archive(path: str | Path) -> dict[str, dict]:
    """Load a ``.json`` archive back to ``{leg_key: record}``."""
    payload = json.loads(Path(path).read_text())
    return payload["legs"]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("save_root")
    ap.add_argument("-o", "--out", default="artifacts/test_archive")
    ap.add_argument("--label", default="")
    args = ap.parse_args(argv)
    legs = collect_statistics(args.save_root)
    if not legs:
        print(f"no statistics_*.mat records under {args.save_root}")
        return 1
    jpath, mpath = write_archive(args.out, legs,
                                 meta={"label": args.label,
                                       "save_root": str(args.save_root)})
    for key, rec in legs.items():
        print(f"{key:42s} rate_ReachGoal={rec['rate_ReachGoal']:.4f} "
              f"cases={int(rec.get('num_validset', 0))}")
    print(f"wrote {jpath} and {mpath}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
