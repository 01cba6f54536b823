"""Checkpointing with the reference's latest/best/numbered semantics.

The reference torch-saves {epoch, iteration, state_dict, optimizer,
scheduler} as ``checkpoint.pth.tar`` plus epoch-numbered snapshots at every
validation and ``model_best.pth.tar`` on improved success rate
(/root/reference/agents/decentralplannerlocal.py:114-138). Here the full
train state pytree (params, batch_stats, opt_state, counters) serializes via
flax msgpack into ``checkpoint.msgpack`` / ``checkpoint_epoch{N}.msgpack`` /
``model_best.msgpack``.
"""
from __future__ import annotations

import json
from pathlib import Path

from flax import serialization

LATEST = "checkpoint.msgpack"
BEST = "model_best.msgpack"


def _meta_path(path: Path) -> Path:
    return path.with_suffix(".meta.json")


def save_checkpoint(ckpt_dir: str | Path, state, epoch: int,
                    is_best: bool = False, numbered: bool = False,
                    extra_meta: dict | None = None) -> None:
    ckpt_dir = Path(ckpt_dir)
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    blob = serialization.to_bytes(state)
    meta = {"epoch": int(epoch)}
    if extra_meta:
        meta.update(extra_meta)
    targets = [ckpt_dir / LATEST]
    if numbered:
        targets.append(ckpt_dir / f"checkpoint_epoch{epoch}.msgpack")
    if is_best:
        targets.append(ckpt_dir / BEST)
    for t in targets:
        # tmp + atomic rename: a kill mid-write (tunnel-stall watchdogs do
        # this) must never leave a truncated checkpoint at the final name
        tmp = t.with_suffix(t.suffix + ".tmp")
        tmp.write_bytes(blob)
        tmp.replace(t)
        _meta_path(t).write_text(json.dumps(meta))


def latest_checkpoint(ckpt_dir: str | Path, which: str = "latest") -> Path | None:
    ckpt_dir = Path(ckpt_dir)
    name = {"latest": LATEST, "best": BEST}.get(which, which)
    p = ckpt_dir / name
    return p if p.exists() else None


def load_checkpoint(path: str | Path, target):
    """Restore a state pytree of the same structure as ``target``.
    Returns (state, meta)."""
    path = Path(path)
    state = serialization.from_bytes(target, path.read_bytes())
    meta = {}
    if _meta_path(path).exists():
        meta = json.loads(_meta_path(path).read_text())
    return state, meta


def load_pretrained_params(path: str | Path, state):
    """Restore only params + batch_stats from a checkpoint into ``state``,
    leaving the optimizer state untouched — the transfer-learning load path
    (the reference loads a pretrained state_dict then freezes layers,
    decentralplannerlocal.py:168-179; a TL optimizer has a different opt
    state structure so a full restore is impossible)."""
    raw = serialization.msgpack_restore(Path(path).read_bytes())
    params = serialization.from_state_dict(state.params, raw["params"])
    batch_stats = serialization.from_state_dict(state.batch_stats,
                                                raw["batch_stats"])
    return state.replace(params=params, batch_stats=batch_stats)
