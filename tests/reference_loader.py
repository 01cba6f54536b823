"""Import helper for the ACTUAL reference sources at /root/reference.

Registers minimal stand-ins for third-party modules the reference imports
but this environment lacks (``easydict``, ``torchsummaryX``, ``hashids``),
shims ``matplotlib.font_manager._rebuild`` (removed upstream), and imports
the requested reference modules with /root/reference temporarily on
sys.path. Read-only use: parity tests study the reference's behavior.
"""
from __future__ import annotations

import importlib
import sys
import types

REF = "/root/reference"


class AttrDict(dict):
    """Minimal easydict.EasyDict stand-in (attribute access over a dict)."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:  # pragma: no cover
            raise AttributeError(k) from e

    def __setattr__(self, k, v):
        self[k] = v


def _install_stubs() -> None:
    if "easydict" not in sys.modules:
        ed = types.ModuleType("easydict")
        ed.EasyDict = AttrDict
        sys.modules["easydict"] = ed
    if "torchsummaryX" not in sys.modules:
        tsx = types.ModuleType("torchsummaryX")
        tsx.summary = lambda *a, **k: None
        sys.modules["torchsummaryX"] = tsx
    if "hashids" not in sys.modules:
        h = types.ModuleType("hashids")

        class Hashids:
            def __init__(self, *a, **k):
                pass

            def encode(self, *vals):
                return "-".join(str(v) for v in vals)

        h.Hashids = Hashids
        sys.modules["hashids"] = h
    import matplotlib.font_manager as fm
    if not hasattr(fm, "_rebuild"):
        fm._rebuild = lambda: None


def load_reference(*module_names: str):
    """Import reference modules by dotted name; returns them in order."""
    _install_stubs()
    sys.path.insert(0, REF)
    try:
        mods = [importlib.import_module(m) for m in module_names]
    finally:
        sys.path.remove(REF)
    return mods[0] if len(mods) == 1 else tuple(mods)
