"""Import reference PyTorch checkpoints into DCPNet variables.

The parity gate (BASELINE.md) requires per-layer allclose against the
reference ``DecentralPlannerNet``. This module maps a torch ``state_dict``
(as produced by /root/reference/agents/decentralplannerlocal.py:114-138
``torch.save({'state_dict': ...})``) onto our flax variable tree.

Key mapping (reference module names -> ours):
  ConvLayers.{0,4,8,11,15}.*   -> conv0..conv4  (Conv2d; indices skip the
                                   BatchNorm/ReLU/MaxPool entries of the
                                   torch Sequential built at
                                   decentralplanner.py:155-177)
  ConvLayers.{1,5,9,12,16}.*   -> bn0..bn4      (BatchNorm2d)
  compressMLP.0.*              -> compress0
  GFL.0.weight [F,1,K,G]       -> gfl0.taps [K,G,F]
  GFL.0.bias [F,1]             -> gfl0.bias [F]
  actionsMLP.0.*               -> actions0

Layout transposes: torch Conv2d kernels are [out, in, kh, kw] (NCHW); flax
wants [kh, kw, in, out]. torch Linear kernels are [out, in]; flax wants
[in, out]. The flatten boundary (CNN -> compressMLP) is layout-safe because
the spatial extent is 1x1 at that point.
"""
from __future__ import annotations

from typing import Mapping

import numpy as np

# Positions in the torch Sequential of decentralplanner.py:155-177: each
# block appends [Conv, BN, ReLU] and a MaxPool after even blocks, giving
# block offsets 0, 4, 7, 11, 14.
_CONV_IDX = (0, 4, 7, 11, 14)
_BN_IDX = (1, 5, 8, 12, 15)


def _np(t) -> np.ndarray:
    """Accept torch tensors or numpy arrays."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def params_from_torch_state_dict(state_dict: Mapping[str, object]):
    """Build flax ``{'params': ..., 'batch_stats': ...}`` from a torch
    state_dict of the reference DecentralPlannerNet."""
    sd = {k: _np(v) for k, v in state_dict.items()}

    params: dict = {}
    batch_stats: dict = {}

    for i, (ci, bi) in enumerate(zip(_CONV_IDX, _BN_IDX)):
        params[f"conv{i}"] = {
            "kernel": sd[f"ConvLayers.{ci}.weight"].transpose(2, 3, 1, 0),
            "bias": sd[f"ConvLayers.{ci}.bias"],
        }
        params[f"bn{i}"] = {
            "scale": sd[f"ConvLayers.{bi}.weight"],
            "bias": sd[f"ConvLayers.{bi}.bias"],
        }
        batch_stats[f"bn{i}"] = {
            "mean": sd[f"ConvLayers.{bi}.running_mean"],
            "var": sd[f"ConvLayers.{bi}.running_var"],
        }

    params["compress0"] = {
        "kernel": sd["compressMLP.0.weight"].T,
        "bias": sd["compressMLP.0.bias"],
    }

    # GFL.0.weight: [F, E=1, K, G] -> taps [K, G, F]
    w = sd["GFL.0.weight"]
    params["gfl0"] = {
        "taps": w[:, 0].transpose(1, 2, 0),
        "bias": sd["GFL.0.bias"][:, 0],
    }

    params["actions0"] = {
        "kernel": sd["actionsMLP.0.weight"].T,
        "bias": sd["actionsMLP.0.bias"],
    }

    import jax.numpy as jnp
    to_jnp = lambda tree: {k: {kk: jnp.asarray(vv) for kk, vv in v.items()}
                           for k, v in tree.items()}
    return {"params": to_jnp(params), "batch_stats": to_jnp(batch_stats)}
