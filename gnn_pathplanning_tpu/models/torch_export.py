"""Export DCPNet variables to a reference-format torch state_dict.

The inverse of ``torch_import.params_from_torch_state_dict``: maps our flax
variable tree onto the module names/layouts of the reference
``DecentralPlannerNet`` (/root/reference/graphs/models/decentralplanner.py,
Sequential indices from :155-243), so checkpoints trained in this framework
can be loaded by the reference code (``model.load_state_dict``) — used by the
closed-loop behavioral parity harness and as a migration path for users of
the reference.

Returns numpy arrays; call sites wrap them in torch tensors
(``{k: torch.from_numpy(v) for ...}``) so this module stays torch-free.
"""
from __future__ import annotations

import numpy as np

from .torch_import import _BN_IDX, _CONV_IDX


def torch_state_dict_from_params(variables) -> dict[str, np.ndarray]:
    """Build a reference-named state_dict from ``{'params', 'batch_stats'}``."""
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    sd: dict[str, np.ndarray] = {}

    def f32(x):
        return np.asarray(x, dtype=np.float32)

    for i, (ci, bi) in enumerate(zip(_CONV_IDX, _BN_IDX)):
        sd[f"ConvLayers.{ci}.weight"] = f32(
            params[f"conv{i}"]["kernel"]).transpose(3, 2, 0, 1)
        sd[f"ConvLayers.{ci}.bias"] = f32(params[f"conv{i}"]["bias"])
        sd[f"ConvLayers.{bi}.weight"] = f32(params[f"bn{i}"]["scale"])
        sd[f"ConvLayers.{bi}.bias"] = f32(params[f"bn{i}"]["bias"])
        bn = stats.get(f"bn{i}", {})
        sd[f"ConvLayers.{bi}.running_mean"] = f32(
            bn.get("mean", np.zeros_like(sd[f"ConvLayers.{bi}.weight"])))
        sd[f"ConvLayers.{bi}.running_var"] = f32(
            bn.get("var", np.ones_like(sd[f"ConvLayers.{bi}.weight"])))
        sd[f"ConvLayers.{bi}.num_batches_tracked"] = np.asarray(0, np.int64)

    sd["compressMLP.0.weight"] = f32(params["compress0"]["kernel"]).T
    sd["compressMLP.0.bias"] = f32(params["compress0"]["bias"])

    taps = f32(params["gfl0"]["taps"])            # [K, G, F]
    sd["GFL.0.weight"] = taps.transpose(2, 0, 1)[:, None]  # [F, 1, K, G]
    sd["GFL.0.bias"] = f32(params["gfl0"]["bias"])[:, None]  # [F, 1]

    sd["actionsMLP.0.weight"] = f32(params["actions0"]["kernel"]).T
    sd["actionsMLP.0.bias"] = f32(params["actions0"]["bias"])
    return sd
