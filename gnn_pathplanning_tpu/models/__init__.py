from .dcp import DCPNet, DCPConfig
from .torch_import import params_from_torch_state_dict
from .torch_export import torch_state_dict_from_params

__all__ = ["DCPNet", "DCPConfig", "params_from_torch_state_dict",
           "torch_state_dict_from_params"]
