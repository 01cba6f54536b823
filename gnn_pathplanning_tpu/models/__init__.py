from .dcp import DCPNet, DCPConfig
from .torch_import import params_from_torch_state_dict

__all__ = ["DCPNet", "DCPConfig", "params_from_torch_state_dict"]
