from .config import Config, load_config, process_config, setup_logging

__all__ = ["Config", "load_config", "process_config", "setup_logging"]
