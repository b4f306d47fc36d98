from monorec_tpu.config.parser import (
    ConfigParser,
    build_dataset,
    build_dataloader,
    build_model_config,
)

__all__ = [
    "ConfigParser",
    "build_dataset",
    "build_dataloader",
    "build_model_config",
]
