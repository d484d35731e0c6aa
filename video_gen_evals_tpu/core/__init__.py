"""Core: typed configuration and run metadata."""

from .config import PathsConfig, TrainConfig, default_train_config

__all__ = ["PathsConfig", "TrainConfig", "default_train_config"]
