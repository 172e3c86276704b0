from coolchic_tpu.utils.paths import COOLCHIC_REPO_ROOT, PRESET_CFG_DIR
from coolchic_tpu.utils.types import (
    DecoderConfig,
    EncoderConfig,
    HyperNetConfig,
    HypernetRunConfig,
    PresetConfig,
    RunConfig,
    UserConfig,
    load_config,
)

__all__ = [
    "COOLCHIC_REPO_ROOT",
    "PRESET_CFG_DIR",
    "DecoderConfig",
    "EncoderConfig",
    "HyperNetConfig",
    "HypernetRunConfig",
    "PresetConfig",
    "RunConfig",
    "UserConfig",
    "load_config",
]
