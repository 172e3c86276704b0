from coolchic_tpu.models.config import CoolChicConfig
from coolchic_tpu.models.coolchic import (
    coolchic_forward,
    frame_forward,
    init_coolchic_params,
    macs_per_pixel,
)

__all__ = [
    "CoolChicConfig",
    "coolchic_forward",
    "frame_forward",
    "init_coolchic_params",
    "macs_per_pixel",
]
