from coolchic_tpu.ops.pallas_arm import (
    arm_rate,
    arm_rate_pallas,
    arm_rate_pallas_pyramid,
)

__all__ = ["arm_rate", "arm_rate_pallas", "arm_rate_pallas_pyramid"]
