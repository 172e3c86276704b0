from coolchic_tpu.train.encode import (
    EncodeResult,
    encode_frame,
    encode_frame_batch,
    warmup,
)
from coolchic_tpu.train.loss import LossOutput, loss_function
from coolchic_tpu.train.presets import (
    AVAILABLE_PRESETS,
    Preset,
    TrainerPhase,
    Warmup,
    WarmupPhase,
    preset_c3x,
    preset_debug,
    preset_measure_speed,
)
from coolchic_tpu.train.quantize_model import quantize_model, quantize_model_with_info
from coolchic_tpu.train.step import eval_metrics, run_phase

__all__ = [
    "EncodeResult",
    "encode_frame",
    "encode_frame_batch",
    "warmup",
    "LossOutput",
    "loss_function",
    "AVAILABLE_PRESETS",
    "Preset",
    "TrainerPhase",
    "Warmup",
    "WarmupPhase",
    "preset_c3x",
    "preset_debug",
    "preset_measure_speed",
    "quantize_model",
    "quantize_model_with_info",
    "eval_metrics",
    "run_phase",
]
