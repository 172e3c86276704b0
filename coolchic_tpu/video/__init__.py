from coolchic_tpu.video.codingstructure import (
    CodingStructure,
    Frame,
    lmbda_from_depth,
)
from coolchic_tpu.video.encoder import (
    EncodedFrame,
    FrameEncoderManager,
    TrainingExitCode,
    VideoEncoder,
    is_job_over,
    load_video_encoder,
)
from coolchic_tpu.video.intercoding import bipred, warp

__all__ = [
    "CodingStructure",
    "Frame",
    "lmbda_from_depth",
    "EncodedFrame",
    "FrameEncoderManager",
    "TrainingExitCode",
    "VideoEncoder",
    "is_job_over",
    "load_video_encoder",
    "bipred",
    "warp",
]
