from coolchic_tpu.io.image import (
    FrameData,
    convert_420_to_444,
    convert_444_to_420,
    load_frame_data_from_file,
    read_png,
    read_ppm,
    read_yuv,
    rgb2yuv,
    write_png,
    write_ppm,
    write_yuv,
    yuv2rgb,
)

__all__ = [
    "FrameData",
    "convert_420_to_444",
    "convert_444_to_420",
    "load_frame_data_from_file",
    "read_png",
    "read_ppm",
    "read_yuv",
    "rgb2yuv",
    "write_png",
    "write_ppm",
    "write_yuv",
    "yuv2rgb",
]
