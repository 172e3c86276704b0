from coolchic_tpu.bitstream.decode import (
    decode_bitstream,
    decode_bitstreams,
    decode_video_bitstream,
)
from coolchic_tpu.bitstream.encode import (
    encode_frame_bitstream,
    encode_image_bitstream,
)
from coolchic_tpu.bitstream.header import (
    FrameHeader,
    GopHeader,
    read_frame_header,
    read_gop_header,
    write_frame_header,
    write_gop_header,
)

__all__ = [
    "decode_bitstream",
    "decode_bitstreams",
    "decode_video_bitstream",
    "encode_frame_bitstream",
    "encode_image_bitstream",
    "FrameHeader",
    "GopHeader",
    "read_frame_header",
    "read_gop_header",
    "write_frame_header",
    "write_gop_header",
]
