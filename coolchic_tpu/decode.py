"""Decode CLI (reference: coolchic/decode.py).

Usage:
    python -m coolchic_tpu.decode -i bitstream.cool -o out.png
    python -m coolchic_tpu.decode -i bitstream.cool -o out.ppm
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="coolchic_tpu decoder")
    p.add_argument("-i", "--input", type=Path, required=True)
    p.add_argument("-o", "--output", type=Path, required=True)
    p.add_argument("--verbosity", type=int, default=0)
    p.add_argument(
        "--int",
        action="store_true",
        help="fixed-point integer reconstruction (platform-deterministic)",
    )
    args = p.parse_args(argv)

    from coolchic_tpu.bitstream import decode_bitstream, decode_video_bitstream
    from coolchic_tpu.io import convert_444_to_420, write_png, write_ppm, write_yuv

    data = Path(args.input).read_bytes()
    out = str(args.output)
    t0 = time.time()
    if out.endswith(".yuv"):
        frames, vinfo = decode_video_bitstream(data)
        gop = vinfo["gop_header"]
        Path(out).unlink(missing_ok=True)
        for frame in frames:
            if gop.frame_data_type == "yuv420":
                write_yuv(convert_444_to_420(frame), gop.bitdepth, "yuv420", out)
            else:
                write_yuv(frame, gop.bitdepth, "yuv444", out)
        elapsed = time.time() - t0
        if args.verbosity:
            h, w = gop.img_size
            print(f"Decoded {len(frames)} frames {w}x{h} {gop.frame_data_type} "
                  f"in {elapsed * 1000:.1f} ms -> {out}")
        return 0

    img, info = decode_bitstream(data, integer_pipeline=args.int)
    elapsed = time.time() - t0

    gop = info["gop_header"]
    if out.endswith(".png"):
        write_png(img, out)
    elif out.endswith(".ppm"):
        write_ppm(img, gop.bitdepth, out)
    else:
        raise ValueError(
            f"Unsupported output format: {out} (use .png, .ppm or .yuv)"
        )

    if args.verbosity:
        h, w = gop.img_size
        print(f"Decoded {w}x{h} {gop.frame_data_type} {gop.bitdepth}b "
              f"in {elapsed * 1000:.1f} ms -> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
