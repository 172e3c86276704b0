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
    args = p.parse_args(argv)

    from coolchic_tpu.bitstream import decode_bitstream
    from coolchic_tpu.io import write_png, write_ppm

    t0 = time.time()
    img, info = decode_bitstream(Path(args.input).read_bytes())
    elapsed = time.time() - t0

    gop = info["gop_header"]
    out = str(args.output)
    if out.endswith(".png"):
        write_png(img, out)
    elif out.endswith(".ppm"):
        write_ppm(img, gop.bitdepth, out)
    else:
        raise ValueError(f"Unsupported output format: {out} (use .png or .ppm)")

    if args.verbosity:
        h, w = gop.img_size
        print(f"Decoded {w}x{h} {gop.frame_data_type} {gop.bitdepth}b "
              f"in {elapsed * 1000:.1f} ms -> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
