"""Decode a directory of .cool bitstreams and report rates/PSNRs
(reference: results/decode_one_dataset.py — re-decode distributed
bitstreams to verify published numbers).

    python scripts/decode_one_dataset.py \\
        --bitstreams /root/reference/results/image/kodak/bitstreams \\
        --out decoded/ [--originals data/kodak]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--bitstreams", type=Path, required=True)
    p.add_argument("--out", type=Path, default=None, help="write PNGs here")
    p.add_argument("--originals", type=Path, default=None,
                   help="dir with <seq>.png originals for PSNR")
    p.add_argument("--limit", type=int, default=None)
    args = p.parse_args()

    from coolchic_tpu.bitstream import decode_bitstream
    from coolchic_tpu.io import read_png, write_png

    files = sorted(args.bitstreams.glob("*.cool"))
    if args.limit:
        files = files[: args.limit]
    assert files, f"no .cool files under {args.bitstreams}"
    if args.out:
        args.out.mkdir(parents=True, exist_ok=True)

    print(f"{'bitstream':<40} {'bytes':>8} {'bpp':>8} {'ms':>7} {'psnr':>7}")
    for f in files:
        data = f.read_bytes()
        t0 = time.time()
        img, info = decode_bitstream(data, integer_pipeline=True)
        dt = (time.time() - t0) * 1000
        h, w = info["gop_header"].img_size
        bpp = len(data) * 8 / (h * w)
        psnr = float("nan")
        if args.originals:
            seq = f.stem.split("-lmbda")[0]
            orig_path = args.originals / f"{seq}.png"
            if orig_path.exists():
                orig, _ = read_png(str(orig_path))
                psnr = -10 * np.log10(np.mean((img - orig) ** 2) + 1e-10)
        if args.out:
            write_png(img, str(args.out / f"{f.stem}.png"))
        print(f"{f.name:<40} {len(data):>8} {bpp:>8.4f} {dt:>7.0f} {psnr:>7.3f}")


if __name__ == "__main__":
    main()
