"""Decoder complexity report: MAC/pixel per operating point
(reference: scripts/estimate_flops.py — fvcore; here analytic, see
coolchic_tpu.models.coolchic.macs_per_pixel)."""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


from coolchic_tpu.models import CoolChicConfig, macs_per_pixel

OPERATING_POINTS = {
    "vlop": dict(dim_arm=8, n_hidden_layers_arm=1,
                 layers_synthesis=("8-1-linear-relu", "X-1-linear-none", "X-3-residual-none")),
    "lop": dict(dim_arm=8, n_hidden_layers_arm=2,
                layers_synthesis=("16-1-linear-relu", "X-1-linear-none",
                                  "X-3-residual-relu", "X-3-residual-none")),
    "mop": dict(dim_arm=16, n_hidden_layers_arm=2,
                layers_synthesis=("16-1-linear-relu", "X-1-linear-none",
                                  "X-3-residual-relu", "X-3-residual-none")),
    "hop": dict(dim_arm=16, n_hidden_layers_arm=2,
                layers_synthesis=("48-1-linear-relu", "X-1-linear-none",
                                  "X-3-residual-relu", "X-3-residual-none")),
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--width", type=int, default=768)
    args = p.parse_args()

    print(f"Image size: {args.height}x{args.width}")
    print(f"{'point':>6} | {'arm':>8} | {'ups':>8} | {'syn':>8} | {'total':>9} MAC/px")
    for name, kw in OPERATING_POINTS.items():
        cfg = CoolChicConfig(img_size=(args.height, args.width), **kw)
        m = macs_per_pixel(cfg)
        print(
            f"{name:>6} | {m['arm']:8.1f} | {m['upsampling']:8.1f} | "
            f"{m['synthesis']:8.1f} | {m['total']:9.1f}"
        )


if __name__ == "__main__":
    main()
