"""Inter-coding RD demonstration: GOP with motion-compensated P frames vs
coding every frame as an independent image.

Builds a synthetic translating sequence (the P-frame's best case), encodes
it (a) as an I+P GOP through the VideoEncoder's motion-compensated path
and (b) as two independent intra images, then reports rate/PSNR of the
decoded bitstreams. Writes results/video/inter_demo.json.

    python scripts/video_inter_demo.py [--size 64x96] [--iters 600]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="64x96")
    ap.add_argument("--iters", type=int, default=600)
    ap.add_argument("--lmbda", type=float, default=2e-3)
    ap.add_argument("--out", type=Path, default=Path("results/video/inter_demo.json"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from coolchic_tpu.bitstream import decode_video_bitstream
    from coolchic_tpu.io import write_yuv
    from coolchic_tpu.models import CoolChicConfig
    from coolchic_tpu.train.presets import Preset, TrainerPhase, Warmup
    from coolchic_tpu.video import CodingStructure, VideoEncoder

    h, w = map(int, args.size.split("x"))
    rng = np.random.default_rng(0)
    base = rng.random((3, h, w)).astype(np.float32)
    # smooth the noise into image-like content
    for _ in range(6):
        base = 0.25 * (
            np.roll(base, 1, -1) + np.roll(base, -1, -1)
            + np.roll(base, 1, -2) + np.roll(base, -1, -2)
        )
    base = (base - base.min()) / (base.max() - base.min() + 1e-9)
    f0, f1 = base, np.roll(base, 3, axis=-1)

    import tempfile

    tdir = Path(tempfile.mkdtemp())
    seq = tdir / f"seq_{w}x{h}_25fps_yuv444_8b.yuv"
    for fr in (f0, f1):
        write_yuv(jnp.asarray(fr), 8, "yuv444", str(seq))

    cfg = CoolChicConfig(
        img_size=(h, w), n_ft_per_res=(1, 1, 1, 1), dim_arm=8,
        n_hidden_layers_arm=1,
        layers_synthesis=("16-1-linear-relu", "X-1-linear-none", "X-3-residual-relu"),
    )
    phase = TrainerPhase(
        lr=1e-2, max_itr=args.iters, freq_valid=100, patience=10000,
        schedule_lr=True, quantizer_type="softround",
        quantizer_noise_type="gaussian",
        softround_temperature=(0.3, 0.1), noise_parameter=(0.25, 0.1),
    )
    q_phase = TrainerPhase(
        lr=1e-3, max_itr=50, quantizer_type="ste", quantizer_noise_type="none",
        quantize_model=True, softround_temperature=(1e-4, 1e-4), freq_valid=50,
    )
    preset = Preset(preset_name="demo", all_phases=(phase, q_phase), warmup=Warmup())

    def psnr(a, b):
        return float(-10 * np.log10(np.mean((np.asarray(a) - np.asarray(b)) ** 2) + 1e-12))

    results = {}
    for mode, intra_period in (("inter_gop", 1), ("all_intra", 0)):
        if intra_period:
            enc = VideoEncoder(
                CodingStructure(intra_period=1, p_period=1), cfg, preset,
                lmbda=args.lmbda,
            )
            enc.encode(str(seq), verbose=False)
            bs = enc.to_bitstream()
            frames, _ = decode_video_bitstream(bs)
            n_bits = len(bs) * 8
        else:
            # two independent single-frame sequences
            n_bits = 0
            frames = []
            for fi, fr in enumerate((f0, f1)):
                one = tdir / f"one{fi}_{w}x{h}_25fps_yuv444_8b.yuv"
                write_yuv(jnp.asarray(fr), 8, "yuv444", str(one))
                e = VideoEncoder(
                    CodingStructure(intra_period=0, p_period=0), cfg, preset,
                    lmbda=args.lmbda,
                )
                e.encode(str(one), verbose=False)
                b = e.to_bitstream()
                n_bits += len(b) * 8
                frames.append(decode_video_bitstream(b)[0][0])
        results[mode] = {
            "rate_bpp": n_bits / (2 * h * w),
            "psnr_db_f0": psnr(frames[0], f0),
            "psnr_db_f1": psnr(frames[1], f1),
        }
        print(mode, results[mode])

    inter, intra = results["inter_gop"], results["all_intra"]
    results["inter_rate_saving_pct"] = round(
        100 * (1 - inter["rate_bpp"] / intra["rate_bpp"]), 2
    )
    args.out.parent.mkdir(parents=True, exist_ok=True)
    args.out.write_text(json.dumps(results, indent=2))
    print(f"rate saving from inter coding: {results['inter_rate_saving_pct']}% "
          f"-> {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
