"""RD-fair inter-coding evaluation: BD-rate of the motion-compensated GOP
path vs all-intra coding over a lambda sweep (round-3 verdict #6: the
single-point demo traded 1.46 dB for 7.5% rate and proved nothing at equal
quality).

Both arms encode the SAME synthetic translating sequence (the P-frame's
favourable case — disclosed) at every lambda; the inter arm uses the
VideoEncoder's motion-compensated I+P path with the reference's
depth-scaled lambda (lmbda_from_depth, reference:
coolchic/enc/component/video.py:509-524), the intra arm codes each frame
as an independent image. BD-rate is computed on the two (rate, PSNR)
curves; negative = inter saves rate at equal quality.

    python scripts/video_bd_rate.py [--size 64x96] [--iters 600]
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

LAMBDAS = (5e-4, 1e-3, 2e-3, 4e-3, 8e-3)


def make_sequence(h: int, w: int, n_frames: int):
    """Smoothed-noise base translating 3 px/frame (image-like content with
    exactly representable inter-frame motion)."""
    import numpy as np

    rng = np.random.default_rng(0)
    base = rng.random((3, h, w)).astype(np.float32)
    for _ in range(6):
        base = 0.25 * (
            np.roll(base, 1, -1) + np.roll(base, -1, -1)
            + np.roll(base, 1, -2) + np.roll(base, -1, -2)
        )
    base = (base - base.min()) / (base.max() - base.min() + 1e-9)
    return [np.roll(base, 3 * i, axis=-1) for i in range(n_frames)]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="64x96")
    ap.add_argument("--iters", type=int, default=600)
    ap.add_argument("--frames", type=int, default=2)
    ap.add_argument("--out", type=Path, default=Path("results/video/bd_rate.json"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from coolchic_tpu.bitstream import decode_video_bitstream
    from coolchic_tpu.eval.bd_rate import bd_rate
    from coolchic_tpu.io import write_yuv
    from coolchic_tpu.models import CoolChicConfig
    from coolchic_tpu.train.presets import Preset, TrainerPhase, Warmup
    from coolchic_tpu.video import CodingStructure, VideoEncoder

    h, w = map(int, args.size.split("x"))
    frames = make_sequence(h, w, args.frames)

    tdir = Path(tempfile.mkdtemp())
    seq = tdir / f"seq_{w}x{h}_25fps_yuv444_8b.yuv"
    for fr in frames:
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

    def seq_psnr(dec) -> float:
        mse = np.mean([
            np.mean((np.asarray(d) - f) ** 2) for d, f in zip(dec, frames)
        ])
        return float(-10 * np.log10(mse + 1e-12))

    n_px = args.frames * h * w
    curves = {"inter_gop": [], "all_intra": []}
    for lm in LAMBDAS:
        t0 = time.time()
        enc = VideoEncoder(
            CodingStructure(intra_period=args.frames - 1, p_period=1), cfg,
            preset, lmbda=lm,
        )
        enc.encode(str(seq), verbose=False)
        bs = enc.to_bitstream()
        dec, _ = decode_video_bitstream(bs)
        curves["inter_gop"].append(
            {"lmbda": lm, "rate_bpp": len(bs) * 8 / n_px, "psnr_db": seq_psnr(dec)}
        )

        n_bits, dec = 0, []
        for fi, fr in enumerate(frames):
            one = tdir / f"one{fi}_{w}x{h}_25fps_yuv444_8b.yuv"
            write_yuv(jnp.asarray(fr), 8, "yuv444", str(one))
            e = VideoEncoder(
                CodingStructure(intra_period=0, p_period=0), cfg, preset, lmbda=lm
            )
            e.encode(str(one), verbose=False)
            b = e.to_bitstream()
            n_bits += len(b) * 8
            dec.append(decode_video_bitstream(b)[0][0])
        curves["all_intra"].append(
            {"lmbda": lm, "rate_bpp": n_bits / n_px, "psnr_db": seq_psnr(dec)}
        )
        print(f"lmbda {lm:g}: inter {curves['inter_gop'][-1]['rate_bpp']:.4f} bpp "
              f"{curves['inter_gop'][-1]['psnr_db']:.2f} dB | intra "
              f"{curves['all_intra'][-1]['rate_bpp']:.4f} bpp "
              f"{curves['all_intra'][-1]['psnr_db']:.2f} dB "
              f"({time.time() - t0:.0f} s)", flush=True)

    bd = bd_rate(
        [r["rate_bpp"] for r in curves["all_intra"]],
        [r["psnr_db"] for r in curves["all_intra"]],
        [r["rate_bpp"] for r in curves["inter_gop"]],
        [r["psnr_db"] for r in curves["inter_gop"]],
    )
    out = {
        "what": "BD-rate of motion-compensated inter GOP (I+P, depth-scaled "
        "lambda) vs all-intra on a synthetic translating sequence "
        f"({args.frames} frames, {h}x{w}, {args.iters} iters/frame). "
        "Favourable content for inter coding (pure translation) — this "
        "measures that the motion path WORKS at equal quality, not a "
        "natural-video average.",
        "lambdas": list(LAMBDAS),
        "curves": curves,
        "bd_rate_inter_vs_intra_pct": round(bd, 2),
    }
    args.out.parent.mkdir(parents=True, exist_ok=True)
    args.out.write_text(json.dumps(out, indent=2))
    print(f"BD-rate inter vs intra: {bd:+.2f}% -> {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
