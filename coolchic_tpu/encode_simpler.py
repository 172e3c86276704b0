"""Single-image encode, spelled out step by step — no config expansion, no
video orchestration, every pipeline stage visible and hackable
(reference: coolchic/encode_simpler.py — "simplified to only train one
image and remove most complexity introduced by the VideoEncoder class").

    python -m coolchic_tpu.encode_simpler -i img.png -o img.cool \\
        --lmbda 1e-3 [--budget fast] [--dim_arm 24] ...

The stages, in order (each one is a plain function call you can edit):
  1. load the image,
  2. warm-up candidate competition,
  3. the preset's training phases (one ``run_phase`` each),
  4. post-training NN quantization (RD grid search),
  5. bitstream write + integer-decoder verification.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="simple single-image cool-chic encode")
    p.add_argument("-i", "--input", required=True, help="png/ppm image")
    p.add_argument("-o", "--output", default=None, help="bitstream path (.cool)")
    p.add_argument("--lmbda", type=float, default=1e-3)
    p.add_argument("--budget", choices=["debug", "fast", "medium", "slow"],
                   default="fast")
    p.add_argument("--dim_arm", type=int, default=24)
    p.add_argument("--n_hidden_layers_arm", type=int, default=2)
    p.add_argument("--n_ft_per_res", default="1,1,1,1,1,1,1")
    p.add_argument(
        "--layers_synthesis",
        default="48-1-linear-relu,X-1-linear-none,X-3-residual-relu,X-3-residual-none",
    )
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from coolchic_tpu.bitstream import decode_bitstream, encode_image_bitstream
    from coolchic_tpu.io import load_frame_data_from_file
    from coolchic_tpu.models import CoolChicConfig, init_coolchic_params
    from coolchic_tpu.train.encode import warmup
    from coolchic_tpu.train.presets import preset_c3x, preset_debug
    from coolchic_tpu.train.quantize_model import quantize_model_with_info
    from coolchic_tpu.train.step import run_phase

    # ---- 1. image + model architecture.
    fd = load_frame_data_from_file(args.input)
    target = jnp.asarray(fd.data)
    cfg = CoolChicConfig(
        img_size=fd.img_size,
        n_ft_per_res=tuple(int(x) for x in args.n_ft_per_res.split(",")),
        layers_synthesis=tuple(args.layers_synthesis.split(",")),
        dim_arm=args.dim_arm,
        n_hidden_layers_arm=args.n_hidden_layers_arm,
    )
    if args.budget == "debug":
        preset = preset_debug()
    else:
        itrs = {"fast": 10_600, "medium": 30_000, "slow": 100_000}[args.budget]
        preset = preset_c3x(n_itr_per_phase=itrs)

    key = jax.random.PRNGKey(args.seed)
    t0 = time.time()

    # ---- 2. warm-up: candidate initializations compete
    # (reference: enc/training/warmup.py).
    params = warmup(key, target, args.lmbda, cfg, preset.warmup)
    print(f"warm-up done in {time.time() - t0:.1f} s")

    # ---- 3. training phases (reference: enc/training/train.py).
    infos = None
    for idx, phase in enumerate(preset.all_phases):
        params, logs = run_phase(
            params, target, args.lmbda, jax.random.fold_in(key, 1000 + idx),
            cfg, phase,
        )
        print(
            f"phase {idx}: {phase.max_itr:>6} itr | loss {float(logs.loss):.6f} "
            f"| psnr {float(logs.psnr_db):6.2f} dB | "
            f"{float(logs.rate_latent_bpp):.4f} bpp | {time.time() - t0:6.1f} s"
        )
        # ---- 4. NN post-training quantization
        # (reference: enc/training/quantizemodel.py).
        if phase.quantize_model:
            params, infos = quantize_model_with_info(params, target, args.lmbda, cfg)

    # ---- 5. bitstream + decode verification.
    if args.output and infos is not None:
        nn_q_step = {
            m: {"weight": float(i.q_step_w), "bias": float(i.q_step_b)}
            for m, i in infos.items()
        }
        nn_expgol = {
            m: {"weight": int(i.expgol_w), "bias": int(i.expgol_b)}
            for m, i in infos.items()
        }
        bs = encode_image_bitstream(
            params, cfg, nn_q_step, nn_expgol,
            bitdepth=fd.bitdepth, frame_data_type=fd.frame_data_type,
        )
        Path(args.output).write_bytes(bs)
        decoded, _ = decode_bitstream(bs, integer_pipeline=True)
        mse = float(np.mean((decoded - np.asarray(fd.data)) ** 2))
        bpp = len(bs) * 8 / cfg.n_pixels
        print(
            f"bitstream: {len(bs)} bytes ({bpp:.4f} bpp), decoded PSNR "
            f"{-10 * np.log10(mse + 1e-12):.2f} dB -> {args.output}"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
