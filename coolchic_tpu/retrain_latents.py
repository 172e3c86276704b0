"""Latent-retrain CLI: reload a trained encoder, re-initialize the latent
grids and retrain only them (reference: coolchic/retrain_latents.py —
zero or seeded-noise re-initialization at :83-88, latent-only training).

Usage:
    python -m coolchic_tpu.retrain_latents --checkpoint=wd/video_encoder.pkl \\
        --input=img.png --init=zeros --n_itr=1000
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="coolchic_tpu latent retrainer")
    p.add_argument("--checkpoint", type=Path, required=True, help="video_encoder.pkl")
    p.add_argument("--input", type=Path, required=True)
    p.add_argument("--init", choices=["zeros", "noise", "keep"], default="zeros")
    p.add_argument("--n_itr", type=int, default=1000)
    p.add_argument("--lmbda", type=float, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--frame", type=int, default=0, help="coding-order index")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from coolchic_tpu.io import convert_420_to_444, load_frame_data_from_file
    from coolchic_tpu.train import TrainerPhase, eval_metrics, run_phase
    from coolchic_tpu.video import load_video_encoder

    enc = load_video_encoder(args.checkpoint)
    cfg = enc.cfg
    entry = enc.all_frame_encoders[str(args.frame)]
    lmbda = args.lmbda or entry.manager.lmbda
    params = jax.tree.map(jnp.asarray, entry.params)

    fd = load_frame_data_from_file(str(args.input), args.frame)
    data = fd.data
    if fd.frame_data_type == "yuv420":
        data = convert_420_to_444(data)
    target = jnp.asarray(data)

    # Re-initialize latents (reference: retrain_latents.py:83-88).
    if args.init == "zeros":
        params["latents"] = [jnp.zeros_like(l) for l in params["latents"]]
    elif args.init == "noise":
        key = jax.random.PRNGKey(args.seed)
        params["latents"] = [
            1e-2 * jax.random.normal(jax.random.fold_in(key, i), l.shape)
            for i, l in enumerate(params["latents"])
        ]

    m0 = eval_metrics(params, cfg, target, lmbda)
    print(f"before: loss {float(m0.loss):.5f} psnr {float(m0.psnr_db):.2f} dB")

    phase = TrainerPhase(
        lr=1e-2,
        max_itr=args.n_itr,
        freq_valid=min(100, args.n_itr),
        schedule_lr=True,
        quantizer_type="softround",
        quantizer_noise_type="gaussian",
        softround_temperature=(0.3, 0.1),
        noise_parameter=(0.25, 0.1),
        optimized_module=("latents",),
    )
    params, logs = run_phase(
        params, target, lmbda, jax.random.PRNGKey(args.seed + 1), cfg, phase
    )
    print(
        f"after : loss {float(logs.loss):.5f} psnr {float(logs.psnr_db):.2f} dB "
        f"bpp {float(logs.rate_latent_bpp):.4f}"
    )

    entry.params = jax.tree.map(np.asarray, params)
    enc.save(args.checkpoint)
    print(f"updated {args.checkpoint}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
