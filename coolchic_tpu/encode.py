"""Image/video encode CLI (reference: coolchic/encode.py).

Usage:
    python -m coolchic_tpu.encode --config=cfg/exps/example.yaml
    python -m coolchic_tpu.encode --input=img.png --output=img.cool \\
        --lmbda=1e-3 --enc_preset=debug --dec_cfg=cfg/dec/vlop.yaml

Loads a ``UserConfig`` YAML, expands it into runs (cartesian product of
input x lmbda x dec_cfg), overfits each image, quantizes the networks,
writes the bitstream and a ``results_best.tsv`` per run.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import yaml


def _build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="coolchic_tpu encoder")
    p.add_argument("--config", type=Path, default=None, help="UserConfig YAML")
    p.add_argument("--input", type=Path, default=None)
    p.add_argument("--output", type=Path, default=None)
    p.add_argument("--workdir", type=Path, default=None)
    p.add_argument("--lmbda", type=float, default=1e-3)
    p.add_argument("--enc_preset", type=str, default="c3x", choices=["c3x", "debug"])
    p.add_argument("--n_itr", type=int, default=None)
    p.add_argument("--n_train_loops", type=int, default=1)
    p.add_argument("--dec_cfg", type=Path, default=None, help="DecoderConfig YAML")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--hls_sig_blksize", type=int, default=16)
    p.add_argument(
        "--disable_wandb",
        action="store_true",
        help="turn off experiment logging (reference: encode.py:148-152)",
    )
    return p


def encode_one_run(run_cfg, seed: int = 0, hls_sig_blksize: int = 16) -> dict:
    """Encode one (image, lmbda, decoder-config) run. Returns a results row
    (schema matches reference results/image/*/results.tsv)."""
    import jax
    import jax.numpy as jnp

    from coolchic_tpu.bitstream import encode_image_bitstream
    from coolchic_tpu.io import load_frame_data_from_file
    from coolchic_tpu.train.encode import encode_frame_with_quant_info

    if str(run_cfg.input).endswith(".yuv"):
        return encode_video_run(run_cfg, seed, hls_sig_blksize)

    fd = load_frame_data_from_file(str(run_cfg.input))
    cfg = run_cfg.dec_cfg.to_coolchic_config(fd.img_size)
    preset = run_cfg.enc_cfg.recipe.to_preset()
    target = jnp.asarray(fd.data)

    best = None
    t0 = time.time()
    for loop in range(run_cfg.enc_cfg.n_train_loops):
        key = jax.random.PRNGKey(seed + loop)
        result, infos = encode_frame_with_quant_info(
            key, target, run_cfg.lmbda, cfg, preset
        )
        if best is None or float(result.loss) < float(best[0].loss):
            best = (result, infos)
    elapsed = time.time() - t0
    result, infos = best

    bitstream = None
    if infos is not None:
        nn_q_step = {
            m: {"weight": float(i.q_step_w), "bias": float(i.q_step_b)}
            for m, i in infos.items()
        }
        nn_expgol = {
            m: {"weight": int(i.expgol_w), "bias": int(i.expgol_b)}
            for m, i in infos.items()
        }
        bitstream = encode_image_bitstream(
            result.params,
            cfg,
            nn_q_step,
            nn_expgol,
            bitdepth=fd.bitdepth,
            frame_data_type=fd.frame_data_type,
            hls_sig_blksize=hls_sig_blksize,
        )
        if run_cfg.output:
            Path(run_cfg.output).write_bytes(bitstream)

    n_pixels = cfg.n_pixels
    real_bpp = len(bitstream) * 8 / n_pixels if bitstream else float("nan")
    # The reported PSNR is measured on the actual decoded bitstream (the
    # integer pipeline), not the float training forward: the reconstruction
    # the user gets goes through the decoder-matched NN reload + integer
    # ARM, so the float estimate can drift slightly.
    psnr_decoded = float(result.psnr_db)
    if bitstream is not None and fd.frame_data_type == "rgb":
        import numpy as np

        from coolchic_tpu.bitstream import decode_bitstream

        decoded_img, _ = decode_bitstream(bitstream, integer_pipeline=True)
        mse = float(np.mean((decoded_img - np.asarray(fd.data)) ** 2))
        psnr_decoded = -10.0 * np.log10(mse + 1e-12)
    row = {
        "seq_name": Path(run_cfg.input).stem,
        "lmbda": run_cfg.lmbda,
        "rate_bpp": real_bpp,
        "n_pixels": n_pixels,
        "psnr_db": psnr_decoded,
        "psnr_db_estimate": float(result.psnr_db),
        "rate_latent_bpp": float(result.rate_latent_bpp),
        "loss": float(result.loss),
        "encoding_time_sec": elapsed,
    }
    if run_cfg.workdir:
        workdir = Path(run_cfg.workdir)
        workdir.mkdir(parents=True, exist_ok=True)
        tsv = workdir / "results_best.tsv"
        with open(tsv, "w") as f:
            f.write("\t".join(row.keys()) + "\n")
            f.write("\t".join(str(v) for v in row.values()) + "\n")
    return row


def encode_video_run(run_cfg, seed: int = 0, hls_sig_blksize: int = 16) -> dict:
    """Encode a .yuv sequence: GOP structure from the encoder config
    (intra_period/p_period), per-frame overfitting, multi-frame bitstream
    (reference: encode.py video path via VideoEncoder)."""
    from pathlib import Path as _Path

    from coolchic_tpu.io import parse_yuv_size
    from coolchic_tpu.video import CodingStructure, VideoEncoder

    w, h = parse_yuv_size(str(run_cfg.input))
    # YUV420 content trains with the 4:1:1-weighted MSE
    # (reference: enc/training/loss.py:53-87).
    fdt = "yuv420" if "420" in str(run_cfg.input) else "yuv444"
    cfg = run_cfg.dec_cfg.to_coolchic_config((h, w), frame_data_type=fdt)
    preset = run_cfg.enc_cfg.recipe.to_preset()
    cs = CodingStructure(
        intra_period=run_cfg.enc_cfg.intra_period,
        p_period=run_cfg.enc_cfg.p_period or max(run_cfg.enc_cfg.intra_period, 1),
        seq_name=_Path(run_cfg.input).stem,
    )
    enc = VideoEncoder(
        cs, cfg, preset, lmbda=run_cfg.lmbda, n_loops=run_cfg.enc_cfg.n_train_loops
    )
    t0 = time.time()
    enc.encode(str(run_cfg.input), seed=seed, workdir=run_cfg.workdir)
    elapsed = time.time() - t0
    bitstream = enc.to_bitstream(hls_sig_blksize)
    if run_cfg.output:
        Path(run_cfg.output).write_bytes(bitstream)
    n_frames = cs.get_number_of_frames()
    row = {
        "seq_name": _Path(run_cfg.input).stem,
        "lmbda": run_cfg.lmbda,
        "rate_bpp": len(bitstream) * 8 / (cfg.n_pixels * n_frames),
        "n_pixels": cfg.n_pixels,
        "psnr_db": float(
            np_mean([e.psnr_db for e in enc.all_frame_encoders.values()])
        ),
        "rate_latent_bpp": float(
            np_mean([e.rate_latent_bpp for e in enc.all_frame_encoders.values()])
        ),
        "loss": float("nan"),
        "encoding_time_sec": elapsed,
    }
    if run_cfg.workdir:
        workdir = Path(run_cfg.workdir)
        workdir.mkdir(parents=True, exist_ok=True)
        with open(workdir / "results_best.tsv", "w") as f:
            f.write("\t".join(row.keys()) + "\n")
            f.write("\t".join(str(v) for v in row.values()) + "\n")
    return row


def np_mean(xs):
    return sum(xs) / max(len(xs), 1)


def main(argv=None) -> int:
    args = _build_argparser().parse_args(argv)

    from coolchic_tpu.utils.types import (
        DecoderConfig,
        EncoderConfig,
        UserConfig,
        load_config,
    )

    if args.config is not None:
        user_cfg = load_config(args.config, UserConfig)
    else:
        assert args.input is not None, "--input or --config required"
        dec_cfg = (
            DecoderConfig(**yaml.safe_load(open(args.dec_cfg)))
            if args.dec_cfg
            else DecoderConfig()
        )
        user_cfg = UserConfig(
            input=args.input,
            output=args.output,
            workdir=args.workdir,
            lmbda=args.lmbda,
            enc_cfg=EncoderConfig(
                std_recipe_name=args.enc_preset,
                n_itr=args.n_itr,
                n_train_loops=args.n_train_loops,
            ),
            dec_cfg=dec_cfg,
        )

    from coolchic_tpu.utils import logging as cclog

    for i, run_cfg in enumerate(user_cfg.get_run_configs()):
        # one logging run per encode run (reference: encode.py:154)
        cclog.init(
            config={
                "input": str(run_cfg.input),
                "lmbda": run_cfg.lmbda,
                "recipe": run_cfg.enc_cfg.std_recipe_name,
            },
            disable=args.disable_wandb,
        )
        row = encode_one_run(run_cfg, args.seed, args.hls_sig_blksize)
        cclog.log(row, step=i)
        cclog.finish()
        print(
            f"{row['seq_name']}: lmbda={row['lmbda']:.1e} "
            f"psnr={row['psnr_db']:.3f} dB rate={row['rate_bpp']:.4f} bpp "
            f"({row['encoding_time_sec']:.1f} s)"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
