"""Hypernet training CLI (reference: coolchic/hypernet_train.py,
no_coolchic_train.py, delta_hypernet_train.py merged behind --mode).

Usage:
    python -m coolchic_tpu.hypernet_train --config=cfg/exps/hnet.yaml --mode=no
    python -m coolchic_tpu.hypernet_train --config=... --mode=delta \\
        --init_from=workdir_no/   # NO -> Delta initialization
    python -m coolchic_tpu.hypernet_train --synthetic ... # no dataset needed
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="coolchic_tpu hypernet trainer")
    p.add_argument("--config", type=Path, default=None, help="HypernetRunConfig YAML")
    p.add_argument("--mode", choices=["no", "delta", "small"], default="no")
    p.add_argument("--data_dir", type=Path, default=None)
    p.add_argument("--synthetic", action="store_true", help="use synthetic patches")
    p.add_argument("--workdir", type=Path, default=Path("hnet_workdir"))
    p.add_argument("--init_from", type=Path, default=None, help="NO checkpoint for delta init")
    p.add_argument(
        "--resume", action="store_true",
        help="continue from the latest samples_N.pkl in --workdir on the "
        "global schedule clock (crash-robust segments on a flaky device)",
    )
    p.add_argument("--n_samples", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--lmbda", type=float, default=None)
    p.add_argument("--patch_size", type=int, default=256)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--disable_wandb", action="store_true")
    p.add_argument(
        "--grad_accum", type=int, default=1,
        help="gradient accumulation micro-batches (reference: training.py:322-326)",
    )
    p.add_argument(
        "--data_parallel", type=int, default=0,
        help="shard batches over this many devices (0 = single device)",
    )
    p.add_argument(
        "--checkpointing_freq",
        type=int,
        default=None,
        help="write samples_N.pkl every N samples (reference: training.py:371-373)",
    )
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from coolchic_tpu.hypernet import (
        DeltaWholeNet,
        NOWholeNet,
        SmallDeltaWholeNet,
        train_wholenet,
    )
    from coolchic_tpu.hypernet.inference import load_checkpoint, save_checkpoint
    from coolchic_tpu.metalearning import PatchDataset, synthetic_batches
    from coolchic_tpu.train.presets import TrainerPhase
    from coolchic_tpu.utils.types import HypernetRunConfig, load_config

    if args.config is not None:
        run_cfg = load_config(args.config, HypernetRunConfig)
        patch = run_cfg.hypernet_cfg.patch_size
        cfg = run_cfg.hypernet_cfg.dec_cfg.to_coolchic_config(patch)
        n_samples = args.n_samples or run_cfg.n_samples
        batch_size = args.batch_size or run_cfg.batch_size
        lmbda = args.lmbda or run_cfg.lmbda
        phase = run_cfg.recipe.all_phases[0].to_phase()
        n_hidden = run_cfg.hypernet_cfg.n_hidden_channels
        backbone = run_cfg.hypernet_cfg.backbone_arch
        unfreeze = run_cfg.unfreeze_backbone
        workdir = Path(run_cfg.workdir or args.workdir)
        hn_kwargs = dict(
            only_biases_arm=run_cfg.hypernet_cfg.arm.only_biases,
            only_biases_synthesis=run_cfg.hypernet_cfg.synthesis.only_biases,
        )
        dbl = run_cfg.hypernet_cfg.double_backbone
    else:
        from coolchic_tpu.utils.types import DecoderConfig

        patch = (args.patch_size, args.patch_size)
        cfg = DecoderConfig().to_coolchic_config(patch)
        n_samples = args.n_samples or 10_000
        batch_size = args.batch_size or 8
        lmbda = args.lmbda or 1e-3
        phase = TrainerPhase(
            lr=1e-4,
            max_itr=1,
            schedule_lr=True,
            quantizer_type="softround",
            quantizer_noise_type="gaussian",
            softround_temperature=(0.3, 0.3),
            noise_parameter=(0.25, 0.25),
        )
        n_hidden, backbone, unfreeze = 64, "resnet18", 0
        workdir = args.workdir
        hn_kwargs = {}
        dbl = False

    key = jax.random.PRNGKey(args.seed)
    if args.mode == "no":
        net = NOWholeNet(cfg, n_hidden_channels=n_hidden)
        state = net.init(key, patch)
    elif args.mode == "small":
        net = SmallDeltaWholeNet(cfg, n_hidden_channels=n_hidden, **hn_kwargs)
        state = net.init(key, patch)
    else:
        net = DeltaWholeNet(
            cfg, backbone_arch=backbone, n_hidden_channels=n_hidden,
            double_backbone=dbl, **hn_kwargs,
        )
        state = net.init(key, patch)
        if args.init_from is not None and not args.resume:
            no_state = load_checkpoint(args.init_from)
            state = net.load_from_no_coolchic(no_state, state)
            print(f"initialized from NO checkpoint {args.init_from}")

    samples_offset = 0
    if args.resume:
        from coolchic_tpu.hypernet.inference import load_checkpoint_meta

        state, samples_offset = load_checkpoint_meta(Path(workdir))
        print(f"resumed from {workdir} at {samples_offset} samples")
        if samples_offset >= n_samples:
            print("nothing left to train")
            return 0

    if args.synthetic or args.data_dir is None:
        data = map(jnp.asarray, synthetic_batches(batch_size, patch, seed=args.seed))
        eval_imgs = jnp.asarray(next(synthetic_batches(batch_size, patch, seed=999)))
    else:
        ds = PatchDataset.from_dir(args.data_dir, patch, seed=args.seed)
        from coolchic_tpu.metalearning import train_test_split

        train_paths, test_paths = train_test_split(ds.paths)
        train_ds = PatchDataset(train_paths, patch, args.seed)
        test_ds = PatchDataset(test_paths or train_paths, patch, args.seed)
        data = map(jnp.asarray, train_ds.batches(batch_size))
        eval_imgs = jnp.asarray(
            [test_ds[i] for i in range(min(8, len(test_ds)))]
        )

    from coolchic_tpu.utils import logging as cclog

    cclog.init(
        config={
            "mode": args.mode,
            "n_samples": n_samples,
            "batch_size": batch_size,
            "lmbda": lmbda,
            "backbone": backbone,
        },
        disable=args.disable_wandb,
    )
    mesh = None
    if args.data_parallel:
        from coolchic_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(args.data_parallel, axis_name="data")
    best, logs = train_wholenet(
        net,
        state,
        data,
        eval_imgs,
        lmbda=lmbda,
        phase=phase,
        key=jax.random.fold_in(key, 1),
        n_samples=n_samples,
        batch_size=batch_size,
        unfreeze_backbone_samples=unfreeze,
        workdir=workdir,
        checkpointing_freq_samples=args.checkpointing_freq,
        grad_accumulation_steps=args.grad_accum,
        mesh=mesh,
        samples_offset=samples_offset,
    )
    cclog.finish()
    save_checkpoint(best, workdir / f"samples_{n_samples}.pkl", n_samples)
    print(f"saved {workdir / f'samples_{n_samples}.pkl'}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
