"""Shard a UserConfig sweep across workers (the TPU-native replacement for
the reference's SLURM job arrays, reference: sbatch-files/*.sh).

Each worker takes every WORKER_ID-th run of the expanded cartesian product;
within a worker, same-sized images are batched onto the chip by the encode
pipeline. Run one process per host/chip:

    WORKER_ID=0 N_WORKERS=4 python scripts/launch_sweep.py --config sweep.yaml
"""

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", type=Path, required=True)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    worker_id = int(os.environ.get("WORKER_ID", 0))
    n_workers = int(os.environ.get("N_WORKERS", 1))

    from coolchic_tpu.encode import encode_one_run
    from coolchic_tpu.utils.types import UserConfig, load_config

    user_cfg = load_config(args.config, UserConfig)
    runs = user_cfg.get_run_configs()
    my_runs = runs[worker_id::n_workers]
    print(f"worker {worker_id}/{n_workers}: {len(my_runs)} of {len(runs)} runs")
    for run_cfg in my_runs:
        row = encode_one_run(run_cfg, seed=args.seed)
        print(
            f"{row['seq_name']}: lmbda={row['lmbda']:.1e} "
            f"psnr={row['psnr_db']:.3f} rate={row['rate_bpp']:.4f} bpp"
        )


if __name__ == "__main__":
    main()
