"""Generate a UserConfig YAML sweeping the 24 Kodak images over the
standard lambda grid (reference: scripts/gen_kodim_config.py +
gen_config_lambdas.py)."""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pathlib import Path

import yaml

STD_LAMBDAS = [0.0001, 0.0004, 0.001, 0.004, 0.02]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_dir", type=Path, required=True, help="dir with kodimXX.png")
    p.add_argument("--out", type=Path, default=Path("cfg/exps/kodak_sweep.yaml"))
    p.add_argument("--enc_preset", default="c3x")
    p.add_argument("--n_itr", type=int, default=10000)
    p.add_argument("--workdir", type=Path, default=Path("kodak_workdir"))
    args = p.parse_args()

    inputs = sorted(str(p) for p in args.data_dir.glob("kodim*.png"))
    assert inputs, f"no kodim*.png under {args.data_dir}"
    cfg = {
        "input": inputs,
        "workdir": str(args.workdir),
        "lmbda": STD_LAMBDAS,
        "enc_cfg": {
            "std_recipe_name": args.enc_preset,
            "n_itr": args.n_itr,
            "n_train_loops": 1,
        },
        "dec_cfg": {"arm": "24,2"},
    }
    args.out.parent.mkdir(parents=True, exist_ok=True)
    args.out.write_text(yaml.safe_dump(cfg))
    print(f"wrote {args.out} ({len(inputs)} images x {len(STD_LAMBDAS)} lambdas)")


if __name__ == "__main__":
    main()
