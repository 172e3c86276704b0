"""Generate RD plots from results TSVs (reference: scripts/generate_rd_plots.py).

    python scripts/generate_rd_plots.py \\
        --results results/image/kodak/tpu_sweep/results.tsv \\
        --anchor results/image/kodak/tpu_sweep/ref_vs_proxy.tsv \\
        --out plots/ [--per_image]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--results", type=Path, required=True, help="our results.tsv")
    p.add_argument("--anchor", type=Path, default=None, help="anchor results.tsv")
    p.add_argument("--anchor_label", default="reference")
    p.add_argument("--out", type=Path, default=Path("plots"))
    p.add_argument("--per_image", action="store_true",
                   help="also write one figure per sequence")
    args = p.parse_args()

    from coolchic_tpu.eval.bd_rate import parse_result_summary
    from coolchic_tpu.eval.plotting import gen_rd_plot

    def flat(path):
        per_seq = parse_result_summary(path)
        return [row for rows in per_seq.values() for row in rows]

    runs = {"ours": flat(args.results)}
    if args.anchor:
        runs[args.anchor_label] = flat(args.anchor)

    args.out.mkdir(parents=True, exist_ok=True)
    import matplotlib.pyplot as plt

    fig = gen_rd_plot(runs, title=args.results.parent.name)
    fig.savefig(args.out / "rd_average.png", dpi=150)
    plt.close(fig)
    print(f"wrote {args.out / 'rd_average.png'}")

    if args.per_image:
        seqs = sorted({r["seq_name"] for r in runs["ours"]})
        for seq in seqs:
            fig = gen_rd_plot(runs, seq_name=seq)
            fig.savefig(args.out / f"rd_{seq}.png", dpi=150)
            plt.close(fig)
        print(f"wrote {len(seqs)} per-image figures to {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
