"""Plot hypernet sweep results against the published anchor curves
(reference: scripts/plot_hypernet_rd.py + eval/hypernet.py plot_hypernet_rd).

    python scripts/plot_hypernet_rd.py --csv sweep.csv \\
        [--dataset kodak] [--out plots/hypernet] [--per_image]

The CSV is the output of ``coolchic_tpu.hypernet.inference.eval_dataset``
(schema: seq_name, rate_bpp, psnr_db, ...); anchors come from the checked-in
``results/image/<dataset>/*.tsv`` published curves.
"""

from __future__ import annotations

import argparse
import csv
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

REPO = Path(__file__).resolve().parents[1]


def load_csv(path: Path):
    with open(path) as f:
        return [
            {
                k: (float(v) if k not in ("seq_name", "option_selected") else v)
                for k, v in row.items()
            }
            for row in csv.DictReader(f)
        ]


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--csv", type=Path, required=True, help="eval_dataset CSV")
    p.add_argument("--dataset", default="kodak",
                   choices=["kodak", "clic20-pro-valid", "jvet"])
    p.add_argument("--anchors", nargs="*", default=["results", "hm", "jpeg"],
                   help="anchor TSV stems under results/image/<dataset>/")
    p.add_argument("--out", type=Path, default=Path("plots/hypernet"))
    p.add_argument("--per_image", action="store_true")
    args = p.parse_args()

    import matplotlib.pyplot as plt

    from coolchic_tpu.eval.bd_rate import parse_result_summary
    from coolchic_tpu.eval.plotting import gen_rd_plot

    runs = {"hypernet": load_csv(args.csv)}
    adir = REPO / "results" / "image" / args.dataset
    for stem in args.anchors:
        tsv = adir / f"{stem}.tsv"
        if tsv.exists():
            label = "cool-chic" if stem == "results" else stem
            per_seq = parse_result_summary(tsv)
            runs[label] = [r for rows in per_seq.values() for r in rows]

    args.out.mkdir(parents=True, exist_ok=True)
    fig = gen_rd_plot(runs, title=f"hypernet vs anchors ({args.dataset})")
    fig.savefig(args.out / "hypernet_rd_average.png", dpi=150)
    plt.close(fig)
    print(f"wrote {args.out / 'hypernet_rd_average.png'}")

    if args.per_image:
        seqs = sorted({r["seq_name"] for r in runs["hypernet"]})
        for seq in seqs:
            fig = gen_rd_plot(runs, seq_name=seq)
            fig.savefig(args.out / f"hypernet_rd_{seq}.png", dpi=150)
            plt.close(fig)
        print(f"wrote {len(seqs)} per-image figures")
    return 0


if __name__ == "__main__":
    sys.exit(main())
