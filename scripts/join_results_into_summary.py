"""Join per-run results_best.tsv files into one results.tsv summary
(reference: scripts/join_results_into_summary.py). Rows keep the
reference results schema so eval.bd_rate can consume the output."""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--runs_dir", type=Path, required=True,
                   help="directory containing per-run workdirs")
    p.add_argument("--out", type=Path, default=None)
    args = p.parse_args()

    tsvs = sorted(args.runs_dir.rglob("results_best.tsv"))
    assert tsvs, f"no results_best.tsv under {args.runs_dir}"
    out = args.out or (args.runs_dir / "results.tsv")

    header = None
    rows = []
    for tsv in tsvs:
        lines = tsv.read_text().strip().split("\n")
        if header is None:
            header = lines[0]
        rows += lines[1:]
    out.write_text(header + "\n" + "\n".join(rows) + "\n")
    print(f"wrote {out} ({len(rows)} rows from {len(tsvs)} runs)")


if __name__ == "__main__":
    main()
