"""Measure single-core decode times of the published Kodak bitstreams with
the whole-frame C decoder and refresh the timing columns of
results/image/kodak/results.tsv (reference: results/decode_one_dataset.py
+ the per-stage chrono report of cpp/ccdecapi.cpp).

    python scripts/measure_decode_times.py \\
        [--bitstreams /root/reference/results/image/kodak/bitstreams] \\
        [--tsv results/image/kodak/results.tsv] [--trials 3]

Stage mapping: the C decoder reports nn-parse, ARM, and a fused
upsampling+synthesis stage; the fused time is written to
``dec_time_syn_sec`` with ``dec_time_ups_sec`` zero.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument(
        "--bitstreams", type=Path,
        default=Path("/root/reference/results/image/kodak/bitstreams"),
    )
    p.add_argument(
        "--tsv", type=Path, default=Path("results/image/kodak/results.tsv")
    )
    p.add_argument("--trials", type=int, default=3)
    args = p.parse_args()

    from coolchic_tpu.bitstream.entropy import decode_image_cc

    # lambda <-> published filename suffix
    suffix = {"00001": 1e-4, "00004": 4e-4, "0001": 1e-3, "0004": 4e-3,
              "002": 2e-2}

    times = {}
    t_start = time.time()
    for f in sorted(args.bitstreams.glob("*.cool")):
        seq, _, suf = f.stem.partition("-lmbda-")
        data = f.read_bytes()
        best = None
        for _ in range(args.trials):
            out = decode_image_cc(data)
            assert out is not None, f.name
            t = out[1]["timings"]
            if best is None or t["total_sec"] < best["total_sec"]:
                best = t
        times[(seq, suffix[suf])] = best
    n = len(times)
    avg = sum(t["total_sec"] for t in times.values()) / n
    print(f"{n} bitstreams, avg total {avg * 1e3:.1f} ms "
          f"(arm {sum(t['arm_sec'] for t in times.values()) / n * 1e3:.1f}, "
          f"ups+syn {sum(t['ups_syn_sec'] for t in times.values()) / n * 1e3:.1f}) "
          f"in {time.time() - t_start:.0f} s wall")

    # Refresh the timing columns in place; keep rate/PSNR columns.
    lines = args.tsv.read_text().splitlines()
    header = lines[0].split("\t")
    idx = {c: i for i, c in enumerate(header)}
    out_lines = [lines[0]]
    for line in lines[1:]:
        cells = line.split("\t")
        key = (cells[idx["seq_name"]], float(cells[idx["lmbda"]]))
        if key in times:
            t = times[key]
            cells[idx["dec_time_arm_sec"]] = f"{t['arm_sec']:.6f}"
            cells[idx["dec_time_ups_sec"]] = "0.0"
            cells[idx["dec_time_syn_sec"]] = f"{t['ups_syn_sec']:.6f}"
            cells[idx["dec_time_all_sec"]] = f"{t['total_sec']:.6f}"
        out_lines.append("\t".join(cells))
    args.tsv.write_text("\n".join(out_lines) + "\n")
    print(f"updated {args.tsv}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
