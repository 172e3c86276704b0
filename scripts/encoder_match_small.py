"""Small-scale SAME-BUDGET encoder match: guaranteed-landing points.

The full-resolution same-budget experiment (scripts/encoder_match.py +
/tmp/refenc harness) runs the reference encoder (torch-CPU) at our c3x-fast
budget — but on this 1-core box it costs ~2.6 s/iteration at 512x768
(~11 h per point), so a full-size point may not land inside a round. This
harness runs the SAME like-for-like comparison on 4x-downscaled (≈192x128)
targets, where the torch side costs ~45 min/point:

  * both encoders see the IDENTICAL 8-bit PNG target (a Lanczos 4x
    downscale of the sweep's proxy target),
  * both run the same c3x recipe at the same budget (n_itr=10600, 1 loop,
    warmup included), same decoder arch (hop: arm 16,2 / 48-wide synthesis
    / 7 grids / ups 8,7 — the torch yaml and cfg/dec/hop.yaml match),
  * both sides' rates are real bitstream bytes and both PSNRs are measured
    on the DECODED bitstream against the shared target.

Rows land in encoder_match.json with kind="same_budget" and an explicit
"scale" field (the seq name carries the size too, e.g. kodim15_192x128) so
nobody can mistake them for full-resolution points. The optimizer-quality
question — at equal budget on an identical target, which encoder reaches
the lower RD cost? — is scale-transferable; the full-size kodim15 point
remains queued as the flagship confirmation.

Our side runs on CPU (f32), matching the torch side's CPU f32 math rather
than the TPU's bf16 matmuls — the cleaner apples-to-apples.

Usage:
  python scripts/encoder_match_small.py prepare            # write targets
  python scripts/encoder_match_small.py ours --seq kodim15 --lmbda 4e-3
  python scripts/encoder_match_small.py ingest --seq kodim15 --lmbda 4e-3 \
      --ref_bitstream /tmp/refenc/small/run_kodim15/kodim15.cool [--ref_wall_s N]

Reference: /root/reference/coolchic/encode.py (the torch side entry point),
cfg/enc/fast.cfg + preset_cfg/c3x.yaml (the shared budget).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))
WORKDIR = REPO / "results/image/kodak/tpu_sweep"
EM_DIR = WORKDIR / "encoder_match"
SMALL_TARGETS = EM_DIR / "small_targets"
SMALL_OURS = EM_DIR / "small_ours"
MATCH = EM_DIR / "encoder_match.json"

POINTS = (
    ("kodim15", 4e-3),
    ("kodim12", 4e-3),
    ("kodim17", 4e-3),
    ("kodim12", 1e-3),
)

N_ITR = 10_600  # c3x fast: cfg/enc/fast.cfg
SCALE = 4

# --budget on ours/ingest: (phase-1 iters, independent loops) — reference
# cfg/enc/{fast,medium}.cfg. A medium row answers the round-4 verdict's
# "is the MIXED verdict budget-specific?" at 2.8x the fast effort.
BUDGET_ITRS = {"fast": (10_600, 1), "medium": (30_000, 2)}


def _result_stem(name: str, lmbda: float, budget: str) -> str:
    """Per-(point, budget) artifact stem; fast keeps the original unsuffixed
    names so pre-existing rows/files stay addressable."""
    stem = f"{name}_{lmbda:g}"
    return stem if budget == "fast" else f"{stem}_{budget}"


def _small_name(seq: str) -> str:
    # actual size read from the target file; name fixed by seq
    for p in SMALL_TARGETS.glob(f"{seq}_*x*.png"):
        return p.stem
    raise SystemExit(f"no small target for {seq}; run `prepare` first")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    return -10.0 * np.log10(mse + 1e-12)


def cmd_prepare(_args) -> None:
    from PIL import Image

    SMALL_TARGETS.mkdir(parents=True, exist_ok=True)
    for seq in sorted({s for s, _ in POINTS}):
        arr = np.load(WORKDIR / "targets" / f"{seq}.npy")  # (3,H,W) f32 0-1
        h, w = arr.shape[1:]
        img = Image.fromarray(
            (np.clip(arr, 0, 1) * 255 + 0.5).astype(np.uint8).transpose(1, 2, 0)
        )
        small = img.resize((w // SCALE, h // SCALE), Image.LANCZOS)
        out = SMALL_TARGETS / f"{seq}_{w // SCALE}x{h // SCALE}.png"
        small.save(out)
        print(f"{out} ({small.size[0]}x{small.size[1]})")


def cmd_ours(args) -> None:
    # CPU-forced: the shared TPU tunnel belongs to the RD sweep, and the
    # torch side is CPU f32 — match it.
    import os

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=1"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")

    from coolchic_tpu.encode import main as encode_main

    name = _small_name(args.seq)
    SMALL_OURS.mkdir(parents=True, exist_ok=True)
    budget = getattr(args, "budget", "fast")  # tolerate pre-budget callers
    n_itr, n_loops = BUDGET_ITRS[budget]
    if args.n_itr is not None:
        n_itr = args.n_itr
    stem = _result_stem(name, args.lmbda, budget)
    out_cool = SMALL_OURS / f"{stem}.cool"
    t0 = time.time()
    rc = encode_main([
        "--input", str(SMALL_TARGETS / f"{name}.png"),
        "--output", str(out_cool),
        "--workdir", str(SMALL_OURS / f"run_{stem}"),
        "--lmbda", str(args.lmbda),
        "--enc_preset", "c3x",
        "--n_itr", str(n_itr),
        "--n_train_loops", str(n_loops),
        "--dec_cfg", str(REPO / "cfg/dec/hop.yaml"),
        "--seed", "0",
        "--disable_wandb",
    ])
    wall = time.time() - t0
    if rc not in (0, None) or not out_cool.exists():
        raise SystemExit(f"our encode failed rc={rc}")
    # decoded-PSNR vs the shared target, via the C decoder (what a user gets)
    from coolchic_tpu.bitstream import decode_bitstream
    from coolchic_tpu.io import load_frame_data_from_file

    target = np.asarray(
        load_frame_data_from_file(str(SMALL_TARGETS / f"{name}.png")).data
    )
    img, _ = decode_bitstream(out_cool.read_bytes(), integer_pipeline=True)
    row = {
        "rate_bpp": len(out_cool.read_bytes()) * 8 / (target.shape[1] * target.shape[2]),
        "psnr_db_vs_target": psnr(np.asarray(img), target),
        "encode_wall_s": round(wall, 1),
        "n_itr": n_itr,
        "n_train_loops": n_loops,
        "budget": budget,
        "bitstream": str(out_cool),
    }
    (SMALL_OURS / f"{stem}.json").write_text(json.dumps(row, indent=2))
    print(json.dumps(row))


def cmd_ingest(args) -> None:
    from coolchic_tpu.bitstream import decode_bitstream
    from coolchic_tpu.io import load_frame_data_from_file

    name = _small_name(args.seq)
    budget = getattr(args, "budget", "fast")  # tolerate pre-budget callers
    stem = _result_stem(name, args.lmbda, budget)
    ours = json.loads((SMALL_OURS / f"{stem}.json").read_text())
    target = np.asarray(
        load_frame_data_from_file(str(SMALL_TARGETS / f"{name}.png")).data
    )
    data = Path(args.ref_bitstream).read_bytes()
    img, _ = decode_bitstream(data, integer_pipeline=True)
    n_pixels = target.shape[1] * target.shape[2]
    ref = {
        "rate_bpp": len(data) * 8 / n_pixels,
        "psnr_db_vs_target": psnr(np.asarray(img), target),
        "decoded_with": "our C decoder (bit-exact twin)",
    }
    if args.ref_wall_s:
        ref["encode_wall_s"] = args.ref_wall_s

    lm = args.lmbda
    rd_ref = 10 ** (-ref["psnr_db_vs_target"] / 10) + lm * ref["rate_bpp"]
    rd_ours = 10 ** (-ours["psnr_db_vs_target"] / 10) + lm * ours["rate_bpp"]
    entry = {
        "seq": name,
        "lmbda": lm,
        "budget": budget,
        "kind": "same_budget",
        "same_budget": True,
        "scale": name.split("_")[-1] + " (4x Lanczos downscale of the sweep "
        "proxy target; both encoders saw this identical 8-bit PNG)",
        "reference_encoder_same_machine_same_target": ref,
        "our_encoder": {
            "rate_bpp": ours["rate_bpp"],
            "psnr_db_vs_proxy": ours["psnr_db_vs_target"],
            "encode_wall_s": ours.get("encode_wall_s"),
            "ran_on": "CPU f32 (matching the torch side's CPU f32 math)",
        },
        "rd_cost": {
            "reference": rd_ref,
            "ours": rd_ours,
            "ours_minus_ref_pct": round(100 * (rd_ours / rd_ref - 1), 3),
        },
        "note": args.note,
    }
    doc = json.loads(MATCH.read_text()) if MATCH.exists() else {"rows": []}
    doc.setdefault("rows", [])
    doc["rows"] = [
        r for r in doc["rows"]
        if not (r["seq"] == entry["seq"] and r["lmbda"] == entry["lmbda"]
                and r.get("budget", "fast") == entry["budget"]
                and r.get("kind") == "same_budget")
    ]
    doc["rows"].append(entry)
    MATCH.parent.mkdir(parents=True, exist_ok=True)
    MATCH.write_text(json.dumps(doc, indent=2))
    print(json.dumps(entry, indent=2))

    # fold the conclusion into the RD summaries
    sys.path.insert(0, str(REPO / "scripts"))
    import encoder_match_conclude

    encoder_match_conclude.main()


def main() -> None:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    sub.add_parser("prepare")
    for c in ("ours", "ingest"):
        p = sub.add_parser(c)
        p.add_argument("--seq", required=True)
        p.add_argument("--lmbda", type=float, required=True)
        p.add_argument("--budget", choices=list(BUDGET_ITRS), default="fast")
        if c == "ours":
            p.add_argument("--n_itr", type=int, default=None)
        else:
            p.add_argument("--ref_bitstream", required=True)
            p.add_argument("--ref_wall_s", type=float, default=None)
            p.add_argument("--note", default=None)
    args = ap.parse_args()
    if getattr(args, "cmd", None) == "ingest" and args.note is None:
        n_itr, n_loops = BUDGET_ITRS[args.budget]
        args.note = (
            "reference encoder torch-CPU eager (TORCH_COMPILE_DISABLE=1), "
            f"same 192x128-scale target, same c3x {args.budget} budget "
            f"(n_itr={n_itr}, {n_loops} loop{'s' if n_loops > 1 else ''}, "
            "warmup included)")
    {"prepare": cmd_prepare, "ours": cmd_ours, "ingest": cmd_ingest}[args.cmd](args)


if __name__ == "__main__":
    main()
