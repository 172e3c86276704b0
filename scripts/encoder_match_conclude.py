"""Fold the same-budget encoder-match verdict into the RD summaries.

Reads encoder_match.json (written by scripts/encoder_match.py, one row per
(seq, lambda, budget, kind)) and injects an `encoder_match` block into
bd_rate_medium.json and bd_rate.json so the attribution conclusion lives
next to the headline BD-rate number it explains (round-3 verdict: the
experiment must answer "is the +2.44% a budget artifact or an
optimizer-quality gap?" in the canonical results file, not a side file).

Only `kind == "same_budget"` rows count: the reference encoder ran on THIS
machine on the SAME proxy target at the SAME iteration budget as our sweep
row, so `rd_cost.ours_minus_ref_pct` directly measures the optimizer-quality
difference at that point. Positive = the reference encoder reaches a lower
RD cost than ours at equal budget (our remaining gap is optimizer quality);
~0 or negative = our encoder matches/beats the reference like-for-like (the
published-curve gap is a budget/recipe artifact).

Idempotent; safe to run after every ingest. CPU-only (json munging).
"""

from __future__ import annotations

import json
from pathlib import Path

WORKDIR = Path(__file__).resolve().parents[1] / "results/image/kodak/tpu_sweep"
MATCH = WORKDIR / "encoder_match" / "encoder_match.json"


def conclusion() -> dict | None:
    if not MATCH.exists():
        return None
    rows = json.loads(MATCH.read_text()).get("rows", [])
    same = [r for r in rows if r.get("kind") == "same_budget"]
    if not same:
        return None
    pts = [
        {
            "seq": r["seq"],
            "lmbda": r["lmbda"],
            "budget": r["budget"],
            "ref_minus_ours_rd_cost_pct": -r["rd_cost"]["ours_minus_ref_pct"],
            "ours_minus_ref_rd_cost_pct": r["rd_cost"]["ours_minus_ref_pct"],
        }
        for r in same
    ]
    mean = sum(p["ours_minus_ref_rd_cost_pct"] for p in pts) / len(pts)
    # Per-point attribution: the question is per-image (the medium-sweep
    # tail is carried by specific images), so a single mean-based sentence
    # can misstate a mixed outcome. |delta| <= 1% counts as parity.
    ours_better = [p for p in pts if p["ours_minus_ref_rd_cost_pct"] < -1.0]
    ref_better = [p for p in pts if p["ours_minus_ref_rd_cost_pct"] > 1.0]
    parity = [p for p in pts if p not in ours_better and p not in ref_better]

    def _names(ps):
        return ", ".join(f"{p['seq']}@{p['lmbda']:g}" for p in ps)

    if ref_better and (ours_better or parity):
        verdict = (
            "MIXED, per-image: at equal iteration budget on the same target "
            f"the reference encoder wins on {_names(ref_better)} (that "
            "image's residual sweep gap is optimizer/recipe quality), while "
            f"ours matches or beats it on {_names(parity + ours_better)} "
            "(those gaps are budget/recipe artifacts of the published "
            "streams' larger unpublished budget)"
        )
    elif ref_better:
        verdict = (
            "at equal iteration budget on the same target the reference "
            "encoder reaches a lower RD cost on every measured point: the "
            "residual sweep gap is optimizer/recipe quality, not budget"
        )
    elif ours_better and not parity:
        verdict = (
            "at equal iteration budget on the same target OUR encoder "
            "reaches a lower RD cost on every measured point: the "
            "published-curve gap is a budget/recipe artifact, not optimizer "
            "quality"
        )
    else:
        verdict = (
            "at equal iteration budget on the same target the two encoders "
            "reach the same RD cost within noise: the published-curve gap "
            "is attributable to the published streams' larger (unpublished) "
            "budget and per-image config search, not optimizer quality"
        )
    return {
        "what": (
            "same-budget encoder match (scripts/encoder_match.py): the "
            "reference encoder (torch-CPU, built from /root/reference) ran "
            "on THIS machine on the SAME proxy target at the SAME iteration "
            "budget as our sweep row; ours_minus_ref_rd_cost_pct > 0 means "
            "the reference encodes better like-for-like"
        ),
        "n_points": len(pts),
        "points": pts,
        "mean_ours_minus_ref_rd_cost_pct": round(mean, 3),
        # Per-lambda view (round-4 verdict #5): the sweep deficit
        # concentrates at 2e-2, so the match verdict is stated per
        # operating point, not just per image.
        "per_lambda_mean_ours_minus_ref_pct": {
            f"{lm:g}": round(
                sum(p["ours_minus_ref_rd_cost_pct"] for p in pts
                    if p["lmbda"] == lm)
                / len([p for p in pts if p["lmbda"] == lm]), 3)
            for lm in sorted({p["lmbda"] for p in pts})
        },
        "verdict": verdict,
    }


def main() -> None:
    block = conclusion()
    if block is None:
        print("no same_budget rows yet; nothing to fold")
        return
    for name in ("bd_rate_medium.json", "bd_rate.json"):
        p = WORKDIR / name
        if not p.exists():
            continue
        doc = json.loads(p.read_text())
        doc["encoder_match"] = block
        p.write_text(json.dumps(doc, indent=2))
        print(f"folded encoder_match ({block['n_points']} points, mean "
              f"{block['mean_ours_minus_ref_rd_cost_pct']:+.2f}%) into {p}")


if __name__ == "__main__":
    main()
