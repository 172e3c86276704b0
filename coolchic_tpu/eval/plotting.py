"""RD curve plots (reference: coolchic/eval/plotting.py, seaborn-based;
matplotlib here)."""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional

from coolchic_tpu.eval.bd_rate import anchor_path, parse_result_summary


def plot_rd_curves(
    summaries: Dict[str, Dict[str, List[dict]]],
    seq_name: str,
    out_path: Optional[Path] = None,
):
    """Plot rate/PSNR curves of several codecs for one sequence.

    Args:
        summaries: {codec_name: parse_result_summary(...) output}.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 5))
    for name, summary in summaries.items():
        if seq_name not in summary:
            continue
        rows = sorted(summary[seq_name], key=lambda r: r["rate_bpp"])
        ax.plot(
            [r["rate_bpp"] for r in rows],
            [r["psnr_db"] for r in rows],
            marker="o",
            label=name,
        )
    ax.set_xlabel("rate [bpp]")
    ax.set_ylabel("PSNR [dB]")
    ax.set_title(seq_name)
    ax.grid(True, alpha=0.3)
    ax.legend()
    if out_path is not None:
        fig.savefig(out_path, dpi=120, bbox_inches="tight")
        plt.close(fig)
    return fig


def plot_dataset_rd(
    dataset: str,
    anchors: List[str],
    seq_name: str,
    out_path: Optional[Path] = None,
):
    """Convenience: plot one sequence's published anchor curves."""
    summaries = {a: parse_result_summary(anchor_path(dataset, a)) for a in anchors}
    return plot_rd_curves(summaries, seq_name, out_path)
