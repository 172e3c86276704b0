"""The slowtail finalize's budget-attribution fold: per-seq deltas against
bd_rate_medium.json land in the summary; missing medium file or missing
sequences degrade gracefully (the fold must never break the real slowtail
finalize mid-sweep)."""

import importlib.util
import json
import sys
from pathlib import Path

SCRIPT = Path(__file__).resolve().parents[1] / "scripts/kodak_rd_sweep.py"


def _fold():
    spec = importlib.util.spec_from_file_location("krs_fold", SCRIPT)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["krs_fold"] = mod
    spec.loader.exec_module(mod)
    return mod._fold_slowtail_attribution


def test_fold_computes_deltas(tmp_path):
    fold = _fold()
    (tmp_path / "bd_rate_medium.json").write_text(json.dumps({
        "bd_rate_per_seq": {"kodim15": 7.69, "kodim23": 5.25},
    }))
    summary = {"bd_rate_per_seq": {"kodim15": 2.0, "kodim23": 5.3,
                                   "kodim99": 1.0}}
    fold(summary, tmp_path)
    vm = summary["vs_medium"]
    assert vm["kodim15"]["delta_pct"] == -5.69
    assert vm["kodim23"]["delta_pct"] == 0.05
    assert vm["kodim99"]["delta_pct"] is None  # not in medium: no crash
    assert summary["budget_attribution"]["mean_delta_pct"] == -2.82


def test_fold_noops_without_medium(tmp_path):
    fold = _fold()
    summary = {"bd_rate_per_seq": {"kodim15": 2.0}}
    fold(summary, tmp_path)
    assert "vs_medium" not in summary and "budget_attribution" not in summary
