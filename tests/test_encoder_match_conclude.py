"""The encoder-match conclusion fold (scripts/encoder_match_conclude.py):
same_budget rows produce a verdict block injected into the RD summaries;
calibration rows alone produce nothing (round-3 advisor finding: the
published-stream calibration row must never read as a same-budget result).
"""

import importlib.util
import json
import sys
from pathlib import Path

SCRIPT = Path(__file__).resolve().parents[1] / "scripts/encoder_match_conclude.py"


def _load(tmp_path):
    spec = importlib.util.spec_from_file_location("emc", SCRIPT)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["emc"] = mod
    spec.loader.exec_module(mod)
    mod.WORKDIR = tmp_path
    mod.MATCH = tmp_path / "encoder_match" / "encoder_match.json"
    return mod


def _row(kind, pct, seq="kodim15", lmbda=0.004):
    return {
        "seq": seq,
        "lmbda": lmbda,
        "budget": "fast",
        "kind": kind,
        "rd_cost": {"ours_minus_ref_pct": pct},
    }


def _write_match(mod, rows):
    mod.MATCH.parent.mkdir(parents=True, exist_ok=True)
    mod.MATCH.write_text(json.dumps({"rows": rows}))


def test_calibration_rows_alone_produce_no_conclusion(tmp_path):
    mod = _load(tmp_path)
    _write_match(mod, [_row("published_calibration", 9.0)])
    assert mod.conclusion() is None


def test_same_budget_rows_fold_into_summaries(tmp_path):
    mod = _load(tmp_path)
    _write_match(mod, [
        _row("published_calibration", 9.0),
        _row("same_budget", 4.0, seq="kodim15"),
        _row("same_budget", -1.0, seq="kodim12"),
    ])
    for name in ("bd_rate_medium.json", "bd_rate.json"):
        (tmp_path / name).write_text(json.dumps({"budget": "x"}))
    mod.main()
    for name in ("bd_rate_medium.json", "bd_rate.json"):
        doc = json.loads((tmp_path / name).read_text())
        blk = doc["encoder_match"]
        assert blk["n_points"] == 2  # calibration row excluded
        assert blk["mean_ours_minus_ref_rd_cost_pct"] == 1.5
        assert "optimizer" in blk["verdict"]
        assert doc["budget"] == "x"  # existing fields preserved


def test_verdict_direction():
    # mean below -1% flips the verdict to budget-artifact
    mod = _load(Path("/tmp"))
    import types

    rows = [_row("same_budget", -5.0)]

    def fake_read():
        return json.dumps({"rows": rows})

    mod.MATCH = types.SimpleNamespace(
        exists=lambda: True, read_text=fake_read)
    blk = mod.conclusion()
    assert "budget/recipe artifact" in blk["verdict"]
    # near-zero mean = parity verdict
    rows[0] = _row("same_budget", 0.3)
    blk = mod.conclusion()
    assert "within noise" in blk["verdict"]


def test_mixed_outcome_names_both_sides():
    # one image reference-better, one parity: the verdict must say MIXED
    # and attribute per image instead of averaging the story away
    mod = _load(Path("/tmp"))
    import types

    rows = [
        _row("same_budget", 3.4, seq="kodim12_192x128"),
        _row("same_budget", -0.6, seq="kodim15_192x128"),
    ]
    mod.MATCH = types.SimpleNamespace(
        exists=lambda: True, read_text=lambda: json.dumps({"rows": rows}))
    blk = mod.conclusion()
    assert blk["verdict"].startswith("MIXED")
    assert "kodim12_192x128" in blk["verdict"]
    assert "kodim15_192x128" in blk["verdict"]
    # all points reference-better: unambiguous optimizer-quality verdict
    rows[1] = _row("same_budget", 2.2, seq="kodim15_192x128")
    blk = mod.conclusion()
    assert "every measured point" in blk["verdict"]
    assert "optimizer/recipe quality" in blk["verdict"]
