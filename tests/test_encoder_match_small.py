"""Small-scale same-budget encoder match (scripts/encoder_match_small.py):
the ingest path must write a `kind="same_budget"` row with an explicit
scale disclosure, replace any prior same-budget row for the same
(seq, lambda) instead of duplicating it, and trigger the conclusion fold
(round-3 advisor finding: structured fields, not free-text notes, decide
what a row claims).
"""

import importlib.util
import json
import sys
import types
from pathlib import Path

import numpy as np

SCRIPT = Path(__file__).resolve().parents[1] / "scripts/encoder_match_small.py"


def _load(tmp_path, monkeypatch):
    spec = importlib.util.spec_from_file_location("ems", SCRIPT)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ems"] = mod
    spec.loader.exec_module(mod)
    mod.SMALL_TARGETS = tmp_path / "small_targets"
    mod.SMALL_OURS = tmp_path / "small_ours"
    mod.MATCH = tmp_path / "encoder_match.json"
    mod.SMALL_TARGETS.mkdir(parents=True)
    mod.SMALL_OURS.mkdir(parents=True)

    # stand-in decode/load: 16x8 target, "decoded" image at a fixed offset
    target = np.full((3, 8, 16), 0.5, np.float32)
    recon = target + 0.1

    import coolchic_tpu.bitstream as bs
    import coolchic_tpu.io as cio

    monkeypatch.setattr(bs, "decode_bitstream",
                        lambda data, integer_pipeline=True: (recon, None))
    fd = types.SimpleNamespace(data=target)
    monkeypatch.setattr(cio, "load_frame_data_from_file", lambda p: fd)

    # the fold is exercised by test_encoder_match_conclude; here just
    # record that ingest invokes it
    stub = types.ModuleType("encoder_match_conclude")
    stub.calls = []
    stub.main = lambda: stub.calls.append(1)
    monkeypatch.setitem(sys.modules, "encoder_match_conclude", stub)
    return mod, stub, target


def _args(mod, **kw):
    import argparse

    defaults = dict(seq="kodim15", lmbda=4e-3, ref_bitstream="", ref_wall_s=None,
                    note="test")
    defaults.update(kw)
    return argparse.Namespace(**defaults)


def test_ingest_writes_same_budget_row_and_replaces(tmp_path, monkeypatch):
    mod, stub, target = _load(tmp_path, monkeypatch)
    name = "kodim15_16x8"
    (mod.SMALL_TARGETS / f"{name}.png").write_bytes(b"")
    (mod.SMALL_OURS / f"{name}_0.004.json").write_text(json.dumps({
        "rate_bpp": 0.5, "psnr_db_vs_target": 30.0, "encode_wall_s": 10.0,
    }))
    ref_bs = tmp_path / "ref.cool"
    ref_bs.write_bytes(b"\x00" * 16)  # 16 bytes over 128 px = 1 bpp

    mod.cmd_ingest(_args(mod, ref_bitstream=str(ref_bs), ref_wall_s=99.0))

    doc = json.loads(mod.MATCH.read_text())
    rows = [r for r in doc["rows"] if r.get("kind") == "same_budget"]
    assert len(rows) == 1
    row = rows[0]
    assert row["seq"] == name and row["same_budget"] is True
    assert "16x8" in row["scale"]
    ref = row["reference_encoder_same_machine_same_target"]
    assert ref["rate_bpp"] == 16 * 8 / (8 * 16)  # 1 bpp
    assert ref["encode_wall_s"] == 99.0
    # decoded PSNR vs target: constant 0.1 offset -> 20 dB
    assert abs(ref["psnr_db_vs_target"] - 20.0) < 1e-3
    assert row["rd_cost"]["ours_minus_ref_pct"] == round(
        100 * (row["rd_cost"]["ours"] / row["rd_cost"]["reference"] - 1), 3)
    assert stub.calls  # conclusion fold ran

    # second ingest for the same (seq, lambda) replaces, never duplicates
    mod.cmd_ingest(_args(mod, ref_bitstream=str(ref_bs), ref_wall_s=1.0))
    doc = json.loads(mod.MATCH.read_text())
    rows = [r for r in doc["rows"] if r.get("kind") == "same_budget"]
    assert len(rows) == 1
    assert rows[0]["reference_encoder_same_machine_same_target"][
        "encode_wall_s"] == 1.0


def test_ingest_preserves_calibration_rows(tmp_path, monkeypatch):
    mod, stub, target = _load(tmp_path, monkeypatch)
    name = "kodim15_16x8"
    (mod.SMALL_TARGETS / f"{name}.png").write_bytes(b"")
    (mod.SMALL_OURS / f"{name}_0.004.json").write_text(json.dumps({
        "rate_bpp": 0.5, "psnr_db_vs_target": 30.0,
    }))
    mod.MATCH.write_text(json.dumps({"rows": [
        {"seq": "kodim12", "lmbda": 0.004, "kind": "published_calibration"},
    ]}))
    ref_bs = tmp_path / "ref.cool"
    ref_bs.write_bytes(b"\x00" * 16)
    mod.cmd_ingest(_args(mod, ref_bitstream=str(ref_bs)))
    doc = json.loads(mod.MATCH.read_text())
    kinds = sorted(r["kind"] for r in doc["rows"])
    assert kinds == ["published_calibration", "same_budget"]
