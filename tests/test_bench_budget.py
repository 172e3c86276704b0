"""bench.py termination contract (round-3 verdict: BENCH_r03 was rc=124).

The orchestrator must ALWAYS print exactly one final JSON line inside its
wall-clock budget — even when every worker launch times out or crashes —
and must annotate partial results instead of dying. These tests fake the
worker subprocess, so they run without a TPU.
"""

import json
import subprocess
import sys
import time
import types

import pytest

import bench


@pytest.fixture()
def no_teardown(monkeypatch):
    monkeypatch.setattr(bench, "stop_sweep_processes", lambda: [])


def run_main(capsys) -> dict:
    monkey_argv = ["bench.py"]
    old = sys.argv
    sys.argv = monkey_argv
    try:
        bench.main()
    finally:
        sys.argv = old
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1, f"expected exactly one JSON line, got {out}"
    return json.loads(out[0])


def test_all_workers_timeout_still_prints_json(monkeypatch, capsys, no_teardown):
    monkeypatch.setattr(bench, "TOTAL_BUDGET_S", 150.0)
    monkeypatch.setattr(bench, "COOLDOWN_S", 0.1)
    monkeypatch.setattr(bench, "GATE_COOLDOWN_S", 0.1)

    def fake_run(cmd, **kw):
        raise subprocess.TimeoutExpired(cmd, kw.get("timeout", 0))

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    t0 = time.time()
    rec = run_main(capsys)
    assert time.time() - t0 < 30
    assert rec["value"] is None
    assert rec["detail"]["chip_state"] == "no-measurement"
    assert rec["detail"]["gate_passed"] is False
    assert rec["detail"]["last_worker_err"] == "worker timeout"


def _fake_worker(trial_value=3000.0, probe_value=150.0, oom_batches=()):
    """Build a subprocess.run replacement that answers every todo item."""

    def fake_run(cmd, **kw):
        todo = cmd[cmd.index("--todo") + 1].split(",")
        lines = [json.dumps({"kind": "device", "value": "axon:fake"})]
        for item in todo:
            kind, _, arg = item.partition(":")
            if kind == "probe":
                lines.append(json.dumps(
                    {"kind": "probe", "arg": arg, "value": probe_value}))
            else:
                b = int(arg.partition("x")[0])
                if b in oom_batches:
                    lines.append(json.dumps(
                        {"kind": "oom", "arg": arg, "value": "RESOURCE_EXHAUSTED"}))
                else:
                    lines.append(json.dumps(
                        {"kind": "trial", "arg": arg, "value": trial_value * b / 8}))
        return types.SimpleNamespace(
            returncode=0, stdout="\n".join(lines) + "\n", stderr="")

    return fake_run


def test_hung_worker_costs_one_capped_window(monkeypatch, capsys, no_teardown):
    """Round-4 flaw: a tunnel-hung worker inherited `timeout=remaining` and
    burned the whole budget (2 launches in 765 s). Every launch must now be
    individually capped so the orchestrator gets many independent windows."""
    monkeypatch.setattr(bench, "TOTAL_BUDGET_S", 780.0)
    monkeypatch.setattr(bench, "COOLDOWN_S", 0.05)
    monkeypatch.setattr(bench, "GATE_COOLDOWN_S", 0.05)
    timeouts = []

    def fake_run(cmd, **kw):
        timeouts.append(kw["timeout"])
        raise subprocess.TimeoutExpired(cmd, kw["timeout"])

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    rec = run_main(capsys)
    assert rec["value"] is None
    # gate probes capped tight, trial windows capped at the window max
    assert timeouts[0] <= bench.PROBE_WORKER_CAP_S
    assert timeouts[1] <= bench.PROBE_WORKER_CAP_S
    assert all(t <= bench.TRIAL_WORKER_CAP_MAX_S for t in timeouts[2:])
    # a dead tunnel yields MANY windows inside the budget, not 2
    assert len(timeouts) >= 6
    assert rec["detail"]["worker_launches"] == len(timeouts)
    assert len(rec["detail"]["worker_windows"]) == len(timeouts)


def test_batch64_leads_round0_and_slow_items_rotate_back(
        monkeypatch, capsys, no_teardown):
    """Round 0 leads with the north-star batch-64 trial, and an item that
    burns a window without completing rotates to the back so it cannot
    starve the other batch sizes."""
    monkeypatch.setattr(bench, "TOTAL_BUDGET_S", 700.0)
    monkeypatch.setattr(bench, "COOLDOWN_S", 0.05)
    monkeypatch.setattr(bench, "GATE_COOLDOWN_S", 0.05)
    first_items = []

    def fake_run(cmd, **kw):
        todo = cmd[cmd.index("--todo") + 1].split(",")
        lines = [json.dumps({"kind": "device", "value": "axon:fake"})]
        kind, _, arg = todo[0].partition(":")
        if kind == "probe":
            lines.append(json.dumps({"kind": "probe", "arg": arg,
                                     "value": 150.0}))
        else:
            first_items.append(todo[0])
            # complete ONLY the first trial of the window, except batch 64
            # which is "too slow" and never completes
            if not arg.startswith("64"):
                b = int(arg.partition("x")[0])
                lines.append(json.dumps({"kind": "trial", "arg": arg,
                                         "value": 1000.0 * b}))
        return types.SimpleNamespace(
            returncode=0, stdout="\n".join(lines) + "\n", stderr="")

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    rec = run_main(capsys)
    # batch 64 led the first trial window...
    assert first_items[0] == "trial:64x0"
    # ...but after failing it rotated back and 8/32 got measured
    assert rec["value"] is not None
    assert set(rec["detail"]["per_batch_it_per_s"]) == {"8", "32"}


def test_healthy_run_reports_headline(monkeypatch, capsys, no_teardown):
    monkeypatch.setattr(bench, "TOTAL_BUDGET_S", 400.0)
    monkeypatch.setattr(bench.subprocess, "run", _fake_worker())
    rec = run_main(capsys)
    # best batch is 64 (linear scaling in the fake): 3000*8 = 24000 it/s
    assert rec["detail"]["batch"] == 64
    assert rec["value"] == pytest.approx(bench.C3X_FAST_TOTAL_ITERS / 24000, abs=1e-3)
    assert rec["detail"]["gate_passed"] is True
    assert rec["detail"]["chip_state"] == "quiet"
    assert rec["detail"]["per_batch_it_per_s"].keys() == {"8", "32", "64"}
    assert "batch64_mechanism" in rec["detail"]


def test_oom_batch_skipped_not_retried(monkeypatch, capsys, no_teardown):
    monkeypatch.setattr(bench, "TOTAL_BUDGET_S", 400.0)
    calls = []
    inner = _fake_worker(oom_batches=(64,))

    def counting(cmd, **kw):
        calls.append(cmd[cmd.index("--todo") + 1])
        return inner(cmd, **kw)

    monkeypatch.setattr(bench.subprocess, "run", counting)
    rec = run_main(capsys)
    assert rec["detail"]["oom_batches"] == ["64"]
    assert rec["detail"]["batch"] == 32
    # after the first oom report, no later launch re-requests batch 64
    later = ",".join(calls[2:])  # calls[0] is the gate probe, [1] first sweep
    assert "trial:64" not in later


def test_degraded_gate_shortens_trials_and_annotates(monkeypatch, capsys, no_teardown):
    monkeypatch.setattr(bench, "TOTAL_BUDGET_S", 400.0)
    monkeypatch.setattr(bench, "GATE_COOLDOWN_S", 0.0)
    iters_seen = []
    inner = _fake_worker(probe_value=5.0)  # degraded chip

    def recording(cmd, **kw):
        iters_seen.append(int(cmd[cmd.index("--iters") + 1]))
        return inner(cmd, **kw)

    monkeypatch.setattr(bench.subprocess, "run", recording)
    rec = run_main(capsys)
    assert rec["detail"]["gate_passed"] is False
    assert rec["value"] is not None  # still measured, just annotated
    assert rec["detail"]["chip_state"] in ("degraded", "cache-suspect")
    # trial launches (after the 2 gate probes) use the degraded iter count
    assert iters_seen[2:] and all(
        i == bench.PHASE_ITERS_DEGRADED for i in iters_seen[2:])
