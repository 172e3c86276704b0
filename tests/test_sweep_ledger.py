"""Durable-ledger logic of the RD sweep engine (scripts/kodak_rd_sweep.py).

The per-batch pickle state is transient (gitignored, lost on machine
resets); the finalized results TSV + bitstreams + finalized_batches json
survive in git. These tests pin the reset-survival contract:
  * a batch listed in the finalized ledger is skipped by `encode` even
    when its final.pkl is gone;
  * `finalize` seeds from previously finalized TSV rows (+ their
    bitstreams) so re-finalizing after a reset merges instead of drops.
"""

import importlib.util
import json
import sys
from pathlib import Path

import pytest


@pytest.fixture()
def sweep(tmp_path, monkeypatch):
    spec = importlib.util.spec_from_file_location(
        "kodak_rd_sweep_under_test",
        Path(__file__).resolve().parents[1] / "scripts/kodak_rd_sweep.py",
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)
    monkeypatch.setattr(mod, "WORKDIR", tmp_path)
    return mod


def _write_tsv(mod, tmp_path, budget, rows):
    from coolchic_tpu.eval.bd_rate import write_results_tsv

    suffix = "" if budget == "fast" else f"_{budget}"
    write_results_tsv(rows, tmp_path / f"results{suffix}.tsv")


def test_finalized_set_roundtrip(sweep, tmp_path):
    assert sweep._finalized_set("medium") == set()
    sweep._finalized_path("medium").write_text(json.dumps([0, 3]))
    assert sweep._finalized_set("medium") == {0, 3}
    # fast budget uses the unsuffixed path and its own ledger
    assert sweep._finalized_set("fast") == set()
    assert sweep._finalized_path("fast").name == "finalized_batches.json"
    assert sweep._finalized_path("medium").name == "finalized_batches_medium.json"


def test_done_rows_reads_finalized_tsv(sweep, tmp_path):
    rows = [
        {"seq_name": "kodim01", "lmbda": 0.004, "rate_bpp": 0.3,
         "n_pixels": 393216, "psnr_db": 28.1, "rd_cost": 0.0028, "loop": 1},
        {"seq_name": "kodim02", "lmbda": 0.02, "rate_bpp": 0.04,
         "n_pixels": 393216, "psnr_db": 29.1, "rd_cost": 0.0019, "loop": 0},
    ]
    _write_tsv(sweep, tmp_path, "medium", rows)
    done = sweep._done_rows("medium")
    assert set(done) == {("kodim01", 0.004), ("kodim02", 0.02)}
    assert done[("kodim01", 0.004)]["psnr_db"] == pytest.approx(28.1)
    # absent tsv -> empty, not an error
    assert sweep._done_rows("slow") == {}


def test_batch_order_mains_before_waves(sweep):
    """All main batches run before any aux/candidate-wave batch, and the
    waves keep their complement ordering among themselves."""
    batches = [
        {"size": (8, 8), "jobs": [{"seq": "a"}]},                      # main 0
        {"size": (8, 8), "jobs": [{"seq": "b"}]},                      # main 1
        {"size": (8, 8), "jobs": [{"seq": "a"}], "arch": {"x": 1}},    # wave 2
        {"size": (8, 8), "jobs": [{"seq": "c"}]},                      # main 3
        {"size": (8, 8), "jobs": [{"seq": "c"}], "arch": {"x": 1}},    # wave 4
    ]
    order = sweep.batch_order(batches)
    assert order == [0, 1, 3, 2, 4]  # mains in plan order, then waves
    # wave for the later-planned seq (c, main 3) sorts after the wave
    # complementing the earlier main (a, main 0)
    assert order.index(2) < order.index(4)


def test_batch_order_waves_by_deficit(sweep):
    """Waves with a bigger measured rate deficit run first; mains always
    precede every wave regardless of value."""
    batches = [
        {"size": (8, 8), "jobs": [{"seq": "a"}]},                      # main 0
        {"size": (8, 8), "jobs": [{"seq": "a"}], "arch": {"x": 1}},    # wave 1
        {"size": (8, 8), "jobs": [{"seq": "b"}], "arch": {"x": 1}},    # wave 2
        {"size": (8, 8), "jobs": [{"seq": "b"}]},                      # main 3
    ]
    order = sweep.batch_order(batches, {1: 2.0, 2: 15.0})
    assert order == [0, 3, 2, 1]


def test_wave_values_from_finalized_rows(sweep, tmp_path):
    rows = [
        {"seq_name": "a", "lmbda": 0.02, "rate_bpp": 0.12,
         "n_pixels": 64, "psnr_db": 30.0, "rd_cost": 0.1, "loop": 0},
        {"seq_name": "b", "lmbda": 0.02, "rate_bpp": 0.10,
         "n_pixels": 64, "psnr_db": 30.0, "rd_cost": 0.1, "loop": 0},
    ]
    _write_tsv(sweep, tmp_path, "medium", rows)
    from coolchic_tpu.eval.bd_rate import write_results_tsv
    write_results_tsv(
        [{"seq_name": "a", "lmbda": 0.02, "rate_bpp": 0.10,
          "n_pixels": 64, "psnr_db": 30.0},
         {"seq_name": "b", "lmbda": 0.02, "rate_bpp": 0.10,
          "n_pixels": 64, "psnr_db": 30.0}],
        tmp_path / "ref_vs_proxy.tsv")
    batches = [
        {"size": (8, 8), "jobs": [{"seq": "a", "lmbda": 0.02}],
         "arch": {"x": 1}},
        {"size": (8, 8), "jobs": [{"seq": "b", "lmbda": 0.02}],
         "arch": {"x": 1}},
        {"size": (8, 8), "jobs": [{"seq": "c", "lmbda": 0.02}],
         "arch": {"x": 1}},  # no rows -> value 0, still listed
    ]
    vals = sweep.wave_values(batches, "medium")
    assert vals[0] == pytest.approx(20.0)   # a: 0.12 vs 0.10
    assert vals[1] == pytest.approx(0.0)    # b: at parity
    assert vals[2] == 0.0                   # c: unknown
    assert sweep.batch_order(batches, vals)[0] == 0


def test_done_rows_survives_float_formatting(sweep, tmp_path):
    """Finalize rewrites the tsv through float() parsing — keys must keep
    matching after a round-trip that turns 393216 into 393216.0."""
    rows = [{"seq_name": "kodim05", "lmbda": "0.0004", "rate_bpp": "1.26",
             "n_pixels": "393216.0", "psnr_db": "36.6", "rd_cost": "0.00072",
             "loop": "0.0"}]
    _write_tsv(sweep, tmp_path, "medium", rows)
    done = sweep._done_rows("medium")
    assert ("kodim05", 4e-4) in done


def test_vlop_wave_kodak_only_restricted_and_appended_last(sweep, tmp_path):
    """The vlop candidate wave exists only for kodak, covers exactly the
    constant worst-deficit sequence list at the aux lambda, and is
    appended after every other batch (index/uid stability contract)."""
    import numpy as np

    tdir = tmp_path / "targets"
    tdir.mkdir()
    for i, seq in enumerate(sweep.SEQS):
        hw = (4, 6) if i % 2 else (6, 4)
        np.save(tdir / f"{seq}.npy", np.zeros((3, *hw), np.float32))

    batches = sweep.job_list("medium")
    is_vlop = [
        b.get("arch", {}).get("n_hidden_layers_arm") == 1 for b in batches
    ]
    assert any(is_vlop), "vlop wave missing from the kodak job list"
    first = is_vlop.index(True)
    assert all(is_vlop[first:]), "vlop batches must be appended last"
    vlop_jobs = [
        j for b, v in zip(batches, is_vlop) if v for j in b["jobs"]
        if not j.get("pad")
    ]
    assert {j["seq"] for j in vlop_jobs} == set(sweep.VLOP_WAVE_SEQS)
    assert all(j["lmbda"] == sweep.AUX_LMBDA for j in vlop_jobs)
    uids = [
        j["uid"] for b in batches for j in b["jobs"] if not j.get("pad")
    ]
    assert len(uids) == len(set(uids)), "uids must stay unique (PRNG keys)"


def test_vlop_wave_absent_for_other_datasets(sweep):
    """set_dataset switches SEQS/WORKDIR; the kodak-named vlop wave must
    not leak into the clic job list (read-only on the real targets)."""
    sweep.set_dataset("clic20-pro-valid")
    batches = sweep.job_list("fast")
    assert not any(
        b.get("arch", {}).get("n_hidden_layers_arm") == 1 for b in batches
    )


def test_slowtail_budget_restricted_to_tail_no_waves(sweep, tmp_path):
    """slowtail = the reference slow recipe on only the worst medium-tail
    sequences, with NO aux/arch candidate waves (pure budget probe), full
    lambda coverage, and unique uids."""
    import numpy as np

    tdir = tmp_path / "targets"
    tdir.mkdir()
    for i, seq in enumerate(sweep.SEQS):
        hw = (4, 6) if i % 2 else (6, 4)
        np.save(tdir / f"{seq}.npy", np.zeros((3, *hw), np.float32))

    # slow phase-1 schedule (3.3x medium iterations); single loop keeps the
    # probe affordable on a degraded tunnel
    assert sweep.BUDGETS["slowtail"][0] == sweep.BUDGETS["slow"][0]
    assert sweep.BUDGETS["slowtail"][1] == 1
    batches = sweep.job_list("slowtail")
    assert all("arch" not in b for b in batches), "no candidate waves"
    jobs = [j for b in batches for j in b["jobs"] if not j.get("pad")]
    tail_all = sweep.TAIL_SEQS + sweep.TAIL_SEQS_EXT
    assert {j["seq"] for j in jobs} == set(tail_all)
    _, n_loops = sweep.BUDGETS["slowtail"]
    assert len(jobs) == len(tail_all) * len(sweep.SWEEP_LAMBDAS) * n_loops
    for seq in tail_all:
        assert {j["lmbda"] for j in jobs if j["seq"] == seq} == set(
            sweep.SWEEP_LAMBDAS)
    # extension batches are strictly appended: the base plan's batch
    # indices/uid assignment are unchanged by the ext wave
    base_uids = [j["uid"] for b in batches for j in b["jobs"]
                 if not j.get("pad") and j["seq"] in sweep.TAIL_SEQS]
    assert max(base_uids) == len(sweep.TAIL_SEQS) * len(sweep.SWEEP_LAMBDAS) - 1
    ext_first = min(j["uid"] for b in batches for j in b["jobs"]
                    if not j.get("pad") and j["seq"] in sweep.TAIL_SEQS_EXT)
    assert ext_first == len(sweep.TAIL_SEQS) * len(sweep.SWEEP_LAMBDAS)
    uids = [j["uid"] for j in jobs]
    assert len(uids) == len(set(uids))


def test_recipe_waves_appended_last_and_persisted(sweep, tmp_path, monkeypatch):
    """Recipe waves: training-hyperparameter candidates appended after all
    arch waves (uid/index stability), ordered after mains by batch_order,
    with the recipe persisted per batch dir for restart stability."""
    import numpy as np

    tdir = tmp_path / "targets"
    tdir.mkdir()
    for i, seq in enumerate(sweep.SEQS):
        hw = (4, 6) if i % 2 else (6, 4)
        np.save(tdir / f"{seq}.npy", np.zeros((3, *hw), np.float32))

    base = sweep.job_list("medium")
    monkeypatch.setattr(sweep, "RECIPE_WAVES", (
        {"name": "anneal", "seqs": sweep.TAIL_SEQS,
         "lmbdas": (0.004, 0.02), "loops": 1,
         "params": {"softround_temperature": [0.3, 0.05]}},
    ))
    withr = sweep.job_list("medium")
    # strictly appended: the pre-existing plan is untouched
    assert withr[: len(base)] == base
    extra = withr[len(base):]
    assert extra and all("recipe" in b for b in extra)
    rjobs = [j for b in extra for j in b["jobs"] if not j.get("pad")]
    assert {j["seq"] for j in rjobs} == set(sweep.TAIL_SEQS)
    assert {j["lmbda"] for j in rjobs} == {0.004, 0.02}
    uids = [j["uid"] for b in withr for j in b["jobs"] if not j.get("pad")]
    assert len(uids) == len(set(uids))
    # ordering: recipe batches come after every main batch
    order = sweep.batch_order(withr, {})
    mains = [i for i, b in enumerate(withr)
             if "arch" not in b and "recipe" not in b]
    recips = [i for i, b in enumerate(withr) if "recipe" in b]
    assert max(order.index(i) for i in mains) < min(
        order.index(i) for i in recips)
    # persistence: first call writes recipe.json, later plan edits ignored
    bdir = tmp_path / "batches_medium" / "batch_xxx"
    r1 = sweep._batch_recipe(bdir, False, {"lr": 0.02})
    assert r1 == {"lr": 0.02}
    r2 = sweep._batch_recipe(bdir, True, {"lr": 0.999})
    assert r2 == {"lr": 0.02}
    # fast/other budgets: no recipe batches
    assert not any("recipe" in b for b in sweep.job_list("fast"))


def test_smoke_budget_registered():
    """The CPU smoke budget exists and is tiny (pre-flight, not a sweep)."""
    import importlib.util
    import sys
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "kodak_rd_sweep_smoke_test",
        Path(__file__).resolve().parents[1] / "scripts/kodak_rd_sweep.py",
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)
    iters, loops = mod.BUDGETS["smoke"]
    assert iters <= 600 and loops == 1
