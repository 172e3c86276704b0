"""Babysit RD sweeps across launcher generations and chain datasets.

The run loop (`kodak_rd_sweep.py run`) snapshots `job_list` at launch, so a
wave appended to the script while a launcher is alive is invisible to that
launcher. For each stage (budget:dataset) in order, this supervisor waits
for any active sweep process to exit, folds the completed batches into the
results tsv (`finalize` needs the TPU idle), and starts a fresh launcher
that sees the full batch list. A stage is complete when its launcher
reports every batch final; the supervisor then finalizes once more and
moves to the next stage, keeping the single shared TPU chip busy
end-to-end (the sweeps themselves are checkpointed and crash-resumable).

Usage:
  python scripts/sweep_supervisor.py --stages medium:kodak,fast:clic20-pro-valid
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
SWEEP = REPO / "scripts" / "kodak_rd_sweep.py"


def _sweep_pids() -> list[int]:
    """PIDs of live kodak_rd_sweep processes (excluding ourselves)."""
    me = os.getpid()
    out = []
    for p in Path("/proc").iterdir():
        if not p.name.isdigit() or int(p.name) == me:
            continue
        try:
            cmd = (p / "cmdline").read_bytes().replace(b"\0", b" ")
        except OSError:
            continue
        if b"kodak_rd_sweep.py" in cmd:
            out.append(int(p.name))
    return out


def _wait_and_finalize(alive, base, tail, env) -> None:
    """Sleep while ``alive()`` holds, folding completed batches into the
    results tsv/bitstreams every ~45 min: finalize is CPU-forced (never
    attaches the TPU tunnel), so it can run alongside the sweep and the
    durable ledger stays fresh even if the round ends mid-wave."""
    waited = 0
    while alive():
        time.sleep(60)
        waited += 60
        if waited % 2700 == 0:
            print(f"[supervisor] periodic finalize ({waited}s)", flush=True)
            subprocess.run(base + ["finalize"] + tail, env=env, cwd=REPO,
                           timeout=7200)


def supervise_stage(budget: str, dataset: str, max_attempts: int, env: dict) -> None:
    base = [sys.executable, str(SWEEP)]
    tail = ["--budget", budget, "--dataset", dataset]
    for generation in range(20):
        _wait_and_finalize(lambda: bool(_sweep_pids()), base, tail, env)
        time.sleep(30)  # grace for fd flushes / tunnel teardown
        print(f"[supervisor] {budget}:{dataset} gen {generation}: idle; finalizing",
              flush=True)
        subprocess.run(base + ["finalize"] + tail, env=env, cwd=REPO, timeout=7200)
        out_path = Path(f"/tmp/sweep_run_{budget}_{dataset}.log")
        with open(out_path, "w") as out_f:
            pr = subprocess.Popen(
                base + ["run", "--max_attempts", str(max_attempts)] + tail,
                env=env, cwd=REPO, stdout=out_f, stderr=subprocess.STDOUT,
                text=True,
            )
            # periodic fold-ins while our own launcher generation runs
            _wait_and_finalize(lambda: pr.poll() is None, base, tail, env)
        stdout = out_path.read_text()
        sys.stdout.write(stdout)
        sys.stdout.flush()
        if "all batches final" in stdout:
            print(f"[supervisor] {budget}:{dataset} complete; final finalize",
                  flush=True)
            subprocess.run(base + ["finalize"] + tail, env=env, cwd=REPO,
                           timeout=7200)
            return
        print(f"[supervisor] run loop exited rc={pr.returncode}; relaunching",
              flush=True)
    raise SystemExit(f"supervisor: generations exhausted on {budget}:{dataset}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--stages", default="medium:kodak",
                    help="comma-separated budget:dataset stages, run in order")
    ap.add_argument("--max_attempts", type=int, default=400)
    args = ap.parse_args()

    # bench.py's pre-measurement teardown kills the supervisor through this
    # pidfile (never by pattern); write it ourselves so no launcher can
    # forget it.
    Path("/tmp/sweep_supervisor.pid").write_text(str(os.getpid()))

    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo:/root/.axon_site"
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")

    for stage in args.stages.split(","):
        budget, dataset = stage.strip().split(":")
        supervise_stage(budget, dataset, args.max_attempts, env)
    print("[supervisor] all stages complete", flush=True)


if __name__ == "__main__":
    main()
