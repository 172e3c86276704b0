"""Measure the Pallas fused ARM rate kernel vs the XLA path on the
eval/validation block at the flagship operating point (dim_arm=24,
512x768), on the real TPU (round-2 verdict item 5: the kernel must serve a
real consumer and the flag default must follow the evidence).

Runs each path in its OWN subprocess (the COOLCHIC_PALLAS_EVAL flag is
read at trace time, and a fresh process also keeps the tunnel state
clean). Reports wall time of a chained eval block and the compiled
program's HBM temp usage.

    python scripts/pallas_eval_bench.py            # orchestrator, table
    python scripts/pallas_eval_bench.py --worker 0|1
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

N_CALLS = 8


def worker(pallas: bool) -> None:
    os.environ["COOLCHIC_PALLAS_EVAL"] = "1" if pallas else "0"
    import jax
    import jax.numpy as jnp

    from coolchic_tpu.models import CoolChicConfig, init_coolchic_params
    from coolchic_tpu.train.step import eval_metrics

    cfg = CoolChicConfig(
        img_size=(512, 768),
        layers_synthesis=(
            "48-1-linear-relu",
            "X-1-linear-none",
            "X-3-residual-relu",
            "X-3-residual-none",
        ),
        n_ft_per_res=(1, 1, 1, 1, 1, 1, 1),
        dim_arm=24,
        n_hidden_layers_arm=2,
    )
    key = jax.random.PRNGKey(0)
    params = init_coolchic_params(key, cfg, "normal")
    # non-trivial latents so the rate computation is not degenerate
    params["latents"] = [
        2.0 * jax.random.normal(jax.random.fold_in(key, i), l.shape)
        for i, l in enumerate(params["latents"])
    ]
    target = jax.random.uniform(jax.random.fold_in(key, 99), (3, *cfg.img_size))

    fn = jax.jit(lambda p, t, s: eval_metrics(p, cfg, t + 0.0 * s, 1e-3))

    # Compiled-program memory analysis (HBM temps).
    lowered = fn.lower(params, target, jnp.float32(0.0))
    compiled = lowered.compile()
    try:
        mem = compiled.memory_analysis()
        temp_bytes = int(getattr(mem, "temp_size_in_bytes", -1))
    except Exception:
        temp_bytes = -1

    out = fn(params, target, jnp.float32(0.0))
    _ = float(out.loss)  # warm + sync
    t0 = time.perf_counter()
    shift = jnp.float32(0.0)
    for i in range(N_CALLS):
        # chain a scalar through the call so the remote layer cannot replay
        out = fn(params, target, shift)
        shift = out.loss * 1e-9
    _ = float(out.loss)
    dt = (time.perf_counter() - t0) / N_CALLS
    print(json.dumps({
        "pallas": pallas,
        "eval_ms": dt * 1e3,
        "hbm_temp_mb": temp_bytes / 1e6 if temp_bytes > 0 else None,
        "loss": float(out.loss),
        "rate_latent_bpp": float(out.rate_latent_bpp),
    }))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", type=int, default=None)
    args = ap.parse_args()
    if args.worker is not None:
        worker(bool(args.worker))
        return 0

    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo:/root/.axon_site"
    rows = {}
    for pallas in (0, 1):
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker", str(pallas)],
            capture_output=True, text=True, timeout=900, env=env,
            cwd="/root/repo",
        )
        line = [l for l in r.stdout.splitlines() if l.startswith("{")]
        if not line:
            print(f"worker pallas={pallas} failed:\n{r.stderr[-500:]}")
            return 1
        rows[pallas] = json.loads(line[-1])
    a, b = rows[0], rows[1]
    print(f"\nflagship eval block 512x768 dim_arm=24 (avg of {N_CALLS} chained calls):")
    print(f"{'path':10} {'eval ms':>9} {'HBM temps MB':>13} {'rate bpp':>10}")
    for name, r in (("xla", a), ("pallas", b)):
        mb = f"{r['hbm_temp_mb']:.1f}" if r["hbm_temp_mb"] else "?"
        print(f"{name:10} {r['eval_ms']:9.2f} {mb:>13} {r['rate_latent_bpp']:10.4f}")
    dr = abs(a["rate_latent_bpp"] - b["rate_latent_bpp"])
    print(f"rate agreement: |delta| = {dr:.5f} bpp")
    return 0


if __name__ == "__main__":
    sys.exit(main())
