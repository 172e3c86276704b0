"""A/B the fused Pallas ARM kernel against the XLA eval path on real TPU.

Round-2 verdict item 5: the kernel's claimed benefit (no [n_latents,
dim_arm] HBM context residual on the eval path) must be measured in situ
at the flagship shape, and the COOLCHIC_PALLAS_EVAL flag should default to
whichever wins. This script jits the full eval-mode forward (the exact fn
the validation blocks run) both ways and reports wall time and compiled
peak HBM, plus a matmul chip probe so a degraded tunnel reading is
recognizable.

MUST run with the TPU chip to itself (stop any sweep run loop first).

    python scripts/pallas_eval_bench.py [--dim_arm 24] [--hw 512 768]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def probe_tflops() -> float:
    import jax
    import jax.numpy as jnp

    n = 4096
    x = jax.random.normal(jax.random.PRNGKey(7), (n, n), jnp.bfloat16)

    @jax.jit
    def f(a):
        y = (a @ a).astype(jnp.float32)
        return (y * jax.lax.rsqrt(jnp.mean(y * y) + 1e-6)).astype(jnp.bfloat16)

    x = f(x)
    _ = float(jnp.sum(x.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(4):
        x = f(x)
    _ = float(jnp.sum(x.astype(jnp.float32)))
    return 4 * 2 * n**3 / (time.perf_counter() - t0) / 1e12


def measure(use_pallas: bool, dim_arm: int, hw, n_calls: int = 8):
    os.environ["COOLCHIC_PALLAS_EVAL"] = "1" if use_pallas else "0"
    import jax
    import jax.numpy as jnp

    from coolchic_tpu.models import CoolChicConfig, init_coolchic_params
    from coolchic_tpu.models.coolchic import coolchic_forward

    cfg = CoolChicConfig(img_size=tuple(hw), dim_arm=dim_arm)

    def eval_fn(params):
        decoded, rate, _ = coolchic_forward(params, cfg, training=False)
        return jnp.mean(decoded), jnp.sum(rate)

    fn = jax.jit(eval_fn)
    params = init_coolchic_params(jax.random.PRNGKey(0), cfg, "normal")
    lowered = fn.lower(params)
    compiled = lowered.compile()
    mem = compiled.memory_analysis()
    peak = getattr(mem, "temp_size_in_bytes", 0) + getattr(
        mem, "output_size_in_bytes", 0
    )

    # warm + timed chain; vary inputs so the remote execution layer cannot
    # replay a memoized result (CLAUDE.md).
    out = fn(params)
    _ = float(out[0])
    t0 = time.perf_counter()
    for i in range(n_calls):
        params = jax.tree.map(
            lambda a: a + jnp.asarray(1e-6 * (i + 1), a.dtype), params
        )
        out = fn(params)
    _ = float(out[0]) + float(out[1])
    dt = (time.perf_counter() - t0) / n_calls
    return {
        "path": "pallas" if use_pallas else "xla",
        "eval_ms": round(dt * 1e3, 2),
        "temp_bytes": int(getattr(mem, "temp_size_in_bytes", 0)),
        "peak_bytes_est": int(peak),
        "rate_bits": float(out[1]),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim_arm", type=int, default=24)
    ap.add_argument("--hw", type=int, nargs=2, default=(512, 768))
    ap.add_argument("--calls", type=int, default=8)
    ap.add_argument("--platform", default="tpu", choices=("cpu", "tpu"),
                    help="cpu = smoke-test mode (Pallas runs interpreted)")
    args = ap.parse_args()

    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    tf0 = probe_tflops()
    rows = [measure(up, args.dim_arm, args.hw, args.calls) for up in (False, True)]
    tf1 = probe_tflops()
    print(json.dumps({
        "dim_arm": args.dim_arm,
        "hw": list(args.hw),
        "probe_tflops": [round(tf0, 1), round(tf1, 1)],
        "results": rows,
    }))


if __name__ == "__main__":
    main()
