"""Benchmark: batched per-image overfitting throughput on one TPU chip.

Measures the real encode workload — the jit-compiled, scan-based training
phase (`run_phase`) vmapped over a batch of Kodak-sized (512x768) images —
and converts the steady-state step rate into an estimated wall-clock
seconds/image for the reference's c3x "fast" operating point
(10k + 1.5k + 1k training iterations + (5+2)x400 warm-up iterations
 = 15,300 iterations/image, reference: cfg/enc/fast.cfg + preset_cfg/c3x.yaml).

Methodology (hardened after round 1, where a degraded tunnel produced an
8.67 s/image reading vs 0.68 on a quiet chip and the gap read as a code
regression):

- Each trial runs in a FRESH SUBPROCESS with retry + cooldown: the shared
  single-chip tunnel intermittently kills the TPU worker on long-running
  programs; a fresh process recovers after ~90 s.
- Each trial uses a DISTINCT SEED and CHAINS state across calls (outputs
  feed inputs): the remote execution layer memoizes repeated identical
  executions, so replayed computations return instantly and fake speed.
- Timing is anchored by a device->host transfer of the result
  (float(sum(...))) — `block_until_ready` alone returns before execution
  completes on this tunnel.
- A bf16 matmul probe before/after reports achieved TFLOP/s (v5e peak
  ~197): <50 = degraded chip; >250 = caching/async artifact, distrust.
- Headline = MEDIAN of trials; `detail.chip_state` flags disagreement.

vs_baseline: the reference publishes no encoder wall-clock (BASELINE.md:25),
so the baseline is the commonly observed reference speed of ~160 train-it/s
for a 512x768 image on a single modern GPU. vs_baseline =
baseline_s_per_image / ours_s_per_image (>1 means faster than the
reference).

Prints exactly one JSON line (worker-mode prints a single float instead).
"""

import argparse
import json
import os
import subprocess
import sys
import time

# phase budget 10k + 1.5k + 1k, warm-up (5 + 2) candidates x 400 iterations.
C3X_FAST_TOTAL_ITERS = 10_000 + 1_500 + 1_000 + (5 + 2) * 400  # = 15_300
BASELINE_S_PER_IMAGE = C3X_FAST_TOTAL_ITERS / 160.0  # ~96 s; see module docstring

PHASE_ITERS = 600
N_TRIALS = 3
COOLDOWN_S = 90
WORKER_TIMEOUT_S = 420


# ---------------------------------------------------------------- workers


def probe_matmul_tflops(seed: int) -> float:
    """Raw-chip health probe: achieved bf16 matmul TFLOP/s on a 4096^3 GEMM.

    The per-step renormalization keeps the chain finite and value-distinct
    (a raw bf16 matmul chain saturates to inf/NaN, making later inputs
    bit-identical and cache-hittable).
    """
    import jax
    import jax.numpy as jnp

    n = 4096
    x = jax.random.normal(jax.random.PRNGKey(seed), (n, n), jnp.bfloat16)

    @jax.jit
    def f(a, c):
        y = (a @ a).astype(jnp.float32)
        y = y * jax.lax.rsqrt(jnp.mean(y * y) + 1e-6) + c
        return y.astype(jnp.bfloat16)

    x = f(x, 0.0)  # compile + warm
    _ = float(jnp.sum(x.astype(jnp.float32)))
    n_calls = 8
    t0 = time.perf_counter()
    for i in range(n_calls):
        x = f(x, 1e-3 * (i + 1))
    # device->host transfer: cannot complete before the chain actually runs
    # (block_until_ready alone returns early on this tunnel).
    _ = float(jnp.sum(x.astype(jnp.float32)))
    dt = time.perf_counter() - t0
    return n_calls * 2 * n**3 / dt / 1e12


def measure(batch: int, trial: int) -> float:
    """Aggregate img-it/s at this batch size (raises on OOM/tunnel crash)."""
    import jax
    import jax.numpy as jnp

    from coolchic_tpu.models import CoolChicConfig, init_coolchic_params
    from coolchic_tpu.train import TrainerPhase, run_phase

    cfg = CoolChicConfig(img_size=(512, 768))
    phase = TrainerPhase(
        lr=1e-2,
        max_itr=PHASE_ITERS,
        freq_valid=100,
        patience=100_000,
        schedule_lr=True,
        quantizer_type="softround",
        quantizer_noise_type="gaussian",
        softround_temperature=(0.3, 0.1),
        noise_parameter=(0.25, 0.1),
    )
    base = jax.random.PRNGKey(1000 + trial)
    keys = jax.random.split(jax.random.fold_in(base, 0), batch)
    params = jax.vmap(lambda k: init_coolchic_params(k, cfg, "normal"))(keys)
    targets = jax.random.uniform(jax.random.fold_in(base, 1), (batch, 3, *cfg.img_size))
    lmbdas = jnp.full((batch,), 1e-3)

    run = jax.jit(jax.vmap(lambda p, t, l, k: run_phase(p, t, l, k, cfg, phase)))
    params, logs = run(params, targets, lmbdas, keys)  # compile + warm
    _ = float(jnp.sum(logs.loss))

    n_calls = 4
    t0 = time.perf_counter()
    for i in range(n_calls):
        keys = jax.random.split(jax.random.fold_in(base, 2 + i), batch)
        params, logs = run(params, targets, lmbdas, keys)  # chained state
    # device->host transfer anchors the timing to real completion.
    _ = float(jnp.sum(logs.loss))
    dt = time.perf_counter() - t0
    return batch * n_calls * PHASE_ITERS / dt


# ------------------------------------------------------------ orchestrator


def run_worker(kind: str, *, seed: int = 0, batch: int = 8, trial: int = 0,
               attempts: int = 3):
    """Run one measurement in a fresh subprocess; retry with cooldown on
    tunnel crashes. Returns (value, device_str) or (None, err_tail)."""
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo:/root/.axon_site"
    cmd = [sys.executable, os.path.abspath(__file__), "--worker", kind,
           "--seed", str(seed), "--batch", str(batch), "--trial", str(trial)]
    last = ""
    for attempt in range(attempts):
        try:
            p = subprocess.run(cmd, capture_output=True, text=True,
                               timeout=WORKER_TIMEOUT_S, env=env, cwd="/root/repo")
        except subprocess.TimeoutExpired:
            last = "worker timeout"
            time.sleep(COOLDOWN_S)
            continue
        if p.returncode == 0:
            try:
                out = json.loads(p.stdout.strip().splitlines()[-1])
                return out["value"], out.get("device", "?")
            except Exception:
                last = f"unparseable worker output: {p.stdout[-200:]}"
        else:
            last = (p.stderr or p.stdout)[-300:]
        if attempt + 1 < attempts:
            time.sleep(COOLDOWN_S)
    return None, last


def worker_main(args):
    if args.worker == "probe":
        v = probe_matmul_tflops(args.seed)
    else:
        v = measure(args.batch, args.trial)
    import jax

    dev = jax.devices()[0]
    print(json.dumps({"value": v,
                      "device": f"{dev.platform}:{getattr(dev, 'device_kind', '?')}"}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", choices=["probe", "trial"], default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--trial", type=int, default=0)
    args = ap.parse_args()
    if args.worker:
        worker_main(args)
        return

    tflops_before, device = run_worker("probe", seed=10)

    batch = 8
    trials: list[float] = []
    last_err = ""
    while batch >= 1 and not trials:
        for t in range(N_TRIALS):
            v, info = run_worker("trial", batch=batch, trial=t)
            if v is None:
                last_err = info
                trials = []
                break
            trials.append(v)
            device = info
        if not trials:
            batch //= 2
    if not trials:
        raise SystemExit(f"bench failed at every batch size: {last_err}")

    tflops_after, _ = run_worker("probe", seed=11)
    probes = [x for x in (tflops_before, tflops_after) if x is not None]
    agg = sorted(trials)[len(trials) // 2]  # median: robust to one bad trial
    spread = max(trials) / min(trials)
    if probes and max(probes) > 250:  # above v5e bf16 peak (~197)
        chip_state = "cache-suspect"
    elif spread >= 2.0:
        chip_state = "contended"
    elif spread < 1.5 and probes and min(probes) > 50:
        chip_state = "quiet"
    else:
        chip_state = "noisy"
    s_per_image = C3X_FAST_TOTAL_ITERS / agg
    print(
        json.dumps(
            {
                "metric": "kodak_512x768_c3x-fast_encode_s_per_image_batched",
                "value": round(s_per_image, 3),
                "unit": "s/image",
                "vs_baseline": round(BASELINE_S_PER_IMAGE / s_per_image, 3),
                "detail": {
                    "batch": batch,
                    "train_it_per_s_aggregate": round(agg, 1),
                    "trials_it_per_s": [round(t, 1) for t in trials],
                    "matmul_tflops_before_after": [
                        round(x, 1) if x is not None else None
                        for x in (tflops_before, tflops_after)
                    ],
                    "chip_state": chip_state,
                    "device": device,
                    "assumed_baseline_s_per_image": round(BASELINE_S_PER_IMAGE, 1),
                    "iters_budget": C3X_FAST_TOTAL_ITERS,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
