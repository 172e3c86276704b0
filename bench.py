"""Benchmark: batched per-image overfitting throughput on one TPU chip.

Measures the real encode workload — the jit-compiled, scan-based training
phase (`run_phase`) vmapped over a batch of Kodak-sized (512x768) images —
and converts the steady-state step rate into an estimated wall-clock
seconds/image for the reference's c3x "fast" operating point
(10k + 1.5k + 1k training iterations + (5+2)x400 warm-up iterations
 = 15,300 iterations/image, reference: cfg/enc/fast.cfg + preset_cfg/c3x.yaml).

Methodology notes: successive calls CHAIN the parameter state (outputs feed
inputs) and vary the PRNG keys, so no layer of the stack can cache or elide
work; timing spans several calls of a 600-iteration compiled phase.

vs_baseline: the reference publishes no encoder wall-clock (BASELINE.md:25),
so the baseline is the commonly observed reference speed of ~160 train-it/s
for a 512x768 image on a single modern GPU. vs_baseline =
baseline_s_per_image / ours_s_per_image (>1 means faster than the
reference).

Prints exactly one JSON line.
"""

import json
import time

import jax
import jax.numpy as jnp

from coolchic_tpu.models import CoolChicConfig, init_coolchic_params
from coolchic_tpu.train import TrainerPhase, run_phase

# phase budget 10k + 1.5k + 1k, warm-up (5 + 2) candidates x 400 iterations.
C3X_FAST_TOTAL_ITERS = 10_000 + 1_500 + 1_000 + (5 + 2) * 400  # = 15_300
BASELINE_S_PER_IMAGE = C3X_FAST_TOTAL_ITERS / 160.0  # ~96 s; see module docstring

PHASE_ITERS = 600


def measure(batch: int) -> float:
    """Aggregate img-it/s at this batch size (raises on OOM)."""
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
    keys = jax.random.split(jax.random.PRNGKey(0), batch)
    params = jax.vmap(lambda k: init_coolchic_params(k, cfg, "normal"))(keys)
    targets = jax.random.uniform(jax.random.PRNGKey(1), (batch, 3, *cfg.img_size))
    lmbdas = jnp.full((batch,), 1e-3)

    run = jax.jit(jax.vmap(lambda p, t, l, k: run_phase(p, t, l, k, cfg, phase)))
    params, logs = run(params, targets, lmbdas, keys)  # compile + warm
    jax.block_until_ready(logs.loss)

    n_calls = 4
    t0 = time.perf_counter()
    for i in range(n_calls):
        keys = jax.random.split(jax.random.fold_in(jax.random.PRNGKey(2), i), batch)
        params, logs = run(params, targets, lmbdas, keys)  # chained state
    jax.block_until_ready(logs.loss)
    dt = time.perf_counter() - t0
    return batch * n_calls * PHASE_ITERS / dt


def main():
    batch = 8
    agg = None
    while batch >= 1:
        try:
            agg = measure(batch)
            break
        except Exception:
            batch //= 2
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
                    "assumed_baseline_s_per_image": round(BASELINE_S_PER_IMAGE, 1),
                    "iters_budget": C3X_FAST_TOTAL_ITERS,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
