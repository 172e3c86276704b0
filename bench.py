"""Benchmark: batched per-image overfitting throughput on one TPU chip.

Measures the steady-state training-step rate for a batch of Kodak-sized
(512x768) images overfitted in parallel (the framework's headline workload,
BASELINE.json north star), and converts it into an estimated wall-clock
seconds/image for the reference's c3x "fast" operating point
(10k + 1.5k + 1k training iterations + 2x(5+2)x400 warm-up iterations
 = 14,300 iterations/image, reference: cfg/enc/fast.cfg + preset_cfg/c3x.yaml).

vs_baseline: the reference publishes no encoder wall-clock (BASELINE.md:25),
so the baseline is the commonly observed reference speed of ~160 train-it/s
for a 512x768 image on a single modern GPU (≈ 89 s/image at the same
14,300-iteration budget). vs_baseline = baseline_s_per_image / ours_s_per_image
(>1 means faster than the reference).

Prints exactly one JSON line.
"""

import json
import time

import jax
import jax.numpy as jnp

from coolchic_tpu.models import CoolChicConfig
from coolchic_tpu.parallel import (
    batched_train_step,
    init_batch_opt_state,
    init_batch_params,
)
from coolchic_tpu.train.presets import TrainerPhase

# phase budget 10k + 1.5k + 1k, warm-up (5 + 2) candidates x 400 iterations.
C3X_FAST_TOTAL_ITERS = 10_000 + 1_500 + 1_000 + (5 + 2) * 400  # = 15_300
BASELINE_S_PER_IMAGE = C3X_FAST_TOTAL_ITERS / 160.0  # ~96 s; see module docstring


def main():
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
    phase = TrainerPhase(
        lr=1e-2,
        max_itr=1,
        quantizer_type="softround",
        quantizer_noise_type="gaussian",
        softround_temperature=(0.3, 0.3),
        noise_parameter=(0.25, 0.25),
    )

    batch = 16
    while batch >= 1:
        try:
            key = jax.random.PRNGKey(0)
            params = init_batch_params(key, cfg, batch, latent_init="normal")
            opt = init_batch_opt_state(params, cfg, phase)
            targets = jax.random.uniform(
                jax.random.PRNGKey(1), (batch, 3, *cfg.img_size)
            )
            lmbdas = jnp.full((batch,), 1e-3)

            def step(params, opt, i):
                keys = jax.random.split(jax.random.fold_in(key, i), batch)
                return batched_train_step(
                    params, opt, targets, lmbdas, keys, cfg, phase
                )

            # Compile + warm up.
            params, opt, loss = step(params, opt, 0)
            jax.block_until_ready(loss)

            n_steps = 30
            t0 = time.perf_counter()
            for i in range(1, n_steps + 1):
                params, opt, loss = step(params, opt, i)
            jax.block_until_ready(loss)
            dt = time.perf_counter() - t0
            break
        except Exception as e:  # OOM etc: halve the batch.
            if batch == 1:
                raise
            batch //= 2

    agg_it_per_s = batch * n_steps / dt
    s_per_image = C3X_FAST_TOTAL_ITERS / agg_it_per_s
    print(
        json.dumps(
            {
                "metric": "kodak_512x768_c3x-fast_encode_s_per_image_batched",
                "value": round(s_per_image, 3),
                "unit": "s/image",
                "vs_baseline": round(BASELINE_S_PER_IMAGE / s_per_image, 3),
                "detail": {
                    "batch": batch,
                    "train_it_per_s_aggregate": round(agg_it_per_s, 1),
                    "assumed_baseline_s_per_image": round(BASELINE_S_PER_IMAGE, 1),
                    "iters_budget": C3X_FAST_TOTAL_ITERS,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
