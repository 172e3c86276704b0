"""Frame encoding pipeline: warm-up competition + multi-phase training.

TPU-first re-design of the reference orchestration
(reference: coolchic/enc/training/warmup.py:22-158 and
coolchic/enc/component/video.py:205-330):

  * Warm-up candidates train *in parallel* as one ``vmap`` over stacked
    parameter pytrees (the reference trains them serially) — candidate
    elimination is an ``argsort`` on the candidate loss vector.
  * Mass overfitting: ``encode_frame_batch`` vmaps the entire pipeline over
    a batch of images, replacing the reference's one-GPU-job-per-image SLURM
    arrays (SURVEY.md §2.3) with one XLA program per chip.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from coolchic_tpu.models.coolchic import init_coolchic_params
from coolchic_tpu.models.config import CoolChicConfig
from coolchic_tpu.train.presets import Preset, Warmup
from coolchic_tpu.train.step import PhaseLogs, eval_metrics, run_phase

Params = Dict[str, Any]


@partial(jax.jit, static_argnames=("cfg", "warmup_cfg"))
def warmup(
    key: jax.Array,
    target: jax.Array,
    lmbda: jax.Array | float,
    cfg: CoolChicConfig,
    warmup_cfg: Warmup,
    valid_hw=None,
) -> Params:
    """Multi-candidate initialization competition (reference: warmup.py:22-158).

    Starts ``warmup_cfg.phases[0].candidates`` randomly initialized decoders,
    trains all of them in parallel (vmap) for each phase, keeps the best
    ``candidates`` of the next phase, and returns the winner's params.
    """
    if not warmup_cfg.phases:
        return init_coolchic_params(key, cfg)

    n0 = warmup_cfg.phases[0].candidates
    init_keys = jax.random.split(jax.random.fold_in(key, 0), n0)
    cand = jax.vmap(lambda k: init_coolchic_params(k, cfg))(init_keys)

    losses = None
    for idx_phase, wp in enumerate(warmup_cfg.phases):
        if idx_phase != 0:
            # Keep the best `wp.candidates` from the previous phase.
            order = jnp.argsort(losses)[: wp.candidates]
            cand = jax.tree.map(lambda a: a[order], cand)

        n = wp.candidates
        train_keys = jax.random.split(jax.random.fold_in(key, idx_phase + 1), n)
        cand, logs = jax.vmap(
            lambda p, k: run_phase(
                p, target, lmbda, k, cfg, wp.training_phase, valid_hw=valid_hw
            )
        )(cand, train_keys)
        losses = logs.loss

    winner = jnp.argmin(losses)
    return jax.tree.map(lambda a: a[winner], cand)


class EncodeResult(NamedTuple):
    params: Params
    loss: jax.Array
    psnr_db: jax.Array
    rate_latent_bpp: jax.Array


def encode_frame(
    key: jax.Array,
    target: jax.Array,
    lmbda: jax.Array | float,
    cfg: CoolChicConfig,
    preset: Preset,
    valid_hw=None,
) -> EncodeResult:
    """Full single-frame encode: warm-up then every preset phase
    (reference: video.py:205-330). NN post-training quantization hooks in
    after phases flagged ``quantize_model`` (see train/quantize_model.py).
    """
    params = warmup(key, target, lmbda, cfg, preset.warmup, valid_hw=valid_hw)
    logs: Optional[PhaseLogs] = None
    for idx, phase in enumerate(preset.all_phases):
        phase_key = jax.random.fold_in(key, 1000 + idx)
        params, logs = run_phase(
            params, target, lmbda, phase_key, cfg, phase, valid_hw=valid_hw
        )
        if phase.quantize_model:
            from coolchic_tpu.train.quantize_model import quantize_model_with_info

            params = quantize_model_with_info(
                params, target, lmbda, cfg, valid_hw=valid_hw
            )[0]
    if logs is None:
        m = eval_metrics(params, cfg, target, lmbda, valid_hw=valid_hw)
        logs = PhaseLogs(m.loss, m.psnr_db, m.rate_latent_bpp)
    return EncodeResult(params, logs.loss, logs.psnr_db, logs.rate_latent_bpp)


def encode_frame_with_quant_info(
    key: jax.Array,
    target: jax.Array,
    lmbda: jax.Array | float,
    cfg: CoolChicConfig,
    preset: Preset,
):
    """Like ``encode_frame`` but also returns the NN-quantization choices
    needed by the bitstream writer (q-steps + exp-Golomb orders per module).

    Returns:
        (EncodeResult, infos dict or None) — infos is None when the preset
        never quantizes the networks.
    """
    from coolchic_tpu.train.quantize_model import quantize_model_with_info

    params = warmup(key, target, lmbda, cfg, preset.warmup)
    logs: Optional[PhaseLogs] = None
    infos = None
    for idx, phase in enumerate(preset.all_phases):
        phase_key = jax.random.fold_in(key, 1000 + idx)
        params, logs = run_phase(params, target, lmbda, phase_key, cfg, phase)
        if phase.quantize_model:
            params, infos = quantize_model_with_info(params, target, lmbda, cfg)
    if logs is None:
        m = eval_metrics(params, cfg, target, lmbda)
        logs = PhaseLogs(m.loss, m.psnr_db, m.rate_latent_bpp)
    return EncodeResult(params, logs.loss, logs.psnr_db, logs.rate_latent_bpp), infos


def encode_frame_batch(
    keys: jax.Array,
    targets: jax.Array,
    lmbdas: jax.Array,
    cfg: CoolChicConfig,
    preset: Preset,
    valid_hws: Optional[jax.Array] = None,
) -> EncodeResult:
    """Overfit a batch of images in parallel on one chip.

    Args:
        keys: [B] PRNG keys.
        targets: [B, C, H, W] images (mixed sizes: pad each into the common
            bucket buffer and pass its true size in ``valid_hws``).
        lmbdas: [B] per-image rate weights (lambda sweeps batch for free).
        valid_hws: optional [B, 2] true (H, W) per image — enables
            mixed-size batching with masked loss/rate (models/masking.py).
    """
    if valid_hws is None:
        return jax.vmap(
            lambda k, t, l: encode_frame(k, t, l, cfg, preset)
        )(keys, targets, lmbdas)
    return jax.vmap(
        lambda k, t, l, v: encode_frame(k, t, l, cfg, preset, valid_hw=v)
    )(keys, targets, lmbdas, valid_hws)
