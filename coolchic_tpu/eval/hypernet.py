"""Hypernet evaluation analysis: iterations-to-match-quality.

How many per-image finetuning iterations does a from-scratch encoder need
to reach the hypernet's one-shot RD point?
(reference: coolchic/eval/hypernet.py:113, hypernet/finetune.py:48-135).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp

from coolchic_tpu.models.coolchic import init_coolchic_params
from coolchic_tpu.train.presets import TrainerPhase
from coolchic_tpu.train.step import eval_metrics, run_phase


def iterations_to_match(
    wholenet,
    state,
    img: jax.Array,
    lmbda: float,
    key: jax.Array,
    max_itr: int = 2000,
    check_every: int = 100,
) -> Dict:
    """Train a fresh per-image decoder from scratch and report after how
    many iterations its eval loss crosses the hypernet's one-shot loss.

    Returns a dict with the one-shot metrics, the per-checkpoint losses of
    the from-scratch run, and ``itr_to_match`` (None if never matched)."""
    cfg = wholenet.cfg
    one_shot_params = wholenet.image_to_coolchic(state, img)
    m_shot = eval_metrics(one_shot_params, cfg, img, lmbda)
    target_loss = float(m_shot.loss)

    params = init_coolchic_params(key, cfg)
    losses: List[float] = []
    itr_to_match: Optional[int] = None
    phase = TrainerPhase(
        lr=1e-2,
        max_itr=check_every,
        freq_valid=check_every,
        patience=10 * max_itr,
        schedule_lr=False,
        quantizer_type="softround",
        quantizer_noise_type="gaussian",
        softround_temperature=(0.3, 0.3),
        noise_parameter=(0.25, 0.25),
    )
    for i in range(max_itr // check_every):
        params, logs = run_phase(
            params, img, lmbda, jax.random.fold_in(key, i), cfg, phase
        )
        losses.append(float(logs.loss))
        if itr_to_match is None and losses[-1] <= target_loss:
            itr_to_match = (i + 1) * check_every
    return {
        "one_shot_loss": target_loss,
        "one_shot_psnr_db": float(m_shot.psnr_db),
        "one_shot_rate_bpp": float(m_shot.rate_latent_bpp),
        "scratch_losses": losses,
        "itr_to_match": itr_to_match,
        "check_every": check_every,
    }
