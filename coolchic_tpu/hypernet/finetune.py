"""Per-image finetuning of hypernet-initialized decoders.

The amortized encoder gives a one-shot initialization; a short standard
training run closes most of the gap to full overfitting
(reference: coolchic/hypernet/finetune.py:48-135).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax

from coolchic_tpu.models.config import CoolChicConfig
from coolchic_tpu.train.presets import Preset, TrainerPhase
from coolchic_tpu.train.step import PhaseLogs, eval_metrics, run_phase


def default_finetune_phases(n_itr: int = 1000) -> Tuple[TrainerPhase, ...]:
    """A short softround+noise phase followed by an STE retune."""
    return (
        TrainerPhase(
            lr=1e-3,
            max_itr=n_itr,
            freq_valid=min(100, n_itr),
            patience=10 * n_itr,
            schedule_lr=True,
            quantizer_type="softround",
            quantizer_noise_type="gaussian",
            softround_temperature=(0.3, 0.1),
            noise_parameter=(0.25, 0.1),
        ),
        TrainerPhase(
            lr=1e-4,
            max_itr=max(n_itr // 10, 10),
            freq_valid=10,
            quantizer_type="ste",
            quantizer_noise_type="none",
            softround_temperature=(1e-4, 1e-4),
        ),
    )


def finetune_coolchic(
    wholenet,
    state,
    img,  # [3, H, W]
    lmbda: float,
    key: jax.Array,
    phases: Optional[Tuple[TrainerPhase, ...]] = None,
):
    """Materialize per-image params from the amortized encoder, then run the
    standard per-image training phases on them.

    Returns:
        (initial metrics, finetuned params, finetuned logs)
    """
    cfg: CoolChicConfig = wholenet.cfg
    params = wholenet.image_to_coolchic(state, img)
    m0 = eval_metrics(params, cfg, img, lmbda)
    logs: Optional[PhaseLogs] = None
    for idx, phase in enumerate(phases or default_finetune_phases()):
        params, logs = run_phase(
            params, img, lmbda, jax.random.fold_in(key, idx), cfg, phase
        )
    return m0, params, logs
