"""Encoding presets: training-phase schedules and warm-up descriptions.

Frozen (hashable) dataclasses so that they can be passed as static
arguments to ``jax.jit`` — each distinct phase compiles its own scan.

Mirrors the reference preset semantics
(reference: coolchic/enc/training/presets.py:25-481).
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Dict, Tuple

MODULES = ("arm", "upsampling", "synthesis", "latents")


@dataclass(frozen=True)
class TrainerPhase:
    """One training phase (reference: presets.py:25-133)."""

    lr: float = 1e-2
    max_itr: int = 5000
    freq_valid: int = 100
    patience: int = 10000
    quantize_model: bool = False
    schedule_lr: bool = False
    end_lr: float = 1e-5
    softround_temperature: Tuple[float, float] = (0.3, 0.3)
    noise_parameter: Tuple[float, float] = (1.0, 1.0)
    quantizer_noise_type: str = "kumaraswamy"
    quantizer_type: str = "softround"
    # "all" or any subset of MODULES
    optimized_module: Tuple[str, ...] = ("all",)

    def __post_init__(self):
        if self.quantizer_type in (
            "softround_alone",
            "hardround",
            "ste",
            "true_ste",
            "none",
        ):
            assert self.quantizer_noise_type == "none", (
                f"quantizer_type={self.quantizer_type} requires "
                f"quantizer_noise_type='none', found {self.quantizer_noise_type}"
            )
        else:
            assert self.quantizer_noise_type != "none", (
                f"quantizer_type={self.quantizer_type} requires a noise type"
            )


@dataclass(frozen=True)
class WarmupPhase:
    """Keep the best ``candidates`` systems, then train each a bit
    (reference: presets.py:179-204)."""

    candidates: int
    training_phase: TrainerPhase


@dataclass(frozen=True)
class Warmup:
    phases: Tuple[WarmupPhase, ...] = ()


@dataclass(frozen=True)
class Preset:
    preset_name: str
    all_phases: Tuple[TrainerPhase, ...] = ()
    warmup: Warmup = field(default_factory=Warmup)


def preset_c3x(start_lr: float = 1e-2, n_itr_per_phase: int = 100000) -> Preset:
    """The canonical 3-phase recipe (reference: presets.py:298-377):
    softround+gaussian-noise phase -> STE + NN-quantize phase -> latent-only
    retune; warm-up 5 -> 2 candidates at 400 iterations each."""
    warmup_phase = TrainerPhase(
        lr=start_lr,
        max_itr=400,
        freq_valid=400,
        patience=100000,
        softround_temperature=(0.3, 0.3),
        noise_parameter=(2.0, 2.0),
        quantizer_noise_type="kumaraswamy",
        quantizer_type="softround",
    )
    return Preset(
        preset_name="c3x",
        all_phases=(
            TrainerPhase(
                lr=start_lr,
                max_itr=n_itr_per_phase,
                patience=5000,
                schedule_lr=True,
                quantizer_type="softround",
                quantizer_noise_type="gaussian",
                softround_temperature=(0.3, 0.1),
                noise_parameter=(0.25, 0.1),
            ),
            TrainerPhase(
                lr=1.0e-4,
                max_itr=1500,
                patience=1500,
                schedule_lr=True,
                quantizer_type="ste",
                quantizer_noise_type="none",
                softround_temperature=(1e-4, 1e-4),
                quantize_model=True,
            ),
            TrainerPhase(
                lr=1.0e-4,
                max_itr=1000,
                patience=50,
                quantizer_type="ste",
                quantizer_noise_type="none",
                optimized_module=("latents",),
                freq_valid=10,
                softround_temperature=(1e-4, 1e-4),
            ),
        ),
        warmup=Warmup(
            phases=(
                WarmupPhase(candidates=5, training_phase=warmup_phase),
                WarmupPhase(candidates=2, training_phase=warmup_phase),
            )
        ),
    )


def preset_debug(start_lr: float = 1e-2, n_itr_per_phase: int = 100000) -> Preset:
    """Tiny schedule for smoke tests (reference: presets.py:380-432)."""
    return Preset(
        preset_name="debug",
        all_phases=(
            TrainerPhase(
                lr=start_lr,
                max_itr=50,
                patience=100000,
                schedule_lr=True,
                quantizer_type="softround",
                quantizer_noise_type="gaussian",
                softround_temperature=(0.3, 0.1),
                noise_parameter=(0.25, 0.1),
            ),
            TrainerPhase(
                lr=1e-4,
                max_itr=10,
                patience=10,
                quantizer_type="ste",
                quantizer_noise_type="none",
                quantize_model=True,
                softround_temperature=(1e-4, 1e-4),
            ),
            TrainerPhase(
                lr=1e-4,
                max_itr=10,
                patience=50,
                optimized_module=("latents",),
                freq_valid=5,
                quantizer_type="ste",
                quantizer_noise_type="none",
                softround_temperature=(1e-4, 1e-4),
            ),
        ),
        warmup=Warmup(
            phases=(
                WarmupPhase(candidates=3, training_phase=TrainerPhase(max_itr=10, freq_valid=10)),
                WarmupPhase(candidates=2, training_phase=TrainerPhase(max_itr=10, freq_valid=10)),
            )
        ),
    )


def preset_measure_speed(start_lr: float = 1e-2, n_itr_per_phase: int = 100000) -> Preset:
    """Single-phase schedule for encoder timing (reference: presets.py:435-474)."""
    return Preset(
        preset_name="measure_speed",
        all_phases=(
            TrainerPhase(
                lr=start_lr,
                max_itr=n_itr_per_phase,
                patience=5000,
                schedule_lr=True,
                quantizer_type="softround",
                quantizer_noise_type="gaussian",
                softround_temperature=(0.3, 0.1),
                noise_parameter=(0.25, 0.1),
                quantize_model=True,
            ),
        ),
        warmup=Warmup(
            phases=(
                WarmupPhase(
                    candidates=1,
                    training_phase=TrainerPhase(max_itr=1, freq_valid=1),
                ),
            )
        ),
    )


AVAILABLE_PRESETS: Dict[str, object] = {
    "c3x": preset_c3x,
    "debug": preset_debug,
    "measure_speed": preset_measure_speed,
}
