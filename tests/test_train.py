"""Training engine: phase runner, warm-up, full encode, batching."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coolchic_tpu.models import CoolChicConfig, init_coolchic_params
from coolchic_tpu.train import (
    Preset,
    TrainerPhase,
    Warmup,
    WarmupPhase,
    encode_frame,
    encode_frame_batch,
    eval_metrics,
    run_phase,
    warmup,
)

pytestmark = pytest.mark.slow  # heavy compile/build; excluded from `-m 'not slow'` fast tier

CFG = CoolChicConfig(
    img_size=(16, 24),
    n_ft_per_res=(1, 1, 1),
    layers_synthesis=("8-1-linear-relu", "X-1-linear-none"),
    dim_arm=8,
    n_hidden_layers_arm=1,
)

PHASE = TrainerPhase(
    lr=1e-2,
    max_itr=60,
    freq_valid=20,
    patience=10000,
    schedule_lr=True,
    quantizer_type="softround",
    quantizer_noise_type="gaussian",
    softround_temperature=(0.3, 0.1),
    noise_parameter=(0.25, 0.1),
)


def _target():
    # A smooth, compressible target.
    y, x = jnp.meshgrid(jnp.linspace(0, 1, 16), jnp.linspace(0, 1, 24), indexing="ij")
    return jnp.stack([x, y, 0.5 * (x + y)], axis=0)


def test_run_phase_improves_loss():
    target = _target()
    params = init_coolchic_params(jax.random.PRNGKey(0), CFG)
    m0 = eval_metrics(params, CFG, target, 1e-3)
    best, logs = run_phase(params, target, 1e-3, jax.random.PRNGKey(1), CFG, PHASE)
    assert float(logs.loss) < float(m0.loss)
    # Returned params reproduce the logged metrics.
    m1 = eval_metrics(best, CFG, target, 1e-3)
    assert float(m1.loss) == pytest.approx(float(logs.loss), rel=1e-5)


def test_run_phase_latent_only_keeps_networks_fixed():
    target = _target()
    params = init_coolchic_params(jax.random.PRNGKey(0), CFG, latent_init="normal")
    # Scale latents so they do not all hardround to zero (an all-zero dense
    # tensor hits relu'(0) = 0 and legitimately kills every gradient — the
    # reference behaves identically; latent-only retune only ever runs on
    # trained models).
    params["latents"] = [50.0 * l for l in params["latents"]]
    phase = TrainerPhase(
        lr=1e-2,
        max_itr=20,
        freq_valid=10,
        # true_ste: identity backward, so the latents get real gradients even
        # in a 20-iteration micro-phase.
        quantizer_type="true_ste",
        quantizer_noise_type="none",
        optimized_module=("latents",),
        softround_temperature=(1e-4, 1e-4),
    )
    best, _ = run_phase(params, target, 1e-3, jax.random.PRNGKey(1), CFG, phase)
    for a, b in zip(
        jax.tree.leaves(params["synthesis"]), jax.tree.leaves(best["synthesis"])
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # But latents moved.
    moved = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(params["latents"], best["latents"])
    )
    assert moved


def test_warmup_returns_single_candidate_params():
    target = _target()
    wu = Warmup(
        phases=(
            WarmupPhase(candidates=3, training_phase=TrainerPhase(max_itr=5, freq_valid=5)),
            WarmupPhase(candidates=2, training_phase=TrainerPhase(max_itr=5, freq_valid=5)),
        )
    )
    params = warmup(jax.random.PRNGKey(0), target, 1e-3, CFG, wu)
    # Unbatched pytree with the right shapes.
    assert params["latents"][0].shape == CFG.latent_shapes[0]


def test_encode_frame_micro_preset():
    target = _target()
    preset = Preset(
        preset_name="micro",
        all_phases=(PHASE,),
        warmup=Warmup(
            phases=(
                WarmupPhase(
                    candidates=2, training_phase=TrainerPhase(max_itr=5, freq_valid=5)
                ),
            )
        ),
    )
    res = encode_frame(jax.random.PRNGKey(0), target, 1e-3, CFG, preset)
    assert float(res.psnr_db) > 15.0


def test_encode_frame_batch_vmaps():
    targets = jnp.stack([_target(), 1.0 - _target()])
    keys = jax.random.split(jax.random.PRNGKey(0), 2)
    lmbdas = jnp.array([1e-3, 4e-3])
    preset = Preset(preset_name="micro", all_phases=(PHASE,), warmup=Warmup())
    res = encode_frame_batch(keys, targets, lmbdas, CFG, preset)
    assert res.psnr_db.shape == (2,)
    assert res.params["latents"][0].shape == (2, *CFG.latent_shapes[0])
    # Higher lambda must not produce a higher bpp on the same content family.
    assert float(res.loss[0]) > 0 and float(res.loss[1]) > 0


def test_patience_no_schedule_freezes():
    """With patience < max_itr and no LR schedule, training stops early:
    result equals a shorter run."""
    target = _target()
    params = init_coolchic_params(jax.random.PRNGKey(0), CFG)
    phase_short = TrainerPhase(
        lr=1e-2,
        max_itr=40,
        freq_valid=10,
        patience=0,  # any block without a record stops the phase
        schedule_lr=False,
        quantizer_type="softround",
        quantizer_noise_type="kumaraswamy",
    )
    best, logs = run_phase(
        params, target, 1e-3, jax.random.PRNGKey(1), CFG, phase_short
    )
    # Must still return valid, improved params.
    m0 = eval_metrics(params, CFG, target, 1e-3)
    assert float(logs.loss) <= float(m0.loss)
