"""Mixed-size batching: padded-buffer encode with masked loss/rate matches
the unpadded encode (SURVEY.md §7 "Static shapes vs arbitrary H x W")."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coolchic_tpu.models import CoolChicConfig, frame_forward, init_coolchic_params
from coolchic_tpu.train import TrainerPhase, encode_frame_batch, run_phase
from coolchic_tpu.train.loss import loss_function
from coolchic_tpu.train.presets import Preset, Warmup, WarmupPhase

pytestmark = pytest.mark.slow  # heavy compile/build; excluded from `-m 'not slow'` fast tier

ARCH = dict(
    n_ft_per_res=(1, 1, 1),
    layers_synthesis=("8-1-linear-relu", "X-1-linear-none", "X-3-residual-relu"),
    dim_arm=8,
    n_hidden_layers_arm=1,
)
SMALL = (16, 24)
BIG = (24, 32)


def _pad_params(params_small, cfg_small, cfg_big):
    """Zero-pad every latent grid of the small image into the big buffer."""
    padded = dict(params_small)
    lat = []
    for ls, (c, hb, wb) in zip(params_small["latents"], cfg_big.latent_shapes):
        _, hs, ws = ls.shape
        lat.append(jnp.pad(ls, ((0, 0), (0, hb - hs), (0, wb - ws))))
    padded["latents"] = lat
    return padded


def _img(h, w):
    y, x = jnp.meshgrid(jnp.linspace(0, 1, h), jnp.linspace(0, 1, w), indexing="ij")
    return jnp.stack([x, y, 0.5 * (x + y)], axis=0)


def test_masked_eval_forward_matches_unpadded():
    cfg_s = CoolChicConfig(img_size=SMALL, **ARCH)
    cfg_b = CoolChicConfig(img_size=BIG, **ARCH)
    params = init_coolchic_params(jax.random.PRNGKey(0), cfg_s, latent_init="normal")
    padded = _pad_params(params, cfg_s, cfg_b)
    valid_hw = jnp.array(SMALL, jnp.int32)

    dec_s, rate_s, _ = frame_forward(params, cfg_s, training=False)
    dec_b, rate_b, _ = frame_forward(padded, cfg_b, training=False, valid_hw=valid_hw)

    np.testing.assert_allclose(
        np.asarray(dec_b[:, : SMALL[0], : SMALL[1]]), np.asarray(dec_s), atol=2e-5
    )
    # masked rate covers exactly the valid latents
    assert float(jnp.sum(rate_b)) == pytest.approx(float(jnp.sum(rate_s)), rel=1e-5)

    # and the masked loss equals the unpadded loss
    tgt_s = _img(*SMALL)
    tgt_b = jnp.pad(tgt_s, ((0, 0), (0, BIG[0] - SMALL[0]), (0, BIG[1] - SMALL[1])))
    l_s = loss_function(dec_s, rate_s, tgt_s, 1e-3)
    l_b = loss_function(dec_b, rate_b, tgt_b, 1e-3, valid_hw=valid_hw)
    assert float(l_b.loss) == pytest.approx(float(l_s.loss), rel=1e-5)
    assert float(l_b.psnr_db) == pytest.approx(float(l_s.psnr_db), abs=1e-3)


def test_masked_training_phase_tracks_unpadded():
    """A short masked training run on the padded buffer reaches (almost)
    the unpadded run's quality — noise realizations differ with buffer
    shape, so this is a statistical check, not bit-exactness."""
    cfg_s = CoolChicConfig(img_size=SMALL, **ARCH)
    cfg_b = CoolChicConfig(img_size=BIG, **ARCH)
    phase = TrainerPhase(
        lr=1e-2, max_itr=60, freq_valid=20, patience=10000, schedule_lr=True,
        quantizer_type="softround", quantizer_noise_type="gaussian",
        softround_temperature=(0.3, 0.1), noise_parameter=(0.25, 0.1),
    )
    tgt_s = _img(*SMALL)
    tgt_b = jnp.pad(tgt_s, ((0, 0), (0, BIG[0] - SMALL[0]), (0, BIG[1] - SMALL[1])))
    params_s = init_coolchic_params(jax.random.PRNGKey(0), cfg_s)
    params_b = init_coolchic_params(jax.random.PRNGKey(0), cfg_b)

    _, logs_s = run_phase(params_s, tgt_s, 1e-3, jax.random.PRNGKey(1), cfg_s, phase)
    _, logs_b = run_phase(
        params_b, tgt_b, 1e-3, jax.random.PRNGKey(1), cfg_b, phase,
        valid_hw=jnp.array(SMALL, jnp.int32),
    )
    assert float(logs_b.loss) == pytest.approx(float(logs_s.loss), rel=0.15)
    assert float(logs_b.psnr_db) == pytest.approx(float(logs_s.psnr_db), abs=2.0)


def test_encode_frame_batch_mixed_sizes():
    """One batch holding two different true image sizes in a shared bucket."""
    cfg_b = CoolChicConfig(img_size=BIG, **ARCH)
    preset = Preset(
        preset_name="tiny",
        all_phases=(
            TrainerPhase(
                lr=1e-2, max_itr=30, freq_valid=10, patience=10000,
                schedule_lr=True, quantizer_type="softround",
                quantizer_noise_type="gaussian",
                softround_temperature=(0.3, 0.1), noise_parameter=(0.25, 0.1),
            ),
        ),
        warmup=Warmup(
            phases=(WarmupPhase(candidates=2, training_phase=TrainerPhase(
                max_itr=10, freq_valid=10)),)
        ),
    )
    t1 = _img(*SMALL)
    t1 = jnp.pad(t1, ((0, 0), (0, BIG[0] - SMALL[0]), (0, BIG[1] - SMALL[1])))
    t2 = _img(*BIG)
    targets = jnp.stack([t1, t2])
    valid_hws = jnp.array([SMALL, BIG], jnp.int32)
    keys = jax.random.split(jax.random.PRNGKey(0), 2)
    lmbdas = jnp.array([1e-3, 1e-3])

    res = encode_frame_batch(keys, targets, lmbdas, cfg_b, preset, valid_hws)
    assert res.loss.shape == (2,)
    assert np.all(np.isfinite(np.asarray(res.loss)))
    # 40 total iterations: just assert both images train to something sane
    assert float(res.psnr_db[0]) > 14 and float(res.psnr_db[1]) > 14
