"""Fixed-point integer decode path vs the float reference math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coolchic_tpu.bitstream import decode_bitstream, encode_image_bitstream
from coolchic_tpu.models import CoolChicConfig, init_coolchic_params
from coolchic_tpu.train import TrainerPhase, run_phase
from coolchic_tpu.train.quantize_model import quantize_model_with_info

CFG = CoolChicConfig(
    img_size=(32, 48),
    n_ft_per_res=(1, 1, 1, 1),
    layers_synthesis=("16-1-linear-relu", "3-1-linear-none", "3-3-residual-none"),
    dim_arm=8,
    n_hidden_layers_arm=1,
)


@pytest.fixture(scope="module")
def bitstream_and_target():
    y, x = jnp.meshgrid(
        jnp.linspace(0, 1, CFG.img_size[0]),
        jnp.linspace(0, 1, CFG.img_size[1]),
        indexing="ij",
    )
    target = jnp.stack(
        [0.5 + 0.4 * jnp.sin(6 * x), y * 0.8 + 0.1, 0.5 * (x + y)], axis=0
    )
    params = init_coolchic_params(jax.random.PRNGKey(0), CFG)
    phase = TrainerPhase(
        lr=1e-2,
        max_itr=400,
        freq_valid=100,
        schedule_lr=True,
        quantizer_type="softround",
        quantizer_noise_type="gaussian",
        softround_temperature=(0.3, 0.1),
        noise_parameter=(0.25, 0.1),
    )
    params, _ = run_phase(params, target, 2e-3, jax.random.PRNGKey(1), CFG, phase)
    qparams, infos = quantize_model_with_info(params, target, 2e-3, CFG)
    nn_q_step = {
        m: {"weight": float(i.q_step_w), "bias": float(i.q_step_b)} for m, i in infos.items()
    }
    nn_expgol = {
        m: {"weight": int(i.expgol_w), "bias": int(i.expgol_b)} for m, i in infos.items()
    }
    bs = encode_image_bitstream(qparams, CFG, nn_q_step, nn_expgol)
    return bs, np.asarray(target)


def test_integer_decode_close_to_float(bitstream_and_target):
    """The int32 pipeline must agree with the float pipeline within the
    reference sanity margin (PSNR delta < 0.1 dB; the reference accepts the
    same drift between its float estimate and its integer decoder)."""
    bs, target = bitstream_and_target
    img_f, _ = decode_bitstream(bs, integer_pipeline=False)
    img_i, _ = decode_bitstream(bs, integer_pipeline=True)

    psnr_f = -10 * np.log10(np.mean((img_f - target) ** 2) + 1e-10)
    psnr_i = -10 * np.log10(np.mean((img_i - target) ** 2) + 1e-10)
    assert abs(psnr_f - psnr_i) < 0.1, f"float {psnr_f:.3f} vs int {psnr_i:.3f}"
    # Pixel-level agreement: fixed point has ~2^-12 resolution + shift bias.
    assert np.abs(img_f - img_i).max() < 8.0 / 255.0


def test_integer_decode_deterministic(bitstream_and_target):
    bs, _ = bitstream_and_target
    a, _ = decode_bitstream(bs, integer_pipeline=True)
    b, _ = decode_bitstream(bs, integer_pipeline=True)
    np.testing.assert_array_equal(a, b)
