"""frozen_zero_grids: the encoder-side pinned-zero-grid RD search knob.

The reference's published low-rate streams leave the full-resolution grid
near-empty (e.g. kodim02-lmbda-002.cool codes 33 bytes for grid 0); pinning
the grid to zero lets our encoder search that optimum explicitly while the
bitstream format stays unchanged.
"""

import jax
import jax.numpy as jnp
import numpy as np

from coolchic_tpu.bitstream.decode import decode_bitstream
from coolchic_tpu.bitstream.encode import encode_image_bitstream
from coolchic_tpu.models import CoolChicConfig, frame_forward, init_coolchic_params
from coolchic_tpu.models.coolchic import coolchic_forward
from coolchic_tpu.train import TrainerPhase, run_phase
from coolchic_tpu.train.quantize_model import quantize_model_with_info

CFG = CoolChicConfig(
    img_size=(16, 24),
    n_ft_per_res=(1, 1, 1),
    layers_synthesis=("8-1-linear-relu", "3-1-linear-none"),
    dim_arm=8,
    n_hidden_layers_arm=1,
    frozen_zero_grids=(0,),
)


def _target():
    y, x = jnp.meshgrid(
        jnp.linspace(0, 1, CFG.img_size[0]),
        jnp.linspace(0, 1, CFG.img_size[1]),
        indexing="ij",
    )
    return jnp.stack([0.5 + 0.3 * jnp.sin(4 * x), 0.8 * y, 0.5 * (x + y)], axis=0)


def test_config_normalizes_json_lists():
    """arch.json round-trips deliver lists; the config must stay hashable."""
    cfg = CoolChicConfig(
        img_size=[16, 24],
        n_ft_per_res=[1, 1, 1],
        layers_synthesis=["8-1-linear-relu", "3-1-linear-none"],
        dim_arm=8,
        frozen_zero_grids=[0],
    )
    assert isinstance(cfg.frozen_zero_grids, tuple)
    assert isinstance(cfg.layers_synthesis, tuple)
    hash(cfg)  # must not raise


def test_forward_masks_pinned_grid_and_blocks_gradient():
    params = init_coolchic_params(jax.random.PRNGKey(0), CFG, latent_init="normal")

    def loss(p):
        out, rate, extras = coolchic_forward(
            p, CFG, key=jax.random.PRNGKey(1), training=True
        )
        return jnp.sum(out**2) + jnp.sum(rate), extras

    (_, extras), grads = jax.value_and_grad(loss, has_aux=True)(params)
    # grid 0's quantized latents are exact zeros despite nonzero raw init
    # (grid 0 is the leading segment of the flattened latent concatenation)
    n0 = params["latents"][0].size
    assert np.all(np.asarray(extras["flat_latent"][:n0]) == 0.0)
    assert np.any(np.asarray(extras["flat_latent"][n0:]) != 0.0)
    assert np.any(np.asarray(params["latents"][0]) != 0.0)
    # and no gradient flows back into the pinned grid
    assert np.all(np.asarray(grads["latents"][0]) == 0.0)
    assert np.any(np.asarray(grads["latents"][1]) != 0.0)


def test_bitstream_codes_pinned_grid_as_empty():
    """End-to-end: train briefly with grid 0 pinned, write a bitstream, and
    check grid 0 costs zero bytes while the decode matches the eval forward
    (the raw latents of the pinned grid still hold their nonzero init)."""
    target = _target()
    params = init_coolchic_params(jax.random.PRNGKey(0), CFG, latent_init="normal")
    phase = TrainerPhase(
        lr=1e-2,
        max_itr=120,
        freq_valid=60,
        schedule_lr=True,
        quantizer_type="softround",
        quantizer_noise_type="gaussian",
        softround_temperature=(0.3, 0.1),
        noise_parameter=(0.25, 0.1),
    )
    params, _ = run_phase(params, target, 2e-3, jax.random.PRNGKey(1), CFG, phase)
    assert np.any(np.asarray(params["latents"][0]) != 0.0)  # init survived

    qparams, infos = quantize_model_with_info(params, target, 2e-3, CFG)
    nn_q_step = {
        m: {"weight": float(infos[m].q_step_w), "bias": float(infos[m].q_step_b)}
        for m in infos
    }
    nn_expgol = {
        m: {"weight": int(infos[m].expgol_w), "bias": int(infos[m].expgol_b)}
        for m in infos
    }
    bitstream = encode_image_bitstream(qparams, CFG, nn_q_step, nn_expgol)
    img, info = decode_bitstream(bitstream)

    assert info["frame_header"].n_bytes_per_latent[0] == 0
    assert np.all(np.asarray(info["latents"][0]) == 0)

    decoded_est, _, _ = frame_forward(qparams, CFG, training=False)
    psnr_dec = -10.0 * np.log10(np.mean((img - np.asarray(target)) ** 2) + 1e-10)
    mse_est = float(np.mean((np.asarray(decoded_est) - np.asarray(target)) ** 2))
    psnr_est = -10.0 * np.log10(mse_est + 1e-10)
    assert abs(psnr_dec - psnr_est) < 0.1
