"""Post-training NN quantization RD search."""

import jax
import jax.numpy as jnp
import numpy as np

from coolchic_tpu.models import CoolChicConfig, init_coolchic_params
from coolchic_tpu.train import eval_metrics
from coolchic_tpu.train.quantize_model import (
    expgol_bits_all_counts,
    quantize_model_with_info,
)

CFG = CoolChicConfig(
    img_size=(16, 24),
    n_ft_per_res=(1, 1, 1),
    layers_synthesis=("8-1-linear-relu", "X-1-linear-none"),
    dim_arm=8,
    n_hidden_layers_arm=1,
)


def test_expgol_bits_order0_known_values():
    """Order-0 exp-Golomb: 0 -> 1 bit, 1 -> 2*floor(log2(2))+1+1 = 4 bits."""
    bits = expgol_bits_all_counts(jnp.array([0.0]))
    assert float(bits[0]) == 1.0
    bits = expgol_bits_all_counts(jnp.array([1.0]))
    assert float(bits[0]) == 4.0  # 2*1 + 0 + 1 + sign
    bits = expgol_bits_all_counts(jnp.array([3.0]))
    assert float(bits[0]) == 6.0  # floor(log2(4)) = 2


def test_quantize_model_params_on_grid():
    key = jax.random.PRNGKey(0)
    target = jax.random.uniform(jax.random.PRNGKey(9), (3, 16, 24))
    params = init_coolchic_params(key, CFG, latent_init="normal")
    qparams, infos = quantize_model_with_info(params, target, 1e-3, CFG)

    # Every quantized arm weight must be a multiple of the chosen q-step.
    dw = float(infos["arm"].q_step_w)
    for layer in qparams["arm"]["layers"]:
        w = np.asarray(layer["weight"]) / dw
        np.testing.assert_allclose(w, np.round(w), atol=1e-4)

    dw_syn = float(infos["synthesis"].q_step_w)
    db_syn = float(infos["synthesis"].q_step_b)
    for layer in qparams["synthesis"]["layers"]:
        w = np.asarray(layer["weight"]) / dw_syn
        np.testing.assert_allclose(w, np.round(w), atol=1e-4)
        b = np.asarray(layer["bias"]) / db_syn
        np.testing.assert_allclose(b, np.round(b), atol=1e-4)

    # Latents untouched.
    for a, b in zip(params["latents"], qparams["latents"]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # NN rate is positive and finite.
    total = sum(float(i.rate_bits) for i in infos.values())
    assert 0 < total < 1e7


def test_quantize_model_rd_not_catastrophic():
    """Quantizing the networks should cost < 3 dB on a trained-ish model."""
    key = jax.random.PRNGKey(1)
    target = jax.random.uniform(jax.random.PRNGKey(9), (3, 16, 24))
    params = init_coolchic_params(key, CFG, latent_init="normal")
    m_before = eval_metrics(params, CFG, target, 1e-3)
    qparams, infos = quantize_model_with_info(params, target, 1e-3, CFG)
    m_after = eval_metrics(qparams, CFG, target, 1e-3)
    assert float(m_after.psnr_db) > float(m_before.psnr_db) - 3.0
