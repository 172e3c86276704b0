"""LatentDecoder: external-latent forward + delta application + as_coolchic
materializer (reference: hypernet.py:966-1145)."""

import jax
import jax.numpy as jnp
import pytest

from coolchic_tpu.hypernet import LatentDecoder
from coolchic_tpu.models import CoolChicConfig, init_coolchic_params
from coolchic_tpu.models.coolchic import coolchic_forward

CFG = CoolChicConfig(
    img_size=(16, 16),
    n_ft_per_res=(1, 1, 1),
    dim_arm=8,
    n_hidden_layers_arm=1,
    layers_synthesis=("8-1-linear-relu", "X-1-linear-none"),
)

EVAL = dict(
    quantizer_type="hardround",
    quantizer_noise_type="none",
    training=False,
)


@pytest.fixture(scope="module")
def nets_and_latents():
    params = init_coolchic_params(jax.random.PRNGKey(0), CFG, "normal")
    # scale so the hardround-quantized latents are non-zero (the default
    # 1e-2 init rounds to all-zeros at eval, making weight deltas no-ops)
    latents = [100.0 * l for l in params.pop("latents")]
    return params, latents


def test_forward_matches_stored_params(nets_and_latents):
    """No deltas: the latent-argument forward equals the stored-params
    forward (the reference's 'hide the stored latents' abstraction)."""
    nets, latents = nets_and_latents
    dec = LatentDecoder(CFG)
    out_a, rate_a, _ = dec.forward(nets, latents, **EVAL)
    out_b, rate_b, _ = coolchic_forward({**nets, "latents": latents}, CFG, **EVAL)
    assert jnp.allclose(out_a, out_b)
    assert jnp.allclose(rate_a, rate_b)


def test_weight_deltas_fold_exactly(nets_and_latents):
    """Runtime deltas (add_to_weight=False) == pre-folded weights
    (add_to_weight=True): same math in the functional design."""
    nets, latents = nets_and_latents
    dec = LatentDecoder(CFG)
    key = jax.random.PRNGKey(7)
    syn_d = [
        1e-2 * jax.random.normal(jax.random.fold_in(key, i), l["weight"].shape)
        for i, l in enumerate(nets["synthesis"]["layers"])
    ]
    arm_d = [
        1e-2 * jax.random.normal(jax.random.fold_in(key, 100 + i), l["weight"].shape)
        for i, l in enumerate(nets["arm"]["layers"])
    ]
    out_a, rate_a, _ = dec.forward(
        nets, latents, synth_delta=syn_d, arm_delta=arm_d, **EVAL
    )

    folded = {
        **nets,
        "synthesis": {
            "layers": [
                {**l, "weight": l["weight"] + d}
                for l, d in zip(nets["synthesis"]["layers"], syn_d)
            ]
        },
        "arm": {
            "layers": [
                {**l, "weight": l["weight"] + d}
                for l, d in zip(nets["arm"]["layers"], arm_d)
            ]
        },
        "latents": latents,
    }
    out_b, rate_b, _ = coolchic_forward(folded, CFG, **EVAL)
    assert jnp.allclose(out_a, out_b)
    assert jnp.allclose(rate_a, rate_b)
    # and the deltas actually change the output
    out_0, _, _ = dec.forward(nets, latents, **EVAL)
    assert not jnp.allclose(out_a, out_0)


def test_bias_only_mode(nets_and_latents):
    """only_delta_biases targets biases (COIN++-style; reference
    hypernet.py:974, 1005)."""
    nets, latents = nets_and_latents
    dec = LatentDecoder(CFG, only_delta_biases=True)
    syn_d = [
        jnp.full(l["bias"].shape, 0.01) for l in nets["synthesis"]["layers"]
    ]
    out_a, _, _ = dec.forward(nets, latents, synth_delta=syn_d, **EVAL)
    folded = {
        **nets,
        "synthesis": {
            "layers": [
                {**l, "bias": l["bias"] + d}
                for l, d in zip(nets["synthesis"]["layers"], syn_d)
            ]
        },
        "latents": latents,
    }
    out_b, _, _ = coolchic_forward(folded, CFG, **EVAL)
    assert jnp.allclose(out_a, out_b)


def test_as_coolchic_roundtrip(nets_and_latents):
    """as_coolchic folds latents + deltas into a standard pytree whose
    forward matches the LatentDecoder forward exactly."""
    nets, latents = nets_and_latents
    dec = LatentDecoder(CFG)
    arm_d = [
        1e-2 * jnp.ones(l["weight"].shape) for l in nets["arm"]["layers"]
    ]
    params = dec.as_coolchic(nets, latents, arm_delta=arm_d)
    out_a, rate_a, _ = dec.forward(nets, latents, arm_delta=arm_d, **EVAL)
    out_b, rate_b, _ = coolchic_forward(params, CFG, **EVAL)
    assert jnp.allclose(out_a, out_b)
    assert jnp.allclose(rate_a, rate_b)
    # gradients are stopped on the materialized tree
    g = jax.grad(
        lambda lats: jnp.sum(
            coolchic_forward(dec.as_coolchic(nets, lats), CFG, **EVAL)[0]
        )
    )(latents)
    assert all(jnp.allclose(x, 0.0) for x in g)
