"""Quantizer semantics (vs reference coolchic/enc/component/core/quantizer.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coolchic_tpu.models.quantizer import kumaraswamy_noise, quantize, softround


def test_softround_limits():
    x = jnp.linspace(-3.3, 3.7, 101)
    # Drop points near half-integers, where the t->0 limit is the ambiguous
    # tie-breaking case.
    x = x[jnp.abs(x - jnp.floor(x) - 0.5) > 0.05]
    # t -> 0: softround ~ round
    np.testing.assert_allclose(softround(x, 1e-4), jnp.round(x), atol=1e-3)
    # large t: softround ~ identity
    np.testing.assert_allclose(softround(x, 1e4), x, atol=1e-3)


def test_softround_fixed_points():
    # Integers and half-integers are fixed points / symmetric points.
    x = jnp.array([-2.0, -1.0, 0.0, 1.0, 2.0])
    np.testing.assert_allclose(softround(x, 0.3), x, atol=1e-6)
    np.testing.assert_allclose(float(softround(jnp.array(0.5), 0.3)), 0.5, atol=1e-6)


def test_kumaraswamy_a1_is_uniform():
    u = jnp.linspace(0.01, 0.99, 51)
    np.testing.assert_allclose(kumaraswamy_noise(u, 1.0), u - 0.5, atol=1e-6)


def test_kumaraswamy_range_and_mode():
    u = jax.random.uniform(jax.random.PRNGKey(0), (10000,))
    n = kumaraswamy_noise(u, 2.0)
    assert float(n.min()) >= -0.5 and float(n.max()) <= 0.5
    # Pointier than uniform: more mass near 0.
    assert float(jnp.mean(jnp.abs(n) < 0.1)) > 0.2


@pytest.mark.parametrize("qt", ["ste", "true_ste"])
def test_ste_forward_is_round(qt):
    x = jnp.linspace(-2.7, 2.7, 37)
    y = quantize(x, None, "none", qt, 0.3, 1.0)
    np.testing.assert_allclose(y, jnp.round(x), atol=1e-5)


def test_true_ste_gradient_is_identity():
    g = jax.grad(lambda x: quantize(x, None, "none", "true_ste").sum())(
        jnp.array([0.2, 1.7, -0.9])
    )
    np.testing.assert_allclose(g, jnp.ones(3), atol=1e-6)


def test_ste_gradient_is_softround_gradient():
    x = jnp.array([0.2, 1.7, -0.9])
    t = 0.3
    g_ste = jax.grad(lambda x: quantize(x, None, "none", "ste", t).sum())(x)
    g_sr = jax.grad(lambda x: softround(x, t).sum())(x)
    np.testing.assert_allclose(g_ste, g_sr, atol=1e-6)


def test_softround_quantizer_composition():
    # quantizer_type softround: softround(softround(x, t) + n, t).
    key = jax.random.PRNGKey(3)
    x = jnp.linspace(-2, 2, 33)
    y = quantize(x, key, "kumaraswamy", "softround", 0.3, 1.0)
    assert y.shape == x.shape
    # Noise is bounded by 0.5, softround moves by < 1.
    assert float(jnp.max(jnp.abs(y - x))) < 1.5


def test_hardround():
    x = jnp.array([0.49, 0.51, -1.5, 2.5])
    y = quantize(x, None, "none", "hardround")
    np.testing.assert_allclose(y, jnp.round(x))
