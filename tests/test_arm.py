"""ARM context gather, MLP and Laplace rate (vs reference arm.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coolchic_tpu.models.arm import (
    MASK_SIZE,
    NON_ZERO_PIXEL_CTX_INDEX,
    arm_apply,
    get_neighbors,
    init_arm_params,
    laplace_cdf,
    latent_rate_bits,
)


def naive_get_neighbors(x: np.ndarray, dim_arm: int) -> np.ndarray:
    """Literal numpy re-implementation of the reference pad+unfold+select
    (reference: arm.py:308-352): zero-pad by 4, slide a 9x9 window, flatten
    row-major, take the indexed positions."""
    c, h, w = x.shape
    pad = (MASK_SIZE - 1) // 2
    xp = np.pad(x, ((0, 0), (pad, pad), (pad, pad)))
    idx = NON_ZERO_PIXEL_CTX_INDEX[dim_arm]
    out = np.zeros((c * h * w, dim_arm), x.dtype)
    n = 0
    for ch in range(c):
        for i in range(h):
            for j in range(w):
                win = xp[ch, i : i + MASK_SIZE, j : j + MASK_SIZE].reshape(-1)
                out[n] = win[list(idx)]
                n += 1
    return out


@pytest.mark.parametrize("dim_arm", [8, 16, 24, 32])
def test_get_neighbors_matches_naive(dim_arm):
    x = np.random.RandomState(0).randn(2, 6, 7).astype(np.float32)
    got = np.asarray(get_neighbors(jnp.asarray(x), dim_arm))
    np.testing.assert_allclose(got, naive_get_neighbors(x, dim_arm), atol=1e-6)


@pytest.mark.parametrize("dim_arm", [8, 16, 24, 32])
def test_context_is_causal(dim_arm):
    """Context of pixel (i, j) must only read raster-order predecessors."""
    h, w = 5, 9
    # Raster-order index as the value of each pixel.
    x = jnp.arange(h * w, dtype=jnp.float32).reshape(1, h, w) + 1.0
    ctx = np.asarray(get_neighbors(x, dim_arm))
    for p in range(h * w):
        used = ctx[p][ctx[p] != 0.0]  # zero-padding reads excluded
        assert (used < p + 1).all(), f"pixel {p} reads future pixel(s) {used}"


def test_arm_apply_initial_stats():
    """At init, hidden layers are zero-residual so the head sees the raw
    context; head bias is zero."""
    key = jax.random.PRNGKey(0)
    params = init_arm_params(key, 16, 2)
    ctx = jnp.zeros((10, 16))
    mu, scale, log_scale = arm_apply(params, ctx)
    np.testing.assert_allclose(mu, np.zeros(10), atol=1e-6)
    # log_scale raw 0 -> scale = exp(clip(-4)) = exp(-4)
    np.testing.assert_allclose(scale, np.full(10, np.exp(-4.0)), rtol=1e-5)


def test_arm_residual_layer():
    """Hidden layer computes relu(x W^T + b + x)."""
    params = {
        "layers": [
            {"weight": jnp.eye(8) * 0.5, "bias": jnp.ones((8,)) * 0.1},
            {"weight": jnp.zeros((2, 8)), "bias": jnp.array([1.5, 0.0])},
        ]
    }
    ctx = jnp.ones((3, 8))
    mu, scale, log_scale = arm_apply(params, ctx)
    # hidden: relu(0.5 + 0.1 + 1) = 1.6 ; head: mu = 1.5, log_scale = 0
    np.testing.assert_allclose(mu, np.full(3, 1.5), atol=1e-6)
    np.testing.assert_allclose(log_scale, np.zeros(3), atol=1e-6)


def test_laplace_cdf_properties():
    mu = jnp.array(0.3)
    b = jnp.array(0.7)
    assert abs(float(laplace_cdf(mu, mu, b)) - 0.5) < 1e-6
    assert float(laplace_cdf(jnp.array(100.0), mu, b)) == pytest.approx(1.0)
    assert float(laplace_cdf(jnp.array(-100.0), mu, b)) == pytest.approx(0.0)


def test_rate_clamped_at_16_bits():
    # A latent far from mu with tiny scale costs exactly 16 bits.
    r = latent_rate_bits(jnp.array(50.0), jnp.array(0.0), jnp.array(0.01))
    assert float(r) == pytest.approx(16.0)


def test_rate_of_likely_symbol_is_small():
    # Symbol at mu with moderate scale: p(y +- .5) large -> rate < 1.5 bits.
    r = latent_rate_bits(jnp.array(0.0), jnp.array(0.0), jnp.array(0.3))
    assert float(r) < 1.0
