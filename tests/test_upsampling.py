"""Upsampling: symmetric kernels, x2 transposed conv, pre-concat filters."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coolchic_tpu.models.upsampling import (
    half_kernel_size,
    init_upsampling_params,
    preconcat_filter,
    symmetric_kernel_1d,
    upsample_x2,
    upsampling_apply,
)


def test_symmetric_kernel_even_odd():
    half = jnp.array([1.0, 2.0, 3.0])
    np.testing.assert_allclose(
        symmetric_kernel_1d(half, 6), [1, 2, 3, 3, 2, 1]
    )
    np.testing.assert_allclose(
        symmetric_kernel_1d(half, 5), [1, 2, 3, 2, 1]
    )
    assert half_kernel_size(6) == 3 and half_kernel_size(7) == 4


def test_preconcat_dirac_init_doubles_input():
    """Dirac init + the residual connection => y = conv(x) + x = 2x
    (reference: upsampling.py:135-166, 202)."""
    params = init_upsampling_params(8, 7, 1, 1)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 6))
    y = preconcat_filter(x, params["preconcat"][0], 7)
    np.testing.assert_allclose(np.asarray(y), 2 * np.asarray(x), atol=1e-6)


@pytest.mark.parametrize("k", [4, 6, 8])
@pytest.mark.parametrize("hw", [(4, 5), (7, 3)])
def test_upsample_x2_shape(k, hw):
    params = init_upsampling_params(k, 7, 1, 1)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, *hw))
    y = upsample_x2(x, params["ups"][0], k)
    assert y.shape == (1, 2 * hw[0], 2 * hw[1])


def test_upsample_x2_bilinear_constant():
    """With the (1/4, 3/4) bilinear taps, upsampling a constant grid keeps
    the constant in the interior (each output pixel sums kernel taps to 1 per
    phase)."""
    params = init_upsampling_params(4, 7, 1, 1)
    x = jnp.ones((1, 8, 8)) * 5.0
    y = upsample_x2(x, params["ups"][0], 4)
    np.testing.assert_allclose(np.asarray(y[0, 2:-2, 2:-2]), 5.0, atol=1e-5)


def test_upsample_x2_separable():
    """The 2-D outer-product kernel equals two 1-D passes (the eval path of
    the reference, upsampling.py:337-353): verify the kernel is rank 1."""
    half = jax.random.normal(jax.random.PRNGKey(2), (4,))
    k1d = symmetric_kernel_1d(half, 8)
    k2d = jnp.outer(k1d, k1d)
    u, s, vt = np.linalg.svd(np.asarray(k2d))
    assert s[1] < 1e-6 * s[0]


def test_upsampling_apply_full_pyramid():
    """3-level pyramid merges to the full resolution with channels ordered
    grid0..gridL-1 (reference: upsampling.py:476-506)."""
    h, w = 13, 10  # odd sizes exercise the ceil/crop path
    shapes = [(1, h, w), (1, (h + 1) // 2, (w + 1) // 2), (1, (h + 3) // 4, (w + 3) // 4)]
    latents = [
        jax.random.normal(jax.random.PRNGKey(i), s) for i, s in enumerate(shapes)
    ]
    params = init_upsampling_params(8, 7, 2, 2)
    dense = upsampling_apply(params, latents, 8, 7)
    assert dense.shape == (3, h, w)
    # Channel 0 of the output is the filtered grid 0 (Dirac+residual = 2x).
    np.testing.assert_allclose(
        np.asarray(dense[0]), 2 * np.asarray(latents[0][0]), atol=1e-5
    )
