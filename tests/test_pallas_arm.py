"""Fused Pallas ARM kernel vs the XLA reference path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coolchic_tpu.models.arm import (
    arm_apply,
    get_neighbors,
    init_arm_params,
    latent_rate_bits,
)
from coolchic_tpu.ops.pallas_arm import arm_rate_pallas, arm_rate_pallas_pyramid

pytestmark = pytest.mark.slow  # heavy compile/build; excluded from `-m 'not slow'` fast tier


def reference_rate(latent_plane, params, dim_arm):
    ctx = get_neighbors(latent_plane[None], dim_arm)
    mu, scale, _ = arm_apply(params, ctx)
    return latent_rate_bits(latent_plane.reshape(-1), mu, scale).reshape(
        latent_plane.shape
    )


@pytest.mark.parametrize("dim_arm,n_hidden", [(8, 1), (24, 2), (32, 2)])
@pytest.mark.parametrize("hw", [(16, 24), (37, 130)])
def test_pallas_rate_matches_xla(dim_arm, n_hidden, hw):
    key = jax.random.PRNGKey(0)
    params = init_arm_params(key, dim_arm, n_hidden)
    # Non-trivial weights so mu/scale vary.
    params["layers"][0]["weight"] = (
        jax.random.normal(jax.random.PRNGKey(1), params["layers"][0]["weight"].shape)
        * 0.2
    )
    latent = jnp.round(
        jax.random.normal(jax.random.PRNGKey(2), hw) * 3.0
    )
    got = arm_rate_pallas(latent, params, dim_arm, n_hidden, interpret=True)
    want = reference_rate(latent, params, dim_arm)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_arm_rate_dispatcher():
    """All widths run the pallas kernel (XLA fallback only if Mosaic
    rejects a shape, cached per shape). Every width must agree with
    the reference implementation (CPU: both are f32-exact)."""
    from coolchic_tpu.ops.pallas_arm import arm_rate

    for dim_arm, n_hidden in [(8, 1), (24, 2), (32, 2)]:
        params = init_arm_params(jax.random.PRNGKey(0), dim_arm, n_hidden)
        latent = jnp.round(jax.random.normal(jax.random.PRNGKey(2), (16, 24)) * 2.0)
        got = arm_rate(latent, params, dim_arm, n_hidden)
        want = reference_rate(latent, params, dim_arm)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_pallas_pyramid_matches_forward_order():
    dim_arm, n_hidden = 8, 1
    params = init_arm_params(jax.random.PRNGKey(0), dim_arm, n_hidden)
    latents = [
        jnp.round(jax.random.normal(jax.random.PRNGKey(i), (1, 12 // 2**i + 1, 16 // 2**i + 1)) * 2)
        for i in range(2)
    ]
    got = arm_rate_pallas_pyramid(latents, params, dim_arm, n_hidden, interpret=True)
    want = jnp.concatenate(
        [reference_rate(g[0], params, dim_arm).reshape(-1) for g in latents]
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)
