"""Full Cool-chic forward: shapes, eval semantics, vmap/jit compatibility."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coolchic_tpu.models import (
    CoolChicConfig,
    coolchic_forward,
    frame_forward,
    init_coolchic_params,
    macs_per_pixel,
)

pytestmark = pytest.mark.slow  # heavy compile/build; excluded from `-m 'not slow'` fast tier

CFG = CoolChicConfig(
    img_size=(24, 36),
    n_ft_per_res=(1, 1, 1, 1),
    layers_synthesis=("16-1-linear-relu", "X-1-linear-none", "X-3-residual-none"),
)


def test_latent_shapes_ceil():
    assert CFG.latent_shapes == (
        (1, 24, 36),
        (1, 12, 18),
        (1, 6, 9),
        (1, 3, 5),
    )
    assert CFG.n_latents == 24 * 36 + 12 * 18 + 6 * 9 + 3 * 5


def test_forward_shapes_and_rate():
    params = init_coolchic_params(jax.random.PRNGKey(0), CFG, latent_init="normal")
    out, rate, extras = coolchic_forward(params, CFG, key=jax.random.PRNGKey(1))
    assert out.shape == (3, 24, 36)
    assert rate.shape == (CFG.n_latents,)
    assert bool(jnp.all(rate >= 0)) and bool(jnp.all(rate <= 16.0 + 1e-4))


def test_eval_zero_latents_cheap():
    """All-zero latents quantize to 0 = mu at init, so the eval rate must be
    far below 1 bit per latent."""
    params = init_coolchic_params(jax.random.PRNGKey(0), CFG, latent_init="zeros")
    _, rate, _ = coolchic_forward(params, CFG, training=False)
    assert float(rate.mean()) < 0.2


def test_eval_is_deterministic_and_integer_quantized():
    params = init_coolchic_params(jax.random.PRNGKey(0), CFG, latent_init="normal")
    _, r1, e1 = coolchic_forward(params, CFG, training=False)
    _, r2, e2 = coolchic_forward(params, CFG, training=False)
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
    # Hardround produces integers.
    lat = np.asarray(e1["flat_latent"])
    np.testing.assert_allclose(lat, np.round(lat), atol=1e-6)


def test_frame_forward_eval_rounds_to_bitdepth():
    params = init_coolchic_params(jax.random.PRNGKey(0), CFG, latent_init="normal")
    decoded, _, _ = frame_forward(params, CFG, training=False, bitdepth=8)
    x = np.asarray(decoded) * 255.0
    np.testing.assert_allclose(x, np.round(x), atol=1e-3)
    assert x.min() >= 0.0 and x.max() <= 255.0


def test_encoder_gain_applied():
    """Latent of value v quantizes (hardround) to round(gain * v)."""
    params = init_coolchic_params(jax.random.PRNGKey(0), CFG)
    params["latents"][0] = jnp.full_like(params["latents"][0], 0.2)
    _, _, extras = coolchic_forward(params, CFG, training=False)
    n0 = CFG.latent_shapes[0][1] * CFG.latent_shapes[0][2]
    # gain = 16 -> round(3.2) = 3
    np.testing.assert_allclose(np.asarray(extras["flat_latent"][:n0]), 3.0)


def test_ac_max_val_clamp():
    params = init_coolchic_params(jax.random.PRNGKey(0), CFG)
    params["latents"][0] = jnp.full_like(params["latents"][0], 100.0)
    _, _, extras = coolchic_forward(params, CFG, training=False, ac_max_val=5)
    assert float(jnp.max(extras["flat_latent"])) <= 6.0


def test_vmap_and_jit():
    B = 3
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    params = jax.vmap(lambda k: init_coolchic_params(k, CFG, latent_init="normal"))(
        keys
    )

    @jax.jit
    def fwd(p, k):
        return jax.vmap(lambda pi, ki: coolchic_forward(pi, CFG, key=ki)[0])(p, k)

    out = fwd(params, keys)
    assert out.shape == (B, 3, 24, 36)
    # Different init keys give different outputs.
    assert not np.allclose(np.asarray(out[0]), np.asarray(out[1]))


def test_grad_flows_to_all_modules():
    params = init_coolchic_params(jax.random.PRNGKey(0), CFG, latent_init="normal")
    target = jax.random.uniform(jax.random.PRNGKey(5), (3, 24, 36))

    def loss(p):
        out, rate, _ = coolchic_forward(
            p, CFG, key=jax.random.PRNGKey(1), quantizer_type="softround"
        )
        return jnp.mean((out - target) ** 2) + 1e-3 * rate.sum() / CFG.n_pixels

    g = jax.grad(loss)(params)
    for lat_g in g["latents"]:
        assert float(jnp.abs(lat_g).max()) > 0
    assert float(jnp.abs(g["arm"]["layers"][-1]["weight"]).max()) > 0
    assert float(jnp.abs(g["synthesis"]["layers"][0]["weight"]).max()) > 0
    assert float(jnp.abs(g["upsampling"]["ups"][0]).max()) > 0


def test_macs_per_pixel_positive():
    m = macs_per_pixel(CFG)
    assert m["total"] > 0 and m["arm"] > 0 and m["synthesis"] > 0
