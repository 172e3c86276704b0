"""Synthesis conv stack (vs reference synthesis.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from coolchic_tpu.models.config import CoolChicConfig
from coolchic_tpu.models.synthesis import init_synthesis_params, synthesis_apply


def naive_conv2d_replicate(x, w, b):
    """Literal numpy conv with replicate padding, NCHW / OIHW."""
    cin, h, wd = x.shape
    cout, _, k, _ = w.shape
    pad = (k - 1) // 2
    xp = np.pad(x, ((0, 0), (pad, pad), (pad, pad)), mode="edge")
    out = np.zeros((cout, h, wd), np.float32)
    for o in range(cout):
        for i in range(h):
            for j in range(wd):
                out[o, i, j] = (
                    xp[:, i : i + k, j : j + k] * w[o]
                ).sum() + b[o]
    return out


def test_conv_matches_naive():
    rs = np.random.RandomState(0)
    x = rs.randn(4, 6, 7).astype(np.float32)
    w = rs.randn(5, 4, 3, 3).astype(np.float32)
    b = rs.randn(5).astype(np.float32)
    params = {"layers": [{"weight": jnp.asarray(w), "bias": jnp.asarray(b)}]}
    layers = ((5, 3, False, False),)
    got = np.asarray(synthesis_apply(params, jnp.asarray(x), layers))
    np.testing.assert_allclose(got, naive_conv2d_replicate(x, w, b), atol=1e-4)


def test_residual_and_relu():
    x = jnp.ones((2, 4, 4)) * -0.3
    w = jnp.zeros((2, 2, 1, 1))
    b = jnp.array([0.1, -0.1])
    params = {"layers": [{"weight": w, "bias": b}]}
    # residual: y = relu(conv(x) + x) = relu(b + x)
    layers = ((2, 1, True, True),)
    got = np.asarray(synthesis_apply(params, x, layers))
    np.testing.assert_allclose(got[0], np.maximum(0.1 - 0.3, 0.0), atol=1e-6)
    np.testing.assert_allclose(got[1], 0.0, atol=1e-6)


def test_layer_spec_parsing():
    cfg = CoolChicConfig(
        img_size=(8, 8),
        layers_synthesis=("48-1-linear-relu", "X-1-linear-none", "X-3-residual-relu"),
        out_channels=3,
    )
    parsed = cfg.parsed_synthesis_layers()
    assert parsed == ((48, 1, False, True), (3, 1, False, False), (3, 3, True, True))


def test_init_shapes_and_residual_zero():
    cfg = CoolChicConfig(img_size=(8, 8))
    key = jax.random.PRNGKey(0)
    params = init_synthesis_params(
        key, cfg.total_latent_channels, cfg.parsed_synthesis_layers()
    )
    parsed = cfg.parsed_synthesis_layers()
    in_ft = cfg.total_latent_channels
    for layer, (out_ft, k, residual, _) in zip(params["layers"], parsed):
        assert layer["weight"].shape == (out_ft, in_ft, k, k)
        assert layer["bias"].shape == (out_ft,)
        if residual:
            assert float(jnp.abs(layer["weight"]).max()) == 0.0
        in_ft = out_ft
