"""Hypernet delta quantization + bitstream path
(reference: coolchic/enc/training/quantizemodel.py:443-616)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coolchic_tpu.hypernet import DeltaWholeNet
from coolchic_tpu.hypernet.inference import (
    hypernet_to_bitstream,
    quantize_image_deltas,
)
from coolchic_tpu.models.config import CoolChicConfig

pytestmark = pytest.mark.slow  # heavy compile/build; excluded from `-m 'not slow'` fast tier

CFG = CoolChicConfig(
    img_size=(32, 32),
    n_ft_per_res=(1, 1, 1),
    layers_synthesis=("8-1-linear-relu", "X-1-linear-none"),
    dim_arm=8,
    n_hidden_layers_arm=1,
)


@pytest.fixture(scope="module")
def net_state():
    net = DeltaWholeNet(CFG, backbone_arch="resnet18", n_hidden_channels=8)
    state = net.init(jax.random.PRNGKey(0), CFG.img_size)
    # nudge the delta heads away from exact zero output so the
    # quantization grid has something to chew on
    state = jax.tree.map(
        lambda a: a + 0.01 * jax.random.normal(jax.random.PRNGKey(1), a.shape)
        if a.ndim >= 1
        else a,
        state,
    )
    return net, state


def _img():
    y, x = jnp.meshgrid(jnp.linspace(0, 1, 32), jnp.linspace(0, 1, 32), indexing="ij")
    return jnp.stack([x, y, 0.5 * (x + y)], 0)


def test_quantize_image_deltas_returns_qstep_multiples(net_state):
    net, state = net_state
    img = _img()
    lat0, qdeltas, infos = quantize_image_deltas(net, state, img, 1e-3)

    assert set(infos) == {"arm", "synthesis", "upsampling"}
    for m, info in infos.items():
        qw = float(info.q_step_w)
        assert qw > 0
        assert float(info.rate_bits) >= 0
    # every quantized delta leaf is an exact multiple of its module q-step
    for m in ("arm", "synthesis"):
        qw = float(infos[m].q_step_w)
        qb = float(infos[m].q_step_b)
        for layer in qdeltas[m]["layers"]:
            w = np.asarray(layer["weight"], np.float64)
            np.testing.assert_allclose(w / qw, np.round(w / qw), atol=1e-4)
            b = np.asarray(layer["bias"], np.float64)
            np.testing.assert_allclose(b / qb, np.round(b / qb), atol=1e-4)
    qw = float(infos["upsampling"].q_step_w)
    for half in list(qdeltas["upsampling"]["ups"]) + list(
        qdeltas["upsampling"]["preconcat"]
    ):
        h = np.asarray(half, np.float64)
        np.testing.assert_allclose(h / qw, np.round(h / qw), atol=1e-4)


def test_quantized_deltas_still_decode_sensibly(net_state):
    """RD of the quantized-delta decoder stays close to full precision."""
    from coolchic_tpu.models.coolchic import coolchic_forward_latents
    from coolchic_tpu.train.loss import loss_function

    net, state = net_state
    img = _img()
    lat0, qdeltas, _ = quantize_image_deltas(net, state, img, 1e-3)
    latents, deltas = net.predict(state, img[None])
    delta0 = jax.tree.map(lambda d: d[0], deltas)

    def rd(dl):
        nets = {
            m: jax.tree.map(lambda b, d: b + d, state.decoder[m], dl[m])
            for m in state.decoder
        }
        decoded, rate, _ = coolchic_forward_latents(nets, lat0, CFG, training=False)
        return float(loss_function(decoded, rate, img, 1e-3).loss)

    fp = rd(delta0)
    q = rd(qdeltas)
    assert np.isfinite(q)
    assert q <= fp * 1.5 + 1e-3  # quantization must not blow up the RD cost


def test_hypernet_to_bitstream_roundtrip(net_state):
    """hypernet -> bitstream -> integer decoder: decodable, sane size."""
    from coolchic_tpu.bitstream import decode_bitstream

    net, state = net_state
    img = _img()
    bs, info = hypernet_to_bitstream(net, state, img, 1e-3)
    assert len(bs) > 20
    decoded, dinfo = decode_bitstream(bs, integer_pipeline=True)
    assert decoded.shape == (3, 32, 32)
    assert np.isfinite(decoded).all()
    assert "delta_infos" in info and "nn_infos" in info
