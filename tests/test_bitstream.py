"""Bitstream: header round-trips, ARM integerization, full encode->decode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coolchic_tpu.bitstream.armint import (
    armint_forward,
    context_int,
    integerize_arm_params,
)
from coolchic_tpu.bitstream.decode import decode_bitstream
from coolchic_tpu.bitstream.encode import encode_image_bitstream, module_symbols
from coolchic_tpu.bitstream.header import (
    FrameHeader,
    GopHeader,
    read_frame_header,
    read_gop_header,
    write_frame_header,
    write_gop_header,
)
from coolchic_tpu.models import CoolChicConfig, frame_forward, init_coolchic_params
from coolchic_tpu.train import TrainerPhase, run_phase
from coolchic_tpu.train.loss import loss_function
from coolchic_tpu.train.quantize_model import quantize_model_with_info

pytestmark = pytest.mark.slow  # heavy compile/build; excluded from `-m 'not slow'` fast tier

CFG = CoolChicConfig(
    img_size=(32, 48),
    n_ft_per_res=(1, 1, 1, 1),
    layers_synthesis=("16-1-linear-relu", "3-1-linear-none", "3-3-residual-none"),
    dim_arm=8,
    n_hidden_layers_arm=1,
)


def test_gop_header_roundtrip():
    h = GopHeader(img_size=(512, 768), frame_data_type="yuv420", bitdepth=10)
    data = write_gop_header(h)
    assert len(data) == 9
    back = read_gop_header(data)
    assert back == h


def test_frame_header_roundtrip():
    fh = FrameHeader(
        display_index=3,
        dim_arm=24,
        n_hidden_layers_arm=2,
        latent_n_grids=7,
        ups_k_size=8,
        ups_preconcat_k_size=7,
        layers_synthesis=["48-1-linear-relu", "3-1-linear-none", "3-3-residual-relu"],
        flow_gain=0,
        ac_max_val_nn=301,
        ac_max_val_latent=57,
        hls_sig_blksize=16,
        q_step_index_nn={
            "arm": {"weight": 3, "bias": 7},
            "upsampling": {"weight": 5, "bias": 0},
            "synthesis": {"weight": 4, "bias": 12},
        },
        scale_index_nn={
            "arm": {"weight": 1, "bias": 2},
            "upsampling": {"weight": 3, "bias": 0},
            "synthesis": {"weight": 0, "bias": 4},
        },
        n_bytes_nn={
            "arm": {"weight": 120, "bias": 13},
            "upsampling": {"weight": 27, "bias": 0},
            "synthesis": {"weight": 256, "bias": 9},
        },
        n_ft_per_latent=[1] * 7,
        n_bytes_per_latent=[100, 50, 25, 12, 6, 3, 1],
    )
    data = write_frame_header(fh)
    back = read_frame_header(data)
    fh2 = fh.__class__(**{**fh.__dict__, "n_bytes_header": back.n_bytes_header})
    assert back == fh2


def test_armint_matches_float_coarsely():
    """Integer ARM tracks the float ARM within fixed-point tolerance."""
    from coolchic_tpu.models.arm import arm_apply, init_arm_params

    key = jax.random.PRNGKey(0)
    p = init_arm_params(key, 8, 1)
    # Give hidden layer some (quantized) weights.
    p["layers"][0]["weight"] = jnp.round(
        jax.random.normal(jax.random.PRNGKey(1), (8, 8)) * 0.3 * 64
    ) / 64
    p["layers"][1]["weight"] = jnp.round(p["layers"][1]["weight"] * 64) / 64
    np_p = jax.tree.map(np.asarray, p)
    int_layers = integerize_arm_params(np_p)

    lat = np.random.RandomState(0).randint(-5, 6, (1, 10, 12))
    ctx_i = context_int(lat, 8)
    mu_i, ls_i = armint_forward(int_layers, ctx_i)

    ctx_f = jnp.asarray(lat[0], jnp.float32)
    from coolchic_tpu.models.arm import get_neighbors

    mu_f, _, ls_f = arm_apply(p, get_neighbors(ctx_f[None], 8))
    np.testing.assert_allclose(mu_i / 256.0, np.asarray(mu_f), atol=0.05)
    np.testing.assert_allclose(ls_i / 256.0, np.asarray(ls_f), atol=0.05)


def test_module_symbols_are_integers():
    params = init_coolchic_params(jax.random.PRNGKey(0), CFG, latent_init="normal")
    params = jax.tree.map(np.asarray, params)
    for m, (qi_w, qi_b) in (("arm", (4, 8)), ("synthesis", (6, 12)), ("upsampling", (6, 0))):
        w, b = module_symbols(params, m, qi_w, qi_b)
        assert w.dtype.kind == "i" and b.dtype.kind == "i"


@pytest.fixture(scope="module")
def trained_quantized():
    """A briefly trained + NN-quantized model on a smooth target."""
    y, x = jnp.meshgrid(
        jnp.linspace(0, 1, CFG.img_size[0]),
        jnp.linspace(0, 1, CFG.img_size[1]),
        indexing="ij",
    )
    target = jnp.stack(
        [0.5 + 0.4 * jnp.sin(6 * x), y * 0.8 + 0.1, 0.5 * (x + y)], axis=0
    )
    params = init_coolchic_params(jax.random.PRNGKey(0), CFG)
    phase = TrainerPhase(
        lr=1e-2,
        max_itr=400,
        freq_valid=100,
        schedule_lr=True,
        quantizer_type="softround",
        quantizer_noise_type="gaussian",
        softround_temperature=(0.3, 0.1),
        noise_parameter=(0.25, 0.1),
    )
    lmbda = 2e-3
    params, _ = run_phase(params, target, lmbda, jax.random.PRNGKey(1), CFG, phase)
    qparams, infos = quantize_model_with_info(params, target, lmbda, CFG)
    nn_q_step = {
        m: {"weight": float(infos[m].q_step_w), "bias": float(infos[m].q_step_b)}
        for m in infos
    }
    nn_expgol = {
        m: {"weight": int(infos[m].expgol_w), "bias": int(infos[m].expgol_b)}
        for m in infos
    }
    return jax.tree.map(np.asarray, qparams), nn_q_step, nn_expgol, target


def test_encode_decode_roundtrip(trained_quantized):
    """The sanity check of the reference (test/sanity_check.py:108-124):
    decoded PSNR within 0.1 dB of the encoder estimate; real rate within
    20% of the estimated rate."""
    qparams, nn_q_step, nn_expgol, target = trained_quantized

    bitstream = encode_image_bitstream(
        jax.tree.map(jnp.asarray, qparams), CFG, nn_q_step, nn_expgol
    )
    img, info = decode_bitstream(bitstream)

    # Encoder-side estimate (eval forward + rate).
    decoded_est, rate, _ = frame_forward(
        jax.tree.map(jnp.asarray, qparams), CFG, training=False
    )
    est = loss_function(decoded_est, rate, target, 1e-3)

    psnr_dec = -10.0 * np.log10(np.mean((img - np.asarray(target)) ** 2) + 1e-10)
    assert abs(psnr_dec - float(est.psnr_db)) < 0.1, (
        f"decoded {psnr_dec:.3f} dB vs estimated {float(est.psnr_db):.3f} dB"
    )

    n_pixels = CFG.n_pixels
    real_bpp = len(bitstream) * 8 / n_pixels
    # Estimated bpp: latent rate + NN rate is not tracked here; compare the
    # latent estimate against the real size minus a generous header bound.
    est_latent_bpp = float(est.rate_latent_bpp)
    assert real_bpp > est_latent_bpp * 0.8  # real includes NN + headers
    # and the real latent payload should be within 20% of the estimate.
    latent_bytes = sum(info["frame_header"].n_bytes_per_latent)
    real_latent_bpp = latent_bytes * 8 / n_pixels
    if est_latent_bpp > 0.05:
        assert abs(real_latent_bpp - est_latent_bpp) / est_latent_bpp < 0.2, (
            f"real latent {real_latent_bpp:.4f} bpp vs est {est_latent_bpp:.4f} bpp"
        )


def test_decoded_latents_match_encoder(trained_quantized):
    """Decoder's sequential ARM reproduces the encoder's hardround latents
    exactly (bit-exact autoregressive loop)."""
    qparams, nn_q_step, nn_expgol, _ = trained_quantized
    bitstream = encode_image_bitstream(
        jax.tree.map(jnp.asarray, qparams), CFG, nn_q_step, nn_expgol
    )
    _, info = decode_bitstream(bitstream)
    for lat_dec, lat_enc in zip(info["latents"], qparams["latents"]):
        expected = np.round(np.asarray(lat_enc, np.float64) * CFG.encoder_gain)
        np.testing.assert_array_equal(lat_dec, expected.astype(np.int32))


def test_decoded_network_matches_encoder(trained_quantized):
    """Decoder-side dequantized networks equal the encoder's quantized params
    (power-of-two q-steps are exact in float)."""
    qparams, nn_q_step, nn_expgol, _ = trained_quantized
    bitstream = encode_image_bitstream(
        jax.tree.map(jnp.asarray, qparams), CFG, nn_q_step, nn_expgol
    )
    _, info = decode_bitstream(bitstream)
    dec = info["params"]
    for a, b in zip(
        jax.tree.leaves(dec["synthesis"]), jax.tree.leaves(qparams["synthesis"])
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-12)
    for a, b in zip(
        jax.tree.leaves(dec["upsampling"]), jax.tree.leaves(qparams["upsampling"])
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-12)
    for a, b in zip(jax.tree.leaves(dec["arm"]), jax.tree.leaves(qparams["arm"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-12)
