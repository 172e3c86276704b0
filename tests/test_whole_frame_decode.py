"""Whole-frame C decoder (cpp/frame_decoder.cpp) and the standalone
``ccdec`` binary: bit-exact vs the python-orchestrated integer pipeline
(reference: cpp/cc-frame-decoder.cpp decode_frame + ccdecapi.cpp main)."""

import subprocess

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coolchic_tpu.bitstream import decode_bitstream, encode_image_bitstream
from coolchic_tpu.bitstream.entropy import (
    build_decoder_binary,
    decode_image_cc,
    probe_bitstream,
)
from coolchic_tpu.models import CoolChicConfig, init_coolchic_params
from coolchic_tpu.train import TrainerPhase, run_phase
from coolchic_tpu.train.quantize_model import quantize_model_with_info

CFG = CoolChicConfig(
    img_size=(29, 43),  # odd sizes: ceil-division pyramid
    n_ft_per_res=(1, 1, 1, 1),
    layers_synthesis=("16-1-linear-relu", "3-1-linear-none", "3-3-residual-relu"),
    dim_arm=8,
    n_hidden_layers_arm=2,
)


@pytest.fixture(scope="module")
def bitstream():
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
        max_itr=300,
        freq_valid=100,
        schedule_lr=True,
        quantizer_type="softround",
        quantizer_noise_type="gaussian",
        softround_temperature=(0.3, 0.1),
        noise_parameter=(0.25, 0.1),
    )
    params, _ = run_phase(params, target, 2e-3, jax.random.PRNGKey(1), CFG, phase)
    qparams, infos = quantize_model_with_info(params, target, 2e-3, CFG)
    nn_q_step = {
        m: {"weight": float(i.q_step_w), "bias": float(i.q_step_b)}
        for m, i in infos.items()
    }
    nn_expgol = {
        m: {"weight": int(i.expgol_w), "bias": int(i.expgol_b)}
        for m, i in infos.items()
    }
    return encode_image_bitstream(qparams, CFG, nn_q_step, nn_expgol)


def test_probe_matches_headers(bitstream):
    info = probe_bitstream(bitstream)
    assert info is not None
    assert info["img_size"] == CFG.img_size
    assert info["c_out"] == 3
    assert info["bitdepth"] == 8
    assert info["n_frames"] == 1


def test_whole_frame_bit_exact_vs_python(bitstream):
    """One C call must reproduce the python-orchestrated integer decode
    exactly (same rounded integer samples)."""
    fast = decode_image_cc(bitstream)
    assert fast is not None
    img_c, info = fast
    img_py, _ = decode_bitstream(bitstream, integer_pipeline=True, full_info=True)
    a = np.round(np.asarray(img_c, np.float64) * 255.0)
    b = np.round(np.asarray(img_py, np.float64) * 255.0)
    np.testing.assert_array_equal(a, b)
    assert info["timings"]["total_sec"] > 0


def test_decode_bitstream_uses_fast_path(bitstream):
    """decode_bitstream(integer_pipeline=True) routes through the C path
    (timings present, no params) and agrees with the full-info path."""
    img, info = decode_bitstream(bitstream, integer_pipeline=True)
    assert "timings" in info and "params" not in info
    img_full, info_full = decode_bitstream(
        bitstream, integer_pipeline=True, full_info=True
    )
    assert "params" in info_full
    np.testing.assert_array_equal(
        np.round(np.asarray(img, np.float64) * 255),
        np.round(np.asarray(img_full, np.float64) * 255),
    )


def test_ccdec_binary_bit_exact(bitstream, tmp_path):
    """The standalone executable writes the same PPM samples."""
    binp = build_decoder_binary()
    bs_path = tmp_path / "img.cool"
    out_path = tmp_path / "img.ppm"
    bs_path.write_bytes(bitstream)
    r = subprocess.run(
        [binp, "-i", str(bs_path), "-o", str(out_path), "-v"],
        capture_output=True,
        text=True,
    )
    assert r.returncode == 0, r.stderr
    raw = out_path.read_bytes()
    # header is exactly "P6\n<w> <h>\n<maxval>\n" (then binary samples)
    nl3 = raw.index(b"\n", raw.index(b"\n", raw.index(b"\n") + 1) + 1) + 1
    magic, dims, maxval = raw[: nl3 - 1].split(b"\n")
    assert magic == b"P6"
    w, h = map(int, dims.split())
    assert (h, w) == CFG.img_size and int(maxval) == 255
    px = np.frombuffer(raw[nl3:], np.uint8).reshape(h, w, 3).transpose(2, 0, 1)
    img_py, _ = decode_bitstream(bitstream, integer_pipeline=True)
    ref = np.round(np.asarray(img_py, np.float64) * 255).astype(np.uint8)
    np.testing.assert_array_equal(px, ref)
