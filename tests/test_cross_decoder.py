"""Cross-decoder compatibility: our bitstreams through the REFERENCE decoder.

Builds the reference's standalone ccdec binary (from the read-only mount)
and verifies that a bitstream produced by this framework decodes with it —
the strongest format-compatibility proof available — and that our integer
reconstruction matches the reference decoder bit-exactly.

Skipped when the reference sources or toolchain are unavailable.
"""

import os
import subprocess
import tempfile
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy compile/build; excluded from `-m 'not slow'` fast tier

REF_CPP = Path("/root/reference/coolchic/cpp")
BUILD_DIR = Path(tempfile.gettempdir()) / "ccdec_build_test"


@pytest.fixture(scope="session")
def ccdec():
    if not REF_CPP.exists():
        pytest.skip("reference sources not mounted")
    exe = BUILD_DIR / "ccdec"
    if not exe.exists():
        BUILD_DIR.mkdir(parents=True, exist_ok=True)
        try:
            subprocess.run(
                ["cmake", str(REF_CPP), "-DCMAKE_BUILD_TYPE=Release"],
                cwd=BUILD_DIR, check=True, capture_output=True, timeout=300,
            )
            subprocess.run(
                ["make", "-j8"], cwd=BUILD_DIR, check=True, capture_output=True,
                timeout=600,
            )
        except Exception as e:
            pytest.skip(f"cannot build reference decoder: {e}")
    return exe


PUBLISHED_BS = Path("/root/reference/results/image/kodak/bitstreams")


@pytest.mark.slow
@pytest.mark.parametrize(
    "name", ["kodim01-lmbda-0001", "kodim05-lmbda-002", "kodim13-lmbda-00001"]
)
def test_our_decoder_reads_published_bitstreams(ccdec, tmp_path, name):
    """Reverse direction: the reference's PUBLISHED Kodak bitstreams decode
    with our integer pipeline bit-exactly (vs the reference decoder's own
    output)."""
    from coolchic_tpu.bitstream import decode_bitstream
    from coolchic_tpu.io import read_ppm

    path = PUBLISHED_BS / f"{name}.cool"
    if not path.exists():
        pytest.skip("published bitstreams not mounted")
    out = tmp_path / "ref.ppm"
    r = subprocess.run(
        [str(ccdec), f"--input={path}", f"--output={out}", "--cpu"],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr
    ref_img, _ = read_ppm(str(out))
    my_int, _ = decode_bitstream(path.read_bytes(), integer_pipeline=True)
    np.testing.assert_allclose(ref_img, my_int, atol=1e-5)


@pytest.mark.slow
def test_reference_decoder_reads_our_bitstream(ccdec, tmp_path):
    from coolchic_tpu.bitstream import decode_bitstream, encode_image_bitstream
    from coolchic_tpu.io import read_ppm
    from coolchic_tpu.models import CoolChicConfig, init_coolchic_params
    from coolchic_tpu.train import TrainerPhase, run_phase
    from coolchic_tpu.train.quantize_model import quantize_model_with_info

    cfg = CoolChicConfig(
        img_size=(64, 96),
        n_ft_per_res=(1, 1, 1, 1),
        layers_synthesis=("16-1-linear-relu", "3-1-linear-none", "3-3-residual-none"),
        dim_arm=8,
        n_hidden_layers_arm=1,
    )
    y, x = jnp.meshgrid(jnp.linspace(0, 1, 64), jnp.linspace(0, 1, 96), indexing="ij")
    target = jnp.stack([0.5 + 0.4 * jnp.sin(6 * x), y * 0.8 + 0.1, 0.5 * (x + y)], 0)
    params = init_coolchic_params(jax.random.PRNGKey(0), cfg)
    phase = TrainerPhase(
        lr=1e-2, max_itr=300, freq_valid=100, schedule_lr=True,
        quantizer_type="softround", quantizer_noise_type="gaussian",
        softround_temperature=(0.3, 0.1), noise_parameter=(0.25, 0.1),
    )
    params, _ = run_phase(params, target, 2e-3, jax.random.PRNGKey(1), cfg, phase)
    qparams, infos = quantize_model_with_info(params, target, 2e-3, cfg)
    nn_q = {m: {"weight": float(i.q_step_w), "bias": float(i.q_step_b)}
            for m, i in infos.items()}
    nn_g = {m: {"weight": int(i.expgol_w), "bias": int(i.expgol_b)}
            for m, i in infos.items()}
    bs = encode_image_bitstream(qparams, cfg, nn_q, nn_g)

    bpath = tmp_path / "ours.cool"
    bpath.write_bytes(bs)
    out_ppm = tmp_path / "refdec.ppm"
    r = subprocess.run(
        [str(ccdec), f"--input={bpath}", f"--output={out_ppm}", "--cpu"],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, f"reference decoder failed: {r.stdout}{r.stderr}"

    ref_img, _ = read_ppm(str(out_ppm))

    # Our integer pipeline must match the reference decoder bit-exactly
    # (both are the same fixed-point semantics).
    my_int, _ = decode_bitstream(bs, integer_pipeline=True)
    np.testing.assert_allclose(ref_img, my_int, atol=1e-5)

    # Float decode within one 8-bit level.
    my_float, _ = decode_bitstream(bs)
    assert np.abs(ref_img - my_float).max() <= 1.01 / 255.0


def test_reference_decoder_reads_hypernet_bitstream(ccdec, tmp_path):
    """hypernet prediction -> quantized deltas -> bitstream -> reference
    ccdec decodes it bit-exactly vs our integer pipeline (VERDICT item 6)."""
    from coolchic_tpu.bitstream import decode_bitstream
    from coolchic_tpu.hypernet import DeltaWholeNet
    from coolchic_tpu.hypernet.inference import hypernet_to_bitstream
    from coolchic_tpu.io import read_ppm
    from coolchic_tpu.models import CoolChicConfig

    cfg = CoolChicConfig(
        img_size=(32, 32),
        n_ft_per_res=(1, 1, 1),
        layers_synthesis=("8-1-linear-relu", "X-1-linear-none"),
        dim_arm=8,
        n_hidden_layers_arm=1,
    )
    net = DeltaWholeNet(cfg, backbone_arch="resnet18", n_hidden_channels=8)
    state = net.init(jax.random.PRNGKey(0), cfg.img_size)
    state = jax.tree.map(
        lambda a: a + 0.01 * jax.random.normal(jax.random.PRNGKey(1), a.shape)
        if a.ndim >= 1
        else a,
        state,
    )
    y, x = jnp.meshgrid(jnp.linspace(0, 1, 32), jnp.linspace(0, 1, 32), indexing="ij")
    img = jnp.stack([x, y, 0.5 * (x + y)], 0)

    bs, _ = hypernet_to_bitstream(net, state, img, 1e-3)
    bpath = tmp_path / "hnet.cool"
    bpath.write_bytes(bs)
    out_ppm = tmp_path / "hnet.ppm"
    r = subprocess.run(
        [str(ccdec), f"--input={bpath}", f"--output={out_ppm}", "--cpu"],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, f"reference decoder failed: {r.stdout}{r.stderr}"
    ref_img, _ = read_ppm(str(out_ppm))
    my_int, _ = decode_bitstream(bs, integer_pipeline=True)
    np.testing.assert_allclose(ref_img, my_int, atol=1e-5)


@pytest.mark.slow
@pytest.mark.parametrize("arch", [{}, {"dim_arm": 16}], ids=["arm24", "arm16"])
def test_reference_decoder_reads_flagship_config_bitstream(ccdec, tmp_path, arch):
    """Encode direction at the FLAGSHIP operating point (dim_arm=24, 2
    hidden layers, 7 latent grids, 48-wide synthesis — the published-Kodak
    architecture) and at the RD sweep's dim_arm=16 point (the reference's
    dominant published config, 97/120 Kodak streams): our bitstream through
    the reference ccdec, bit-exact vs our integer pipeline. Round 1 only
    exercised flagship in the decode direction (published bitstreams)."""
    from coolchic_tpu.bitstream import decode_bitstream, encode_image_bitstream
    from coolchic_tpu.io import read_ppm
    from coolchic_tpu.models import CoolChicConfig, init_coolchic_params
    from coolchic_tpu.train import TrainerPhase, run_phase
    from coolchic_tpu.train.quantize_model import quantize_model_with_info

    cfg = CoolChicConfig(img_size=(128, 160), **arch)  # flagship defaults
    y, x = jnp.meshgrid(
        jnp.linspace(0, 1, 128), jnp.linspace(0, 1, 160), indexing="ij"
    )
    target = jnp.stack(
        [0.5 + 0.4 * jnp.sin(7 * x + 2 * y), y * 0.8 + 0.1, 0.5 * (x + y)], 0
    )
    params = init_coolchic_params(jax.random.PRNGKey(0), cfg)
    phase = TrainerPhase(
        lr=1e-2, max_itr=250, freq_valid=50, schedule_lr=True,
        quantizer_type="softround", quantizer_noise_type="gaussian",
        softround_temperature=(0.3, 0.1), noise_parameter=(0.25, 0.1),
    )
    params, _ = run_phase(params, target, 2e-3, jax.random.PRNGKey(1), cfg, phase)
    qparams, infos = quantize_model_with_info(params, target, 2e-3, cfg)
    nn_q = {m: {"weight": float(i.q_step_w), "bias": float(i.q_step_b)}
            for m, i in infos.items()}
    nn_g = {m: {"weight": int(i.expgol_w), "bias": int(i.expgol_b)}
            for m, i in infos.items()}
    bs = encode_image_bitstream(qparams, cfg, nn_q, nn_g)

    bpath = tmp_path / "flagship.cool"
    bpath.write_bytes(bs)
    out_ppm = tmp_path / "refdec.ppm"
    r = subprocess.run(
        [str(ccdec), f"--input={bpath}", f"--output={out_ppm}", "--cpu"],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, f"reference decoder failed: {r.stdout}{r.stderr}"
    ref_img, _ = read_ppm(str(out_ppm))
    my_int, _ = decode_bitstream(bs, integer_pipeline=True)
    np.testing.assert_allclose(ref_img, my_int, atol=1e-5)
