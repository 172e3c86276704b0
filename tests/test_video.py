"""Coding structure, warping, video encoder orchestration."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from coolchic_tpu.models import CoolChicConfig
from coolchic_tpu.train.presets import Preset, TrainerPhase, Warmup, WarmupPhase
from coolchic_tpu.video import (
    CodingStructure,
    TrainingExitCode,
    VideoEncoder,
    lmbda_from_depth,
    load_video_encoder,
    warp,
)

pytestmark = pytest.mark.slow  # heavy compile/build; excluded from `-m 'not slow'` fast tier


def test_all_intra():
    cs = CodingStructure(intra_period=0, p_period=0)
    assert cs.get_number_of_frames() == 1
    assert cs.frames[0].frame_type == "I"


def test_low_delay_p():
    # I0 -> P1 -> P2 -> ... -> P8 (reference: codingstructure.py:246-248)
    cs = CodingStructure(intra_period=8, p_period=1)
    assert cs.get_number_of_frames() == 9
    assert cs.frames[0].frame_type == "I"
    for f in cs.frames[1:]:
        assert f.frame_type == "P"
        assert f.index_references == [f.display_order - 1]
        assert f.coding_order == f.display_order


def test_random_access_hierarchy():
    # intra_period=8 p_period=8: hierarchical B tree
    # (reference: codingstructure.py:250-255).
    cs = CodingStructure(intra_period=8, p_period=8)
    assert cs.get_number_of_frames() == 9
    by_disp = {f.display_order: f for f in cs.frames}
    assert by_disp[8].frame_type == "P" and by_disp[8].index_references == [0]
    assert by_disp[4].frame_type == "B" and by_disp[4].index_references == [0, 8]
    assert by_disp[2].index_references == [0, 4]
    assert by_disp[6].index_references == [4, 8]
    assert by_disp[1].index_references == [0, 2]
    # Depths: P=1, B4=2, B2/B6=3, B1..=4.
    assert by_disp[8].depth == 1 and by_disp[4].depth == 2
    assert by_disp[2].depth == 3 and by_disp[1].depth == 4
    # Coding order: I0 first, then P8, then B4...
    assert by_disp[0].coding_order == 0
    assert by_disp[8].coding_order == 1
    assert by_disp[4].coding_order == 2


def test_lmbda_from_depth():
    assert lmbda_from_depth(0, 1e-3) == 1e-3
    assert lmbda_from_depth(2, 1e-3) == pytest.approx(2.25e-3)


def test_warp_zero_flow_is_identity():
    x = jnp.asarray(np.random.RandomState(0).rand(3, 8, 10).astype(np.float32))
    out = warp(x, jnp.zeros((2, 8, 10)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


def test_warp_integer_shift():
    x = jnp.asarray(np.random.RandomState(0).rand(1, 6, 8).astype(np.float32))
    # flow dx=+1 means sample from x+1: out[y, x] = in[y, x+1].
    flow = jnp.zeros((2, 6, 8)).at[0].set(1.0)
    out = np.asarray(warp(x, flow))
    np.testing.assert_allclose(out[0, :, :-1], np.asarray(x)[0, :, 1:], atol=1e-6)


@pytest.mark.slow
def test_video_encoder_two_frames(tmp_path):
    """Encode a 2-frame low-delay sequence end to end (YUV444 file),
    checkpoint + resume, write the multi-frame bitstream."""
    from coolchic_tpu.io import write_yuv

    h, w = 16, 24
    rng = np.random.RandomState(0)
    yy, xx = np.meshgrid(np.linspace(0, 1, h), np.linspace(0, 1, w), indexing="ij")
    f0 = np.stack([xx, yy, 0.5 * (xx + yy)], 0).astype(np.float32)
    f1 = np.clip(f0 + 0.05, 0, 1)
    path = tmp_path / f"seq_{w}x{h}_25fps_444_8b.yuv"
    write_yuv(f0, 8, "yuv444", str(path))
    write_yuv(f1, 8, "yuv444", str(path))

    cfg = CoolChicConfig(
        img_size=(h, w),
        n_ft_per_res=(1, 1, 1),
        layers_synthesis=("8-1-linear-relu", "X-1-linear-none"),
        dim_arm=8,
        n_hidden_layers_arm=1,
    )
    phase = TrainerPhase(
        lr=1e-2,
        max_itr=60,
        freq_valid=30,
        schedule_lr=True,
        quantizer_type="softround",
        quantizer_noise_type="gaussian",
        softround_temperature=(0.3, 0.1),
        noise_parameter=(0.25, 0.1),
    )
    q_phase = TrainerPhase(
        lr=1e-4,
        max_itr=10,
        quantizer_type="ste",
        quantizer_noise_type="none",
        quantize_model=True,
        softround_temperature=(1e-4, 1e-4),
    )
    preset = Preset(preset_name="micro", all_phases=(phase, q_phase), warmup=Warmup())

    cs = CodingStructure(intra_period=1, p_period=1, seq_name="seq")
    enc = VideoEncoder(cs, cfg, preset, lmbda=1e-3)
    code = enc.encode(str(path), workdir=tmp_path, verbose=False)
    assert code == TrainingExitCode.END
    assert len(enc.all_frame_encoders) == 2
    # P-frame got the depth-scaled lambda.
    assert enc.all_frame_encoders["1"].manager.lmbda == pytest.approx(1.5e-3)

    # Checkpoint round trip.
    loaded = load_video_encoder(tmp_path / "video_encoder.pkl")
    assert len(loaded.all_frame_encoders) == 2

    # Multi-frame bitstream round-trips through the decoder.
    bs = loaded.to_bitstream()
    from coolchic_tpu.bitstream import decode_video_bitstream

    frames, info = decode_video_bitstream(bs)
    gop = info["gop_header"]
    assert gop.intra_period == 1 and gop.img_size == (h, w)
    assert gop.frame_data_type == "yuv444"
    assert len(frames) == 2
    for dec, orig, key in zip(frames, [f0, f1], ["0", "1"]):
        psnr_dec = -10 * np.log10(np.mean((dec - orig) ** 2) + 1e-10)
        # Decoded PSNR matches the encoder-side estimate. The reference
        # sanity margin is 0.1 dB (test/sanity_check.py:108-115) for fully
        # trained models; this 10-iteration micro-model drifts marginally
        # more. P frames carry a little extra: the encoder's references
        # are bit-exact decoder output (VideoEncoder._integer_reconstruct
        # round-trips the real bitstream) and eval-mode warping runs the
        # decoder's fixed-point math (inter_predict_int), so the remaining
        # drift is only the float-vs-integer synthesis of the 12-frac raw
        # output on a barely-trained model (~0.19 dB here).
        margin = 0.2 if key == "0" else 0.3
        assert abs(psnr_dec - loaded.all_frame_encoders[key].psnr_db) < margin
    # The stored per-frame reconstruction IS the decoder output, exactly.
    for k, dec in zip(["0", "1"], frames):
        assert np.array_equal(
            np.round(dec * 255),
            np.round(loaded.all_frame_encoders[k].decoded * 255),
        )
