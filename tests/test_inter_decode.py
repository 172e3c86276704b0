"""Inter-frame decoding (P/B motion compensation): our integer decoder vs
the REFERENCE ccdec, byte-exact on the .yuv output.

The reference's own encoder bypasses its inter module
(reference: enc/component/frame.py:165-172), so no published inter
bitstreams exist; these tests handcraft conforming streams — frame 0 intra
(3 synthesis outputs), later frames P (6) / B (9) with flow_gain=1 — and
require both decoders to reconstruct identical bytes, which exercises the
full fixed-point warp/bpred path (reference: cpp/ccdecapi.cpp:496-671)."""

import subprocess

import jax
import numpy as np
import pytest

from coolchic_tpu.bitstream import decode_video_bitstream
from coolchic_tpu.bitstream.encode import encode_frame_bitstream
from coolchic_tpu.bitstream.header import GopHeader, write_gop_header
from coolchic_tpu.bitstream.inter import bpred_int, warp_int
from coolchic_tpu.models import CoolChicConfig, init_coolchic_params

pytestmark = pytest.mark.slow  # heavy compile/build; excluded from `-m 'not slow'` fast tier

H, W = 32, 48
ARCH = dict(
    img_size=(H, W),
    n_ft_per_res=(1, 1, 1),
    dim_arm=8,
    n_hidden_layers_arm=1,
)


def _rounded_params(key, cfg):
    """Random params rounded to fixed q-steps so they are directly
    encodable (no RD search needed for a decode-compliance test)."""
    params = init_coolchic_params(key, cfg, latent_init="normal")
    qs = {"arm": (2.0**-8, 2.0**-16), "synthesis": (2.0**-10, 2.0**-16)}
    for mod, (qw, qb) in qs.items():
        params[mod] = {
            "layers": [
                {
                    "weight": np.round(np.asarray(l["weight"], np.float64) / qw) * qw,
                    "bias": np.round(np.asarray(l["bias"], np.float64) / qb) * qb,
                }
                for l in params[mod]["layers"]
            ]
        }
    qu = 2.0**-12
    params["upsampling"] = {
        k: [np.round(np.asarray(h, np.float64) / qu) * qu
            for h in params["upsampling"][k]]
        for k in ("ups", "preconcat")
    }
    nn_q_step = {
        "arm": {"weight": 2.0**-8, "bias": 2.0**-16},
        "upsampling": {"weight": qu, "bias": 1.0},
        "synthesis": {"weight": 2.0**-10, "bias": 2.0**-16},
    }
    nn_expgol = {m: {"weight": 0, "bias": 0} for m in nn_q_step}
    return params, nn_q_step, nn_expgol


def _frame_payload(seed, out_channels, display_index):
    cfg = CoolChicConfig(
        out_channels=out_channels,
        layers_synthesis=(
            "16-1-linear-relu", "X-1-linear-none", "X-3-residual-relu"
        ),
        **ARCH,
    )
    params, q, eg = _rounded_params(jax.random.PRNGKey(seed), cfg)
    fb, _, _ = encode_frame_bitstream(
        params, cfg, q, eg, display_index=display_index, flow_gain=1
    )
    return fb


def _make_stream(frame_specs, intra_period, p_period):
    """frame_specs: list of (seed, out_channels, display_index) in coding
    order."""
    out = write_gop_header(
        GopHeader(
            img_size=(H, W), frame_data_type="yuv444", bitdepth=8,
            intra_period=intra_period, p_period=p_period,
        )
    )
    for seed, c, disp in frame_specs:
        out += _frame_payload(seed, c, disp)
    return out


def _ref_decode_yuv(ccdec, bs, tmp_path, n_frames):
    bs_path = tmp_path / "seq.cool"
    out_path = tmp_path / "ref_out.yuv"
    bs_path.write_bytes(bs)
    r = subprocess.run(
        [str(ccdec), f"--input={bs_path}", f"--output={out_path}", "--cpu"],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr + r.stdout
    raw = np.frombuffer(out_path.read_bytes(), np.uint8)
    return raw.reshape(n_frames, 3, H, W)


def _our_decode_yuv(bs):
    frames, _ = decode_video_bitstream(bs)
    return np.stack(
        [np.round(np.asarray(f, np.float64) * 255).astype(np.uint8) for f in frames]
    )


@pytest.mark.slow
def test_p_frame_stream_matches_reference(ccdec, tmp_path):
    """I + P (6-channel warp, flow_gain=1): byte-exact vs reference ccdec."""
    bs = _make_stream([(0, 3, 0), (1, 6, 1)], intra_period=1, p_period=1)
    ref = _ref_decode_yuv(ccdec, bs, tmp_path, 2)
    ours = _our_decode_yuv(bs)
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.slow
def test_b_frame_stream_matches_reference(ccdec, tmp_path):
    """I + P + B (9-channel bi-prediction): byte-exact vs reference ccdec.
    Coding order: display 0 (I), display 2 (P), display 1 (B)."""
    bs = _make_stream(
        [(0, 3, 0), (1, 6, 2), (2, 9, 1)], intra_period=2, p_period=2
    )
    ref = _ref_decode_yuv(ccdec, bs, tmp_path, 3)
    ours = _our_decode_yuv(bs)
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("specs,ip", [
    ([(0, 3, 0), (1, 6, 1)], 1),
    ([(0, 3, 0), (1, 6, 2), (2, 9, 1)], 2),
])
def test_c_video_path_matches_python(specs, ip):
    """The one-call C video decoder (cpp/frame_decoder.cpp
    ccz_decode_video) reproduces the python-orchestrated integer pipeline
    exactly, inter frames included."""
    bs = _make_stream(specs, intra_period=ip, p_period=ip)
    fc, info_c = decode_video_bitstream(bs)
    fp, _ = decode_video_bitstream(bs, full_info=True)
    assert "timings" in info_c  # C path taken
    for a, b in zip(fc, fp):
        np.testing.assert_array_equal(
            np.round(np.asarray(a, np.float64) * 255),
            np.round(np.asarray(b, np.float64) * 255),
        )


@pytest.mark.slow
def test_our_ccdec_binary_video_matches_reference(ccdec, tmp_path):
    """Our standalone ccdec exe writes the same .yuv bytes as the
    reference's for an inter-coded stream."""
    from coolchic_tpu.bitstream.entropy import build_decoder_binary

    bs = _make_stream(
        [(0, 3, 0), (1, 6, 2), (2, 9, 1)], intra_period=2, p_period=2
    )
    ref = _ref_decode_yuv(ccdec, bs, tmp_path, 3)
    binp = build_decoder_binary()
    bs_path = tmp_path / "seq2.cool"
    out_path = tmp_path / "ours.yuv"
    bs_path.write_bytes(bs)
    r = subprocess.run(
        [str(binp), "-i", str(bs_path), "-o", str(out_path)],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr
    ours = np.frombuffer(out_path.read_bytes(), np.uint8).reshape(3, 3, H, W)
    np.testing.assert_array_equal(ours, ref)


def test_warp_int_identity_flow():
    """Zero flow + alpha=0.5-saturating gain reduces to gain-scaled copy."""
    rng = np.random.default_rng(0)
    ref = rng.integers(0, 4096, (3, 8, 10)).astype(np.int64)
    raw = np.zeros((6, 8, 10), np.int64)
    raw[5] = 1 << 11  # alpha = 0.5 + 0.5 = 1.0
    out = warp_int(ref, raw, xy_idx=3, gain_idx=5, flow_gain=1,
                   add_residue=True)
    np.testing.assert_array_equal(out, ref)


def test_warp_int_integer_shift():
    """A flow of exactly +1 px shifts the reference (border-clamped)."""
    rng = np.random.default_rng(1)
    ref = rng.integers(0, 4096, (3, 8, 10)).astype(np.int64)
    raw = np.zeros((6, 8, 10), np.int64)
    raw[3] = 1 << 12  # dx = +1 pixel
    raw[5] = 1 << 11  # alpha = 1
    out = warp_int(ref, raw, xy_idx=3, gain_idx=5, flow_gain=1,
                   add_residue=False)
    np.testing.assert_array_equal(out[:, :, :-1], ref[:, :, 1:])
    np.testing.assert_array_equal(out[:, :, -1], ref[:, :, -1])


def test_bpred_alpha_zero_keeps_residue():
    rng = np.random.default_rng(2)
    p0 = rng.integers(0, 4096, (3, 4, 5)).astype(np.int64)
    p1 = rng.integers(0, 4096, (3, 4, 5)).astype(np.int64)
    raw = rng.integers(-100, 100, (9, 4, 5)).astype(np.int64)
    raw[5] = -(1 << 11)  # alpha -> clip(0) = 0
    out = bpred_int(p0, p1, raw, gain_idx=5)
    np.testing.assert_array_equal(out, raw[:3])


@pytest.mark.slow
def test_trained_inter_video_reference_decodable(ccdec, tmp_path):
    """End-to-end: VideoEncoder trains a real I+P GOP (motion-compensated
    P-frame forward), writes a multi-frame stream, and the REFERENCE ccdec
    decodes it byte-identically to our decoder — inter-coded streams from
    this encoder are reference-conformant (the reference's own encoder
    cannot produce them, frame.py:165-172)."""
    import jax.numpy as jnp

    from coolchic_tpu.io import write_yuv
    from coolchic_tpu.models import CoolChicConfig
    from coolchic_tpu.train.presets import Preset, TrainerPhase, Warmup
    from coolchic_tpu.video import CodingStructure, VideoEncoder

    h, w = H, W
    y, x = np.meshgrid(np.linspace(0, 1, h), np.linspace(0, 1, w), indexing="ij")
    f0 = np.stack([0.5 + 0.3 * np.sin(5 * x), y * 0.8, 0.5 * (x + y)], 0)
    f1 = np.roll(f0, 2, axis=-1)  # pure translation: P frame's best case
    seq = tmp_path / f"seq_{w}x{h}_25fps_yuv444_8b.yuv"
    for fr in (f0, f1):
        write_yuv(jnp.asarray(fr), 8, "yuv444", str(seq))

    cfg = CoolChicConfig(
        img_size=(h, w), n_ft_per_res=(1, 1, 1), dim_arm=8,
        n_hidden_layers_arm=1,
        layers_synthesis=("16-1-linear-relu", "X-1-linear-none", "X-3-residual-relu"),
    )
    phase = TrainerPhase(
        lr=1e-2, max_itr=150, freq_valid=50, patience=10000, schedule_lr=True,
        quantizer_type="softround", quantizer_noise_type="gaussian",
        softround_temperature=(0.3, 0.1), noise_parameter=(0.25, 0.1),
    )
    q_phase = TrainerPhase(
        lr=1e-3, max_itr=10, quantizer_type="ste", quantizer_noise_type="none",
        quantize_model=True, softround_temperature=(1e-4, 1e-4),
    )
    preset = Preset(preset_name="micro", all_phases=(phase, q_phase), warmup=Warmup())
    enc = VideoEncoder(
        CodingStructure(intra_period=1, p_period=1, seq_name="seq"),
        cfg, preset, lmbda=1e-3,
    )
    enc.encode(str(seq), verbose=False)
    bs = enc.to_bitstream()

    ref = _ref_decode_yuv(ccdec, bs, tmp_path, 2)
    ours = _our_decode_yuv(bs)
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.slow
def test_trained_hierarchical_gop_reference_decodable(ccdec, tmp_path):
    """4-frame hierarchical GOP (I P B B at depths 0/1/2/2, intra_period=4,
    p_period=4... compute_gop gives I + P(display 4)? -> use intra_period=2:
    I, P(display 2), B(display 1)) trained end-to-end and decoded
    byte-exactly by the reference ccdec."""
    import jax.numpy as jnp

    from coolchic_tpu.io import write_yuv
    from coolchic_tpu.models import CoolChicConfig
    from coolchic_tpu.train.presets import Preset, TrainerPhase, Warmup
    from coolchic_tpu.video import CodingStructure, VideoEncoder

    h, w = H, W
    y, x = np.meshgrid(np.linspace(0, 1, h), np.linspace(0, 1, w), indexing="ij")
    f0 = np.stack([0.5 + 0.3 * np.sin(5 * x), y * 0.8, 0.5 * (x + y)], 0)
    frames = [f0, np.roll(f0, 1, -1), np.roll(f0, 2, -1)]
    seq = tmp_path / f"hier_{w}x{h}_25fps_yuv444_8b.yuv"
    for fr in frames:
        write_yuv(jnp.asarray(fr), 8, "yuv444", str(seq))

    cfg = CoolChicConfig(
        img_size=(h, w), n_ft_per_res=(1, 1, 1), dim_arm=8,
        n_hidden_layers_arm=1,
        layers_synthesis=("16-1-linear-relu", "X-1-linear-none", "X-3-residual-relu"),
    )
    phase = TrainerPhase(
        lr=1e-2, max_itr=100, freq_valid=50, patience=10000, schedule_lr=True,
        quantizer_type="softround", quantizer_noise_type="gaussian",
        softround_temperature=(0.3, 0.1), noise_parameter=(0.25, 0.1),
    )
    q_phase = TrainerPhase(
        lr=1e-3, max_itr=10, quantizer_type="ste", quantizer_noise_type="none",
        quantize_model=True, softround_temperature=(1e-4, 1e-4),
    )
    preset = Preset(preset_name="micro", all_phases=(phase, q_phase), warmup=Warmup())
    cs = CodingStructure(intra_period=2, p_period=2)
    # sanity on the structure itself: I (disp 0), P (disp 2), B (disp 1)
    types = {f.display_order: f.frame_type for f in cs.frames}
    assert types == {0: "I", 2: "P", 1: "B"}
    enc = VideoEncoder(cs, cfg, preset, lmbda=1e-3)
    enc.encode(str(seq), verbose=False)
    bs = enc.to_bitstream()

    ref = _ref_decode_yuv(ccdec, bs, tmp_path, 3)
    ours = _our_decode_yuv(bs)
    np.testing.assert_array_equal(ours, ref)
