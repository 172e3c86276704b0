"""Multi-stream parallel decode (cpp/frame_decoder.cpp ccz_decode_many).

Streams are decoded concurrently on a C thread pool by the same
single-stream entry points as the serial paths, so outputs must be
bit-identical to serial decodes. The reference decoder is strictly one
stream per process (reference: cpp/ccdecapi.cpp main); this is the
production serving shape on top of the same format. Note: speedup is a
non-goal of this test (CI boxes may have one core); only exactness and
the API contract are asserted.
"""

import glob

import numpy as np
import pytest

from coolchic_tpu.bitstream import decode_bitstream, decode_bitstreams, \
    decode_video_bitstream

pytestmark = pytest.mark.slow  # builds libccz; excluded from the fast tier

KODAK = sorted(glob.glob("/root/reference/results/image/kodak/bitstreams/*.cool"))
JVET = sorted(
    glob.glob("/root/reference/results/image/jvet/bitstreams/C-*-lmbda-002*.cool")
)


@pytest.mark.skipif(not KODAK, reason="published kodak bitstreams unavailable")
def test_parallel_image_decode_bit_identical():
    datas = [open(p, "rb").read() for p in KODAK[:8]]
    serial = [decode_bitstream(d, integer_pipeline=True)[0] for d in datas]
    par = decode_bitstreams(datas, n_threads=4)
    assert len(par) == len(datas)
    for s, (img, info) in zip(serial, par):
        assert info["kind"] == "image"
        assert np.array_equal(s, img)
        assert info["timings"]["total_sec"] > 0


@pytest.mark.skipif(not JVET, reason="published jvet bitstreams unavailable")
def test_parallel_yuv_decode_matches_video_path():
    """Non-rgb streams ride the video entry point (kind='video'); outputs
    must equal serial decode_video_bitstream frames exactly."""
    datas = [open(p, "rb").read() for p in JVET[:3]]
    par = decode_bitstreams(datas, n_threads=3)
    for d, (frames, info) in zip(datas, par):
        assert info["kind"] == "video"
        ref_frames, _ = decode_video_bitstream(d)
        assert len(frames) == len(ref_frames)
        for a, b in zip(frames, ref_frames):
            assert np.array_equal(a, b)


@pytest.mark.skipif(len(KODAK) < 2 or not JVET,
                    reason="published bitstreams unavailable")
def test_parallel_mixed_kinds_and_single_thread():
    """A mixed image+video batch keeps per-stream kinds straight, and
    n_threads=1 (the default on a 1-core box) is exactly serial."""
    datas = [open(KODAK[0], "rb").read(), open(JVET[0], "rb").read(),
             open(KODAK[1], "rb").read()]
    par = decode_bitstreams(datas, n_threads=1)
    assert [info["kind"] for _, info in par] == ["image", "video", "image"]
    img0 = decode_bitstream(datas[0], integer_pipeline=True)[0]
    assert np.array_equal(par[0][0], img0)


def test_empty_batch():
    assert decode_bitstreams([]) == []


@pytest.mark.skipif(not KODAK, reason="published kodak bitstreams unavailable")
def test_decode_cli_directory_mode(tmp_path):
    """`python -m coolchic_tpu.decode -i dir -o dir --threads N` decodes
    every stream; outputs byte-identical to single-stream --int decodes."""
    import shutil

    from coolchic_tpu.decode import main

    indir = tmp_path / "in"
    outdir = tmp_path / "out"
    indir.mkdir()
    for p in KODAK[:2]:
        shutil.copy(p, indir)
    assert main(["-i", str(indir), "-o", str(outdir), "--threads", "2"]) == 0
    for p in KODAK[:2]:
        stem = p.rsplit("/", 1)[-1].removesuffix(".cool")
        single = tmp_path / f"{stem}.ppm"
        assert main(["-i", p, "-o", str(single), "--int"]) == 0
        assert single.read_bytes() == (outdir / f"{stem}.ppm").read_bytes()


@pytest.mark.skipif(not KODAK, reason="published kodak bitstreams unavailable")
def test_grid_parallel_arm_decode_bit_identical():
    """CCZ_ARM_THREADS>1 decodes a stream's latent grids concurrently
    (independent CABAC byte ranges); output must equal serial decode.
    The flag is read once per process, so each side runs in a fresh
    subprocess."""
    import os
    import subprocess
    import sys

    code = (
        "import numpy as np, hashlib\n"
        "from coolchic_tpu.bitstream.decode import decode_bitstream\n"
        "h = hashlib.sha256()\n"
        f"for p in {KODAK[:3]!r}:\n"
        "    img, _ = decode_bitstream(open(p, 'rb').read(), integer_pipeline=True)\n"
        "    h.update(np.round(img * 255).astype(np.int32).tobytes())\n"
        "print(h.hexdigest())\n"
    )
    env = dict(os.environ, PYTHONPATH="/root/repo:/root/.axon_site")
    outs = []
    for threads in ("1", "4"):
        p = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=300, env=dict(env, CCZ_ARM_THREADS=threads),
        )
        assert p.returncode == 0, p.stderr[-500:]
        outs.append(p.stdout)
    assert outs[0] == outs[1]


@pytest.mark.skipif(not KODAK, reason="published kodak bitstreams unavailable")
def test_ccdec_exe_multi_input(tmp_path):
    """The standalone ccdec decodes repeated -i/-o pairs on a pool; each
    output must be byte-identical to its single-stream decode."""
    import subprocess

    from coolchic_tpu.bitstream.entropy import build_decoder_binary

    exe = build_decoder_binary()
    pairs = []
    for i, p in enumerate(KODAK[:3]):
        pairs += ["-i", p, "-o", str(tmp_path / f"multi_{i}.ppm")]
    subprocess.run([exe] + pairs + ["-t", "2"], check=True, timeout=300)
    for i, p in enumerate(KODAK[:3]):
        single = tmp_path / f"single_{i}.ppm"
        subprocess.run([exe, "-i", p, "-o", str(single)], check=True,
                       timeout=300)
        assert single.read_bytes() == (tmp_path / f"multi_{i}.ppm").read_bytes()
