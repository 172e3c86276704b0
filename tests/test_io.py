"""I/O round-trips: PNG, PPM (8/16-bit), planar YUV 420/444."""

import numpy as np
import pytest

from coolchic_tpu.io import (
    convert_420_to_444,
    convert_444_to_420,
    load_frame_data_from_file,
    read_png,
    read_ppm,
    read_yuv,
    write_png,
    write_ppm,
    write_yuv,
)


def _rand_img(c=3, h=12, w=16, seed=0):
    return np.random.RandomState(seed).rand(c, h, w).astype(np.float32)


def test_png_roundtrip(tmp_path):
    img = _rand_img()
    p = str(tmp_path / "x.png")
    write_png(img, p)
    back, bitdepth = read_png(p)
    assert bitdepth == 8
    np.testing.assert_allclose(back, np.round(img * 255) / 255, atol=1e-6)


@pytest.mark.parametrize("bitdepth", [8, 16])
def test_ppm_roundtrip(tmp_path, bitdepth):
    img = _rand_img()
    p = str(tmp_path / "x.ppm")
    write_ppm(img, bitdepth, p)
    back, bd = read_ppm(p)
    assert bd == bitdepth
    mv = 2**bitdepth - 1
    np.testing.assert_allclose(back, np.round(img * mv) / mv, atol=1e-6)


@pytest.mark.parametrize("bitdepth", [8, 10])
def test_yuv444_roundtrip(tmp_path, bitdepth):
    img = _rand_img(3, 8, 8)
    tag = "8b" if bitdepth == 8 else "10b"
    p = str(tmp_path / f"seq_8x8_25fps_444_{tag}.yuv")
    write_yuv(img, bitdepth, "yuv444", p)
    write_yuv(img * 0.5, bitdepth, "yuv444", p)  # second frame appends
    back = read_yuv(p, 0, "yuv444", bitdepth)
    mv = 2**bitdepth - 1
    np.testing.assert_allclose(back, np.round(img * mv) / mv, atol=1e-6)
    back1 = read_yuv(p, 1, "yuv444", bitdepth)
    np.testing.assert_allclose(back1, np.round(img * 0.5 * mv) / mv, atol=1e-6)


def test_yuv420_roundtrip(tmp_path):
    yuv = {
        "y": _rand_img(1, 8, 8, 1),
        "u": _rand_img(1, 4, 4, 2),
        "v": _rand_img(1, 4, 4, 3),
    }
    p = str(tmp_path / "seq_8x8_25fps_420_8b.yuv")
    write_yuv(yuv, 8, "yuv420", p)
    back = read_yuv(p, 0, "yuv420", 8)
    for k in ("y", "u", "v"):
        np.testing.assert_allclose(back[k], np.round(yuv[k] * 255) / 255, atol=1e-6)


def test_420_444_conversion():
    img = _rand_img(3, 8, 8)
    yuv420 = convert_444_to_420(img)
    assert yuv420["u"].shape == (1, 4, 4)
    # Nearest downsampling takes the top-left of each 2x2 block.
    np.testing.assert_allclose(yuv420["u"][0], img[1, ::2, ::2])
    up = convert_420_to_444(yuv420)
    assert up.shape == (3, 8, 8)
    np.testing.assert_allclose(up[0], img[0])


def test_load_frame_dispatcher(tmp_path):
    img = _rand_img()
    p = str(tmp_path / "x.png")
    write_png(img, p)
    fd = load_frame_data_from_file(p)
    assert fd.frame_data_type == "rgb" and fd.bitdepth == 8
    assert fd.img_size == (12, 16)
