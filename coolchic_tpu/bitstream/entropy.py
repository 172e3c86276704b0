"""ctypes bindings for the host C++ entropy backend (cpp/entropy_api.cpp).

Builds libccz.so on first use (g++ -O3). The backend implements the
reference's encoder-side entropy API (reference: coolchic/cpp/ccencapi.cpp)
without pybind11.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_CPP_DIR = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..", "cpp")
)
_LIB_PATH = os.path.join(_CPP_DIR, "libccz.so")
_SOURCES = ["entropy_api.cpp", "arm_decode.cpp", "ups_syn_int.cpp",
            "frame_decoder.cpp"]
_HEADERS = ["cabac.hpp", "gen_contexts.inc"]
_BIN_SOURCES = _SOURCES + ["ccdec_main.cpp"]
_BIN_PATH = os.path.join(_CPP_DIR, "ccdec")

_lib: Optional[ctypes.CDLL] = None


_HASH_PATH = _LIB_PATH + ".srchash"


def _source_hash(sources=None) -> str:
    """Content hash of every source/header feeding the build (mtimes are
    unreliable after a fresh clone, where all files share checkout time and
    a stale committed .so built with -march=native elsewhere could load)."""
    import hashlib

    h = hashlib.sha256()
    for f in (sources or _SOURCES) + _HEADERS:
        p = os.path.join(_CPP_DIR, f)
        if os.path.exists(p):
            with open(p, "rb") as fh:
                h.update(f.encode())
                h.update(fh.read())
    return h.hexdigest()


def _needs_build() -> bool:
    if not os.path.exists(_LIB_PATH) or not os.path.exists(_HASH_PATH):
        return True
    with open(_HASH_PATH) as f:
        return f.read().strip() != _source_hash()


def build_library() -> str:
    inc = os.path.join(_CPP_DIR, "gen_contexts.inc")
    if not os.path.exists(inc):
        from coolchic_tpu.bitstream.contexts import emit_inc_file

        emit_inc_file(inc)
    cmd = (
        ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
         "-pthread"]
        + [os.path.join(_CPP_DIR, s) for s in _SOURCES]
        + ["-o", _LIB_PATH]
    )
    subprocess.run(cmd, check=True, capture_output=True)
    with open(_HASH_PATH, "w") as f:
        f.write(_source_hash())
    return _LIB_PATH


def build_decoder_binary(force: bool = False) -> str:
    """Build the standalone ``ccdec`` decoder executable
    (reference: coolchic/cpp/CMakeLists.txt ccdec target)."""
    bin_hash_path = _BIN_PATH + ".srchash"
    want = _source_hash(_BIN_SOURCES)
    if (
        not force
        and os.path.exists(_BIN_PATH)
        and os.path.exists(bin_hash_path)
        and open(bin_hash_path).read().strip() == want
    ):
        return _BIN_PATH
    inc = os.path.join(_CPP_DIR, "gen_contexts.inc")
    if not os.path.exists(inc):
        from coolchic_tpu.bitstream.contexts import emit_inc_file

        emit_inc_file(inc)
    cmd = (
        ["g++", "-O3", "-march=native", "-std=c++17", "-pthread"]
        + [os.path.join(_CPP_DIR, s) for s in _BIN_SOURCES]
        + ["-o", _BIN_PATH]
    )
    subprocess.run(cmd, check=True, capture_output=True)
    with open(bin_hash_path, "w") as f:
        f.write(want)
    return _BIN_PATH


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if _needs_build():
        build_library()
    lib = ctypes.CDLL(_LIB_PATH)

    u8p = ctypes.POINTER(ctypes.c_uint8)
    i32p = ctypes.POINTER(ctypes.c_int32)

    lib.ccz_buffer_free.argtypes = [u8p]
    lib.ccz_code_wb.restype = ctypes.c_int
    lib.ccz_code_wb.argtypes = [
        i32p,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(u8p),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.ccz_code_latent_layer.argtypes = [
        i32p,
        i32p,
        i32p,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(u8p),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.ccz_decode_latent_layer.argtypes = [
        u8p,
        ctypes.c_int,
        i32p,
        i32p,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        i32p,
    ]
    lib.ccz_wb_decoder_new.restype = ctypes.c_void_p
    lib.ccz_wb_decoder_new.argtypes = [u8p, ctypes.c_int]
    lib.ccz_wb_decoder_continue.argtypes = [
        ctypes.c_void_p,
        ctypes.c_int,
        ctypes.c_int,
        i32p,
    ]
    lib.ccz_wb_decoder_free.argtypes = [ctypes.c_void_p]
    lib.ccz_ups_syn_int.argtypes = [
        i32p, i32p, i32p,  # latents, heights, widths
        ctypes.c_int, ctypes.c_int, ctypes.c_int,  # n_res, ups_k, pre_k
        i32p, i32p,  # ups kernels, preconcat kernels
        i32p, i32p, i32p,  # syn weights, biases, desc
        ctypes.c_int,  # n_syn_layers
        i32p,  # out
    ]
    lib.ccz_decode_arm_latent_layer.argtypes = [
        u8p, ctypes.c_int,  # data
        i32p, i32p,  # weights, biases
        ctypes.c_int, ctypes.c_int,  # dim_arm, n_hidden
        i32p, i32p,  # ctx offsets dy, dx
        ctypes.c_int, ctypes.c_int, ctypes.c_int,  # h, w, blk
        i32p,  # out
    ]
    lib.ccz_probe_bitstream.restype = ctypes.c_int
    lib.ccz_probe_bitstream.argtypes = [u8p, ctypes.c_int, i32p]
    lib.ccz_decode_image.restype = ctypes.c_int
    lib.ccz_decode_image.argtypes = [
        u8p, ctypes.c_int, i32p, ctypes.POINTER(ctypes.c_double),
    ]
    lib.ccz_decode_video.restype = ctypes.c_int
    lib.ccz_decode_video.argtypes = [
        u8p, ctypes.c_int, i32p, ctypes.POINTER(ctypes.c_double),
    ]
    _lib = lib
    return lib


def _as_i32(a) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(a).reshape(-1), np.int32)


def _i32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def code_wb(values, use_count: int = -1) -> Tuple[bytes, int]:
    """Entropy-code integer weights/biases. Returns (bytes, exp-Golomb order
    used); use_count=-1 searches orders 0..12 for the smallest stream
    (reference: ccencapi.cpp:97-177)."""
    lib = _load()
    v = _as_i32(values)
    out = ctypes.POINTER(ctypes.c_uint8)()
    out_len = ctypes.c_int()
    count = lib.ccz_code_wb(
        _i32p(v), len(v), use_count, ctypes.byref(out), ctypes.byref(out_len)
    )
    data = ctypes.string_at(out, out_len.value)
    lib.ccz_buffer_free(out)
    return data, count


class WbDecoder:
    """Streaming decoder for concatenated weight/bias substreams
    (reference: ccencapi.cpp:412-454)."""

    def __init__(self, data: bytes):
        self._lib = _load()
        self._buf = np.frombuffer(data, np.uint8).copy()
        self._h = self._lib.ccz_wb_decoder_new(
            self._buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(self._buf)
        )

    def decode_continue(self, n: int, count: int) -> np.ndarray:
        out = np.empty(n, np.int32)
        self._lib.ccz_wb_decoder_continue(self._h, n, count, _i32p(out))
        return out

    def close(self):
        if self._h:
            self._lib.ccz_wb_decoder_free(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def code_latent_layer(xs, mus, log_scales, h: int, w: int, blk: int = 16) -> bytes:
    """Entropy-code one 2-D latent grid. xs are integer latents; mus /
    log_scales are fixed-point ints at 8 fractional bits (x256)
    (reference: ccencapi.cpp:179-365, called from enc/bitstream/encode.py
    with mu*256 / log_scale*256)."""
    lib = _load()
    xs, mus, ls = _as_i32(xs), _as_i32(mus), _as_i32(log_scales)
    assert len(xs) == h * w == len(mus) == len(ls)
    out = ctypes.POINTER(ctypes.c_uint8)()
    out_len = ctypes.c_int()
    lib.ccz_code_latent_layer(
        _i32p(xs), _i32p(mus), _i32p(ls), h, w, blk,
        ctypes.byref(out), ctypes.byref(out_len),
    )
    data = ctypes.string_at(out, out_len.value)
    lib.ccz_buffer_free(out)
    return data


def decode_arm_latent_layer(
    data: bytes,
    int_layers,
    dim_arm: int,
    n_hidden: int,
    h: int,
    w: int,
    blk: int = 16,
) -> np.ndarray:
    """Sequential autoregressive decode of one latent grid: the C++ backend
    runs CABAC + the int32 ARM pixel by pixel (reference:
    cpp/cc-frame-decoder.cpp run_arm). ``int_layers`` is the output of
    armint.integerize_arm_params."""
    from coolchic_tpu.models.arm import MASK_SIZE, context_offsets

    lib = _load()
    weights = _as_i32(np.concatenate([l["weight"].reshape(-1) for l in int_layers]))
    biases = _as_i32(np.concatenate([l["bias"].reshape(-1) for l in int_layers]))
    offs = context_offsets(dim_arm)
    dy = _as_i32([o[0] for o in offs])
    dx = _as_i32([o[1] for o in offs])
    buf = np.frombuffer(data, np.uint8).copy()
    out = np.empty(h * w, np.int32)
    lib.ccz_decode_arm_latent_layer(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(buf),
        _i32p(weights), _i32p(biases), dim_arm, n_hidden,
        _i32p(dy), _i32p(dx), h, w, blk, _i32p(out),
    )
    return out.reshape(h, w)


def ups_syn_int(
    latents,  # list of [1, h_i, w_i] int arrays, full-res first
    heights,
    widths,
    ups_k_size: int,
    pre_k_size: int,
    ups_kernels_int: np.ndarray,  # [(n_res-1) * ups_k_size] 12-frac ints
    pre_kernels_int: np.ndarray,  # [(n_res-1) * pre_k_size]
    syn_w_int: np.ndarray,  # concatenated 12-frac ints (OIHW)
    syn_b_int: np.ndarray,  # concatenated 24-frac ints
    syn_desc: np.ndarray,  # [n_layers, 4] = out_ft, ks, residual, relu
) -> np.ndarray:
    """Fixed-point integer upsample + synthesize (cpp/ups_syn_int.cpp).
    Returns [out_ft, H, W] int32 at 12 fractional bits."""
    lib = _load()
    n_res = len(heights)
    lat = _as_i32(np.concatenate([np.asarray(l).reshape(-1) for l in latents]))
    hh, ww = _as_i32(heights), _as_i32(widths)
    uk, pk = _as_i32(ups_kernels_int), _as_i32(pre_kernels_int)
    sw, sb = _as_i32(syn_w_int), _as_i32(syn_b_int)
    desc = _as_i32(np.asarray(syn_desc).reshape(-1))
    n_layers = len(desc) // 4
    out_ft = int(desc[-4])
    out = np.empty(out_ft * heights[0] * widths[0], np.int32)
    lib.ccz_ups_syn_int(
        _i32p(lat), _i32p(hh), _i32p(ww), n_res, ups_k_size, pre_k_size,
        _i32p(uk), _i32p(pk), _i32p(sw), _i32p(sb), _i32p(desc), n_layers,
        _i32p(out),
    )
    return out.reshape(out_ft, heights[0], widths[0])


def probe_bitstream(data: bytes) -> Optional[dict]:
    """Parse headers without decoding: dict with img_size / c_out / bitdepth /
    frame_data_type / n_frames, or None if the C parser rejects the stream."""
    lib = _load()
    buf = np.frombuffer(data, np.uint8).copy()
    info = np.zeros(6, np.int32)
    rc = lib.ccz_probe_bitstream(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(buf), _i32p(info)
    )
    if rc != 0:
        return None
    return {
        "img_size": (int(info[0]), int(info[1])),
        "c_out": int(info[2]),
        "bitdepth": int(info[3]),
        "frame_data_type": ["rgb", "yuv420", "yuv444"][int(info[4])],
        "n_frames": int(info[5]),
    }


def decode_image_cc(data: bytes) -> Optional[Tuple[np.ndarray, dict]]:
    """Whole-frame decode in one C call (header parse -> NN decode -> ARM ->
    integer ups/syn -> bitdepth rounding), the no-Python-overhead fast path
    (reference: cpp/cc-frame-decoder.cpp:1152-1168 decode_frame).

    Returns ([c, H, W] float image in [0, 1], info with headers/timings), or
    None when the stream uses a configuration the C path doesn't cover
    (n_ft_per_res != 1, unknown dim_arm) — callers fall back to
    decode_bitstream.
    """
    info = probe_bitstream(data)
    if info is None or info["frame_data_type"] != "rgb" or info["n_frames"] != 1:
        return None
    lib = _load()
    buf = np.frombuffer(data, np.uint8).copy()
    h, w = info["img_size"]
    out = np.empty(info["c_out"] * h * w, np.int32)
    times = (ctypes.c_double * 4)()
    rc = lib.ccz_decode_image(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(buf),
        _i32p(out), times,
    )
    if rc < 0:
        return None
    max_dyn = 2.0 ** info["bitdepth"] - 1.0
    img = out.reshape(info["c_out"], h, w).astype(np.float32) / max_dyn
    info["timings"] = {
        "nn_sec": times[0], "arm_sec": times[1], "ups_syn_sec": times[2],
        "total_sec": times[3],
    }
    return img, info


def decode_video_cc(data: bytes) -> Optional[Tuple[np.ndarray, dict]]:
    """Whole-GOP decode in one C call: per-frame decode + fixed-point inter
    prediction (warp/bpred) + reference-storage round-trips
    (cpp/frame_decoder.cpp ccz_decode_video; reference: ccdecapi.cpp
    cc_decode_* frame loop). Returns ([n_frames, 3, H, W] int32 samples in
    display order, info), or None for configurations the C path doesn't
    cover (callers fall back to the python pipeline)."""
    info = probe_bitstream(data)
    if info is None:
        return None
    lib = _load()
    buf = np.frombuffer(data, np.uint8).copy()
    h, w = info["img_size"]
    out = np.empty(info["n_frames"] * 3 * h * w, np.int32)
    times = (ctypes.c_double * 4)()
    rc = lib.ccz_decode_video(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(buf),
        _i32p(out), times,
    )
    if rc < 0:
        return None
    info["timings"] = {
        "nn_sec": times[0], "arm_sec": times[1], "ups_syn_sec": times[2],
        "total_sec": times[3],
    }
    return out.reshape(info["n_frames"], 3, h, w), info


def decode_many_cc(
    datas: list, n_threads: Optional[int] = None
) -> Optional[list]:
    """Decode independent bitstreams concurrently on a C thread pool
    (cpp/frame_decoder.cpp ccz_decode_many): plain data parallelism over
    streams, each decoded by the same single-stream entry points, so outputs
    are bit-identical to serial decodes. The reference decoder is strictly
    one stream per process (reference: cpp/ccdecapi.cpp main).

    Per stream the result mirrors the serial fast paths: rgb single-frame
    streams return ([c, H, W] float image in [0, 1], info) exactly like
    ``decode_image_cc``; everything else returns ([n_frames, 3, H, W] int32
    display-ordered samples, info) exactly like ``decode_video_cc``
    (``info["kind"]`` says which). Returns None if any header fails to
    parse; a stream the C decoder rejects gets ``None`` in its slot (caller
    falls back to the python pipeline for that stream only).
    """
    if not datas:
        return []
    lib = _load()
    infos = [probe_bitstream(d) for d in datas]
    if any(i is None for i in infos):
        return None
    n = len(datas)
    bufs = [np.frombuffer(d, np.uint8).copy() for d in datas]
    kinds, outs = [], []
    for info in infos:
        h, w = info["img_size"]
        if info["n_frames"] == 1 and info["frame_data_type"] == "rgb":
            kinds.append(0)
            outs.append(np.empty(info["c_out"] * h * w, np.int32))
        else:
            kinds.append(1)
            outs.append(np.empty(info["n_frames"] * 3 * h * w, np.int32))
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i32p_t = ctypes.POINTER(ctypes.c_int32)
    data_arr = (u8p * n)(*[b.ctypes.data_as(u8p) for b in bufs])
    out_arr = (i32p_t * n)(*[_i32p(o) for o in outs])
    len_arr = np.array([len(b) for b in bufs], np.int32)
    kind_arr = np.array(kinds, np.int32)
    times = np.zeros((n, 4), np.float64)
    rcs = np.zeros(n, np.int32)
    if n_threads is None:
        n_threads = min(n, os.cpu_count() or 1)
    lib.ccz_decode_many(
        data_arr, _i32p(len_arr), n, out_arr, _i32p(kind_arr),
        times.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        int(n_threads), _i32p(rcs),
    )
    results: list = []
    for i, (info, kind, out) in enumerate(zip(infos, kinds, outs)):
        if rcs[i] < 0:
            results.append(None)
            continue
        h, w = info["img_size"]
        info = dict(info, kind="image" if kind == 0 else "video")
        info["timings"] = {
            "nn_sec": times[i, 0], "arm_sec": times[i, 1],
            "ups_syn_sec": times[i, 2], "total_sec": times[i, 3],
        }
        if kind == 0:
            max_dyn = 2.0 ** info["bitdepth"] - 1.0
            results.append(
                (out.reshape(info["c_out"], h, w).astype(np.float32) / max_dyn,
                 info)
            )
        else:
            results.append((out.reshape(info["n_frames"], 3, h, w), info))
    return results


def decode_latent_layer(data: bytes, mus, log_scales, h: int, w: int, blk: int = 16) -> np.ndarray:
    """Teacher-forced latent-layer decode (round-trip testing; the real
    decoder derives mu/sigma sequentially with the integer ARM)."""
    lib = _load()
    mus, ls = _as_i32(mus), _as_i32(log_scales)
    buf = np.frombuffer(data, np.uint8).copy()
    out = np.empty(h * w, np.int32)
    lib.ccz_decode_latent_layer(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(buf),
        _i32p(mus), _i32p(ls), h, w, blk, _i32p(out),
    )
    return out.reshape(h, w)
