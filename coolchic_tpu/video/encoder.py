"""Video encoder orchestration: per-frame overfitting in coding order.

Re-design of the reference ``VideoEncoder`` god-object (reference:
coolchic/enc/component/video.py:37-591) as a thin host-side loop over the
jitted per-frame pipeline: frames are encoded in coding order with
per-depth lambda scaling, state checkpoints after every frame enable
time-sliced requeue (the reference's SLURM REQUEUE protocol,
video.py:394-397, enc/utils/misc.py:43-64).

Inter frames are trained with the motion-compensated forward
(models/coolchic.py frame_forward + video/intercoding.py inter_predict):
P/B frames synthesize 6/9 channels (residue + flow + gains) warped against
the decoded reference frames, exactly what the reference *decoder*
reconstructs (cpp/ccdecapi.cpp process_inter) — the reference encoder has
this step commented out (frame.py:165-172) and ours wires it, so the
written streams are reference-decodable.
"""

from __future__ import annotations

import pickle
import time
from dataclasses import dataclass, field
from enum import Enum
from pathlib import Path
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

import dataclasses

from coolchic_tpu.bitstream.encode import encode_frame_bitstream
from coolchic_tpu.bitstream.header import GopHeader, write_gop_header
from coolchic_tpu.io import convert_420_to_444, load_frame_data_from_file
from coolchic_tpu.models.config import CoolChicConfig
from coolchic_tpu.train.encode import encode_frame_with_quant_info
from coolchic_tpu.train.presets import Preset
from coolchic_tpu.video.codingstructure import CodingStructure, lmbda_from_depth


class TrainingExitCode(Enum):
    """Process exit codes: 42 requeues a time-sliced cluster job
    (reference: enc/utils/misc.py:43-64)."""

    END = 0
    REQUEUE = 42


def is_job_over(start_time: float, max_duration_job_min: int = 45) -> bool:
    if max_duration_job_min < 0:
        return False
    return (time.time() - start_time) / 60 >= max_duration_job_min


@dataclass
class FrameEncoderManager:
    """Per-frame training bookkeeping (reference: enc/utils/manager.py)."""

    lmbda: float
    loop_counter: int = 0
    best_loss: float = float("inf")
    iterations_counter: int = 0
    total_training_time_sec: float = 0.0


@dataclass
class EncodedFrame:
    params: Dict[str, Any]
    infos: Optional[Dict[str, Any]]
    manager: FrameEncoderManager
    psnr_db: float
    rate_latent_bpp: float
    # eval-decoded reconstruction [3, H, W]; the reference input of
    # dependent P/B frames (reference: video.py:450-507 get_ref_data)
    decoded: Optional[Any] = None


class VideoEncoder:
    """Encode a GOP of frames, one overfitted Cool-chic decoder each."""

    def __init__(
        self,
        coding_structure: CodingStructure,
        cfg: CoolChicConfig,
        preset: Preset,
        lmbda: float = 1e-3,
        n_loops: int = 1,
    ):
        self.coding_structure = coding_structure
        self.cfg = cfg
        self.preset = preset
        self.lmbda = lmbda
        self.n_loops = n_loops
        self.all_frame_encoders: Dict[str, EncodedFrame] = {}
        self.bitdepth = 8
        self.frame_data_type = "rgb"

    # ------------------------------------------------------------------ #
    def _load_frame(self, input_path: str, display_order: int) -> jnp.ndarray:
        fd = load_frame_data_from_file(input_path, display_order)
        self.bitdepth = fd.bitdepth
        self.frame_data_type = fd.frame_data_type
        data = fd.data
        if fd.frame_data_type == "yuv420":
            data = convert_420_to_444(data)
        return jnp.asarray(data)

    def encode(
        self,
        input_path: str,
        seed: int = 0,
        job_duration_min: int = -1,
        workdir: Optional[Path] = None,
        verbose: bool = True,
    ) -> TrainingExitCode:
        """Encode every not-yet-encoded frame in coding order. Returns
        REQUEUE when the time budget runs out mid-GOP (resume by calling
        again after ``load``)."""
        start_time = time.time()
        n_frames = self.coding_structure.get_number_of_frames()

        for idx_coding_order in range(n_frames):
            if str(idx_coding_order) in self.all_frame_encoders:
                continue  # already encoded (resumed job)

            frame = self.coding_structure.get_frame_from_coding_order(idx_coding_order)
            target = self._load_frame(input_path, frame.display_order)
            cfg_f = self.frame_cfg(frame.frame_type)
            refs = self._refs_for(frame)
            if refs:
                # P/B: the reference frame(s) ride along the target so the
                # whole phase engine keeps its (params, target) signature
                # (train/step.py split_target).
                target = jnp.concatenate([target, *refs], axis=0)
            lmbda = lmbda_from_depth(frame.depth, self.lmbda)
            manager = FrameEncoderManager(lmbda=lmbda)
            frame_start_time = time.time()

            best = None
            for loop in range(self.n_loops):
                key = jax.random.PRNGKey(seed + 7919 * idx_coding_order + loop)
                result, infos = encode_frame_with_quant_info(
                    key, target, lmbda, cfg_f, self.preset
                )
                manager.loop_counter += 1
                if best is None or float(result.loss) < manager.best_loss:
                    manager.best_loss = float(result.loss)
                    best = (result, infos)
            result, infos = best
            manager.total_training_time_sec = time.time() - frame_start_time

            # Reconstruct the frame EXACTLY as a decoder will see it (the
            # reference for any dependent frame): write the frame's real
            # bitstream and decode it through the integer pipeline against
            # integer-stored references. The reference encoder re-infers
            # references in float (video.py:450-507 get_ref_data), which
            # drifts from its own decoder; the bitstream round-trip here
            # is drift-free by construction. Falls back to the float eval
            # forward when the preset skipped NN quantization (no
            # decodable bitstream exists yet).
            if infos is not None:
                decoded = self._integer_reconstruct(
                    result.params, infos, frame, cfg_f
                )
            else:
                from coolchic_tpu.models.coolchic import frame_forward
                from coolchic_tpu.train.step import split_target

                _, ref_tuple = split_target(cfg_f, target)
                decoded, _, _ = frame_forward(
                    jax.tree.map(jnp.asarray, result.params), cfg_f,
                    training=False, bitdepth=self.bitdepth, refs=ref_tuple,
                )

            self.all_frame_encoders[str(idx_coding_order)] = EncodedFrame(
                params=jax.tree.map(np.asarray, result.params),
                infos=jax.tree.map(np.asarray, infos) if infos is not None else None,
                manager=manager,
                psnr_db=float(result.psnr_db),
                rate_latent_bpp=float(result.rate_latent_bpp),
                decoded=np.asarray(decoded),
            )
            if verbose:
                print(
                    f"frame {frame.display_order:>3} ({frame.frame_type}, depth "
                    f"{frame.depth}): psnr {float(result.psnr_db):6.2f} dB, "
                    f"{float(result.rate_latent_bpp):.4f} bpp, lmbda {lmbda:.2e}"
                )

            if workdir is not None:
                self.save(Path(workdir) / "video_encoder.pkl")
            if is_job_over(start_time, job_duration_min):
                return TrainingExitCode.REQUEUE

        return TrainingExitCode.END

    # ------------------------------------------------------------------ #
    def frame_cfg(self, frame_type: str) -> CoolChicConfig:
        """Per-frame-type architecture: P/B synthesize 6/9 channels
        (residue + motion; reference: video.py:151-165 synthesis widths)."""
        return dataclasses.replace(
            self.cfg,
            frame_type=frame_type,
            out_channels={"I": 3, "P": 6, "B": 9}[frame_type],
        )

    def _refs_for(self, frame) -> List[jnp.ndarray]:
        """Decoded reference frames, earliest first
        (reference: video.py:450-507)."""
        refs = []
        for disp in frame.index_references:
            ref_frame = self.coding_structure.get_frame_from_display_order(disp)
            enc = self.all_frame_encoders.get(str(ref_frame.coding_order))
            assert enc is not None and enc.decoded is not None, (
                f"reference frame (display {disp}) not yet encoded"
            )
            refs.append(jnp.asarray(enc.decoded))
        return refs

    # ------------------------------------------------------------------ #
    def _integer_reconstruct(self, params, infos, frame, cfg_f) -> np.ndarray:
        """Decode this frame's real bitstream through the integer pipeline
        (mirrors bitstream/decode.py decode_video_bitstream's frame loop:
        12-frac synthesis decode, fixed-point warp against integer-stored
        references, output bitdepth quantization, 420 chroma expansion).
        Returns the float [3, H, W] frame a decoder will reconstruct."""
        from coolchic_tpu.bitstream.decode import _decode_frame_raw12
        from coolchic_tpu.bitstream.header import GopHeader as BsGopHeader
        from coolchic_tpu.bitstream.inter import HALF, PREC, process_inter_int

        nn_q_step = {
            m: {"weight": float(i.q_step_w), "bias": float(i.q_step_b)}
            for m, i in infos.items()
        }
        nn_expgol = {
            m: {"weight": int(i.expgol_w), "bias": int(i.expgol_b)}
            for m, i in infos.items()
        }
        frame_bytes, _, _ = encode_frame_bitstream(
            jax.tree.map(jnp.asarray, params),
            cfg_f,
            nn_q_step,
            nn_expgol,
            display_index=frame.display_order,
            flow_gain=0 if frame.frame_type == "I" else cfg_f.flow_gain,
        )
        gop = BsGopHeader(
            img_size=self.cfg.img_size,
            frame_data_type=self.frame_data_type,
            bitdepth=self.bitdepth,
            intra_period=self.coding_structure.intra_period,
            p_period=self.coding_structure.p_period,
        )
        raw12, finfo, _ = _decode_frame_raw12(bytes(frame_bytes), 0, gop)
        max_dyn = (1 << self.bitdepth) - 1

        c = raw12.shape[0]
        if c == 3:
            f444 = raw12[:3]
        else:
            # Integer-stored references, rebuilt exactly from the decoded
            # frames ((round(dec*max_dyn) << PREC) // max_dyn — the
            # decoder's storage round-trip); nearest-display search like
            # the decoder's frame loop.
            stored: Dict[int, np.ndarray] = {}
            for k, enc in self.all_frame_encoders.items():
                fr = self.coding_structure.get_frame_from_coding_order(int(k))
                vq = np.round(
                    np.asarray(enc.decoded, np.float64) * max_dyn
                ).astype(np.int64)
                stored[fr.display_order] = (vq << PREC) // max_dyn
            disp = frame.display_order
            ref_prev = next(
                (stored[i] for i in range(disp - 1, -1, -1) if i in stored),
                None,
            )
            ref_next = None
            if c == 9:
                ref_next = next(
                    (stored[i]
                     for i in range(disp + 1, gop.intra_period + 1)
                     if i in stored),
                    None,
                )
            fh = finfo["frame_header"]
            f444 = process_inter_int(raw12, ref_prev, ref_next, fh.flow_gain)

        vq = np.clip(
            (f444.astype(np.int64) * max_dyn + HALF) >> PREC, 0, max_dyn
        )
        if self.frame_data_type == "yuv420":
            u = np.repeat(np.repeat(vq[1, ::2, ::2], 2, 0), 2, 1)
            v = np.repeat(np.repeat(vq[2, ::2, ::2], 2, 0), 2, 1)
            vq = np.stack([vq[0], u, v])
        return (vq.astype(np.float32) / np.float32(max_dyn))

    # ------------------------------------------------------------------ #
    def to_bitstream(self, hls_sig_blksize: int = 16) -> bytes:
        """GOP header + every frame's bitstream, in coding order
        (reference: enc/bitstream/encode.py:166-218)."""
        out = write_gop_header(
            GopHeader(
                img_size=self.cfg.img_size,
                frame_data_type=self.frame_data_type,
                bitdepth=self.bitdepth,
                intra_period=self.coding_structure.intra_period,
                p_period=self.coding_structure.p_period,
            )
        )
        for idx in range(self.coding_structure.get_number_of_frames()):
            enc = self.all_frame_encoders[str(idx)]
            assert enc.infos is not None, (
                f"frame {idx} was trained without NN quantization; cannot "
                "write a bitstream (use a preset with quantize_model)."
            )
            frame = self.coding_structure.get_frame_from_coding_order(idx)
            cfg_f = self.frame_cfg(frame.frame_type)
            nn_q_step = {
                m: {"weight": float(i.q_step_w), "bias": float(i.q_step_b)}
                for m, i in enc.infos.items()
            }
            nn_expgol = {
                m: {"weight": int(i.expgol_w), "bias": int(i.expgol_b)}
                for m, i in enc.infos.items()
            }
            frame_bytes, _, _ = encode_frame_bitstream(
                jax.tree.map(jnp.asarray, enc.params),
                cfg_f,
                nn_q_step,
                nn_expgol,
                display_index=frame.display_order,
                hls_sig_blksize=hls_sig_blksize,
                flow_gain=0 if frame.frame_type == "I" else cfg_f.flow_gain,
            )
            out += frame_bytes
        return out

    # ------------------------------------------------------------------ #
    def save(self, path: Path) -> None:
        """Whole-state checkpoint (reference: video.py:526-558)."""
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        state = {
            "coding_structure": self.coding_structure,
            "cfg": self.cfg,
            "preset": self.preset,
            "lmbda": self.lmbda,
            "n_loops": self.n_loops,
            "bitdepth": self.bitdepth,
            "frame_data_type": self.frame_data_type,
            "all_frame_encoders": self.all_frame_encoders,
        }
        with open(path, "wb") as f:
            pickle.dump(state, f)


def load_video_encoder(path: Path) -> VideoEncoder:
    """(reference: video.py:561-591)."""
    with open(path, "rb") as f:
        state = pickle.load(f)
    enc = VideoEncoder(
        coding_structure=state["coding_structure"],
        cfg=state["cfg"],
        preset=state["preset"],
        lmbda=state["lmbda"],
        n_loops=state["n_loops"],
    )
    enc.bitdepth = state["bitdepth"]
    enc.frame_data_type = state["frame_data_type"]
    enc.all_frame_encoders = state["all_frame_encoders"]
    return enc
