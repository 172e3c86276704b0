"""Static (hashable) model configuration for the Cool-chic decoder.

Everything that determines array *shapes* lives here so it can be passed as
a static argument to ``jax.jit``. The mutable state (latents, network
weights) lives in a parameter pytree, see ``coolchic_tpu.models.coolchic``.

Mirrors the semantics of the reference ``CoolChicEncoderParameter``
(reference: coolchic/enc/component/coolchic.py:56-124) without the
stateful ``nn.Module`` design.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Tuple


@dataclass(frozen=True)
class CoolChicConfig:
    """Architecture of one Cool-chic frame decoder.

    Attributes:
        img_size: (H, W) of the frame to code.
        layers_synthesis: synthesis layer descriptors, each formatted as
            ``"<out_ft>-<kernel_size>-<linear|residual>-<none|relu>"``
            (reference: coolchic/enc/component/core/synthesis.py:224-262).
            ``out_ft`` may be the literal ``"X"`` meaning "output channels"
            (3 for RGB), matching the reference config convention
            (reference: coolchic/utils/types.py:115-216).
        n_ft_per_res: latent channels per dyadic resolution; entry ``i`` is
            the channel count of the grid with resolution
            ``(ceil(H/2^i), ceil(W/2^i))``.
        dim_arm: number of ARM context pixels == ARM hidden width
            (must be in {8, 16, 24, 32}).
        n_hidden_layers_arm: number of residual hidden layers in the ARM.
        encoder_gain: latent multiplier applied before quantization.
        ups_k_size: even kernel size of the x2 transposed-conv upsamplers.
        ups_preconcat_k_size: odd kernel size of the pre-concat filters.
        out_channels: channels of the synthesized output (3 for RGB/YUV444).
        frame_data_type: "rgb" | "yuv444" | "yuv420". Static so the
            training loss can weight YUV420 MSE 4:1:1 under jit
            (reference: enc/training/loss.py:53-87).
    """

    img_size: Tuple[int, int]
    layers_synthesis: Tuple[str, ...] = (
        "48-1-linear-relu",
        "X-1-linear-none",
        "X-3-residual-relu",
        "X-3-residual-none",
    )
    n_ft_per_res: Tuple[int, ...] = (1, 1, 1, 1, 1, 1, 1)
    dim_arm: int = 24
    n_hidden_layers_arm: int = 2
    encoder_gain: int = 16
    ups_k_size: int = 8
    ups_preconcat_k_size: int = 7
    out_channels: int = 3
    frame_data_type: str = "rgb"
    frame_type: str = "I"  # "I" | "P" | "B": inter frames synthesize extra
    # flow/gain channels consumed by the motion-compensated prediction
    # (out_channels 6 / 9; reference: cpp/ccdecapi.cpp process_inter)
    flow_gain: int = 1
    # Latent grids (by index) pinned to exactly zero for the whole encode:
    # their quantized latents are masked to 0 in the forward pass, so the
    # optimizer routes all information to the remaining grids and the
    # bitstream codes an all-insignificant grid (a few bytes). Encoder-side
    # search knob only — the format is unchanged and any decoder reads the
    # result. Mirrors the reference's published low-rate streams, whose
    # full-resolution grid is near-empty (e.g. kodim02-lmbda-002: 33 B for
    # grid 0 vs 370 B when left free; reference results/image/kodak).
    frozen_zero_grids: Tuple[int, ...] = ()

    def __post_init__(self):
        # JSON round-trips (arch.json in the RD sweeps) deliver sequence
        # fields as lists; normalize to tuples so the config stays hashable
        # wherever it is used as a jit static argument.
        for f in ("layers_synthesis", "n_ft_per_res", "frozen_zero_grids", "img_size"):
            v = getattr(self, f)
            if not isinstance(v, tuple):
                object.__setattr__(self, f, tuple(v))
        assert all(0 <= g < len(self.n_ft_per_res) for g in self.frozen_zero_grids), (
            f"frozen_zero_grids {self.frozen_zero_grids} out of range for "
            f"{len(self.n_ft_per_res)} grids"
        )
        assert self.dim_arm in (8, 16, 24, 32), (
            f"ARM context size must be 8, 16, 24 or 32. Found {self.dim_arm}."
        )
        assert self.ups_k_size >= 4 and self.ups_k_size % 2 == 0, (
            f"Upsampling kernel size must be even and >= 4, found {self.ups_k_size}"
        )
        assert self.ups_preconcat_k_size % 2 == 1, (
            f"Pre-concat kernel size must be odd, found {self.ups_preconcat_k_size}"
        )
        assert self.frame_type in ("I", "P", "B"), self.frame_type
        if self.frame_type == "P":
            assert self.out_channels == 6, "P frames synthesize 6 channels"
        if self.frame_type == "B":
            assert self.out_channels == 9, "B frames synthesize 9 channels"


    # ----- Derived static shapes ------------------------------------------------
    @property
    def latent_n_grids(self) -> int:
        return len(self.n_ft_per_res)

    @property
    def latent_shapes(self) -> Tuple[Tuple[int, int, int], ...]:
        """(C_i, H_i, W_i) for each latent grid, H_i = ceil(H / 2^i)."""
        h, w = self.img_size
        return tuple(
            (
                self.n_ft_per_res[i],
                int(math.ceil(h / (2**i))),
                int(math.ceil(w / (2**i))),
            )
            for i in range(self.latent_n_grids)
        )

    @property
    def n_latents(self) -> int:
        """Total number of latent variables across all grids."""
        return sum(c * h * w for (c, h, w) in self.latent_shapes)

    @property
    def total_latent_channels(self) -> int:
        return sum(self.n_ft_per_res)

    @property
    def n_pixels(self) -> int:
        return self.img_size[0] * self.img_size[1]

    def parsed_synthesis_layers(self):
        """Yield (out_ft, k_size, residual, relu) per synthesis layer."""
        out = []
        for spec in self.layers_synthesis:
            out_ft, k_size, mode, non_linearity = spec.split("-")
            out_ft = self.out_channels if out_ft == "X" else int(out_ft)
            assert mode in ("linear", "residual"), f"Unknown mode {mode}"
            assert non_linearity in ("none", "relu"), (
                f"Unknown non-linearity {non_linearity}"
            )
            out.append((out_ft, int(k_size), mode == "residual", non_linearity == "relu"))
        return tuple(out)
