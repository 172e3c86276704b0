"""ConvNeXt-style building blocks and the latent encoder (flax.linen, NHWC).

Mirrors the reference architecture (reference: coolchic/hypernet/
common.py:46-137 — LayerNorm2d, ConvNeXt Block, ResidualBlock from Blard et
al., and hypernet/hypernet.py:37-119 — LatentHyperNet), re-expressed in
flax with NHWC layout (TPU-native conv layout).
"""

from __future__ import annotations

from typing import List, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

_TRUNC_INIT = nn.initializers.truncated_normal(stddev=0.02)


class ConvNeXtBlock(nn.Module):
    """Depthwise 7x7 -> LN -> 1x1 x4 -> GELU -> 1x1, layer-scaled residual
    (reference: common.py:56-88)."""

    n_channels: int
    layer_scale_init: float = 1e-6

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        z = nn.Conv(
            self.n_channels,
            (7, 7),
            padding="SAME",
            feature_group_count=self.n_channels,
            kernel_init=_TRUNC_INIT,
        )(x)
        z = nn.LayerNorm(epsilon=1e-6)(z)
        z = nn.Conv(self.n_channels * 4, (1, 1), kernel_init=_TRUNC_INIT)(z)
        z = nn.gelu(z)
        z = nn.Conv(self.n_channels, (1, 1), kernel_init=_TRUNC_INIT)(z)
        scale = self.param(
            "layer_scale",
            lambda k, s: jnp.full(s, self.layer_scale_init),
            (self.n_channels,),
        )
        return scale * z + x


class ResidualBlock(nn.Module):
    """ConvNeXt residual block with optional downsampling
    (reference: common.py:91-137)."""

    in_channels: int
    out_channels: Optional[int] = None
    downsample_n: int = 1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        out_ch = self.out_channels or self.in_channels
        # Branch 1: strided conv -> LN -> GELU -> Block.
        z = nn.Conv(
            out_ch,
            (3, 3),
            strides=self.downsample_n,
            padding=1,
            kernel_init=_TRUNC_INIT,
        )(x)
        z = nn.LayerNorm(epsilon=1e-6)(z)
        z = nn.gelu(z)
        z = ConvNeXtBlock(out_ch)(z)
        # Branch 2: (avg-pool if downsampling) -> 1x1.
        y = x
        if self.downsample_n > 1:
            y = nn.avg_pool(
                y,
                (2, 2),
                strides=(self.downsample_n, self.downsample_n),
                padding=((0, 1), (0, 1)),  # ceil mode
            )
        y = nn.Conv(out_ch, (1, 1), kernel_init=_TRUNC_INIT)(y)
        z = z + y
        z = ConvNeXtBlock(out_ch)(z)
        z = ConvNeXtBlock(out_ch)(z)
        return z


class LatentHyperNet(nn.Module):
    """Pyramidal latent encoder: one ResidualBlock per latent level (x2
    downsampling between levels) with a 1x1 "fuse" head per level
    (reference: hypernet.py:37-72).

    Input [B, H, W, 3]; output: list of [B, H/2^i, W/2^i, 1]."""

    n_latents: int = 7
    n_hidden_channels: int = 64

    @nn.compact
    def __call__(self, x: jax.Array) -> List[jax.Array]:
        outputs = []
        for i in range(self.n_latents):
            x = ResidualBlock(
                in_channels=3 if i == 0 else self.n_hidden_channels,
                out_channels=self.n_hidden_channels,
                downsample_n=1 if i == 0 else 2,
            )(x)
            outputs.append(
                nn.Conv(1, (1, 1), kernel_init=_TRUNC_INIT)(x)
            )
        return outputs


def upsample_latents(latents, img_size, method: str = "bicubic") -> jax.Array:
    """Resize every latent grid to the full image size and concatenate along
    channels (reference: hypernet/common.py:185-197; used by the
    double-backbone variant). Latents are NHWC [B, h, w, 1]."""
    h, w = img_size
    resized = [
        jax.image.resize(l, (l.shape[0], h, w, l.shape[-1]), method=method)
        for l in latents
    ]
    return jnp.concatenate(resized, axis=-1)


class MLP(nn.Module):
    """input -> hidden -> [hidden] * n_hidden_layers -> output, ReLU
    activations, optional output activation
    (reference: common.py:8-43 build_mlp)."""

    output_size: int
    hidden_size: int
    n_hidden_layers: int
    output_activation: Optional[str] = None
    zero_init_output: bool = False  # deltas start at zero (hypernet.py:685-708)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.relu(nn.Dense(self.hidden_size)(x))
        for _ in range(self.n_hidden_layers):
            x = nn.relu(nn.Dense(self.hidden_size)(x))
        out_init = (
            {"kernel_init": nn.initializers.zeros, "bias_init": nn.initializers.zeros}
            if self.zero_init_output
            else {}
        )
        x = nn.Dense(self.output_size, **out_init)(x)
        if self.output_activation == "tanh":
            x = jnp.tanh(x)
        elif self.output_activation == "relu":
            x = nn.relu(x)
        elif self.output_activation == "leaky_relu":
            x = nn.leaky_relu(x, negative_slope=0.2)
        elif self.output_activation is not None:
            raise ValueError(f"Unknown output activation {self.output_activation}")
        return x
