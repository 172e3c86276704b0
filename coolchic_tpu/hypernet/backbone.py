"""ResNet feature-extraction backbones (flax.linen, NHWC).

The reference uses torchvision ResNet18/50/101 with ImageNet weights as the
hypernet feature extractor (reference: coolchic/hypernet/hypernet.py:122-148).
This is our own flax implementation; since this environment has no network
access (no pretrained checkpoints), backbones train from scratch and use
GroupNorm instead of BatchNorm — stateless normalization keeps the whole
hypernet a pure function (vmap/jit-friendly), and without ImageNet
initialization BatchNorm holds no advantage.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax


def _norm():
    return nn.GroupNorm(num_groups=32)


class BasicBlock(nn.Module):
    filters: int
    strides: int = 1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        residual = x
        y = nn.Conv(self.filters, (3, 3), strides=self.strides, padding=1, use_bias=False)(x)
        y = nn.relu(_norm()(y))
        y = nn.Conv(self.filters, (3, 3), padding=1, use_bias=False)(y)
        y = _norm()(y)
        if residual.shape != y.shape:
            residual = nn.Conv(
                self.filters, (1, 1), strides=self.strides, use_bias=False
            )(x)
            residual = _norm()(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    filters: int
    strides: int = 1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        residual = x
        y = nn.Conv(self.filters, (1, 1), use_bias=False)(x)
        y = nn.relu(_norm()(y))
        y = nn.Conv(self.filters, (3, 3), strides=self.strides, padding=1, use_bias=False)(y)
        y = nn.relu(_norm()(y))
        y = nn.Conv(self.filters * 4, (1, 1), use_bias=False)(y)
        y = _norm()(y)
        if residual.shape != y.shape:
            residual = nn.Conv(
                self.filters * 4, (1, 1), strides=self.strides, use_bias=False
            )(x)
            residual = _norm()(residual)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    """Feature extractor: stem + 4 stages + global average pool (the
    classification head is dropped, as the reference does)."""

    stage_sizes: Sequence[int]
    block: type = BasicBlock

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False)(x)
        x = nn.relu(_norm()(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for i, n_blocks in enumerate(self.stage_sizes):
            filters = 64 * 2**i
            for j in range(n_blocks):
                strides = 2 if (i > 0 and j == 0) else 1
                x = self.block(filters, strides)(x)
        return x.mean(axis=(1, 2))  # [B, F]


def get_backbone(arch: str = "resnet18"):
    """Returns (module, n_output_features)
    (reference: hypernet.py:122-148)."""
    if arch == "resnet18":
        return ResNet(stage_sizes=(2, 2, 2, 2), block=BasicBlock), 512
    if arch == "resnet50":
        return ResNet(stage_sizes=(3, 4, 6, 3), block=Bottleneck), 2048
    if arch == "resnet101":
        return ResNet(stage_sizes=(3, 4, 23, 3), block=Bottleneck), 2048
    raise ValueError(f"Unknown backbone arch {arch}")
