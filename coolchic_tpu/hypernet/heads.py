"""Hypernet heads: MLPs mapping backbone features to decoder weights.

Each head emits a flat vector reshaped directly into the decoder's
parameter pytree (reference: coolchic/hypernet/hypernet.py:160-569 —
SynthesisHyperNet / ArmHyperNet / UpsamplingHyperNet shape_outputs; the
reference reshapes into torch state-dict names, we reshape into the
functional param trees of coolchic_tpu.models).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from coolchic_tpu.hypernet.blocks import MLP
from coolchic_tpu.models.config import CoolChicConfig
from coolchic_tpu.models.upsampling import half_kernel_size


def arm_param_count(
    dim_arm: int, n_hidden: int, biases: bool = True, only_biases: bool = False
) -> int:
    if only_biases:  # COIN++-style bias-only deltas (reference: hypernet.py:360-366)
        return dim_arm * n_hidden + 2
    per_hidden = dim_arm * dim_arm + (dim_arm if biases else 0)
    return per_hidden * n_hidden + dim_arm * 2 + (2 if biases else 0)


def synthesis_param_count(
    cfg: CoolChicConfig, biases: bool = True, only_biases: bool = False
) -> int:
    n = 0
    in_ft = cfg.total_latent_channels
    for out_ft, k, _res, _relu in cfg.parsed_synthesis_layers():
        if only_biases:  # reference: hypernet.py:239-243
            n += out_ft
        else:
            n += out_ft * in_ft * k * k + (out_ft if biases else 0)
        in_ft = out_ft
    return n


def upsampling_param_count(cfg: CoolChicConfig) -> int:
    # Per stage: ups half kernel + 1 bias, preconcat half kernel + 1 bias
    # (the reference predicts the decoder's dead upsampling biases too,
    # hypernet.py:476-489 — we keep the outputs for capacity parity but drop
    # them when building the param tree).
    return (cfg.latent_n_grids - 1) * (
        half_kernel_size(cfg.ups_k_size) + 1 + half_kernel_size(cfg.ups_preconcat_k_size) + 1
    )


def shape_arm(flat: jax.Array, cfg: CoolChicConfig, only_biases: bool = False) -> Dict:
    """[B, n_params] -> arm param tree with leading batch dim. With
    ``only_biases`` the flat vector holds biases only; weight (deltas) are
    zero (reference: hypernet.py:385-425 shape_outputs)."""
    c = cfg.dim_arm
    batch = flat.shape[0]
    layers = []
    p = 0
    for _ in range(cfg.n_hidden_layers_arm):
        if only_biases:
            w = jnp.zeros((batch, c, c), flat.dtype)
        else:
            w = flat[:, p : p + c * c].reshape(-1, c, c)
            p += c * c
        b = flat[:, p : p + c]
        p += c
        layers.append({"weight": w, "bias": b})
    if only_biases:
        w = jnp.zeros((batch, 2, c), flat.dtype)
    else:
        w = flat[:, p : p + 2 * c].reshape(-1, 2, c)
        p += 2 * c
    b = flat[:, p : p + 2]
    layers.append({"weight": w, "bias": b})
    return {"layers": layers}


def shape_synthesis(
    flat: jax.Array, cfg: CoolChicConfig, only_biases: bool = False
) -> Dict:
    layers = []
    batch = flat.shape[0]
    p = 0
    in_ft = cfg.total_latent_channels
    for out_ft, k, _res, _relu in cfg.parsed_synthesis_layers():
        if only_biases:
            w = jnp.zeros((batch, out_ft, in_ft, k, k), flat.dtype)
        else:
            n_w = out_ft * in_ft * k * k
            w = flat[:, p : p + n_w].reshape(-1, out_ft, in_ft, k, k)
            p += n_w
        b = flat[:, p : p + out_ft]
        p += out_ft
        layers.append({"weight": w, "bias": b})
        in_ft = out_ft
    return {"layers": layers}


def shape_upsampling(flat: jax.Array, cfg: CoolChicConfig) -> Dict:
    n_ups = half_kernel_size(cfg.ups_k_size)
    n_pre = half_kernel_size(cfg.ups_preconcat_k_size)
    ups, pre = [], []
    p = 0
    for _ in range(cfg.latent_n_grids - 1):
        ups.append(flat[:, p : p + n_ups])
        p += n_ups + 1  # skip the dead bias output
        pre.append(flat[:, p : p + n_pre])
        p += n_pre + 1
    return {"ups": ups, "preconcat": pre}


class CoolchicHyperNet(nn.Module):
    """Latent encoder + backbone + three weight heads
    (reference: hypernet.py:572-744).

    __call__(img [B, H, W, 3]) ->
        (latents: list of [B, h_i, w_i, 1],
         synthesis/arm/upsampling param trees with leading batch dim).
    """

    cfg: CoolChicConfig
    backbone_arch: str = "resnet18"
    n_hidden_channels: int = 64
    synthesis_hidden_dim: int = 1024
    synthesis_n_layers: int = 3
    arm_hidden_dim: int = 1024
    arm_n_layers: int = 3
    ups_hidden_dim: int = 256
    ups_n_layers: int = 3
    output_activation: Optional[str] = "tanh"
    deltas: bool = True  # zero-init head outputs (delta mode)
    # bias-only deltas per module (COIN++ mode; reference HyperNetParams.only_biases)
    only_biases_arm: bool = False
    only_biases_synthesis: bool = False
    double_backbone: bool = False  # 2nd backbone over upsampled latents

    @nn.compact
    def __call__(self, img: jax.Array):
        from coolchic_tpu.hypernet.backbone import get_backbone
        from coolchic_tpu.hypernet.blocks import LatentHyperNet, upsample_latents

        latents = LatentHyperNet(
            n_latents=self.cfg.latent_n_grids,
            n_hidden_channels=self.n_hidden_channels,
        )(img)

        backbone, _ = get_backbone(self.backbone_arch)
        feats = backbone(img)
        if self.double_backbone:
            # Second backbone reads the (detached) predicted latents resized
            # to image scale (reference: hypernet.py:583-589, 639-649).
            lat_img = jax.lax.stop_gradient(
                upsample_latents(latents, img.shape[1:3])
            )
            lat_backbone, _ = get_backbone(self.backbone_arch)
            feats = jnp.concatenate([feats, lat_backbone(lat_img)], axis=-1)

        syn_flat = MLP(
            output_size=synthesis_param_count(
                self.cfg, only_biases=self.only_biases_synthesis
            ),
            hidden_size=self.synthesis_hidden_dim,
            n_hidden_layers=self.synthesis_n_layers,
            output_activation=self.output_activation,
            zero_init_output=self.deltas,
        )(feats)
        arm_flat = MLP(
            output_size=arm_param_count(
                self.cfg.dim_arm, self.cfg.n_hidden_layers_arm,
                only_biases=self.only_biases_arm,
            ),
            hidden_size=self.arm_hidden_dim,
            n_hidden_layers=self.arm_n_layers,
            output_activation=self.output_activation,
            zero_init_output=self.deltas,
        )(feats)
        ups_flat = MLP(
            output_size=upsampling_param_count(self.cfg),
            hidden_size=self.ups_hidden_dim,
            n_hidden_layers=self.ups_n_layers,
            output_activation="tanh",
            zero_init_output=self.deltas,
        )(feats)

        return (
            latents,
            shape_synthesis(
                syn_flat, self.cfg, only_biases=self.only_biases_synthesis
            ),
            shape_arm(arm_flat, self.cfg, only_biases=self.only_biases_arm),
            shape_upsampling(ups_flat, self.cfg),
        )


class SmallCoolchicHyperNet(nn.Module):
    """Compact variant: a plain conv backbone over the image concatenated
    with the (detached) upsampled predicted latents; synthesis + arm heads
    only — no upsampling deltas (reference: hypernet.py:746-845
    SmallCoolchicHyperNet)."""

    cfg: CoolChicConfig
    n_hidden_channels: int = 64
    synthesis_hidden_dim: int = 1024
    synthesis_n_layers: int = 3
    arm_hidden_dim: int = 1024
    arm_n_layers: int = 3
    output_activation: Optional[str] = "tanh"
    deltas: bool = True
    only_biases_arm: bool = False
    only_biases_synthesis: bool = False

    @nn.compact
    def __call__(self, img: jax.Array):
        from coolchic_tpu.hypernet.blocks import LatentHyperNet, upsample_latents

        latents = LatentHyperNet(
            n_latents=self.cfg.latent_n_grids,
            n_hidden_channels=self.n_hidden_channels,
        )(img)

        lat_img = jax.lax.stop_gradient(upsample_latents(latents, img.shape[1:3]))
        x = jnp.concatenate([img, lat_img], axis=-1)
        for width, k in ((64, 3), (128, 3), (256, 3), (512, 3), (1024, 1)):
            x = nn.Conv(width, (k, k), padding=(k - 1) // 2)(x)
            if width != 1024:
                x = nn.relu(x)
        feats = jnp.mean(x, axis=(1, 2))  # global average pool -> [B, 1024]

        syn_flat = MLP(
            output_size=synthesis_param_count(
                self.cfg, only_biases=self.only_biases_synthesis
            ),
            hidden_size=self.synthesis_hidden_dim,
            n_hidden_layers=self.synthesis_n_layers,
            output_activation=self.output_activation,
            zero_init_output=self.deltas,
        )(feats)
        arm_flat = MLP(
            output_size=arm_param_count(
                self.cfg.dim_arm, self.cfg.n_hidden_layers_arm,
                only_biases=self.only_biases_arm,
            ),
            hidden_size=self.arm_hidden_dim,
            n_hidden_layers=self.arm_n_layers,
            output_activation=self.output_activation,
            zero_init_output=self.deltas,
        )(feats)

        batch = img.shape[0]
        ups_zero = {
            "ups": [
                jnp.zeros((batch, half_kernel_size(self.cfg.ups_k_size)))
                for _ in range(self.cfg.latent_n_grids - 1)
            ],
            "preconcat": [
                jnp.zeros((batch, half_kernel_size(self.cfg.ups_preconcat_k_size)))
                for _ in range(self.cfg.latent_n_grids - 1)
            ],
        }
        return (
            latents,
            shape_synthesis(
                syn_flat, self.cfg, only_biases=self.only_biases_synthesis
            ),
            shape_arm(arm_flat, self.cfg, only_biases=self.only_biases_arm),
            ups_zero,
        )
