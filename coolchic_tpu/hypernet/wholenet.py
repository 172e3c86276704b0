"""Whole-net amortized encoders: NO (shared decoder) and Delta variants.

The amortized path predicts Cool-chic latents (and optionally per-image
weight *deltas* to a shared decoder) in one forward pass
(reference: coolchic/hypernet/hypernet.py:849-1439 — WholeNet ABC,
NOWholeNet, DeltaWholeNet).

TPU-native design: the flax hypernet emits latents + per-image delta
pytrees; the shared decoder is the functional Cool-chic core, and the batch
of per-image decoders runs as one ``jax.vmap`` over (latents, base+delta)
— the same trick the reference implements with torch.vmap(functional_call)
(hypernet.py:1285-1288), here with no module/state plumbing at all.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from coolchic_tpu.hypernet.blocks import LatentHyperNet
from coolchic_tpu.hypernet.heads import CoolchicHyperNet
from coolchic_tpu.models.coolchic import (
    coolchic_forward_latents,
    init_coolchic_params,
)
from coolchic_tpu.models.config import CoolChicConfig

Params = Dict[str, Any]


def _nets_only(params: Params) -> Params:
    return {k: v for k, v in params.items() if k != "latents"}


def _latents_nhwc_to_chw(latents_nhwc) -> list:
    """list of [B, h, w, 1] -> list of [B, 1, h, w]."""
    return [jnp.transpose(l, (0, 3, 1, 2)) for l in latents_nhwc]


class WholeNetState(NamedTuple):
    """Trainable state of an amortized encoder."""

    hypernet: Any  # flax params of the encoder (+ heads for Delta)
    decoder: Params  # shared decoder networks (arm/upsampling/synthesis)


class NOWholeNet:
    """Latent encoder + shared decoder, no per-image weights
    (reference: hypernet.py:1148-1221)."""

    def __init__(self, cfg: CoolChicConfig, n_hidden_channels: int = 64):
        self.cfg = cfg
        self.module = LatentHyperNet(
            n_latents=cfg.latent_n_grids, n_hidden_channels=n_hidden_channels
        )

    def init(self, key: jax.Array, patch_size: Optional[Tuple[int, int]] = None) -> WholeNetState:
        h, w = patch_size or self.cfg.img_size
        k1, k2 = jax.random.split(key)
        variables = self.module.init(k1, jnp.zeros((1, h, w, 3)))
        decoder = _nets_only(init_coolchic_params(k2, self.cfg))
        return WholeNetState(hypernet=variables["params"], decoder=decoder)

    def predict_latents(self, state: WholeNetState, img_nchw: jax.Array):
        """img [B, 3, H, W] -> list of [B, 1, h_i, w_i] latent grids."""
        img = jnp.transpose(img_nchw, (0, 2, 3, 1))
        latents = self.module.apply({"params": state.hypernet}, img)
        return _latents_nhwc_to_chw(latents)

    def forward(
        self,
        state: WholeNetState,
        img_nchw: jax.Array,
        key: Optional[jax.Array] = None,
        quantizer_noise_type: str = "gaussian",
        quantizer_type: str = "softround",
        soft_round_temperature=0.3,
        noise_parameter=0.25,
        training: bool = True,
    ):
        """Returns (decoded [B, 3, H, W], rate [B, n_latents])."""
        latents = self.predict_latents(state, img_nchw)
        batch = img_nchw.shape[0]
        keys = (
            jax.random.split(key, batch)
            if key is not None
            else jnp.zeros((batch, 2), jnp.uint32)
        )

        def one(lats, k):
            # Under vmap each latent is its per-image [1, h, w] = [C, h, w].
            out, rate, _ = coolchic_forward_latents(
                state.decoder,
                lats,
                self.cfg,
                key=k,
                quantizer_noise_type=quantizer_noise_type,
                quantizer_type=quantizer_type,
                soft_round_temperature=soft_round_temperature,
                noise_parameter=noise_parameter,
                training=training,
            )
            return out, rate

        out, rate = jax.vmap(one)(latents, keys)
        return out, rate

    def image_to_coolchic(self, state: WholeNetState, img_nchw: jax.Array) -> Params:
        """Materialize a standard per-image param pytree (for finetuning or
        bitstream writing) from one [3, H, W] image
        (reference: hypernet.py:1188-1206)."""
        latents = self.predict_latents(state, img_nchw[None])
        params = dict(jax.tree.map(lambda a: a, state.decoder))
        # Predicted latents already use the stored (pre-gain) convention:
        # the wholenet forward feeds them to coolchic_forward_latents, which
        # applies cfg.encoder_gain itself.
        params["latents"] = [
            jax.lax.stop_gradient(l[0, 0][None]) for l in latents
        ]
        return params


class DeltaWholeNet:
    """Hypernet predicting latents + weight deltas to a shared decoder
    (reference: hypernet.py:1238-1357).

    ``mode="full"`` turns this into the reference's CoolchicWholeNet
    (hypernet.py:880-963): the heads predict the decoder weights outright
    (no zero output initialization, no shared base added)."""

    def __init__(
        self,
        cfg: CoolChicConfig,
        backbone_arch: str = "resnet18",
        mode: str = "delta",
        **hn_kwargs,
    ):
        assert mode in ("delta", "full")
        self.cfg = cfg
        self.mode = mode
        self.module = CoolchicHyperNet(
            cfg=cfg, backbone_arch=backbone_arch, deltas=(mode == "delta"), **hn_kwargs
        )
        self.use_delta = True

    def init(self, key: jax.Array, patch_size: Optional[Tuple[int, int]] = None) -> WholeNetState:
        h, w = patch_size or self.cfg.img_size
        k1, k2 = jax.random.split(key)
        variables = self.module.init(k1, jnp.zeros((1, h, w, 3)))
        decoder = _nets_only(init_coolchic_params(k2, self.cfg))
        return WholeNetState(hypernet=variables["params"], decoder=decoder)

    def predict(self, state: WholeNetState, img_nchw: jax.Array):
        img = jnp.transpose(img_nchw, (0, 2, 3, 1))
        latents, syn_d, arm_d, ups_d = self.module.apply(
            {"params": state.hypernet}, img
        )
        return _latents_nhwc_to_chw(latents), {
            "synthesis": syn_d,
            "arm": arm_d,
            "upsampling": ups_d,
        }

    def forward(
        self,
        state: WholeNetState,
        img_nchw: jax.Array,
        key: Optional[jax.Array] = None,
        quantizer_noise_type: str = "gaussian",
        quantizer_type: str = "softround",
        soft_round_temperature=0.3,
        noise_parameter=0.25,
        training: bool = True,
    ):
        """Batched forward: every image decodes through base + its own delta
        (reference: hypernet.py:1248-1288). Returns (decoded [B, 3, H, W],
        rate [B, n_latents])."""
        latents, deltas = self.predict(state, img_nchw)
        batch = img_nchw.shape[0]
        keys = (
            jax.random.split(key, batch)
            if key is not None
            else jnp.zeros((batch, 2), jnp.uint32)
        )

        if not self.use_delta:
            deltas = jax.tree.map(lambda d: d * 0.0, deltas)

        full = self.mode == "full"

        def one(lats, delta, k):
            if full:
                # Predicted weights ARE the decoder (CoolchicWholeNet).
                nets = delta
            else:
                nets = jax.tree.map(lambda base, d: base + d, state.decoder, delta)
            out, rate, _ = coolchic_forward_latents(
                nets,
                lats,
                self.cfg,
                key=k,
                quantizer_noise_type=quantizer_noise_type,
                quantizer_type=quantizer_type,
                soft_round_temperature=soft_round_temperature,
                noise_parameter=noise_parameter,
                training=training,
            )
            return out, rate

        out, rate = jax.vmap(one)(latents, deltas, keys)
        return out, rate

    def image_to_coolchic(self, state: WholeNetState, img_nchw: jax.Array) -> Params:
        """Materialize per-image params (base + delta, predicted latents)
        for finetuning / bitstream writing (reference: hypernet.py:1290-1330)."""
        latents, deltas = self.predict(state, img_nchw[None])
        delta0 = jax.tree.map(lambda d: d[0], deltas)
        if self.mode == "full":
            params = dict(delta0)
        else:
            params = dict(
                jax.tree.map(lambda base, d: base + d, state.decoder, delta0)
            )
        params["latents"] = [
            jax.lax.stop_gradient(l[0, 0][None]) for l in latents
        ]
        return params

    def load_from_no_coolchic(
        self, no_state: WholeNetState, delta_state: WholeNetState
    ) -> WholeNetState:
        """Initialize from a trained NOWholeNet: copy the latent encoder and
        the shared decoder; delta heads already start at zero output
        (reference: hypernet.py:1360-1416)."""
        hypernet = dict(delta_state.hypernet)
        hypernet["LatentHyperNet_0"] = no_state.hypernet
        return WholeNetState(hypernet=hypernet, decoder=no_state.decoder)


class SmallDeltaWholeNet(DeltaWholeNet):
    """Delta wholenet with the compact conv hypernet — no ResNet backbone,
    no upsampling deltas (reference: hypernet.py:1419-1439 SmallDeltaWholeNet
    + :746-845 SmallCoolchicHyperNet). The training loop's backbone
    freeze/unfreeze naturally no-ops: the param tree has no ``ResNet*``
    collection (the reference overrides freeze_resnet to pass)."""

    def __init__(self, cfg: CoolChicConfig, mode: str = "delta", **hn_kwargs):
        from coolchic_tpu.hypernet.heads import SmallCoolchicHyperNet

        assert mode == "delta", "the small hypernet is a delta-only variant"
        self.cfg = cfg
        self.mode = mode
        self.module = SmallCoolchicHyperNet(cfg=cfg, **hn_kwargs)
        self.use_delta = True
