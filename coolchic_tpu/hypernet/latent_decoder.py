"""LatentDecoder: the Cool-chic decoder driven by externally supplied
latents and optional per-layer weight deltas
(reference: coolchic/hypernet/hypernet.py:966-1145 ``LatentDecoder``).

The reference subclasses ``CoolChicEncoder`` and mutates its latent
parameters / module weights in place to "hide" the stored state. In the
functional JAX design there is no stored state to hide — the decoder nets
and the latents are both plain pytree arguments — so the LatentDecoder
reduces to (1) a delta-application rule matching the reference's
``add_delta(bias_only=...)`` semantics, and (2) the ``as_coolchic``
materializer that folds everything into a standard per-image parameter
pytree (the reference's ``add_to_weight=True`` + ``stop_grads=True`` path).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp

from coolchic_tpu.models.coolchic import coolchic_forward_latents
from coolchic_tpu.models.config import CoolChicConfig

Params = Dict[str, Any]


def apply_layer_deltas(
    module_params: Dict[str, Any],
    deltas: Optional[Sequence[jax.Array]],
    bias_only: bool = False,
) -> Dict[str, Any]:
    """Add one delta per layer to a ``{"layers": [{"weight", "bias"}, ...]}``
    module (reference: ArmLinearDelta / SynthesisDelta ``add_delta``,
    hypernet.py:104-156 + synthesis.py:119-172). ``bias_only`` is the
    COIN++-style mode where deltas target the biases."""
    if deltas is None:
        return module_params
    layers = module_params["layers"]
    assert len(deltas) == len(layers), (
        f"need {len(layers)} deltas, got {len(deltas)}"
    )
    key = "bias" if bias_only else "weight"
    new_layers = [
        {**layer, key: layer[key] + jnp.reshape(d, layer[key].shape)}
        for layer, d in zip(layers, deltas)
    ]
    return {**module_params, "layers": new_layers}


class LatentDecoder:
    """Decoder-as-a-function over (nets, latents, deltas).

    Args mirror the reference constructor: ``only_delta_biases`` selects the
    bias-only delta rule for both ARM and synthesis.
    """

    def __init__(self, cfg: CoolChicConfig, only_delta_biases: bool = False):
        self.cfg = cfg
        self.only_delta_biases = only_delta_biases

    def _with_deltas(
        self,
        nets: Params,
        synth_delta: Optional[Sequence[jax.Array]],
        arm_delta: Optional[Sequence[jax.Array]],
    ) -> Params:
        nets = dict(nets)
        if synth_delta is not None:
            nets["synthesis"] = apply_layer_deltas(
                nets["synthesis"], synth_delta, self.only_delta_biases
            )
        if arm_delta is not None:
            nets["arm"] = apply_layer_deltas(
                nets["arm"], arm_delta, self.only_delta_biases
            )
        return nets

    def forward(
        self,
        nets: Params,
        latents: List[jax.Array],
        synth_delta: Optional[Sequence[jax.Array]] = None,
        arm_delta: Optional[Sequence[jax.Array]] = None,
        key: Optional[jax.Array] = None,
        quantizer_noise_type: str = "kumaraswamy",
        quantizer_type: str = "softround",
        soft_round_temperature: float = 0.3,
        noise_parameter: float = 1.0,
        training: bool = True,
    ):
        """Run the decoder on external latents (each ``[C, h_i, w_i]``),
        with runtime deltas (reference: LatentDecoder.forward,
        ``add_to_weight=False``). Returns (decoded, rate, extras)."""
        nets = self._with_deltas(nets, synth_delta, arm_delta)
        return coolchic_forward_latents(
            nets,
            latents,
            self.cfg,
            key=key,
            quantizer_noise_type=quantizer_noise_type,
            quantizer_type=quantizer_type,
            soft_round_temperature=soft_round_temperature,
            noise_parameter=noise_parameter,
            training=training,
        )

    def as_coolchic(
        self,
        nets: Params,
        latents: List[jax.Array],
        synth_delta: Optional[Sequence[jax.Array]] = None,
        arm_delta: Optional[Sequence[jax.Array]] = None,
        stop_grads: bool = True,
    ) -> Params:
        """Fold latents + deltas into a standard per-image params pytree
        usable by ``coolchic_forward`` / the training loop (reference:
        LatentDecoder.as_coolchic, hypernet.py:1020-1090; only the
        stop_grads=True path exists there too). Latents are stored
        unchanged — like the reference, both the latent-argument forward
        and the stored-params forward apply ``encoder_gain`` at use time,
        so ``coolchic_forward(as_coolchic(...))`` equals
        ``forward(nets, latents, ...)`` exactly.
        """
        assert stop_grads, "only the stop_grads=True path is defined"
        params = dict(self._with_deltas(nets, synth_delta, arm_delta))
        params["latents"] = list(latents)
        return jax.tree.map(jax.lax.stop_gradient, params)
