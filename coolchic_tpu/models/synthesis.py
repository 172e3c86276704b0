"""Synthesis transform: a small stack of 2-D convolutions.

Turns the dense upsampled latent [C_in, H, W] into the output image
[C_out, H, W]. Layers are described by spec strings
``"<out_ft>-<kernel_size>-<linear|residual>-<none|relu>"``
(reference: coolchic/enc/component/core/synthesis.py:175-277).

Convolutions use replicate padding (reference: synthesis.py:78) — note this
differs from the ARM's zero padding; both pad modes are format semantics.
"""

from __future__ import annotations

import math
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp


def init_synthesis_params(
    key: jax.Array,
    input_ft: int,
    parsed_layers: Sequence[Tuple[int, int, bool, bool]],
    dtype=jnp.float32,
) -> Dict[str, List[Dict[str, jax.Array]]]:
    """Initialize the conv stack (reference: synthesis.py:86-116).

    * Biases are zero.
    * Residual layers start at zero.
    * Linear layers ~ U(-sqrt(k), sqrt(k)) / out_ft^2 with
      k = 1 / (C_in * kernel_size^2).
    """
    layers = []
    in_ft = input_ft
    for out_ft, k_size, residual, _relu in parsed_layers:
        shape = (out_ft, in_ft, k_size, k_size)
        if residual:
            weight = jnp.zeros(shape, dtype)
        else:
            key, sub = jax.random.split(key)
            sqrt_k = math.sqrt(1.0 / (in_ft * k_size * k_size))
            weight = (
                (jax.random.uniform(sub, shape, dtype) - 0.5)
                * 2.0
                * sqrt_k
                / out_ft**2
            )
        layers.append({"weight": weight, "bias": jnp.zeros((out_ft,), dtype)})
        in_ft = out_ft
    return {"layers": layers}


def synthesis_apply(
    params: Dict[str, List[Dict[str, jax.Array]]],
    x: jax.Array,
    parsed_layers: Sequence[Tuple[int, int, bool, bool]],
    valid_hw=None,
) -> jax.Array:
    """Apply the synthesis stack to a dense latent [C_in, H, W].

    Each layer: replicate-pad, conv, optional residual add, optional ReLU
    (non-linearity applied after the residual, reference: synthesis.py:69-84,
    255-262).

    valid_hw: traced [2] true (H, W) for mixed-size batching — before every
    k>1 conv the buffer is replicate-extended at the true image edge so the
    valid region sees exactly the replicate padding of the unpadded encode
    (models/masking.py); 1x1 layers are pointwise and need nothing.

    Convs are expressed as per-tap channel contractions (k*k shifted
    einsums): with <= 48 channels the MXU still does the channel matmuls,
    but no ``lax.conv`` appears in the graph — under vmap XLA assigns the
    grouped-conv gradients (channel, batch)-minor tiled layouts that pad
    3 -> 128 lanes (measured 42.7x memory expansion; together with the
    shifted upsampling this cuts the batch-8 Kodak train-step HBM temps
    from 15.1G to 1.9G).
    """
    for layer, (out_ft, k_size, residual, relu) in zip(
        params["layers"], parsed_layers
    ):
        pad = (k_size - 1) // 2
        if pad and valid_hw is not None:
            from coolchic_tpu.models.masking import replicate_extend

            x = replicate_extend(x, valid_hw[0], valid_hw[1])
        w = layer["weight"]  # [out_ft, in_ft, k, k]
        if pad == 0:
            y = jnp.einsum(
                "oi,ihw->ohw", w[:, :, 0, 0], x,
                preferred_element_type=jnp.float32,
            )
        else:
            xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad)), mode="edge")
            h, wd = x.shape[-2], x.shape[-1]
            y = None
            for dy in range(k_size):
                for dx in range(k_size):
                    term = jnp.einsum(
                        "oi,ihw->ohw", w[:, :, dy, dx],
                        xp[:, dy : dy + h, dx : dx + wd],
                        preferred_element_type=jnp.float32,
                    )
                    y = term if y is None else y + term
        y = y + layer["bias"][:, None, None]
        if residual:
            y = y + x
        if relu:
            y = jax.nn.relu(y)
        x = y
    return x
