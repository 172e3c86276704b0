"""Auto-Regressive Module (ARM): entropy model over causal spatial contexts.

The ARM predicts, for every latent pixel, the (mu, scale) of a Laplace
distribution from up to 32 causal neighbors, via a small residual MLP
(reference: coolchic/enc/component/core/arm.py:159-268).

TPU-first design notes:
  * During *training* the ARM is teacher-forced: contexts are gathered from
    the already-quantized latent tensor in parallel (reference
    coolchic.py:392-424 — sequential decode only exists in the bitstream
    decoder). We therefore gather contexts with static shifted slices of a
    zero-padded grid — pure XLA slicing, no gather/unfold — and run ONE big
    [M, C] x [C, C] matmul over all latent pixels of all grids, which maps
    straight onto the MXU.
  * The context layout (row-major indices into a 9x9 causal mask) is part of
    the bitstream format, so the index tables match the reference
    (arm.py:373-506) exactly.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp

# Mask is always 9x9; only the first 40 positions (raster order, before the
# center pixel) are causal (reference: enc/utils/misc.py:92, arm.py:308-352).
MASK_SIZE = 9
_PAD = (MASK_SIZE - 1) // 2  # 4

# Indices of the context pixels inside the flattened 9x9 window, for each
# supported context size. Same tables as the reference (arm.py:398-501);
# they are format constants (the C++ decoder hardcodes the same stencils).
# fmt: off
NON_ZERO_PIXEL_CTX_INDEX: Dict[int, Tuple[int, ...]] = {
    8: (13, 22, 30, 31, 32, 37, 38, 39),
    16: (13, 14, 20, 21, 22, 23, 24, 28, 29, 30, 31, 32, 33, 37, 38, 39),
    24: (4, 11, 12, 13, 14, 15, 19, 20, 21, 22, 23, 24, 25, 28, 29, 30, 31,
         32, 33, 34, 36, 37, 38, 39),
    32: (2, 3, 4, 5, 10, 11, 12, 13, 14, 15, 16, 19, 20, 21, 22, 23, 24, 25,
         26, 27, 28, 29, 30, 31, 32, 33, 34, 35, 36, 37, 38, 39),
}
# fmt: on


def context_offsets(dim_arm: int) -> Tuple[Tuple[int, int], ...]:
    """(dy, dx) offsets of each context pixel relative to the top-left of the
    zero-padded window, i.e. context p of pixel (i, j) is
    x_pad[i + dy, j + dx] with x_pad zero-padded by 4 on every side."""
    return tuple(
        (idx // MASK_SIZE, idx % MASK_SIZE) for idx in NON_ZERO_PIXEL_CTX_INDEX[dim_arm]
    )


def get_neighbors(x: jax.Array, dim_arm: int) -> jax.Array:
    """Gather the causal context of every pixel of a single-channel grid.

    Equivalent to the reference pad+unfold+index_select
    (reference: arm.py:308-352) but expressed as ``dim_arm`` static shifted
    slices of the zero-padded grid, which XLA fuses into cheap strided reads.

    Args:
        x: [C, H, W] latent grid (every channel treated independently).
        dim_arm: number of context pixels (8/16/24/32).

    Returns:
        [C * H * W, dim_arm] contexts in raster order (channel-major),
        matching the reference ordering of the flattened latent.
    """
    c, h, w = x.shape
    x_pad = jnp.pad(x, ((0, 0), (_PAD, _PAD), (_PAD, _PAD)))
    ctx = [
        x_pad[:, dy : dy + h, dx : dx + w] for (dy, dx) in context_offsets(dim_arm)
    ]
    # [dim_arm, C, H, W] -> [C, H, W, dim_arm] -> [C*H*W, dim_arm]
    return jnp.stack(ctx, axis=-1).reshape(c * h * w, dim_arm)


# --------------------------------------------------------------------------- #
# ARM MLP: residual hidden layers (ReLU after residual add) + 2-wide head.
# --------------------------------------------------------------------------- #
def init_arm_params(
    key: jax.Array, dim_arm: int, n_hidden_layers_arm: int, dtype=jnp.float32
) -> Dict[str, List[Dict[str, jax.Array]]]:
    """Initialize ARM parameters (reference: arm.py:66-84, 198-225).

    Hidden (residual) layers start at zero; the 2-output head is sampled
    from N(0, 1/out^4) i.e. randn / out_channels**2. Biases are zero.
    """
    layers = []
    for _ in range(n_hidden_layers_arm):
        layers.append(
            {
                "weight": jnp.zeros((dim_arm, dim_arm), dtype),
                "bias": jnp.zeros((dim_arm,), dtype),
            }
        )
    key, sub = jax.random.split(key)
    out_channels = 2
    layers.append(
        {
            "weight": jax.random.normal(sub, (out_channels, dim_arm), dtype)
            / out_channels**2,
            "bias": jnp.zeros((out_channels,), dtype),
        }
    )
    return {"layers": layers}


def arm_apply(
    params: Dict[str, List[Dict[str, jax.Array]]], ctx: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Run the ARM MLP on flattened contexts.

    Args:
        params: output of ``init_arm_params``.
        ctx: [M, C] context matrix.

    Returns:
        (mu [M], scale [M], log_scale [M]); scale = exp(clamp(raw - 4,
        -4.6, 5.0)) so that scale is within [1e-2, ~150]
        (reference: arm.py:261-268).
    """
    x = ctx
    layers = params["layers"]
    for layer in layers[:-1]:
        # Residual layer followed by ReLU (reference: arm.py:218-221).
        x = jax.nn.relu(
            jnp.dot(x, layer["weight"].T, preferred_element_type=jnp.float32)
            + layer["bias"]
            + x
        )
    head = layers[-1]
    raw = (
        jnp.dot(x, head["weight"].T, preferred_element_type=jnp.float32)
        + head["bias"]
    )
    mu = raw[..., 0]
    log_scale = raw[..., 1]
    scale = jnp.exp(jnp.clip(log_scale - 4.0, -4.6, 5.0))
    return mu, scale, log_scale


def laplace_cdf(x: jax.Array, mu: jax.Array, scale: jax.Array) -> jax.Array:
    """Laplace CDF evaluated at x (reference: arm.py:355-370)."""
    shifted = x - mu
    return 0.5 - 0.5 * jnp.sign(shifted) * jnp.expm1(-jnp.abs(shifted) / scale)


def latent_rate_bits(
    y_hat: jax.Array, mu: jax.Array, scale: jax.Array
) -> jax.Array:
    """Per-latent rate in bits: -log2(CDF(y+.5) - CDF(y-.5)), clamped so no
    value costs more than 16 bits (reference: coolchic.py:419-424)."""
    proba = jnp.clip(
        laplace_cdf(y_hat + 0.5, mu, scale) - laplace_cdf(y_hat - 0.5, mu, scale),
        min=2.0**-16,
    )
    return -jnp.log2(proba)
