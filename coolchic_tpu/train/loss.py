"""Rate-distortion loss (reference: coolchic/enc/training/loss.py:90-163).

loss = MSE(x, x_hat) + lmbda * (R_latent + R_nn) / n_pixels

R_nn (network rate) carries no gradient — it only makes the RD cost honest
(reference: loss.py:111-115).
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp


class LossOutput(NamedTuple):
    loss: jax.Array  # scalar RD cost
    mse: jax.Array  # scalar
    psnr_db: jax.Array  # scalar
    rate_latent_bpp: jax.Array  # scalar
    rate_nn_bpp: jax.Array  # scalar
    total_rate_bpp: jax.Array  # scalar


def yuv420_mse(decoded_444: jax.Array, target_444: jax.Array) -> jax.Array:
    """Pixel-weighted YUV420 MSE computed on 444 tensors: the chroma planes
    carry 1/4 of the luma's pixels, so MSE = (4*MSE_y + MSE_u + MSE_v) / 6
    (reference: loss.py:53-87). Chroma is compared on the 2x2-subsampled
    grid (nearest), matching the 444->420 conversion of the output."""
    mse_y = jnp.mean((decoded_444[0] - target_444[0]) ** 2)
    mse_u = jnp.mean((decoded_444[1, ::2, ::2] - target_444[1, ::2, ::2]) ** 2)
    mse_v = jnp.mean((decoded_444[2, ::2, ::2] - target_444[2, ::2, ::2]) ** 2)
    return (4.0 * mse_y + mse_u + mse_v) / 6.0


def loss_function(
    decoded: jax.Array,
    rate_bits: jax.Array,
    target: jax.Array,
    lmbda: float | jax.Array,
    rate_nn_bits: float | jax.Array = 0.0,
    frame_data_type: str = "rgb",
    valid_hw: jax.Array | None = None,
) -> LossOutput:
    """Compute the RD loss for one frame.

    Args:
        decoded: [C, H, W] decoded image in [0, 1].
        rate_bits: [n_latents] per-latent rate in bits.
        target: [C, H, W] original image.
        lmbda: rate weight.
        rate_nn_bits: total network-weights rate in bits (no gradient).
        frame_data_type: "yuv420" weights the MSE 4:1:1 on the subsampled
            chroma grid (reference: loss.py:53-87); anything else is plain
            per-pixel MSE. Must be static under jit.
        valid_hw: traced [2] (true H, true W) for mixed-size batching: MSE
            and bpp are computed over the valid region only (the forward
            already masks the rate of padded latents, models/masking.py).
    """
    if valid_hw is not None:
        from coolchic_tpu.models.masking import valid_mask_2d

        m = valid_mask_2d(decoded.shape[-2], decoded.shape[-1],
                          valid_hw[0], valid_hw[1], decoded.dtype)
        n_pixels = (valid_hw[0] * valid_hw[1]).astype(decoded.dtype)
        if frame_data_type == "yuv420":
            # Masked 4:1:1 MSE on the subsampled chroma grid. 420 frames
            # have even true dims, so the even-index subsample of the luma
            # mask has exactly (hv/2)*(wv/2) ones.
            mc = m[::2, ::2]
            n_c = ((valid_hw[0] + 1) // 2 * ((valid_hw[1] + 1) // 2)).astype(
                decoded.dtype
            )
            mse_y = jnp.sum(((decoded[0] - target[0]) * m) ** 2) / n_pixels
            mse_u = jnp.sum(
                ((decoded[1, ::2, ::2] - target[1, ::2, ::2]) * mc) ** 2
            ) / n_c
            mse_v = jnp.sum(
                ((decoded[2, ::2, ::2] - target[2, ::2, ::2]) * mc) ** 2
            ) / n_c
            mse = (4.0 * mse_y + mse_u + mse_v) / 6.0
        else:
            mse = jnp.sum(((decoded - target) * m) ** 2) / (
                decoded.shape[0] * n_pixels
            )
    elif frame_data_type == "yuv420":
        mse = yuv420_mse(decoded, target)
        n_pixels = decoded.shape[-2] * decoded.shape[-1]
    else:
        mse = jnp.mean((decoded - target) ** 2)
        n_pixels = decoded.shape[-2] * decoded.shape[-1]
    rate_latent_bits = jnp.sum(rate_bits)
    rate_bpp = (rate_latent_bits + rate_nn_bits) / n_pixels
    loss = mse + lmbda * rate_bpp
    psnr_db = -10.0 * jnp.log10(mse + 1e-10)
    return LossOutput(
        loss=loss,
        mse=mse,
        psnr_db=psnr_db,
        rate_latent_bpp=rate_latent_bits / n_pixels,
        rate_nn_bpp=rate_nn_bits / n_pixels * jnp.ones(()),
        total_rate_bpp=rate_bpp,
    )
