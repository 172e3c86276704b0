"""Inter-frame tools: optical-flow warping and bi-prediction.

JAX bilinear warp matching the reference's grid_sample-based motion
compensation (reference: coolchic/enc/component/intercoding.py:20-63 and
the fixed-point decoder twin cpp/ccdecapi.cpp:496-646). Note the reference
FrameEncoder currently bypasses its inter module in the forward
(reference: enc/component/frame.py:165-172) — frames are coded
independently and the coding structure only drives the per-depth lambda;
the warp utilities are provided for the inter path and its tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def warp(x: jax.Array, flow: jax.Array) -> jax.Array:
    """Bilinear backward warp with border padding and out-of-bounds masking.

    Args:
        x: [C, H, W] reference image.
        flow: [2, H, W] optical flow (dx, dy) in pixels.

    Returns:
        [C, H, W] warped image; samples whose bilinear footprint leaves the
        image entirely are zeroed (the reference masks grid_sample with
        a warped all-ones tensor, intercoding.py:51-63).
    """
    c, h, w = x.shape
    yy, xx = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    sx = xx + flow[0]
    sy = yy + flow[1]

    # Out-of-bounds mask before clamping (border padding afterwards).
    inb = (sx >= 0) & (sx <= w - 1) & (sy >= 0) & (sy <= h - 1)
    sx = jnp.clip(sx, 0.0, w - 1)
    sy = jnp.clip(sy, 0.0, h - 1)

    x0 = jnp.floor(sx).astype(jnp.int32)
    y0 = jnp.floor(sy).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    fx = sx - x0
    fy = sy - y0

    def gather(yi, xi):
        return x[:, yi, xi]  # [C, H, W]

    out = (
        gather(y0, x0) * (1 - fx) * (1 - fy)
        + gather(y0, x1) * fx * (1 - fy)
        + gather(y1, x0) * (1 - fx) * fy
        + gather(y1, x1) * fx * fy
    )
    return out * inb


def bipred(ref0: jax.Array, ref1: jax.Array, flow0: jax.Array, flow1: jax.Array,
           beta: jax.Array | float = 0.5) -> jax.Array:
    """Bi-directional prediction: beta-weighted blend of two warped
    references (reference: cpp/ccdecapi.cpp:602-646)."""
    return beta * warp(ref0, flow0) + (1.0 - beta) * warp(ref1, flow1)
