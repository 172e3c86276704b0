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


def warp_decoder_style(x: jax.Array, flow: jax.Array) -> jax.Array:
    """Bilinear backward warp with BORDER CLAMPING — the float twin of the
    fixed-point decoder's motion compensation (reference:
    cpp/ccdecapi.cpp:496-600 warp; integer twin bitstream/inter.py
    warp_int). Out-of-range samples replicate the edge instead of being
    zeroed, so a model trained with this forward decodes to (nearly) the
    same pixels through the integer pipeline."""
    c, h, w = x.shape
    yy, xx = jnp.meshgrid(
        jnp.arange(h, dtype=flow.dtype), jnp.arange(w, dtype=flow.dtype),
        indexing="ij",
    )
    sx = jnp.clip(xx + flow[0], 0.0, w - 1)
    sy = jnp.clip(yy + flow[1], 0.0, h - 1)
    x0 = jnp.floor(sx).astype(jnp.int32)
    y0 = jnp.floor(sy).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    fx = sx - x0
    fy = sy - y0
    return (
        x[:, y0, x0] * (1 - fx) * (1 - fy)
        + x[:, y0, x1] * fx * (1 - fy)
        + x[:, y1, x0] * (1 - fx) * fy
        + x[:, y1, x1] * fx * fy
    )


def inter_predict(
    raw_out: jax.Array,
    ref0: jax.Array,
    ref1: jax.Array | None,
    flow_gain: int | float = 1,
) -> jax.Array:
    """Float inter reconstruction from the synthesis output — the training
    forward of P/B frames (float twin of the decoder's process_inter,
    reference: cpp/ccdecapi.cpp:649-671; integer twin
    bitstream/inter.py process_inter_int).

    Channel layout (reference raw_cc_output):
      P (6): residue[0:3], flow xy[3:5], alpha[5]
      B (9): residue[0:3], flow0 xy[3:5], alpha[5], flow1 xy[6:8], beta[8]
    with gain channels mapped through ``clip(v + 0.5, 0, 1)``.
    """
    c = raw_out.shape[0]
    alpha = jnp.clip(raw_out[5] + 0.5, 0.0, 1.0)
    if c == 6:
        pred = warp_decoder_style(ref0, raw_out[3:5] * flow_gain)
        return pred * alpha + raw_out[:3]
    assert c == 9 and ref1 is not None
    beta = jnp.clip(raw_out[8] + 0.5, 0.0, 1.0)
    p0 = warp_decoder_style(ref0, raw_out[3:5] * flow_gain) * beta
    p1 = warp_decoder_style(ref1, raw_out[6:8] * flow_gain) * (1.0 - beta)
    return (p0 + p1) * alpha + raw_out[:3]


# --------------------------------------------------------------------------- #
# Integer-exact eval twin: the decoder's fixed-point motion compensation
# (bitstream/inter.py process_inter_int / cpp ccz_warp+ccz_bpred) in jnp,
# so the ENCODER's eval-mode P/B estimate matches what the bitstream will
# actually decode to. The float path above stays the training forward
# (differentiable); this one is eval-only (int32 arithmetic, no gradient).
# --------------------------------------------------------------------------- #

_PREC = 12  # SYN_LAYER_PRECISION (bitstream/inter.py PREC)
_ONE = 1 << _PREC
_HALF = 1 << (_PREC - 1)


def _gain_int(raw_ch: jax.Array, invert: bool) -> jax.Array:
    g = jnp.clip(raw_ch + _HALF, 0, _ONE)
    return (_ONE - g) if invert else g


def _warp_int_jax(ref: jax.Array, raw: jax.Array, xy_idx: int, gain_idx: int,
                  flow_gain: int, add_residue: bool,
                  invert_gain: bool = False) -> jax.Array:
    """jnp twin of bitstream/inter.py warp_int (int32; flows clamped to
    keep every intermediate in range — the decoder's int32 envelope)."""
    _, h, w = ref.shape
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.int32),
                          jnp.arange(w, dtype=jnp.int32), indexing="ij")
    fl = jnp.clip(raw[xy_idx : xy_idx + 2], -(1 << 22), 1 << 22)
    px = fl[0] * flow_gain + (xx << _PREC)
    py = fl[1] * flow_gain + (yy << _PREC)

    def floor_axis(p, n):
        b0 = jnp.where(p < 0, (p - (_ONE - 1)) >> _PREC, p >> _PREC)
        d = p - (b0 << _PREC)
        low = b0 < 0
        high = b0 >= n - 1
        b0 = jnp.clip(b0, 0, n - 1)
        b1 = jnp.where(low | high, b0, b0 + 1)
        d = jnp.where(low | high, 0, d)
        return b0, b1, d

    bx0, bx1, dx = floor_axis(px, w)
    by0, by1, dy = floor_axis(py, h)
    gain = _gain_int(raw[gain_idx], invert_gain)

    a = ref[:, by0, bx0]
    b = ref[:, by0, bx1]
    cc = ref[:, by1, bx0]
    d = ref[:, by1, bx1]
    h0 = a + (((b - a) * dx) >> _PREC)
    h1 = cc + (((d - cc) * dx) >> _PREC)
    v = ((h1 - h0) * dy) >> _PREC
    out = ((h0 + v) * gain) >> _PREC
    if add_residue:
        out = out + raw[:3]
    return out


def inter_predict_int(
    raw12: jax.Array,
    ref0_12: jax.Array,
    ref1_12: jax.Array | None,
    flow_gain: int,
) -> jax.Array:
    """Integer inter reconstruction (jnp twin of
    bitstream/inter.py process_inter_int; reference:
    cpp/ccdecapi.cpp:649-671). ``raw12`` is the [6|9, H, W] synthesis
    output and refs the stored references, all int32 at 12 frac bits."""
    c = raw12.shape[0]
    if c == 6:
        return _warp_int_jax(ref0_12, raw12, xy_idx=3, gain_idx=5,
                             flow_gain=flow_gain, add_residue=True)
    assert c == 9 and ref1_12 is not None
    p0 = _warp_int_jax(ref0_12, raw12, xy_idx=3, gain_idx=8,
                       flow_gain=flow_gain, add_residue=False)
    p1 = _warp_int_jax(ref1_12, raw12, xy_idx=6, gain_idx=8,
                       flow_gain=flow_gain, add_residue=False,
                       invert_gain=True)
    gain = _gain_int(raw12[5], invert=False)
    return (((p0 + p1) * gain) >> _PREC) + raw12[:3]
