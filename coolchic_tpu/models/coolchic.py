"""The Cool-chic frame decoder as a pure function of a parameter pytree.

Parameters of one frame:
    {
      "latents":    [ [C_i, H_i, W_i] f32, ... ]    # hierarchical grids
      "arm":        {"layers": [{"weight", "bias"}, ...]}
      "upsampling": {"ups": [...half kernels...], "preconcat": [...]}
      "synthesis":  {"layers": [{"weight", "bias"}, ...]}
    }

``coolchic_forward`` reproduces the RD math of the reference forward pass
(reference: coolchic/enc/component/coolchic.py:291-479): quantize the gained
latents, measure their rate with the teacher-forced ARM, upsample and
synthesize. Batching over images/candidates is done with ``jax.vmap`` from
the outside — nothing here carries a batch dimension.
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from coolchic_tpu.models.arm import (
    arm_apply,
    get_neighbors,
    init_arm_params,
    latent_rate_bits,
)
from coolchic_tpu.models.config import CoolChicConfig
from coolchic_tpu.models.quantizer import quantize
from coolchic_tpu.models.synthesis import init_synthesis_params, synthesis_apply
from coolchic_tpu.models.upsampling import init_upsampling_params, upsampling_apply

Params = Dict[str, Any]


from coolchic_tpu.models.masking import (  # noqa: F401  (re-exported API)
    level_valid_hw,
    replicate_extend,
    valid_mask_2d,
)


def init_coolchic_params(
    key: jax.Array,
    cfg: CoolChicConfig,
    latent_init: str = "zeros",
    dtype=jnp.float32,
) -> Params:
    """Build the parameter pytree for one frame.

    Latents start at zero (reference: coolchic.py:513-531 default) or at
    1e-2 * N(0,1) when ``latent_init == "normal"`` (used to diversify warm-up
    candidates, reference: retrain_latents.py:83-88).
    """
    k_lat, k_arm, k_syn = jax.random.split(key, 3)
    latents: List[jax.Array] = []
    for shape in cfg.latent_shapes:
        if latent_init == "zeros":
            latents.append(jnp.zeros(shape, dtype))
        else:
            k_lat, sub = jax.random.split(k_lat)
            latents.append(1e-2 * jax.random.normal(sub, shape, dtype))

    return {
        "latents": latents,
        "arm": init_arm_params(k_arm, cfg.dim_arm, cfg.n_hidden_layers_arm, dtype),
        "upsampling": init_upsampling_params(
            cfg.ups_k_size,
            cfg.ups_preconcat_k_size,
            n_ups_kernel=cfg.latent_n_grids - 1,
            n_ups_preconcat_kernel=cfg.latent_n_grids - 1,
            dtype=dtype,
        ),
        "synthesis": init_synthesis_params(
            k_syn,
            cfg.total_latent_channels,
            cfg.parsed_synthesis_layers(),
            dtype=dtype,
        ),
    }


def coolchic_forward_latents(
    net_params: Params,
    latents: List[jax.Array],
    cfg: CoolChicConfig,
    key: Optional[jax.Array] = None,
    quantizer_noise_type: str = "kumaraswamy",
    quantizer_type: str = "softround",
    soft_round_temperature: jax.Array | float = 0.3,
    noise_parameter: jax.Array | float = 1.0,
    ac_max_val: int = -1,
    training: bool = True,
) -> Tuple[jax.Array, jax.Array, Dict[str, Any]]:
    """Latent-free forward: latents passed as arguments instead of stored in
    the param pytree (reference: enc/component/nlcoolchic.py:151-160). Used
    by the hypernet/amortized path where latents come from an encoder net."""
    params = dict(net_params)
    params["latents"] = list(latents)
    return coolchic_forward(
        params,
        cfg,
        key=key,
        quantizer_noise_type=quantizer_noise_type,
        quantizer_type=quantizer_type,
        soft_round_temperature=soft_round_temperature,
        noise_parameter=noise_parameter,
        ac_max_val=ac_max_val,
        training=training,
    )


def coolchic_forward(
    params: Params,
    cfg: CoolChicConfig,
    key: Optional[jax.Array] = None,
    quantizer_noise_type: str = "kumaraswamy",
    quantizer_type: str = "softround",
    soft_round_temperature: jax.Array | float = 0.3,
    noise_parameter: jax.Array | float = 1.0,
    ac_max_val: int = -1,
    training: bool = True,
    valid_hw: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array, Dict[str, Any]]:
    """Cool-chic forward pass (reference: coolchic.py:291-479).

    1. y_hat = Q(gain * y) per latent grid. In eval mode the quantizer is
       forced to hardround with no noise (reference: coolchic.py:365-371).
    2. Rate via teacher-forced ARM + Laplace CDF over all grids at once.
    3. Dense latent via upsampling, image via synthesis.

    Args:
        params: parameter pytree (see module docstring).
        cfg: static architecture description.
        key: PRNG key, required when training with noise.
        ac_max_val: if != -1, clamp y_hat to [-ac_max_val, ac_max_val + 1]
            (bitstream writing path).
        training: static flag; False selects the eval quantizer.
        valid_hw: traced [2] int array (true H, true W) for mixed-size
            batching: latents outside the valid pyramid are forced to zero
            (zero-pad semantics of the ARM/refine), their rate masked out,
            and replicate-padded ops see the replicated valid edge — so the
            valid-region output equals the unpadded encode's. None = whole
            buffer is the image (unchanged fast path).

    Returns:
        (raw_out [C_out, H, W], rate_bits [n_latents], extras) where extras
        holds mu / log_scale / y_hat per-latent tensors for the bitstream
        writer and logs.
    """
    noise_type = quantizer_noise_type if training else "none"
    q_type = quantizer_type if training else "hardround"

    n_grids = cfg.latent_n_grids
    keys = (
        jax.random.split(key, n_grids)
        if (key is not None and noise_type != "none")
        else [None] * n_grids
    )

    y_hat: List[jax.Array] = []
    grid_masks: List[Optional[jax.Array]] = []
    for level, (latent, sub) in enumerate(zip(params["latents"], keys)):
        q = quantize(
            latent * cfg.encoder_gain,
            sub,
            noise_type,
            q_type,
            soft_round_temperature,
            noise_parameter,
        )
        if ac_max_val != -1:
            q = jnp.clip(q, -ac_max_val, ac_max_val + 1)
        if level in cfg.frozen_zero_grids:
            # Pinned-zero grid (encoder-side RD search knob, see
            # CoolChicConfig.frozen_zero_grids): zero after quantization so
            # the grid contributes nothing, its latents get no gradient,
            # and the ARM rate sees exact zeros (all-insignificant blocks).
            q = q * 0.0
        if valid_hw is not None:
            hv, wv = level_valid_hw(valid_hw, level)
            m = valid_mask_2d(q.shape[-2], q.shape[-1], hv, wv, q.dtype)
            q = q * m
            grid_masks.append(m)
        else:
            grid_masks.append(None)
        y_hat.append(q)

    # ----- ARM over all grids: either one [M, C] x [C, C] matmul chain
    # (XLA; training path — needs the backward and the mu/log_scale
    # extras), or the fused Pallas kernel (eval path behind the
    # COOLCHIC_PALLAS_EVAL flag: no [M, dim_arm] HBM context residual).
    flat_latent = jnp.concatenate([y.reshape(-1) for y in y_hat], axis=0)
    # Default ON for real TPU (A/B at flagship 512x768 dim_arm=24, same
    # chip window: pallas 51 ms vs XLA 857 ms eval forward — see
    # results/pallas_eval_ab.json); default OFF on CPU, where the kernel
    # only runs interpreted (orders of magnitude slower than XLA-CPU).
    # COOLCHIC_PALLAS_EVAL=0/1 forces either way. Scope note: this gate
    # covers EVERY eval-mode forward on TPU — in-scan validation blocks,
    # the NN-quant RD search, and vmapped/shard_mapped batch encodes — not
    # just the standalone eval (the medium RD sweep runs it in production;
    # the estimators agree to ~0.003% of total rate, pallas being f32-exact
    # where XLA eval carries bf16 matmul error). Set 0 if a toolchain
    # regression breaks pallas lowering under vmap/scan.
    pallas_flag = os.environ.get("COOLCHIC_PALLAS_EVAL", "")
    if pallas_flag == "":
        pallas_flag = "0" if jax.default_backend() == "cpu" else "1"
    use_pallas = not training and valid_hw is None and pallas_flag == "1"
    if use_pallas:
        from coolchic_tpu.ops.pallas_arm import arm_rate_pallas_pyramid, pallas_fits

        # Static VMEM-fit gate: callers jit the whole eval fn, so an
        # over-budget pallas_call would fail at compile time where the
        # runtime fallback in ops.pallas_arm.arm_rate cannot catch it.
        use_pallas = all(
            pallas_fits(hh, ww, cfg.dim_arm) for (_, hh, ww) in cfg.latent_shapes
        )
    if use_pallas:

        rate = arm_rate_pallas_pyramid(
            y_hat,
            params["arm"],
            cfg.dim_arm,
            cfg.n_hidden_layers_arm,
            interpret=jax.default_backend() == "cpu",
        )
        mu = log_scale = None
    else:
        flat_context = jnp.concatenate(
            [get_neighbors(y, cfg.dim_arm) for y in y_hat], axis=0
        )
        mu, scale, log_scale = arm_apply(params["arm"], flat_context)
        rate = latent_rate_bits(flat_latent, mu, scale)
    if valid_hw is not None:
        flat_mask = jnp.concatenate(
            [
                jnp.broadcast_to(m, y.shape).reshape(-1)
                for m, y in zip(grid_masks, y_hat)
            ]
        )
        rate = rate * flat_mask

    # ----- Upsample + synthesize.
    dense = upsampling_apply(
        params["upsampling"], y_hat, cfg.ups_k_size, cfg.ups_preconcat_k_size,
        valid_hw=valid_hw,
    )
    raw_out = synthesis_apply(
        params["synthesis"], dense, cfg.parsed_synthesis_layers(),
        valid_hw=valid_hw,
    )

    extras = {"mu": mu, "log_scale": log_scale, "flat_latent": flat_latent}
    return raw_out, rate, extras


def frame_forward(
    params: Params,
    cfg: CoolChicConfig,
    key: Optional[jax.Array] = None,
    quantizer_noise_type: str = "kumaraswamy",
    quantizer_type: str = "softround",
    soft_round_temperature: jax.Array | float = 0.3,
    noise_parameter: jax.Array | float = 1.0,
    ac_max_val: int = -1,
    training: bool = True,
    bitdepth: int = 8,
    valid_hw: Optional[jax.Array] = None,
    refs: Optional[Tuple[jax.Array, ...]] = None,
) -> Tuple[jax.Array, jax.Array, Dict[str, Any]]:
    """Frame-level forward (reference: coolchic/enc/component/frame.py:93-196).

    On top of ``coolchic_forward``: for P/B frames (``cfg.frame_type``),
    the synthesized flow/gain channels motion-compensate the reference
    frame(s) in ``refs`` (float twin of the decoder's process_inter; the
    reference encoder has this step commented out, frame.py:165-172 — here
    it is wired). In eval mode, simulate the round-trip to an integer file
    (round to ``2^bitdepth - 1`` levels) then clamp to [0, 1]. (YUV420
    down-conversion is handled by the YUV I/O layer.)
    """
    raw_out, rate, extras = coolchic_forward(
        params,
        cfg,
        key=key,
        quantizer_noise_type=quantizer_noise_type,
        quantizer_type=quantizer_type,
        soft_round_temperature=soft_round_temperature,
        noise_parameter=noise_parameter,
        ac_max_val=ac_max_val,
        training=training,
        valid_hw=valid_hw,
    )
    max_dynamic = 2.0**bitdepth - 1.0
    if cfg.frame_type == "I":
        decoded = raw_out
        if not training:
            decoded = jnp.round(decoded * max_dynamic) / max_dynamic
    elif training:
        from coolchic_tpu.video.intercoding import inter_predict

        assert refs is not None and len(refs) >= 1, (
            f"{cfg.frame_type} frame forward needs reference frame(s)"
        )
        decoded = inter_predict(
            raw_out, refs[0], refs[1] if cfg.frame_type == "B" else None,
            cfg.flow_gain,
        )
    else:
        # Eval-mode P/B: run the DECODER's fixed-point motion compensation
        # (video/intercoding.py inter_predict_int) on 12-frac integers so
        # the estimate matches what the bitstream decodes to — the float
        # warp drifts ~0.4 dB from the integer pipeline on barely-trained
        # flow fields. Refs go through the decoder's storage round-trip
        # ((round(ref*max_dyn) << 12) // max_dyn, cpp ccz_decode_video),
        # and the output through its bitdepth quantization.
        from coolchic_tpu.video.intercoding import inter_predict_int

        assert refs is not None and len(refs) >= 1, (
            f"{cfg.frame_type} frame forward needs reference frame(s)"
        )
        md = jnp.int32(round(max_dynamic))

        def store12(ref):
            vq = jnp.round(ref * max_dynamic).astype(jnp.int32)
            return (vq << 12) // md

        raw12 = jnp.round(raw_out * 4096.0).astype(jnp.int32)
        out12 = inter_predict_int(
            raw12,
            store12(refs[0]),
            store12(refs[1]) if cfg.frame_type == "B" else None,
            cfg.flow_gain,
        )
        # (f444 * max_dyn + HALF) >> PREC, clamped (ccz_decode_video)
        vq = jnp.clip((out12 * md + 2048) >> 12, 0, md)
        decoded = vq.astype(raw_out.dtype) / max_dynamic
    decoded = jnp.clip(decoded, 0.0, 1.0)
    return decoded, rate, extras


# --------------------------------------------------------------------------- #
# Complexity accounting (MAC / decoded pixel), replacing fvcore
# (reference: coolchic.py:611-650, 716-728). Counted analytically on the
# *eval* path: separable 1-D upsampling passes, as the C++ decoder runs them.
# --------------------------------------------------------------------------- #
def xla_cost_analysis(cfg: CoolChicConfig) -> Dict[str, float]:
    """Compiler-measured decode cost: XLA's own flop/byte counts for the
    eval forward (the TPU-native replacement for the reference's fvcore
    accounting, reference: coolchic.py:611-650). Returns flops (2 flops =
    1 MAC), flops/pixel, and HBM bytes accessed."""
    import jax

    params = init_coolchic_params(jax.random.PRNGKey(0), cfg)

    def fwd(p):
        return coolchic_forward(p, cfg, training=False)[0]

    compiled = jax.jit(fwd).lower(params).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):  # older jax returns a per-computation list
        cost = cost[0]
    flops = float(cost.get("flops", 0.0))
    return {
        "flops": flops,
        "flops_per_pixel": flops / cfg.n_pixels,
        "bytes_accessed": float(cost.get("bytes accessed", 0.0)),
    }


def macs_per_pixel(cfg: CoolChicConfig) -> Dict[str, float]:
    """Analytic multiply-accumulate count per decoded pixel."""
    h, w = cfg.img_size
    n_pix = h * w
    shapes = cfg.latent_shapes

    # ARM: per latent pixel, n_hidden residual CxC matmuls + Cx2 head.
    n_latents = sum(c * hh * ww for c, hh, ww in shapes)
    arm_macs = n_latents * (
        cfg.n_hidden_layers_arm * cfg.dim_arm * cfg.dim_arm + cfg.dim_arm * 2
    )

    # Upsampling (separable eval path): each x2 step runs two 1-D passes of
    # size ups_k over every output pixel, plus the pre-concat filter's two
    # 1-D passes of size ups_preconcat_k over the target grid.
    ups_macs = 0
    acc_px = shapes[-1][0] * shapes[-1][1] * shapes[-1][2]
    for i in range(len(shapes) - 2, -1, -1):
        c_i, h_i, w_i = shapes[i]
        up_px = 4 * acc_px  # 2x upsampling of the running tensor
        # polyphase x2: each output needs ups_k/2 taps per 1-D pass
        # (2 passes -> ups_k MACs/output), as the decoder runs it
        ups_macs += up_px * cfg.ups_k_size
        ups_macs += (c_i * h_i * w_i) * 2 * cfg.ups_preconcat_k_size
        acc_px = up_px + c_i * h_i * w_i  # after crop this slightly overcounts
    # Synthesis: dense convs at full resolution.
    syn_macs = 0
    in_ft = cfg.total_latent_channels
    for out_ft, k_size, _res, _relu in cfg.parsed_synthesis_layers():
        syn_macs += n_pix * in_ft * out_ft * k_size * k_size
        in_ft = out_ft

    total = arm_macs + ups_macs + syn_macs
    return {
        "arm": arm_macs / n_pix,
        "upsampling": ups_macs / n_pix,
        "synthesis": syn_macs / n_pix,
        "total": total / n_pix,
    }
