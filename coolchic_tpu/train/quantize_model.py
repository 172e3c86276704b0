"""Post-training quantization of the decoder networks: RD grid search.

For each module sent to the decoder (arm, synthesis, upsampling — greedy, in
sorted name order), find the (q_step_weight, q_step_bias) pair minimizing
  MSE + lmbda * (R_latent + R_nn) / n_pixels
where R_nn is measured with the best exponential-Golomb order per parameter
family (reference: coolchic/enc/training/quantizemodel.py:118-309).

TPU-first re-design: the reference evaluates the ~150-325 (dw, db) pairs in
a serial Python loop, one full forward each. Here every pair is evaluated by
a single ``lax.map`` over the pair grid (chunked to bound memory), and all
13 exp-Golomb orders are scored with one vectorized reduction instead of a
loop — the whole search stays inside one XLA program and is vmap-able over
a batch of images.

Q-step / exp-Golomb tables (format constants) mirror
reference: coolchic/enc/utils/misc.py:111-145.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from coolchic_tpu.models.coolchic import frame_forward
from coolchic_tpu.models.config import CoolChicConfig
from coolchic_tpu.train.loss import loss_function

Params = Dict[str, Any]

MAX_AC_MAX_VAL = 65535  # 16-bit header field (reference: misc.py:152)

# Possible quantization steps per module (reference: misc.py:111-130).
Q_STEPS: Dict[str, Dict[str, np.ndarray]] = {
    "arm": {
        "weight": 2.0 ** np.linspace(-8, 0, 9),
        "bias": 2.0 ** np.linspace(-16, 0, 17),
    },
    "upsampling": {
        "weight": 2.0 ** np.linspace(-12, 0, 13),
        "bias": np.array([1.0]),
    },
    "synthesis": {
        "weight": 2.0 ** np.linspace(-12, 0, 13),
        "bias": 2.0 ** np.linspace(-24, 0, 25),
    },
}
EXP_GOL_COUNTS = np.arange(13)  # reference: misc.py:132-145

# Greedy order = sorted module names (reference: quantizemodel.py:183).
MODULES_TO_SEND = ("arm", "synthesis", "upsampling")


def _module_leaves(params: Params, module: str) -> Tuple[List[jax.Array], List[jax.Array]]:
    """Split a module's parameters into (weights, biases) leaf lists.

    The upsampling half-kernels count as weights; the reference's upsampling
    bias parameters are dead (never used in the forward, always zero,
    reference: upsampling.py:129-131) and are not represented here — the
    bitstream layer accounts for them as zero symbols.
    """
    m = params[module]
    if module == "upsampling":
        return list(m["ups"]) + list(m["preconcat"]), []
    weights = [layer["weight"] for layer in m["layers"]]
    biases = [layer["bias"] for layer in m["layers"]]
    return weights, biases


def _rebuild_module(params: Params, module: str, weights, biases) -> Params:
    new = dict(params)
    if module == "upsampling":
        n_ups = len(params[module]["ups"])
        new[module] = {"ups": weights[:n_ups], "preconcat": weights[n_ups:]}
    else:
        new[module] = {
            "layers": [
                {"weight": w, "bias": b}
                for w, b in zip(weights, biases)
            ]
        }
    return new


def expgol_bits_all_counts(v: jax.Array) -> jax.Array:
    """Bits to code integer symbols ``v`` with exp-Golomb order c, for every
    c in 0..12 at once (reference: misc.py:248-268). Returns [13]."""
    counts = jnp.asarray(EXP_GOL_COUNTS, jnp.float32)  # [13]
    av = jnp.abs(v)[:, None]  # [N, 1]
    nbins = (
        2.0 * jnp.floor(jnp.log2(av / (2.0**counts) + 1.0))
        + counts
        + 1.0
        + (av != 0)
    )
    return jnp.sum(nbins, axis=0)


class ModuleQuantInfo(NamedTuple):
    q_step_w: jax.Array  # chosen weight q-step (scalar)
    q_step_b: jax.Array  # chosen bias q-step (scalar, 1.0 when no biases)
    expgol_w: jax.Array  # chosen exp-Golomb order for weights (int32)
    expgol_b: jax.Array  # chosen exp-Golomb order for biases (int32)
    rate_bits: jax.Array  # module rate with those choices (scalar)


def _quantize_leaves(leaves, q_step):
    """round(p / q) * q per leaf, plus overflow validity and integer symbols."""
    q_leaves, ints, valid = [], [], jnp.bool_(True)
    for p in leaves:
        sent = jnp.round(p / q_step)
        valid = valid & (jnp.max(jnp.abs(sent)) <= MAX_AC_MAX_VAL)
        q_leaves.append(sent * q_step)
        ints.append(sent.reshape(-1))
    return q_leaves, (jnp.concatenate(ints) if ints else None), valid


def quantize_module(
    params: Params,
    module: str,
    target: jax.Array,
    lmbda: jax.Array | float,
    cfg: CoolChicConfig,
    other_nn_rate_bits: jax.Array | float,
    map_batch: int = 8,
    valid_hw=None,
) -> Tuple[Params, ModuleQuantInfo]:
    """RD-search the (q_step_w, q_step_b) grid for one module."""
    from coolchic_tpu.train.step import split_target

    target, refs = split_target(cfg, target)
    w_steps = np.asarray(Q_STEPS[module]["weight"], np.float32)
    b_steps = np.asarray(Q_STEPS[module]["bias"], np.float32)
    weights, biases = _module_leaves(params, module)
    has_bias = len(biases) > 0
    if not has_bias:
        b_steps = np.array([1.0], np.float32)

    pair_w, pair_b = np.meshgrid(w_steps, b_steps, indexing="ij")
    pair_w = jnp.asarray(pair_w.reshape(-1))
    pair_b = jnp.asarray(pair_b.reshape(-1))
    n_pairs = pair_w.shape[0]

    def eval_pair(i):
        dw, db = pair_w[i], pair_b[i]
        qw, int_w, valid_w = _quantize_leaves(weights, dw)
        if has_bias:
            qb, int_b, valid_b = _quantize_leaves(biases, db)
        else:
            qb, int_b, valid_b = [], None, jnp.bool_(True)
        valid = valid_w & valid_b

        trial = _rebuild_module(params, module, qw, qb)
        decoded, rate, _ = frame_forward(
            trial, cfg, training=False, valid_hw=valid_hw, refs=refs
        )

        bits_w_all = expgol_bits_all_counts(int_w)
        bits_w, cnt_w = jnp.min(bits_w_all), jnp.argmin(bits_w_all)
        if int_b is not None:
            bits_b_all = expgol_bits_all_counts(int_b)
            bits_b, cnt_b = jnp.min(bits_b_all), jnp.argmin(bits_b_all)
        else:
            bits_b, cnt_b = jnp.float32(0.0), jnp.int32(0)

        nn_bits = bits_w + bits_b + other_nn_rate_bits
        loss = loss_function(decoded, rate, target, lmbda, nn_bits,
                             valid_hw=valid_hw).loss
        loss = jnp.where(valid, loss, jnp.inf)
        return loss, bits_w + bits_b, cnt_w.astype(jnp.int32), cnt_b.astype(jnp.int32)

    losses, rates, cnts_w, cnts_b = jax.lax.map(
        eval_pair, jnp.arange(n_pairs), batch_size=min(map_batch, n_pairs)
    )
    best = jnp.argmin(losses)
    dw, db = pair_w[best], pair_b[best]

    qw, _, _ = _quantize_leaves(weights, dw)
    qb = _quantize_leaves(biases, db)[0] if has_bias else []
    new_params = _rebuild_module(params, module, qw, qb)
    info = ModuleQuantInfo(
        q_step_w=dw,
        q_step_b=db,
        expgol_w=cnts_w[best],
        expgol_b=cnts_b[best],
        rate_bits=rates[best],
    )
    return new_params, info


@partial(jax.jit, static_argnames=("cfg",))
def quantize_model_with_info(
    params: Params,
    target: jax.Array,
    lmbda: jax.Array | float,
    cfg: CoolChicConfig,
    valid_hw=None,
) -> Tuple[Params, Dict[str, ModuleQuantInfo]]:
    """Quantize all decoder-side networks greedily (arm -> synthesis ->
    upsampling, sorted order as the reference) and return the quantized
    params plus per-module (q-step, exp-Golomb, rate) choices."""
    infos: Dict[str, ModuleQuantInfo] = {}
    other_rate = jnp.float32(0.0)
    for module in MODULES_TO_SEND:
        params, info = quantize_module(
            params, module, target, lmbda, cfg, other_rate, valid_hw=valid_hw
        )
        infos[module] = info
        other_rate = other_rate + info.rate_bits
    return params, infos


def quantize_model(
    params: Params, target: jax.Array, lmbda: jax.Array | float, cfg: CoolChicConfig
) -> Params:
    return quantize_model_with_info(params, target, lmbda, cfg)[0]


def total_nn_rate_bits(infos: Dict[str, ModuleQuantInfo]) -> jax.Array:
    return sum(info.rate_bits for info in infos.values())


# --------------------------------------------------------------------------- #
# Hypernet-predicted weight DELTAS: quantize what would be transmitted
# (reference: coolchic/enc/training/quantizemodel.py:443-616).
# --------------------------------------------------------------------------- #
def _combine_nets(base: Params, deltas: Dict[str, Params]) -> Params:
    """decoder = shared base + per-image deltas, per module."""
    return {
        m: jax.tree.map(lambda b, d: b + d, base[m], deltas[m]) for m in base
    }


def quantize_delta_module(
    base: Params,
    deltas: Dict[str, Params],
    module: str,
    latents,
    target: jax.Array,
    lmbda: jax.Array | float,
    cfg: CoolChicConfig,
    other_nn_rate_bits: jax.Array | float,
    map_batch: int = 8,
) -> Tuple[Params, ModuleQuantInfo]:
    """RD-search the (q_step_w, q_step_b) grid over one module's DELTA
    leaves; the decoder evaluated is base + (deltas with this module
    quantized), exactly the reference's functional_call evaluation
    (reference: quantizemodel.py:491-570)."""
    from coolchic_tpu.models.coolchic import coolchic_forward_latents

    w_steps = np.asarray(Q_STEPS[module]["weight"], np.float32)
    b_steps = np.asarray(Q_STEPS[module]["bias"], np.float32)
    weights, biases = _module_leaves(deltas, module)
    has_bias = len(biases) > 0
    if not has_bias:
        b_steps = np.array([1.0], np.float32)

    pair_w, pair_b = np.meshgrid(w_steps, b_steps, indexing="ij")
    pair_w = jnp.asarray(pair_w.reshape(-1))
    pair_b = jnp.asarray(pair_b.reshape(-1))
    n_pairs = pair_w.shape[0]

    def eval_pair(i):
        dw, db = pair_w[i], pair_b[i]
        qw, int_w, valid_w = _quantize_leaves(weights, dw)
        if has_bias:
            qb, int_b, valid_b = _quantize_leaves(biases, db)
        else:
            qb, int_b, valid_b = [], None, jnp.bool_(True)
        valid = valid_w & valid_b

        trial_deltas = _rebuild_module(deltas, module, qw, qb)
        nets = _combine_nets(base, trial_deltas)
        decoded, rate, _ = coolchic_forward_latents(
            nets, latents, cfg, training=False
        )

        bits_w_all = expgol_bits_all_counts(int_w)
        bits_w, cnt_w = jnp.min(bits_w_all), jnp.argmin(bits_w_all)
        if int_b is not None:
            bits_b_all = expgol_bits_all_counts(int_b)
            bits_b, cnt_b = jnp.min(bits_b_all), jnp.argmin(bits_b_all)
        else:
            bits_b, cnt_b = jnp.float32(0.0), jnp.int32(0)

        nn_bits = bits_w + bits_b + other_nn_rate_bits
        loss = loss_function(decoded, rate, target, lmbda, nn_bits).loss
        loss = jnp.where(valid, loss, jnp.inf)
        return loss, bits_w + bits_b, cnt_w.astype(jnp.int32), cnt_b.astype(jnp.int32)

    losses, rates, cnts_w, cnts_b = jax.lax.map(
        eval_pair, jnp.arange(n_pairs), batch_size=min(map_batch, n_pairs)
    )
    best = jnp.argmin(losses)
    dw, db = pair_w[best], pair_b[best]

    qw, _, _ = _quantize_leaves(weights, dw)
    qb = _quantize_leaves(biases, db)[0] if has_bias else []
    new_deltas = _rebuild_module(deltas, module, qw, qb)
    info = ModuleQuantInfo(
        q_step_w=dw,
        q_step_b=db,
        expgol_w=cnts_w[best],
        expgol_b=cnts_b[best],
        rate_bits=rates[best],
    )
    return new_deltas, info


@partial(jax.jit, static_argnames=("cfg",))
def quantize_model_deltas(
    base: Params,
    deltas: Dict[str, Params],
    latents,
    target: jax.Array,
    lmbda: jax.Array | float,
    cfg: CoolChicConfig,
) -> Tuple[Dict[str, Params], Dict[str, ModuleQuantInfo]]:
    """Quantize the hypernet-predicted weight deltas greedily per module
    (sorted order), measuring rate on the delta symbols — so a hypernet
    output can be costed/transmitted as base-decoder + quantized deltas
    (reference: quantizemodel.py:443-616).

    Args:
        base: shared decoder nets (arm/upsampling/synthesis — no latents).
        deltas: per-module delta pytrees, same structure as ``base``.
        latents: per-image latent grids in the forward convention of
            ``DeltaWholeNet.forward`` (list of [C, h, w]).
        target: [3, H, W] image.

    Returns:
        (quantized deltas, per-module ModuleQuantInfo).
    """
    infos: Dict[str, ModuleQuantInfo] = {}
    other_rate = jnp.float32(0.0)
    for module in MODULES_TO_SEND:
        deltas, info = quantize_delta_module(
            base, deltas, module, latents, target, lmbda, cfg, other_rate
        )
        infos[module] = info
        other_rate = other_rate + info.rate_bits
    return deltas, infos
