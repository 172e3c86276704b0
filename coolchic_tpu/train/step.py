"""Per-image overfitting engine: one jit-compiled scan per training phase.

The reference trains with a Python loop around Adam plus host-side
patience / best-model bookkeeping (reference: coolchic/enc/training/
train.py:57-374). Here the *entire phase* — gradient steps, periodic
eval-mode validation, record keeping, patience-triggered rollback and the
cosine LR / temperature / noise schedules — is a single ``lax.scan`` whose
carry holds both the live and the best (params, opt-state). That makes a
full phase one XLA program: no host round-trips, and the whole thing can be
``vmap``-ed over candidates and over images for mass overfitting
(the TPU-native replacement for the reference's SLURM job arrays,
SURVEY.md §2.3).

Faithfulness notes vs the reference loop:
  * LR / softround-temperature / noise schedules are stepped once per
    validation block, as the reference does (train.py:272-368).
  * Patience is evaluated at block granularity; the reference checks every
    iteration but only ever *changes* state after a validation, and every
    preset's patience is a multiple of freq_valid, so behavior matches.
  * A "new record" needs loss < best AND (delta_bpp < 0.001 or
    delta_psnr > 0.001) (train.py:282-289).
  * Without LR scheduling, exceeding patience ends the phase
    (train.py:238-240) — modeled with an ``active`` flag that freezes all
    further updates (same result, bounded extra FLOPs).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from coolchic_tpu.models.coolchic import frame_forward
from coolchic_tpu.models.config import CoolChicConfig
from coolchic_tpu.train.loss import LossOutput, loss_function
from coolchic_tpu.train.presets import TrainerPhase

Params = Dict[str, Any]

GRAD_CLIP_NORM = 0.1  # reference: train.py:265


def _linear_schedule(v0: float, v1: float, t: jax.Array | float, t_max: float):
    """Linear interpolation from v0 (t=0) to v1 (t=t_max)
    (reference: train.py:33-54)."""
    return t * (v1 - v0) / t_max + v0


def _cosine_lr(start_lr, end_lr, block_idx, n_blocks):
    """Closed form of torch CosineAnnealingLR stepped once per validation
    block (reference: train.py:187-196)."""
    frac = jnp.minimum(block_idx, n_blocks) / n_blocks
    return end_lr + 0.5 * (start_lr - end_lr) * (1.0 + jnp.cos(jnp.pi * frac))


def grad_mask(params: Params, optimized_module: Tuple[str, ...]) -> Params:
    """0/1 pytree selecting which top-level modules receive gradients
    (reference: train.py:165-182)."""
    select_all = "all" in optimized_module
    return {
        k: jax.tree.map(
            lambda _: jnp.float32(1.0 if (select_all or k in optimized_module) else 0.0),
            v,
        )
        for k, v in params.items()
    }


def split_target(cfg: CoolChicConfig, target_ex: jax.Array):
    """P/B frames ride their decoded reference frame(s) concatenated after
    the 3 target channels ([3+3(+3), H, W]) so the whole phase engine keeps
    its single-`target` signature; split them back out."""
    if cfg.frame_type == "I":
        return target_ex, None
    if cfg.frame_type == "P":
        return target_ex[:3], (target_ex[3:6],)
    return target_ex[:3], (target_ex[3:6], target_ex[6:9])


def eval_metrics(
    params: Params, cfg: CoolChicConfig, target: jax.Array, lmbda, rate_nn_bits=0.0,
    valid_hw=None,
) -> LossOutput:
    """Eval-mode test: hardround quantizer, no noise, bitdepth rounding
    (reference: enc/training/test.py:369-438)."""
    target, refs = split_target(cfg, target)
    decoded, rate, _ = frame_forward(
        params, cfg, training=False, valid_hw=valid_hw, refs=refs
    )
    return loss_function(
        decoded, rate, target, lmbda, rate_nn_bits,
        frame_data_type=cfg.frame_data_type,
        valid_hw=valid_hw,
    )


def detailed_eval_metrics(
    params: Params, cfg: CoolChicConfig, target: jax.Array, lmbda, rate_nn_bits=0.0
) -> dict:
    """Rich per-frame logs like the reference's FrameEncoderLogs
    (reference: enc/training/test.py:29-366): overall loss/PSNR/rates plus
    per-latent-grid bpp breakdown and feature usage."""
    decoded, rate, extras = frame_forward(params, cfg, training=False)
    out = loss_function(
        decoded, rate, target, lmbda, rate_nn_bits,
        frame_data_type=cfg.frame_data_type,
    )

    per_grid_bpp = {}
    per_grid_nonzero = {}
    cnt = 0
    flat_latent = extras["flat_latent"]
    for i, (c, h, w) in enumerate(cfg.latent_shapes):
        n = c * h * w
        per_grid_bpp[f"latent_{i}_bpp"] = jnp.sum(rate[cnt : cnt + n]) / cfg.n_pixels
        per_grid_nonzero[f"latent_{i}_nonzero_pct"] = (
            100.0 * jnp.mean(flat_latent[cnt : cnt + n] != 0)
        )
        cnt += n
    return {
        "loss": out.loss,
        "psnr_db": out.psnr_db,
        "mse": out.mse,
        "rate_latent_bpp": out.rate_latent_bpp,
        "rate_nn_bpp": out.rate_nn_bpp,
        "total_rate_bpp": out.total_rate_bpp,
        **per_grid_bpp,
        **per_grid_nonzero,
    }


class PhaseState(NamedTuple):
    params: Params
    opt_state: Any
    best_params: Params
    best_opt_state: Any
    best_loss: jax.Array
    best_psnr: jax.Array
    best_bpp: jax.Array
    cnt_record: jax.Array  # iteration index of the last record
    active: jax.Array  # False once patience ended the phase (no schedule_lr)
    key: jax.Array


class PhaseLogs(NamedTuple):
    loss: jax.Array
    psnr_db: jax.Array
    rate_latent_bpp: jax.Array


def _tree_select(pred, a, b):
    return jax.tree.map(lambda x, y: jnp.where(pred, x, y), a, b)


def make_optimizer():
    """Gradient transform shared by every phase: global-norm clip at 0.1
    (reference: train.py:265) then Adam moments; the LR is applied manually
    so schedules stay a pure function of the block index."""
    return optax.chain(
        optax.clip_by_global_norm(GRAD_CLIP_NORM),
        optax.scale_by_adam(),
    )


def make_train_step(cfg: CoolChicConfig, phase: TrainerPhase, remat: bool = True,
                    valid_hw=None):
    """Build (tx, step_fn) for one phase. ``step_fn`` performs a single
    gradient step and is the unit the multi-chip path shards over images.

    ``remat=True`` rematerializes the forward in the backward pass: the
    dominant residual is the [n_latents, dim_arm] ARM context (24x the
    latent volume), and recomputing it trades ~1 extra forward for the HBM
    that lets 2-4x more images overfit per chip."""
    tx = make_optimizer()

    def _forward(p, step_key, temp, noise, refs):
        return frame_forward(
            p,
            cfg,
            key=step_key,
            quantizer_noise_type=phase.quantizer_noise_type,
            quantizer_type=phase.quantizer_type,
            soft_round_temperature=temp,
            noise_parameter=noise,
            training=True,
            valid_hw=valid_hw,
            refs=refs,
        )

    fwd = jax.checkpoint(_forward) if remat else _forward

    def loss_fn(p, target, lmbda, step_key, temp, noise):
        target, refs = split_target(cfg, target)
        decoded, rate, _ = fwd(p, step_key, temp, noise, refs)
        return loss_function(
            decoded, rate, target, lmbda, frame_data_type=cfg.frame_data_type,
            valid_hw=valid_hw,
        ).loss

    def step_fn(params, opt_state, target, lmbda, step_key, lr, temp, noise, mask):
        loss, grads = jax.value_and_grad(loss_fn)(
            params, target, lmbda, step_key, temp, noise
        )
        grads = jax.tree.map(lambda g, m: g * m, grads, mask)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree.map(lambda x, u: x - lr * u, params, updates)
        return params, opt_state, loss

    return tx, step_fn


def _phase_geometry(phase: TrainerPhase) -> Tuple[int, int, int, float]:
    """(freq, n_full_blocks, rem, n_blocks_sched) for one phase."""
    freq = min(phase.freq_valid, phase.max_itr)
    n_full_blocks = phase.max_itr // freq
    rem = phase.max_itr % freq
    n_blocks_sched = max(phase.max_itr / phase.freq_valid, 1)  # cosine T_max
    return freq, n_full_blocks, rem, n_blocks_sched


def _make_run_block(cfg: CoolChicConfig, phase: TrainerPhase, target, lmbda, mask,
                    valid_hw=None):
    """Build the per-validation-block body shared by the monolithic and the
    segmented phase runners. ``block_idx`` may be a traced scalar, so one
    compilation serves every segment position."""
    freq, _, _, n_blocks_sched = _phase_geometry(phase)
    tx, step_fn = make_train_step(cfg, phase, valid_hw=valid_hw)

    def run_block(state: PhaseState, block_idx: jax.Array, n_steps: int) -> PhaseState:
        """n_steps gradient steps then one validation."""
        cnt_start = block_idx * freq
        # ---- patience: reload best (schedule_lr) or freeze (no schedule).
        over_patience = (cnt_start - state.cnt_record) > phase.patience
        if phase.schedule_lr:
            params_in = _tree_select(over_patience, state.best_params, state.params)
            opt_in = _tree_select(over_patience, state.best_opt_state, state.opt_state)
            cnt_record = jnp.where(over_patience, cnt_start, state.cnt_record)
            active = state.active
        else:
            params_in, opt_in, cnt_record = state.params, state.opt_state, state.cnt_record
            active = state.active & ~over_patience

        # ---- per-block schedule values (reference steps them per valid).
        sched_t = jnp.maximum(cnt_start - 1, 0)
        temp = _linear_schedule(
            phase.softround_temperature[0],
            phase.softround_temperature[1],
            sched_t,
            phase.max_itr,
        )
        noise = _linear_schedule(
            phase.noise_parameter[0],
            phase.noise_parameter[1],
            sched_t,
            phase.max_itr,
        )
        if phase.schedule_lr:
            lr = _cosine_lr(phase.lr, phase.end_lr, block_idx, n_blocks_sched)
        else:
            lr = jnp.float32(phase.lr)

        # ---- n_steps optimization steps.
        def body(i, carry):
            p, opt = carry
            step_key = jax.random.fold_in(state.key, cnt_start + i)
            p, opt, _ = step_fn(p, opt, target, lmbda, step_key, lr, temp, noise, mask)
            return p, opt

        new_params, new_opt = jax.lax.fori_loop(0, n_steps, body, (params_in, opt_in))
        new_params = _tree_select(active, new_params, params_in)
        new_opt = _tree_select(active, new_opt, opt_in)

        # ---- validation (eval-mode test) + record keeping.
        m = eval_metrics(new_params, cfg, target, lmbda, valid_hw=valid_hw)
        is_better = m.loss < state.best_loss
        significant = ((m.rate_latent_bpp - state.best_bpp) < 0.001) | (
            (m.psnr_db - state.best_psnr) > 0.001
        )
        new_record = active & is_better & significant
        cnt_end = cnt_start + n_steps - 1

        return PhaseState(
            params=new_params,
            opt_state=new_opt,
            best_params=_tree_select(new_record, new_params, state.best_params),
            best_opt_state=_tree_select(new_record, new_opt, state.best_opt_state),
            best_loss=jnp.where(new_record, m.loss, state.best_loss),
            best_psnr=jnp.where(new_record, m.psnr_db, state.best_psnr),
            best_bpp=jnp.where(new_record, m.rate_latent_bpp, state.best_bpp),
            cnt_record=jnp.where(new_record, cnt_end, cnt_record),
            active=active,
            key=state.key,
        )

    return run_block


@partial(jax.jit, static_argnames=("cfg", "phase"))
def init_phase_state(
    params: Params,
    target: jax.Array,
    lmbda: jax.Array | float,
    key: jax.Array,
    cfg: CoolChicConfig,
    phase: TrainerPhase,
    valid_hw=None,
) -> PhaseState:
    """Initial phase carry: current params are the record to beat
    (reference: train.py:153-157)."""
    tx = make_optimizer()
    m0 = eval_metrics(params, cfg, target, lmbda, valid_hw=valid_hw)
    opt_state0 = tx.init(params)
    return PhaseState(
        params=params,
        opt_state=opt_state0,
        best_params=params,
        best_opt_state=opt_state0,
        best_loss=m0.loss,
        best_psnr=m0.psnr_db,
        best_bpp=m0.rate_latent_bpp,
        cnt_record=jnp.int32(0),
        active=jnp.bool_(True),
        key=key,
    )


@partial(jax.jit, static_argnames=("cfg", "phase", "n_blocks"))
def run_phase_blocks(
    state: PhaseState,
    target: jax.Array,
    lmbda: jax.Array | float,
    block_start: jax.Array,
    cfg: CoolChicConfig,
    phase: TrainerPhase,
    n_blocks: int,
    valid_hw=None,
) -> PhaseState:
    """Run ``n_blocks`` full validation blocks starting at (traced)
    ``block_start``. Segmenting a phase into consecutive run_phase_blocks
    calls runs the exact op sequence of the monolithic ``run_phase`` — the
    carry holds everything and schedules/keys are pure functions of the
    absolute block index (results match to ~1e-8; XLA fuses across segment
    boundaries differently in the single-program form). This is the unit the
    checkpointed/resumable sweep driver calls (the shared TPU tunnel kills
    long-running programs; see scripts/kodak_rd_sweep.py)."""
    freq, _, _, _ = _phase_geometry(phase)
    mask = grad_mask(state.params, phase.optimized_module)
    run_block = _make_run_block(cfg, phase, target, lmbda, mask, valid_hw)

    def scan_body(s, block_idx):
        return run_block(s, block_idx, freq), None

    state, _ = jax.lax.scan(
        scan_body, state, block_start + jnp.arange(n_blocks)
    )
    return state


@partial(jax.jit, static_argnames=("cfg", "phase", "n_steps"))
def run_phase_rem_block(
    state: PhaseState,
    target: jax.Array,
    lmbda: jax.Array | float,
    block_idx: jax.Array,
    cfg: CoolChicConfig,
    phase: TrainerPhase,
    n_steps: int,
    valid_hw=None,
) -> PhaseState:
    """The final partial block when max_itr % freq_valid != 0."""
    mask = grad_mask(state.params, phase.optimized_module)
    run_block = _make_run_block(cfg, phase, target, lmbda, mask, valid_hw)
    return run_block(state, block_idx, n_steps)


def finish_phase(state: PhaseState) -> Tuple[Params, PhaseLogs]:
    logs = PhaseLogs(
        loss=state.best_loss, psnr_db=state.best_psnr, rate_latent_bpp=state.best_bpp
    )
    return state.best_params, logs


@partial(
    jax.jit,
    static_argnames=("cfg", "phase"),
)
def run_phase(
    params: Params,
    target: jax.Array,
    lmbda: jax.Array | float,
    key: jax.Array,
    cfg: CoolChicConfig,
    phase: TrainerPhase,
    valid_hw=None,
) -> Tuple[Params, PhaseLogs]:
    """Train ``params`` on ``target`` for one phase; return the best params
    seen (eval-mode loss) and their metrics.

    Args:
        params: parameter pytree of one frame.
        target: [C, H, W] image in [0, 1].
        lmbda: rate weight.
        key: PRNG key (quantization noise).
        cfg: static model architecture.
        phase: static phase description.
        valid_hw: traced [2] true (H, W) for mixed-size batching (None =
            the whole buffer is the image).
    """
    freq, n_full_blocks, rem, _ = _phase_geometry(phase)
    state = init_phase_state(params, target, lmbda, key, cfg, phase, valid_hw)
    # freq = min(freq_valid, max_itr) guarantees n_full_blocks >= 1.
    state = run_phase_blocks(
        state, target, lmbda, jnp.int32(0), cfg, phase, n_full_blocks, valid_hw
    )
    if rem:
        state = run_phase_rem_block(
            state, target, lmbda, jnp.int32(n_full_blocks), cfg, phase, rem, valid_hw
        )
    return finish_phase(state)
