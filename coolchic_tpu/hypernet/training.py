"""Amortized-encoder (whole-net) training over an image-patch stream.

Reference semantics (coolchic/hypernet/training.py:207-392): Adam with
cosine LR, softround temperature / noise linearly scheduled by samples
seen, gradient clip 1.0, periodic eval with patience-based best-model
reload, optional backbone freezing for the first N samples.

TPU-native: one jit-compiled train step per (net, phase); the data loader
streams host-side. The step vmaps the per-image decoders internally (see
wholenet.py) so a whole batch is one XLA program.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Any, Callable, Dict, Iterator, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from coolchic_tpu.hypernet.wholenet import WholeNetState
from coolchic_tpu.train.loss import loss_function
from coolchic_tpu.train.presets import TrainerPhase
from coolchic_tpu.utils import logging as cclog

GRAD_CLIP_NORM = 1.0  # reference: hypernet/training.py:322


def _batch_loss(net, state, imgs, lmbda, key, q_noise, q_type, temp, noise):
    decoded, rate = net.forward(
        state,
        imgs,
        key=key,
        quantizer_noise_type=q_noise,
        quantizer_type=q_type,
        soft_round_temperature=temp,
        noise_parameter=noise,
        training=True,
    )
    losses = jax.vmap(
        lambda d, r, t: loss_function(d, r, t, lmbda).loss
    )(decoded, rate, imgs)
    return jnp.mean(losses)


def make_wholenet_train_step(
    net,
    phase: TrainerPhase,
    freeze_backbone: bool = False,
    grad_accumulation_steps: int = 1,
) -> Tuple[Any, Callable]:
    """Build (optimizer, jitted step) for one training phase.

    ``grad_accumulation_steps > 1`` averages gradients over that many
    consecutive micro-batches before each optimizer update
    (reference: hypernet/training.py:322-326), via optax.MultiSteps —
    between updates the step emits zero deltas, so the training loop is
    unchanged.
    """
    tx = optax.chain(
        optax.clip_by_global_norm(GRAD_CLIP_NORM),
        optax.scale_by_adam(),
    )
    if grad_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accumulation_steps)

    def mask_fn(grads: WholeNetState) -> WholeNetState:
        if not freeze_backbone:
            return grads
        hn = dict(grads.hypernet)
        for k in hn:
            if k.startswith("ResNet"):
                hn[k] = jax.tree.map(jnp.zeros_like, hn[k])
        return WholeNetState(hypernet=hn, decoder=grads.decoder)

    @jax.jit
    def step(state: WholeNetState, opt_state, imgs, lmbda, key, lr, temp, noise):
        loss, grads = jax.value_and_grad(
            lambda s: _batch_loss(
                net,
                s,
                imgs,
                lmbda,
                key,
                phase.quantizer_noise_type,
                phase.quantizer_type,
                temp,
                noise,
            )
        )(state)
        grads = mask_fn(grads)
        updates, opt_state = tx.update(grads, opt_state, state)
        state = jax.tree.map(lambda p, u: p - lr * u, state, updates)
        return state, opt_state, loss

    return tx, step


@partial(jax.jit, static_argnames=("net",))
def evaluate_wholenet(net, state: WholeNetState, imgs: jax.Array, lmbda) -> Dict:
    """Eval-mode metrics over a batch (reference: training.py:47-133)."""
    decoded, rate = net.forward(state, imgs, training=False)
    out = jax.vmap(lambda d, r, t: loss_function(d, r, t, lmbda))(
        decoded, rate, imgs
    )
    return {
        "loss": jnp.mean(out.loss),
        "psnr_db": jnp.mean(out.psnr_db),
        "rate_latent_bpp": jnp.mean(out.rate_latent_bpp),
    }


class HypernetTrainLog(NamedTuple):
    samples_seen: int
    loss: float
    eval_loss: float
    eval_psnr_db: float
    eval_rate_bpp: float


def train_wholenet(
    net,
    state: WholeNetState,
    data_iter: Iterator[jax.Array],
    eval_imgs: jax.Array,
    lmbda: float,
    phase: TrainerPhase,
    key: jax.Array,
    n_samples: int,
    batch_size: int,
    freq_valid_samples: int = 1000,
    patience_samples: Optional[int] = None,
    unfreeze_backbone_samples: int = 0,
    verbose: bool = True,
    workdir: Optional[Any] = None,
    checkpointing_freq_samples: Optional[int] = None,
    grad_accumulation_steps: int = 1,
    mesh: Optional[Any] = None,
    samples_offset: int = 0,
):
    """Train for ``n_samples`` images with periodic evaluation + patience
    best-reload (reference: training.py:207-392).

    Args:
        data_iter: yields [B, 3, H, W] float batches in [0, 1].
        eval_imgs: held-out [B_eval, 3, H, W] batch.
        unfreeze_backbone_samples: keep the backbone frozen until this many
            samples have been seen (reference: training.py:235, 376-377).
        workdir / checkpointing_freq_samples: write ``samples_{N}.pkl``
            checkpoints every N samples during the run (reference:
            training.py:371-373; resumable via the ``__latest`` convention).
        samples_offset: samples already seen by a resumed run. ``n_samples``
            stays the TOTAL target: the step count covers the remainder,
            the data stream and per-step noise keys fast-forward past the
            consumed prefix, and the LR/temperature schedules and
            checkpoint names continue on the global sample clock. Known
            limitation: optimizer moments restart at zero on resume
            (checkpoints deliberately store only WholeNetState — Adam
            moments would triple the 80 MB delta checkpoints), so expect a
            brief loss blip at the resume boundary.

    Returns:
        (best state, list of HypernetTrainLog).
    """
    n_steps = max((n_samples - samples_offset) // batch_size, 1)
    # Resume fidelity: fast-forward the stream past the batches the
    # pre-crash run consumed, so the resumed run sees the data (and, via
    # the global step index in fold_in below, the noise keys) an
    # uninterrupted run would — not a replay of the first batches.
    steps_done = samples_offset // batch_size
    for _ in range(steps_done):
        next(data_iter)
    freq_valid_steps = max(freq_valid_samples // batch_size, 1)
    patience_steps = (
        max(patience_samples // batch_size, 1) if patience_samples else None
    )

    data_sharding = None
    if mesh is not None:
        # Data parallelism over the mesh's "data" axis: batches are placed
        # batch-sharded, state replicated, and XLA inserts the gradient
        # all-reduce (the sharding-annotation recipe; no reference
        # counterpart — the reference trains single-GPU).
        from jax.sharding import NamedSharding, PartitionSpec

        data_sharding = NamedSharding(mesh, PartitionSpec("data"))
        repl = NamedSharding(mesh, PartitionSpec())
        state = jax.device_put(state, repl)
        eval_imgs = jax.device_put(eval_imgs, data_sharding)

    frozen = unfreeze_backbone_samples > 0
    tx, step = make_wholenet_train_step(
        net, phase, freeze_backbone=frozen,
        grad_accumulation_steps=grad_accumulation_steps,
    )
    opt_state = tx.init(state)

    best_state = state
    best_loss = float("inf")
    logs = []
    step_record = 0
    t0 = time.time()

    for i in range(n_steps):
        samples_seen = samples_offset + i * batch_size
        # Un/refreeze the backbone once the threshold is crossed. The
        # optimizer chain is identical (freezing is grad masking), so the
        # Adam moments carry over — the reference likewise only flips
        # requires_grad and keeps training (reference: training.py:376-377).
        if frozen and samples_seen >= unfreeze_backbone_samples:
            frozen = False
            _, step = make_wholenet_train_step(
                net, phase, freeze_backbone=False,
                grad_accumulation_steps=grad_accumulation_steps,
            )

        frac = samples_seen / n_samples
        lr = phase.lr * 0.5 * (1 + jnp.cos(jnp.pi * frac)) if phase.schedule_lr else phase.lr
        temp = phase.softround_temperature[0] + frac * (
            phase.softround_temperature[1] - phase.softround_temperature[0]
        )
        noise = phase.noise_parameter[0] + frac * (
            phase.noise_parameter[1] - phase.noise_parameter[0]
        )

        imgs = next(data_iter)
        if data_sharding is not None:
            imgs = jax.device_put(imgs, data_sharding)
        step_key = jax.random.fold_in(key, steps_done + i)
        state, opt_state, loss = step(
            state, opt_state, imgs, lmbda, step_key, lr, temp, noise
        )

        if workdir is not None and checkpointing_freq_samples:
            ckpt_steps = max(checkpointing_freq_samples // batch_size, 1)
            if (i + 1) % ckpt_steps == 0:
                from coolchic_tpu.hypernet.inference import save_checkpoint
                from pathlib import Path

                n_seen = samples_seen + batch_size
                save_checkpoint(
                    state, Path(workdir) / f"samples_{n_seen}.pkl", n_seen
                )

        if (i + 1) % freq_valid_steps == 0 or i + 1 == n_steps:
            m = evaluate_wholenet(net, state, eval_imgs, lmbda)
            eval_loss = float(m["loss"])
            if eval_loss < best_loss:
                best_loss = eval_loss
                best_state = state
                step_record = i
            elif patience_steps and i - step_record > patience_steps:
                state = best_state  # reload best (reference: training.py:354-369)
                step_record = i
            logs.append(
                HypernetTrainLog(
                    samples_seen=samples_seen + batch_size,
                    loss=float(loss),
                    eval_loss=eval_loss,
                    eval_psnr_db=float(m["psnr_db"]),
                    eval_rate_bpp=float(m["rate_latent_bpp"]),
                )
            )
            # per-validation experiment logging (reference: training.py:342-351)
            cclog.log(
                {
                    "samples_seen": samples_seen + batch_size,
                    "train_loss": float(loss),
                    "eval_loss": eval_loss,
                    "eval_psnr_db": float(m["psnr_db"]),
                    "eval_rate_bpp": float(m["rate_latent_bpp"]),
                    "lr": float(lr),
                    "softround_temperature": float(temp),
                    "noise_parameter": float(noise),
                },
                step=samples_seen + batch_size,
            )
            if verbose:
                print(
                    f"samples {samples_seen + batch_size:>8} | "
                    f"train loss {float(loss):.5f} | eval loss {eval_loss:.5f} | "
                    f"psnr {float(m['psnr_db']):6.2f} dB | "
                    f"bpp {float(m['rate_latent_bpp']):.4f} | "
                    f"{time.time() - t0:6.1f} s"
                )

    return best_state, logs
