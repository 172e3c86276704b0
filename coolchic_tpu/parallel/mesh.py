"""Multi-chip scaling: image-sharded mass overfitting over a device mesh.

The reference scales out with SLURM job arrays — one GPU process per
(image, lambda) pair (SURVEY.md §2.3; reference: sbatch-files/*.sh). The
TPU-native equivalent is a single SPMD program: the batch axis of the
vmapped per-image training step is sharded over a 1-D ``jax.sharding.Mesh``
("images" axis). Per-image encodes are independent, so the partitioned
program contains no per-step collectives; only metric reductions
(mean loss across the mesh) ride the ICI.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from coolchic_tpu.models.coolchic import init_coolchic_params
from coolchic_tpu.models.config import CoolChicConfig
from coolchic_tpu.train.encode import EncodeResult, encode_frame
from coolchic_tpu.train.presets import Preset, TrainerPhase
from coolchic_tpu.train.step import grad_mask, make_train_step

IMAGE_AXIS = "images"


def make_mesh(n_devices: Optional[int] = None, axis_name: str = IMAGE_AXIS) -> Mesh:
    """1-D mesh over (the first n) available devices.

    When the default backend has fewer devices than requested (e.g. one
    real TPU behind a tunnel), fall back to the CPU backend's virtual
    devices (xla_force_host_platform_device_count) so multi-chip programs
    can be dry-run anywhere."""
    devices = jax.devices()
    if n_devices is not None and len(devices) < n_devices:
        try:
            cpu = jax.devices("cpu")
            if len(cpu) >= n_devices:
                devices = cpu
        except RuntimeError:
            pass
    if n_devices is not None:
        assert len(devices) >= n_devices, (
            f"need {n_devices} devices, have {len(devices)}"
        )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def shard_leading_axis(tree, mesh: Mesh, axis_name: str = IMAGE_AXIS):
    """Place every leaf so its leading (batch) axis is sharded over the mesh."""

    def _put(a):
        spec = P(axis_name, *([None] * (a.ndim - 1)))
        return jax.device_put(a, NamedSharding(mesh, spec))

    return jax.tree.map(_put, tree)


def init_batch_params(
    key: jax.Array, cfg: CoolChicConfig, batch: int, latent_init: str = "zeros"
):
    """[B]-stacked parameter pytrees (one decoder per image)."""
    keys = jax.random.split(key, batch)
    return jax.vmap(lambda k: init_coolchic_params(k, cfg, latent_init))(keys)


def init_batch_opt_state(params_stack, cfg: CoolChicConfig, phase: TrainerPhase):
    """Per-image optimizer states (vmapped init so the Adam step counter is
    also batched)."""
    tx, _ = make_train_step(cfg, phase)
    return jax.vmap(tx.init)(params_stack)


def _vmapped_step(params_stack, opt_stack, targets, lmbdas, keys, cfg, phase):
    _, step_fn = make_train_step(cfg, phase)
    mask = grad_mask(jax.tree.map(lambda a: a[0], params_stack), phase.optimized_module)

    def one(p, o, t, l, k):
        return step_fn(
            p,
            o,
            t,
            l,
            k,
            lr=phase.lr,
            temp=phase.softround_temperature[0],
            noise=phase.noise_parameter[0],
            mask=mask,
        )

    return jax.vmap(one)(params_stack, opt_stack, targets, lmbdas, keys)


@partial(jax.jit, static_argnames=("cfg", "phase", "mesh"), donate_argnums=(0, 1))
def batched_train_step(
    params_stack,
    opt_stack,
    targets: jax.Array,
    lmbdas: jax.Array,
    keys: jax.Array,
    cfg: CoolChicConfig,
    phase: TrainerPhase,
    mesh: Optional[Mesh] = None,
) -> Tuple[Any, Any, jax.Array]:
    """ONE gradient step for a whole batch of independent per-image decoders.

    With a mesh, the batch axis is laid out explicitly with ``shard_map`` —
    every device overfits its own image shard, the only collective is the
    ``pmean`` of the logging loss over the ICI. (We do not rely on the SPMD
    partitioner here: vmap lowers the single-channel convolutions to grouped
    convs whose lhs/rhs shardings the propagator does not always agree on.)

    Returns:
        (new params stack, new opt-state stack, mean loss over the mesh).
    """
    if mesh is None:
        params_stack, opt_stack, losses = _vmapped_step(
            params_stack, opt_stack, targets, lmbdas, keys, cfg, phase
        )
        return params_stack, opt_stack, jnp.mean(losses)

    def shard_fn(p, o, t, l, k):
        p, o, losses = _vmapped_step(p, o, t, l, k, cfg, phase)
        return p, o, jax.lax.pmean(jnp.mean(losses), IMAGE_AXIS)

    sharded = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(IMAGE_AXIS), P(IMAGE_AXIS), P(IMAGE_AXIS), P(IMAGE_AXIS), P(IMAGE_AXIS)),
        out_specs=(P(IMAGE_AXIS), P(IMAGE_AXIS), P()),
    )
    return sharded(params_stack, opt_stack, targets, lmbdas, keys)


def encode_batch_sharded(
    keys: jax.Array,
    targets: jax.Array,
    lmbdas: jax.Array,
    cfg: CoolChicConfig,
    preset: Preset,
    mesh: Optional[Mesh] = None,
    with_quant_info: bool = False,
):
    """Overfit a batch of images sharded across the mesh (full pipeline:
    warm-up + every preset phase). Batch size must be a multiple of the mesh
    size.

    With ``with_quant_info`` (requires a preset phase with
    ``quantize_model``), also returns the stacked NN-quantization choices
    (q-steps + exp-Golomb orders per module) the bitstream writer needs —
    so a sharded mass encode can go straight to .cool files.
    """
    if mesh is None:
        mesh = make_mesh()
    keys, targets, lmbdas = shard_leading_axis((keys, targets, lmbdas), mesh)

    if with_quant_info:
        from coolchic_tpu.train.encode import encode_frame_with_quant_info

        def shard_fn(k, t, l):
            res, infos = jax.vmap(
                lambda ki, ti, li: encode_frame_with_quant_info(
                    ki, ti, li, cfg, preset
                )
            )(k, t, l)
            assert infos is not None, (
                "with_quant_info requires a quantize_model phase in the preset"
            )
            return res, infos

        fn = jax.jit(
            jax.shard_map(
                shard_fn,
                mesh=mesh,
                in_specs=(P(IMAGE_AXIS), P(IMAGE_AXIS), P(IMAGE_AXIS)),
                out_specs=(P(IMAGE_AXIS), P(IMAGE_AXIS)),
                # The encode pipeline mixes varying (per-image) state with
                # unvarying constants (zero-init latents) inside its scan
                # carries; there is no cross-shard communication at all, so
                # the varying-manual-axes checker adds no safety here.
                check_vma=False,
            )
        )
        return fn(keys, targets, lmbdas)

    def shard_fn(k, t, l):
        return jax.vmap(lambda ki, ti, li: encode_frame(ki, ti, li, cfg, preset))(
            k, t, l
        )

    fn = jax.jit(
        jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P(IMAGE_AXIS), P(IMAGE_AXIS), P(IMAGE_AXIS)),
            out_specs=P(IMAGE_AXIS),
            check_vma=False,  # see above: no collectives in the pipeline
        )
    )
    return fn(keys, targets, lmbdas)
