"""Fused ARM kernel (Pallas/TPU): context gather + MLP + Laplace rate.

The XLA path materializes the [n_latents, dim_arm] context matrix in HBM
(dim_arm x the latent volume, the dominant activation of the forward).
This kernel keeps everything in VMEM: the padded latent grid is resident
on-chip, each program slices its row slab, builds the causal contexts with
static slices and runs the MLP as channelwise VPU FMAs — one HBM read of
the grid, one HBM write of the rate map.

Implementation note: the natural [pixels, C] matrix form needs a 3-D
stack+reshape that the Mosaic compiler of this toolchain rejects, so the
MLP is expressed over a *list of 2-D planes* (one per channel) with scalar
weights read from SMEM — pure elementwise VPU work, no relayouts. The
training path keeps the XLA matmul formulation (it is MXU-bound and needs
the backward); this kernel serves the eval/test path.

Reference semantics: coolchic/enc/component/core/arm.py:227-268 and
coolchic.py:392-424.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from coolchic_tpu.models.arm import MASK_SIZE, context_offsets

_PAD = (MASK_SIZE - 1) // 2  # 4

# Scoped-VMEM budget for tile sizing. The Mosaic compiler keeps roughly
# _TEMP_FACTOR * dim_arm live [tile_h, w_al] f32 rows per output row (the
# x/y context-plane generations of the residual MLP plus slice copies);
# measured 36.7 MB at tile_h=64, dim_arm=24, w_al=768 on this toolchain
# (factor ~7.8) but 17.8 MB at tile_h=40, dim_arm=24, w_al=512 (factor
# ~8.7) — the factor is shape-dependent, so the budget keeps headroom.
# Mosaic's default scoped limit is 16 MiB; we raise it via
# CompilerParams(vmem_limit_bytes) and size tiles against a margin of it.
# v5e has 128 MiB of VMEM per core; 48 MiB scoped leaves the pipelined
# out tiles and slab plenty of room.
_VMEM_REQUEST = 48 * 2**20
_VMEM_LIMIT = int(_VMEM_REQUEST * 0.7)  # tile-sizing budget (margin for
# the shape-dependent part of Mosaic's stack allocation)
_TEMP_FACTOR = 10


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _slab_bytes(h: int, w: int) -> int:
    h_al = _round_up(max(h, 8), 8)
    w_al = _round_up(max(w, 128), 128)
    return (h_al + 2 * _PAD) * (w_al + 128) * 4


def _budget_tile_h(h: int, w: int, dim_arm: int) -> int:
    """Largest multiple-of-8 tile height whose temps fit scoped VMEM."""
    w_al = _round_up(max(w, 128), 128)
    budget = _VMEM_LIMIT - _slab_bytes(h, w)
    rows = budget // (_TEMP_FACTOR * dim_arm * w_al * 4)
    return min(64, _round_up(max(h, 8), 8), max(8, rows // 8 * 8))


def pallas_fits(h: int, w: int, dim_arm: int) -> bool:
    """Static check that the fused kernel fits VMEM at this plane shape.

    Used by callers that jit the *whole* eval function: a pallas_call that
    exceeds scoped VMEM fails at outer-jit compile time, where arm_rate's
    runtime try/except cannot fall back — so the choice must be static."""
    w_al = _round_up(max(w, 128), 128)
    temps = _TEMP_FACTOR * dim_arm * 8 * w_al * 4  # minimal tile_h = 8
    return _slab_bytes(h, w) + temps <= _VMEM_LIMIT


def _expm1(a):
    # expm1 has no Pallas TPU lowering: 2-term Taylor for small |a| avoids
    # the cancellation error of exp(a) - 1.
    return jnp.where(jnp.abs(a) > 1e-4, jnp.exp(a) - 1.0, a * (1.0 + 0.5 * a))


def _kernel(slab_ref, *refs, offsets, n_hidden, tile_h, w_al):
    """One program computes rows [i*tile_h, (i+1)*tile_h) of the rate map.

    slab_ref: [h_al + 8, w_al + 128] zero-padded latent grid (VMEM, full).
    refs: per layer (weight [C, C] SMEM, bias [1, C] SMEM), head
          ([C, 2], [1, 2]), then the out ref [tile_h, w_al].
    """
    *w_refs, out_ref = refs
    i = pl.program_id(0)
    row0 = pl.multiple_of(i * tile_h, 8)
    slab = slab_ref[pl.ds(row0, tile_h + 2 * _PAD), :]

    c_dim = len(offsets)
    # Context planes: context c of pixel (y, x) is slab[y + dy, x + dx].
    x = [
        jax.lax.slice(slab, (dy, dx), (dy + tile_h, dx + w_al))
        for dy, dx in offsets
    ]

    # Residual MLP as channelwise FMAs with scalar weights.
    for layer in range(n_hidden):
        w_ref = w_refs[2 * layer]
        b_ref = w_refs[2 * layer + 1]
        y = []
        for o in range(c_dim):
            acc = x[0] * w_ref[0, o]
            for c in range(1, c_dim):
                acc = acc + x[c] * w_ref[c, o]
            y.append(jnp.maximum(acc + b_ref[0, o] + x[o], 0.0))
        x = y
    w_ref = w_refs[2 * n_hidden]
    b_ref = w_refs[2 * n_hidden + 1]
    mu = x[0] * w_ref[0, 0]
    ls = x[0] * w_ref[0, 1]
    for c in range(1, c_dim):
        mu = mu + x[c] * w_ref[c, 0]
        ls = ls + x[c] * w_ref[c, 1]
    mu = mu + b_ref[0, 0]
    ls = ls + b_ref[0, 1]
    scale = jnp.exp(jnp.clip(ls - 4.0, -4.6, 5.0))

    # Laplace rate of the center pixel (reference: coolchic.py:419-424).
    y0 = jax.lax.slice(slab, (_PAD, _PAD), (_PAD + tile_h, _PAD + w_al))
    hi = y0 + 0.5 - mu
    lo = y0 - 0.5 - mu
    cdf_hi = 0.5 - 0.5 * jnp.sign(hi) * _expm1(-jnp.abs(hi) / scale)
    cdf_lo = 0.5 - 0.5 * jnp.sign(lo) * _expm1(-jnp.abs(lo) / scale)
    proba = jnp.clip(cdf_hi - cdf_lo, min=2.0**-16)
    out_ref[:] = -jnp.log2(proba)


@functools.partial(jax.jit, static_argnames=("dim_arm", "n_hidden", "interpret"))
def arm_rate_pallas(
    latent: jax.Array,  # [H, W] quantized latent plane (float)
    arm_params: Dict,  # {"layers": [{"weight" [out,in], "bias" [out]}, ...]}
    dim_arm: int,
    n_hidden: int,
    interpret: bool = False,
) -> jax.Array:
    """Rate map [H, W] in bits for one latent plane, fully fused."""
    h, w = latent.shape
    w_al = _round_up(max(w, 128), 128)
    tile_h = _budget_tile_h(h, w, dim_arm)
    n_tiles = pl.cdiv(h, tile_h)
    h_al = n_tiles * tile_h

    # Zero padding: 4 context rows/cols; lane padding of 128 covers dx in
    # [0, 8] while keeping every slice in bounds.
    slab = jnp.zeros((h_al + 2 * _PAD, w_al + 128), jnp.float32)
    slab = jax.lax.dynamic_update_slice(slab, latent.astype(jnp.float32), (_PAD, _PAD))

    offsets = context_offsets(dim_arm)

    w_args = []
    w_specs = []
    for layer in arm_params["layers"]:
        # input-major [C_in, C_out] weights; biases as [1, C_out] rows.
        w_args += [
            layer["weight"].T.astype(jnp.float32),
            layer["bias"][None, :].astype(jnp.float32),
        ]
        w_specs += [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ]

    body = functools.partial(
        _kernel, offsets=offsets, n_hidden=n_hidden, tile_h=tile_h, w_al=w_al
    )

    rate = pl.pallas_call(
        body,
        out_shape=jax.ShapeDtypeStruct((h_al, w_al), jnp.float32),
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] + w_specs,
        out_specs=pl.BlockSpec(
            (tile_h, w_al), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_REQUEST),
        interpret=interpret,
    )(slab, *w_args)
    return rate[:h, :w]


_PALLAS_OK: Dict = {}  # (dim_arm, n_hidden) -> bool, learned at first call


def arm_rate(
    latent: jax.Array, arm_params: Dict, dim_arm: int, n_hidden: int
) -> jax.Array:
    """Rate map with automatic backend choice.

    The Pallas kernel is bit-accurate f32 (verified ~2e-6 vs
    default_matmul_precision('float32') XLA on TPU, while the default XLA
    path carries ~5e-2 bf16 matmul error in mu). All stencil widths
    including the flagship dim_arm=24 compile on the current Mosaic
    toolchain; if a future toolchain rejects a shape again, the failure is
    cached and that shape permanently falls back to XLA."""
    key = (dim_arm, n_hidden)
    if _PALLAS_OK.get(key, True) and pallas_fits(*latent.shape, dim_arm):
        interpret = jax.default_backend() == "cpu"
        try:
            out = arm_rate_pallas(
                latent, arm_params, dim_arm, n_hidden, interpret=interpret
            )
            _PALLAS_OK[key] = True
            return out
        except Exception:
            _PALLAS_OK[key] = False
    from coolchic_tpu.models.arm import arm_apply, get_neighbors, latent_rate_bits

    ctx = get_neighbors(latent[None], dim_arm)
    mu, scale, _ = arm_apply(arm_params, ctx)
    return latent_rate_bits(latent.reshape(-1), mu, scale).reshape(latent.shape)


def arm_rate_pallas_pyramid(
    latents, arm_params: Dict, dim_arm: int, n_hidden: int, interpret: bool = False
) -> jax.Array:
    """Concatenated flat rate over a latent pyramid (matches the ordering of
    models.coolchic.coolchic_forward). Latents are [C, H, W] planes."""
    rates = []
    for grid in latents:
        for c in range(grid.shape[0]):
            rates.append(
                arm_rate_pallas(
                    grid[c], arm_params, dim_arm, n_hidden, interpret=interpret
                ).reshape(-1)
            )
    return jnp.concatenate(rates)
