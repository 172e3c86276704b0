"""Mixed-size batching helpers (SURVEY.md §7 "Static shapes vs arbitrary
H x W"): encode a smaller image inside a padded bucket buffer with
semantics identical to the unpadded encode.

``valid_hw`` is a traced [2] int array (true height, width), so one
compiled program serves every image in a bucket and a vmapped batch can
hold different true sizes. Three operations keep the padded math exact:

  * latents outside the valid pyramid are forced to zero — the ARM context
    gather and the pre-concat refine use zero padding, so valid pixels see
    exactly what the unpadded encode's zero padding would give them;
  * the rate vector is masked, removing padded latents from the RD cost;
  * before every replicate-padded op (x2 upsampling, k>1 synthesis convs)
    the buffer beyond the valid edge is overwritten with the replicated
    edge, reproducing replicate padding at the *true* image boundary.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def valid_mask_2d(buf_h: int, buf_w: int, hv, wv, dtype=jnp.float32) -> jax.Array:
    """[buf_h, buf_w] mask: 1 inside the valid (hv, wv) region, 0 outside."""
    row = jnp.arange(buf_h) < hv
    col = jnp.arange(buf_w) < wv
    return (row[:, None] & col[None, :]).astype(dtype)


def replicate_extend(x: jax.Array, hv, wv) -> jax.Array:
    """Overwrite everything beyond the valid (hv, wv) region of a
    [..., H, W] tensor with the replicated valid edge — exactly what
    replicate padding at the true image boundary would produce."""
    h, w = x.shape[-2], x.shape[-1]
    ri = jnp.minimum(jnp.arange(h), hv - 1)
    ci = jnp.minimum(jnp.arange(w), wv - 1)
    return x[..., ri, :][..., :, ci]


def level_valid_hw(valid_hw: jax.Array, level: int) -> Tuple[jax.Array, jax.Array]:
    """ceil-divided valid dims of latent grid ``level`` (matches
    CoolChicConfig.latent_shapes ceil division)."""
    s = 1 << level
    return (valid_hw[0] + s - 1) // s, (valid_hw[1] + s - 1) // s
