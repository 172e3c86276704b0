"""Resumable phase engine: segmented run_phase_blocks == monolithic
run_phase (same op sequence; only XLA fusion-boundary rounding differs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coolchic_tpu.models import CoolChicConfig, init_coolchic_params
from coolchic_tpu.train import TrainerPhase, run_phase
from coolchic_tpu.train.step import (
    _phase_geometry,
    finish_phase,
    init_phase_state,
    run_phase_blocks,
    run_phase_rem_block,
)

pytestmark = pytest.mark.slow  # heavy compile/build; excluded from `-m 'not slow'` fast tier

CFG = CoolChicConfig(
    img_size=(16, 24),
    n_ft_per_res=(1, 1, 1),
    layers_synthesis=("8-1-linear-relu", "X-1-linear-none"),
    dim_arm=8,
    n_hidden_layers_arm=1,
)
PHASE = TrainerPhase(
    lr=1e-2,
    max_itr=65,
    freq_valid=20,
    patience=40,
    schedule_lr=True,
    quantizer_type="softround",
    quantizer_noise_type="gaussian",
    softround_temperature=(0.3, 0.1),
    noise_parameter=(0.25, 0.1),
)


def _target():
    y, x = jnp.meshgrid(jnp.linspace(0, 1, 16), jnp.linspace(0, 1, 24), indexing="ij")
    return jnp.stack([x, y, 0.5 * (x + y)], axis=0)


def test_segmented_equals_monolithic_with_checkpoint_roundtrip():
    target = _target()
    params = init_coolchic_params(jax.random.PRNGKey(0), CFG)
    key = jax.random.PRNGKey(1)
    best_mono, logs_mono = run_phase(params, target, 1e-3, key, CFG, PHASE)

    freq, nfb, rem, _ = _phase_geometry(PHASE)
    assert (nfb, rem) == (3, 5)
    st = init_phase_state(params, target, 1e-3, key, CFG, PHASE)
    st = run_phase_blocks(st, target, 1e-3, jnp.int32(0), CFG, PHASE, 1)
    # simulate the sweep driver's checkpoint: host round-trip through numpy
    st = jax.tree.map(lambda a: jnp.asarray(np.asarray(a)), st)
    st = run_phase_blocks(st, target, 1e-3, jnp.int32(1), CFG, PHASE, 2)
    st = run_phase_rem_block(st, target, 1e-3, jnp.int32(3), CFG, PHASE, rem)
    best_seg, logs_seg = finish_phase(st)

    assert float(logs_seg.loss) == pytest.approx(float(logs_mono.loss), rel=1e-5)
    for a, b in zip(jax.tree.leaves(best_mono), jax.tree.leaves(best_seg)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_segmented_vmaps_over_images():
    """The sweep driver vmaps the segment over a batch of (image, lambda)."""
    target = _target()
    targets = jnp.stack([target, 1.0 - target])
    lmbdas = jnp.array([1e-3, 4e-3])
    keys = jax.random.split(jax.random.PRNGKey(2), 2)
    params = jax.vmap(lambda k: init_coolchic_params(k, CFG))(keys)

    st = jax.vmap(
        lambda p, t, l, k: init_phase_state(p, t, l, k, CFG, PHASE)
    )(params, targets, lmbdas, keys)
    st = jax.vmap(
        lambda s, t, l: run_phase_blocks(s, t, l, jnp.int32(0), CFG, PHASE, 3)
    )(st, targets, lmbdas)
    best, logs = jax.vmap(finish_phase)(st)
    assert logs.loss.shape == (2,)
    assert np.all(np.isfinite(np.asarray(logs.loss)))

    # batch row 0 tracks the single-image run of the same work (batched
    # XLA kernels reassociate floats differently; 60 training steps amplify
    # that to ~1e-3 relative — same behavior as encode_frame_batch)
    st1 = init_phase_state(
        jax.tree.map(lambda a: a[0], params), targets[0], 1e-3, keys[0], CFG, PHASE
    )
    st1 = run_phase_blocks(st1, targets[0], 1e-3, jnp.int32(0), CFG, PHASE, 3)
    _, logs1 = finish_phase(st1)
    assert float(logs1.loss) == pytest.approx(float(logs.loss[0]), rel=1e-2)
