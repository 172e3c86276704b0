"""Multi-chip sharding: 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coolchic_tpu.models import CoolChicConfig
from coolchic_tpu.parallel import (
    batched_train_step,
    init_batch_opt_state,
    init_batch_params,
    make_mesh,
    shard_leading_axis,
)
from coolchic_tpu.train.presets import TrainerPhase

pytestmark = pytest.mark.slow  # heavy compile/build; excluded from `-m 'not slow'` fast tier

CFG = CoolChicConfig(
    img_size=(16, 16),
    n_ft_per_res=(1, 1, 1),
    layers_synthesis=("8-1-linear-relu", "X-1-linear-none"),
    dim_arm=8,
    n_hidden_layers_arm=1,
)
PHASE = TrainerPhase(
    lr=1e-2,
    max_itr=1,
    quantizer_type="softround",
    quantizer_noise_type="gaussian",
    softround_temperature=(0.3, 0.3),
    noise_parameter=(0.25, 0.25),
)


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.size == 8  # conftest forces 8 virtual CPU devices


def test_batched_train_step_sharded():
    mesh = make_mesh()
    batch = mesh.size
    params = init_batch_params(jax.random.PRNGKey(0), CFG, batch, "normal")
    opt = init_batch_opt_state(params, CFG, PHASE)
    targets = jax.random.uniform(jax.random.PRNGKey(1), (batch, 3, *CFG.img_size))
    lmbdas = jnp.full((batch,), 1e-3)
    keys = jax.random.split(jax.random.PRNGKey(2), batch)

    params, opt, targets, lmbdas, keys = shard_leading_axis(
        (params, opt, targets, lmbdas, keys), mesh
    )
    new_params, new_opt, mean_loss = batched_train_step(
        params, opt, targets, lmbdas, keys, CFG, PHASE, mesh
    )
    assert np.isfinite(float(mean_loss))
    # Output keeps the sharded leading axis.
    assert new_params["latents"][0].shape[0] == batch


def test_graft_entry_dryrun():
    import importlib.util, pathlib

    path = pathlib.Path(__file__).resolve().parents[1] / "__graft_entry__.py"
    spec = importlib.util.spec_from_file_location("graft_entry", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    loss, psnr, bpp = jax.jit(fn)(*args)
    assert np.isfinite(float(loss))
    mod.dryrun_multichip(8)


def test_graft_entry_dryrun_fresh_process():
    """Regression for MULTICHIP_r01: dryrun_multichip must self-force the
    virtual-CPU backend in a pristine process (no XLA_FLAGS/JAX_PLATFORMS
    help from the environment) — exactly how the driver launches it."""
    import os
    import pathlib
    import subprocess
    import sys

    repo = pathlib.Path(__file__).resolve().parents[1]
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    out = subprocess.run(
        [sys.executable, "-c", "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"],
        cwd=repo,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "dryrun_multichip(8): ok" in out.stdout
