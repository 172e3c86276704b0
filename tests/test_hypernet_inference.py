"""Hypernet checkpoints, delta-subset search, finetuning, train CLI."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coolchic_tpu.hypernet import DeltaWholeNet, NOWholeNet
from coolchic_tpu.hypernet.finetune import finetune_coolchic
from coolchic_tpu.hypernet.inference import (
    eval_dataset,
    eval_image_delta_subsets,
    load_checkpoint,
    save_checkpoint,
)
from coolchic_tpu.metalearning import synthetic_batches
from coolchic_tpu.models import CoolChicConfig
from coolchic_tpu.train.presets import TrainerPhase

pytestmark = pytest.mark.slow  # heavy compile/build; excluded from `-m 'not slow'` fast tier

CFG = CoolChicConfig(
    img_size=(32, 32),
    n_ft_per_res=(1, 1, 1),
    layers_synthesis=("8-1-linear-relu", "X-1-linear-none"),
    dim_arm=8,
    n_hidden_layers_arm=1,
)
HN_KW = dict(
    synthesis_hidden_dim=32,
    synthesis_n_layers=1,
    arm_hidden_dim=32,
    arm_n_layers=1,
    ups_hidden_dim=16,
    ups_n_layers=1,
)


def test_checkpoint_roundtrip_and_latest(tmp_path):
    net = NOWholeNet(CFG, n_hidden_channels=8)
    state = net.init(jax.random.PRNGKey(0))
    save_checkpoint(state, tmp_path / "samples_100.pkl", 100)
    save_checkpoint(state, tmp_path / "samples_500.pkl", 500)
    # __latest convention: directory resolves to the highest sample count.
    loaded = load_checkpoint(tmp_path)
    for a, b in zip(jax.tree.leaves(state.decoder), jax.tree.leaves(loaded.decoder)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_delta_subset_search_picks_best(tmp_path):
    net = DeltaWholeNet(CFG, n_hidden_channels=8, **HN_KW)
    state = net.init(jax.random.PRNGKey(0))
    img = jnp.asarray(next(synthetic_batches(1, CFG.img_size))[0])
    row = eval_image_delta_subsets(net, state, img, 1e-3)
    assert "option_selected" in row and np.isfinite(row["loss"])


def test_delta_subset_search_rated_accounts_delta_rate():
    from coolchic_tpu.hypernet.inference import eval_image_delta_subsets_rated

    net = DeltaWholeNet(CFG, n_hidden_channels=8, **HN_KW)
    state = net.init(jax.random.PRNGKey(0))
    img = jnp.asarray(next(synthetic_batches(1, CFG.img_size))[0])
    row = eval_image_delta_subsets_rated(net, state, img, 1e-3)
    assert np.isfinite(row["loss"])
    assert row["rate_nn_bpp"] >= 0.0
    # the all-off option pays zero delta rate, so whenever any module is
    # enabled the winner must have judged its delta bits worth paying
    if row["option_selected"] != "arm=0,syn=0,ups=0":
        on = [kv.split("=")[1] == "1" for kv in row["option_selected"].split(",")]
        assert any(on) and row["rate_nn_bpp"] > 0.0


def test_eval_dataset_csv(tmp_path):
    net = NOWholeNet(CFG, n_hidden_channels=8)
    state = net.init(jax.random.PRNGKey(0))
    imgs = next(synthetic_batches(3, CFG.img_size))
    rows = eval_dataset(
        net,
        state,
        [(f"img{i}", imgs[i]) for i in range(3)],
        1e-3,
        csv_path=tmp_path / "results.csv",
    )
    assert len(rows) == 3
    content = (tmp_path / "results.csv").read_text()
    assert content.startswith("seq_name,")  # reference ablation CSV schema


def test_finetune_improves_over_one_shot():
    net = NOWholeNet(CFG, n_hidden_channels=8)
    state = net.init(jax.random.PRNGKey(0))
    img = jnp.asarray(next(synthetic_batches(1, CFG.img_size))[0])
    phases = (
        TrainerPhase(
            lr=1e-2,
            max_itr=100,
            freq_valid=50,
            schedule_lr=True,
            quantizer_type="softround",
            quantizer_noise_type="gaussian",
            softround_temperature=(0.3, 0.1),
            noise_parameter=(0.25, 0.1),
        ),
    )
    m0, params, logs = finetune_coolchic(
        net, state, img, 1e-3, jax.random.PRNGKey(1), phases
    )
    assert float(logs.loss) < float(m0.loss)


@pytest.mark.slow
def test_hypernet_train_cli(tmp_path):
    from coolchic_tpu.hypernet_train import main

    rc = main(
        [
            "--synthetic",
            "--mode", "no",
            "--workdir", str(tmp_path),
            "--n_samples", "64",
            "--batch_size", "4",
            "--patch_size", "32",
        ]
    )
    assert rc == 0
    assert (tmp_path / "samples_64.pkl").exists()


def test_load_checkpoint_meta_sample_counter(tmp_path):
    from coolchic_tpu.hypernet.inference import load_checkpoint_meta

    net = NOWholeNet(CFG, n_hidden_channels=8)
    state = net.init(jax.random.PRNGKey(0))
    save_checkpoint(state, tmp_path / "samples_300.pkl", 300)
    loaded, seen = load_checkpoint_meta(tmp_path)
    assert seen == 300
    for a, b in zip(jax.tree.leaves(state.decoder), jax.tree.leaves(loaded.decoder)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_hypernet_train_cli_resume(tmp_path):
    """A crash-resumed run continues the global sample clock: segment one
    trains to 32 samples, segment two resumes and finishes the 64-sample
    target, writing the final samples_64.pkl."""
    from coolchic_tpu.hypernet_train import main

    base = [
        "--synthetic",
        "--mode", "no",
        "--workdir", str(tmp_path),
        "--batch_size", "4",
        "--patch_size", "32",
        "--checkpointing_freq", "16",
    ]
    assert main(base + ["--n_samples", "32"]) == 0
    assert (tmp_path / "samples_32.pkl").exists()
    assert main(base + ["--n_samples", "64", "--resume"]) == 0
    assert (tmp_path / "samples_64.pkl").exists()
    # resumed checkpoints continue past the first segment's counter
    names = sorted(
        int(p.stem.split("_")[1]) for p in tmp_path.glob("samples_*.pkl")
    )
    assert names[-1] == 64 and 48 in names, names
