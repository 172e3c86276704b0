"""Plotting, logging, XLA cost analysis, console reports, latent retrain."""

import numpy as np
import pytest

from coolchic_tpu.models import CoolChicConfig
from coolchic_tpu.models.coolchic import xla_cost_analysis
from coolchic_tpu.utils.console import pretty_string_coolchic, pretty_string_latents

CFG = CoolChicConfig(
    img_size=(16, 24),
    n_ft_per_res=(1, 1, 1),
    layers_synthesis=("8-1-linear-relu", "X-1-linear-none"),
    dim_arm=8,
    n_hidden_layers_arm=1,
)


def test_console_reports():
    s = pretty_string_coolchic(CFG)
    assert "MAC / pixel" in s and "ARM" in s and "Synthesis" in s
    s = pretty_string_latents(CFG)
    assert "level 0" in s


def test_xla_cost_analysis():
    c = xla_cost_analysis(CFG)
    assert c["flops"] > 0
    # XLA flops (2 per MAC) should be within ~3x of the analytic MAC count
    # (XLA counts padding/elementwise work the analytic model skips).
    from coolchic_tpu.models import macs_per_pixel

    analytic = macs_per_pixel(CFG)["total"]
    assert 0.5 < c["flops_per_pixel"] / (2 * analytic) < 5


def test_detailed_eval_metrics():
    import jax
    import jax.numpy as jnp

    from coolchic_tpu.models import init_coolchic_params
    from coolchic_tpu.train.step import detailed_eval_metrics, eval_metrics

    params = init_coolchic_params(jax.random.PRNGKey(0), CFG, latent_init="normal")
    target = jax.random.uniform(jax.random.PRNGKey(1), (3, *CFG.img_size))
    d = detailed_eval_metrics(params, CFG, target, 1e-3)
    m = eval_metrics(params, CFG, target, 1e-3)
    assert float(d["loss"]) == pytest.approx(float(m.loss), rel=1e-6)
    # Per-grid bpp sums to the total latent bpp.
    total = sum(float(d[f"latent_{i}_bpp"]) for i in range(CFG.latent_n_grids))
    assert total == pytest.approx(float(m.rate_latent_bpp), rel=1e-5)
    for i in range(CFG.latent_n_grids):
        assert 0.0 <= float(d[f"latent_{i}_nonzero_pct"]) <= 100.0


def test_logging_noop_when_disabled(tmp_path):
    from coolchic_tpu.utils import logging as clog

    clog.init(disable=True)
    clog.log({"x": 1})  # must not raise
    clog.finish()
    info = clog.mem_info()
    assert isinstance(info, str)


def test_plotting_writes_png(tmp_path):
    from coolchic_tpu.eval.plotting import plot_dataset_rd

    out = tmp_path / "rd.png"
    plot_dataset_rd("kodak", ["results", "hm"], "kodim01", out)
    assert out.exists() and out.stat().st_size > 1000


@pytest.mark.slow
@pytest.mark.slow
def test_retrain_latents_cli(tmp_path):
    import jax
    import jax.numpy as jnp

    from coolchic_tpu.io import write_png
    from coolchic_tpu.train.presets import Preset, TrainerPhase, Warmup
    from coolchic_tpu.video import CodingStructure, VideoEncoder

    h, w = CFG.img_size
    yy, xx = np.meshgrid(np.linspace(0, 1, h), np.linspace(0, 1, w), indexing="ij")
    img = np.stack([xx, yy, 0.5 * (xx + yy)], 0).astype(np.float32)
    src = tmp_path / "img.png"
    write_png(img, str(src))

    phase = TrainerPhase(
        lr=1e-2,
        max_itr=40,
        freq_valid=20,
        schedule_lr=True,
        quantizer_type="softround",
        quantizer_noise_type="gaussian",
        softround_temperature=(0.3, 0.1),
        noise_parameter=(0.25, 0.1),
        quantize_model=True,
    )
    preset = Preset(preset_name="micro", all_phases=(phase,), warmup=Warmup())
    enc = VideoEncoder(CodingStructure(0, 0), CFG, preset, lmbda=1e-3)
    enc.encode(str(src), workdir=tmp_path, verbose=False)

    from coolchic_tpu.retrain_latents import main

    rc = main(
        [
            "--checkpoint", str(tmp_path / "video_encoder.pkl"),
            "--input", str(src),
            "--init", "noise",
            "--n_itr", "20",
        ]
    )
    assert rc == 0
