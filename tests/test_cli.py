"""CLI + config system: end-to-end encode -> decode via the user surface."""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest
import yaml

from coolchic_tpu.utils.types import (
    DecoderConfig,
    EncoderConfig,
    PresetConfig,
    UserConfig,
    load_config,
)

pytestmark = pytest.mark.slow  # heavy compile/build; excluded from `-m 'not slow'` fast tier


def test_decoder_config_parsing():
    dc = DecoderConfig(arm="16,2", layers_synthesis="8-1-linear-relu,X-1-linear-none")
    assert dc.dim_arm == 16 and dc.n_hidden_layers_arm == 2
    assert dc.parsed_layers_synthesis == ["8-1-linear-relu", "X-1-linear-none"]
    cfg = dc.to_coolchic_config((32, 48))
    assert cfg.dim_arm == 16
    assert cfg.parsed_synthesis_layers()[1][0] == 3  # X -> out_channels


def test_encoder_config_std_recipe():
    ec = EncoderConfig(std_recipe_name="debug")
    assert ec.recipe is not None and ec.recipe.preset_name == "debug"
    preset = ec.recipe.to_preset()
    assert len(preset.all_phases) == 3
    assert preset.all_phases[1].quantize_model
    # "latent" in YAML maps to our pytree key "latents".
    assert preset.all_phases[2].optimized_module == ("latents",)


def test_encoder_config_n_itr_override():
    ec = EncoderConfig(std_recipe_name="c3x", n_itr=123)
    assert ec.recipe.all_phases[0].max_itr == 123


def test_user_config_cartesian_expansion(tmp_path):
    cfg = UserConfig(
        input=[Path("a.png"), Path("b.png")],
        lmbda=[1e-3, 4e-3],
        enc_cfg=EncoderConfig(std_recipe_name="debug"),
        dec_cfg=[DecoderConfig(), DecoderConfig(arm="8,1", config_name="small")],
    )
    runs = cfg.get_run_configs()
    assert len(runs) == 2 * 2 * 2
    assert {str(r.input) for r in runs} == {"a.png", "b.png"}


def test_preset_yaml_loading():
    from coolchic_tpu.utils.paths import PRESET_CFG_DIR

    preset = load_config(PRESET_CFG_DIR / "c3x.yaml", PresetConfig)
    assert preset.preset_name == "c3x"
    p = preset.to_preset()
    assert p.warmup.phases[0].candidates == 5
    assert p.all_phases[0].max_itr == 10600


@pytest.mark.slow
def test_cli_encode_decode_roundtrip(tmp_path):
    """Drive the actual CLI entry points end to end on a tiny image."""
    from coolchic_tpu.io import write_png

    rng = np.random.RandomState(0)
    y, x = np.meshgrid(np.linspace(0, 1, 24), np.linspace(0, 1, 32), indexing="ij")
    img = np.stack([x, y, 0.5 * (x + y)], 0).astype(np.float32)
    src = tmp_path / "tiny.png"
    write_png(img, str(src))

    out_bs = tmp_path / "tiny.cool"
    dec_cfg = tmp_path / "dec.yaml"
    dec_cfg.write_text(
        yaml.safe_dump(
            {
                "arm": "8,1",
                "layers_synthesis": "8-1-linear-relu,X-1-linear-none",
                "n_ft_per_res": "1,1,1",
            }
        )
    )

    from coolchic_tpu.encode import main as encode_main

    rc = encode_main(
        [
            "--input", str(src),
            "--output", str(out_bs),
            "--enc_preset", "debug",
            "--dec_cfg", str(dec_cfg),
            "--workdir", str(tmp_path / "wd"),
        ]
    )
    assert rc == 0
    assert out_bs.exists() and out_bs.stat().st_size > 20
    assert (tmp_path / "wd" / "results_best.tsv").exists()

    from coolchic_tpu.decode import main as decode_main

    out_png = tmp_path / "dec.png"
    rc = decode_main(["-i", str(out_bs), "-o", str(out_png), "--verbosity", "1"])
    assert rc == 0
    from coolchic_tpu.io import read_png

    dec, _ = read_png(str(out_png))
    assert dec.shape == (3, 24, 32)
    # Debug preset trains 70 iterations: only demand basic fidelity sanity.
    mse = float(np.mean((dec - img) ** 2))
    assert mse < 0.2


@pytest.mark.slow
def test_encode_simpler_cli(tmp_path):
    """The step-by-step simple encoder produces a decodable bitstream
    (reference: encode_simpler.py)."""
    from coolchic_tpu.io import write_png

    y, x = np.meshgrid(np.linspace(0, 1, 24), np.linspace(0, 1, 32), indexing="ij")
    img = np.stack([x, y, 0.5 * (x + y)], 0).astype(np.float32)
    src = tmp_path / "tiny.png"
    write_png(img, str(src))
    out_bs = tmp_path / "tiny.cool"

    from coolchic_tpu.encode_simpler import main as simple_main

    rc = simple_main(
        [
            "-i", str(src),
            "-o", str(out_bs),
            "--budget", "debug",
            "--dim_arm", "8",
            "--n_hidden_layers_arm", "1",
            "--n_ft_per_res", "1,1,1",
            "--layers_synthesis", "8-1-linear-relu,X-1-linear-none",
        ]
    )
    assert rc == 0
    assert out_bs.exists() and out_bs.stat().st_size > 20

    from coolchic_tpu.bitstream import decode_bitstream

    decoded, _ = decode_bitstream(out_bs.read_bytes(), integer_pipeline=True)
    assert decoded.shape == (3, 24, 32)
