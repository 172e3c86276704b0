"""User-facing configuration system: pydantic models + YAML loading.

Mirrors the reference config surface (reference: coolchic/utils/types.py):
``UserConfig`` expands multi-valued fields (input, lmbda, dec_cfg) into a
cartesian product of ``RunConfig`` runs; ``EncoderConfig`` takes either an
inline recipe or a named standard preset from ``preset_cfg/``.
"""

from __future__ import annotations

import itertools
import random
from datetime import datetime
from pathlib import Path
from typing import Annotated, Any, List, Literal, Optional, Tuple, Type, TypeVar, Union

import yaml
from pydantic import BaseModel, BeforeValidator, Field, computed_field

from coolchic_tpu.models.config import CoolChicConfig
from coolchic_tpu.train import presets as P
from coolchic_tpu.utils.paths import PRESET_CFG_DIR

PRESET_NAMES = Literal["c3x", "debug"]
PRESET_PATHS = {
    "c3x": PRESET_CFG_DIR / "c3x.yaml",
    "debug": PRESET_CFG_DIR / "debug.yaml",
}


# --------------------------------------------------------------------------- #
# Training recipe (YAML-facing mirrors of the frozen preset dataclasses)
# --------------------------------------------------------------------------- #
class TrainerPhaseConfig(BaseModel):
    lr: float = 1e-2
    max_itr: int = 5000
    freq_valid: int = 100
    patience: int = 10000
    quantize_model: bool = False
    schedule_lr: bool = False
    end_lr: float = 1e-5
    softround_temperature: Tuple[float, float] = (0.3, 0.3)
    noise_parameter: Tuple[float, float] = (1.0, 1.0)
    quantizer_noise_type: str = "kumaraswamy"
    quantizer_type: str = "softround"
    optimized_module: List[str] = Field(default_factory=lambda: ["all"])

    def to_phase(self) -> P.TrainerPhase:
        # The reference calls the latent module "latent"; our pytree key is
        # "latents".
        modules = tuple(
            "latents" if m == "latent" else m for m in self.optimized_module
        )
        return P.TrainerPhase(
            lr=self.lr,
            max_itr=self.max_itr,
            freq_valid=self.freq_valid,
            patience=self.patience,
            quantize_model=self.quantize_model,
            schedule_lr=self.schedule_lr,
            end_lr=self.end_lr,
            softround_temperature=tuple(self.softround_temperature),
            noise_parameter=tuple(self.noise_parameter),
            quantizer_noise_type=self.quantizer_noise_type,
            quantizer_type=self.quantizer_type,
            optimized_module=modules,
        )


class WarmupPhaseConfig(BaseModel):
    candidates: int
    training_phase: TrainerPhaseConfig


class WarmupConfig(BaseModel):
    phases: List[WarmupPhaseConfig] = Field(default_factory=list)


class PresetConfig(BaseModel):
    """YAML-facing training recipe (reference: utils/types.py:21-74)."""

    preset_name: str
    warmup: WarmupConfig
    all_phases: List[TrainerPhaseConfig]

    def model_post_init(self, __context: Any) -> None:
        if "hnet" in self.preset_name:
            return
        flag = any(ph.quantize_model for ph in self.all_phases)
        assert flag or len(self.all_phases) == 0, (
            f"Preset {self.preset_name} has no phase with NN quantization."
        )

    def to_preset(self) -> P.Preset:
        return P.Preset(
            preset_name=self.preset_name,
            all_phases=tuple(ph.to_phase() for ph in self.all_phases),
            warmup=P.Warmup(
                phases=tuple(
                    P.WarmupPhase(
                        candidates=wp.candidates,
                        training_phase=wp.training_phase.to_phase(),
                    )
                    for wp in self.warmup.phases
                )
            ),
        )


# --------------------------------------------------------------------------- #
# Encoder / decoder configs (reference: utils/types.py:77-216)
# --------------------------------------------------------------------------- #
class EncoderConfig(BaseModel):
    intra_period: int = 0
    p_period: int = 0
    start_lr: float = 1e-2
    n_itr: Optional[int] = None
    n_train_loops: int = 1
    recipe: Optional[PresetConfig] = None
    std_recipe_name: Optional[PRESET_NAMES] = None

    def model_post_init(self, __context: Any) -> None:
        if not self.recipe and not self.std_recipe_name:
            raise ValueError("One of 'recipe' or 'std_recipe_name' must be provided.")
        if self.std_recipe_name:
            if self.recipe:
                raise ValueError(
                    "Only one of 'recipe' or 'std_recipe_name' must be provided."
                )
            with open(PRESET_PATHS[self.std_recipe_name], "r") as stream:
                self.recipe = PresetConfig(**yaml.safe_load(stream))
        assert self.recipe is not None
        if self.n_itr:
            self.recipe.all_phases[0].max_itr = self.n_itr


class DecoderConfig(BaseModel):
    """Decoder architecture descriptor (reference: utils/types.py:115-216)."""

    config_name: Optional[str] = None
    layers_synthesis: str = (
        "40-1-linear-relu,X-1-linear-none,X-3-residual-relu,X-3-residual-none"
    )
    arm: str = "24,2"
    ups_k_size: int = 8
    ups_preconcat_k_size: int = 7
    n_ft_per_res: str = "1,1,1,1,1,1,1"
    encoder_gain: int = 16

    @computed_field
    @property
    def dim_arm(self) -> int:
        return int(self.arm.split(",")[0])

    @computed_field
    @property
    def n_hidden_layers_arm(self) -> int:
        return int(self.arm.split(",")[1])

    @computed_field
    @property
    def parsed_layers_synthesis(self) -> List[str]:
        layers = [x for x in self.layers_synthesis.split(",") if x != ""]
        assert layers, "Synthesis should have at least one layer."
        return layers

    @computed_field
    @property
    def parsed_n_ft_per_res(self) -> List[int]:
        out = [int(x) for x in self.n_ft_per_res.split(",") if x != ""]
        assert set(out) == {1}, (
            f"--n_ft_per_res should only contain 1. Found {self.n_ft_per_res}"
        )
        return out

    def to_coolchic_config(
        self,
        img_size: Tuple[int, int],
        out_channels: int = 3,
        frame_data_type: str = "rgb",
    ) -> CoolChicConfig:
        return CoolChicConfig(
            img_size=img_size,
            layers_synthesis=tuple(self.parsed_layers_synthesis),
            n_ft_per_res=tuple(self.parsed_n_ft_per_res),
            dim_arm=self.dim_arm,
            n_hidden_layers_arm=self.n_hidden_layers_arm,
            encoder_gain=self.encoder_gain,
            ups_k_size=self.ups_k_size,
            ups_preconcat_k_size=self.ups_preconcat_k_size,
            out_channels=out_channels,
            frame_data_type=frame_data_type,
        )


def single_element_to_list(elem: Any) -> List[Any]:
    return elem if isinstance(elem, list) else [elem]


def get_run_uid(index: Optional[int] = None) -> str:
    if not index:
        index = random.randint(100, 999)
    return f"{datetime.now().strftime('%H%M%S')}_{index:03}"


class RunConfig(BaseModel):
    input: Path
    output: Optional[Path] = None
    workdir: Optional[Path] = None
    lmbda: float = 1e-3
    job_duration_min: int = -1
    enc_cfg: EncoderConfig
    dec_cfg: DecoderConfig
    disable_wandb: bool = False
    load_models: bool = True
    unique_id: str = Field(default_factory=get_run_uid)
    user_tag: Optional[str] = None


class UserConfig(BaseModel):
    """Multi-valued config expanded into runs (reference: types.py:246-279)."""

    input: Annotated[Union[Path, List[Path]], BeforeValidator(single_element_to_list)]
    output: Optional[Path] = None
    workdir: Optional[Path] = None
    lmbda: Annotated[
        Union[float, List[float]], BeforeValidator(single_element_to_list)
    ] = [1e-3]
    job_duration_min: int = -1
    enc_cfg: EncoderConfig
    dec_cfg: Annotated[
        Union[DecoderConfig, List[DecoderConfig]],
        BeforeValidator(single_element_to_list),
    ]
    disable_wandb: bool = False
    load_models: bool = True
    mult_attributes: List[str] = ["input", "lmbda", "dec_cfg"]
    user_tag: Optional[str] = None

    def get_run_configs(self) -> List[RunConfig]:
        configs = []
        for inp, lmbda, dec_cfg in itertools.product(
            *[getattr(self, attr) for attr in self.mult_attributes]
        ):
            cur = self.model_copy(deep=True)
            cur.input = inp
            cur.lmbda = lmbda
            cur.dec_cfg = dec_cfg
            if cur.enc_cfg.std_recipe_name:
                cur.enc_cfg.recipe = None
            run = RunConfig(**cur.model_dump())
            run.unique_id = get_run_uid(len(configs))
            configs.append(run)
        return configs


# --------------------------------------------------------------------------- #
# Hypernet configs (reference: types.py:282-329)
# --------------------------------------------------------------------------- #
class HyperNetParams(BaseModel):
    hidden_dim: int
    n_layers: int
    biases: bool = True
    only_biases: bool = False
    output_activation: Optional[str] = "tanh"


RESNET_OPTIONS = Literal["resnet18", "resnet50", "resnet101"]


class HyperNetConfig(BaseModel):
    dec_cfg: DecoderConfig

    synthesis: HyperNetParams = HyperNetParams(hidden_dim=1024, n_layers=3)
    arm: HyperNetParams = HyperNetParams(hidden_dim=1024, n_layers=3)
    upsampling: HyperNetParams = HyperNetParams(hidden_dim=256, n_layers=3)
    backbone_arch: RESNET_OPTIONS = "resnet18"
    double_backbone: bool = False
    n_hidden_channels: int = 64
    patch_size: Tuple[int, int] = (256, 256)

    @computed_field
    @property
    def n_latents(self) -> int:
        return len(self.dec_cfg.parsed_n_ft_per_res)


class HypernetRunConfig(BaseModel):
    n_samples: int
    batch_size: int = 1
    lmbda: float = 1e-3
    recipe: PresetConfig
    unfreeze_backbone: int = 0
    hypernet_cfg: HyperNetConfig
    workdir: Optional[Path] = None
    model_weights: Optional[Path] = None
    checkpoint: Optional[Path] = None
    disable_wandb: bool = False
    unique_id: str = Field(default_factory=get_run_uid)
    user_tag: Optional[str] = None


T = TypeVar("T", bound=BaseModel)


def load_config(config_path: Path, config_class: Type[T]) -> T:
    with open(config_path, "r") as stream:
        return config_class(**yaml.safe_load(stream))
