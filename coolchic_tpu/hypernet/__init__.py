from coolchic_tpu.hypernet.backbone import get_backbone
from coolchic_tpu.hypernet.blocks import LatentHyperNet
from coolchic_tpu.hypernet.heads import CoolchicHyperNet
from coolchic_tpu.hypernet.latent_decoder import LatentDecoder, apply_layer_deltas
from coolchic_tpu.hypernet.training import (
    evaluate_wholenet,
    make_wholenet_train_step,
    train_wholenet,
)
from coolchic_tpu.hypernet.wholenet import (
    DeltaWholeNet,
    NOWholeNet,
    SmallDeltaWholeNet,
    WholeNetState,
)

__all__ = [
    "get_backbone",
    "LatentHyperNet",
    "CoolchicHyperNet",
    "LatentDecoder",
    "apply_layer_deltas",
    "evaluate_wholenet",
    "make_wholenet_train_step",
    "train_wholenet",
    "DeltaWholeNet",
    "NOWholeNet",
    "SmallDeltaWholeNet",
    "WholeNetState",
]
