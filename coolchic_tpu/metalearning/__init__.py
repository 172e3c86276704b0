from coolchic_tpu.metalearning.data import (
    PatchDataset,
    random_patch,
    synthetic_batches,
    train_test_split,
)

__all__ = ["PatchDataset", "random_patch", "synthetic_batches", "train_test_split"]
