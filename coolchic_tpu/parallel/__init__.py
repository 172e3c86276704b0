from coolchic_tpu.parallel.mesh import (
    IMAGE_AXIS,
    batched_train_step,
    encode_batch_sharded,
    init_batch_opt_state,
    init_batch_params,
    make_mesh,
    shard_leading_axis,
)

__all__ = [
    "IMAGE_AXIS",
    "batched_train_step",
    "encode_batch_sharded",
    "init_batch_opt_state",
    "init_batch_params",
    "make_mesh",
    "shard_leading_axis",
]
