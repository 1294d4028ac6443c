from phc_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    MeshSpec,
    initialize_distributed,
    make_mesh,
    shard_train_step,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "MeshSpec",
    "initialize_distributed",
    "make_mesh",
    "shard_train_step",
]
