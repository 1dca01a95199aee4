from .mesh import (  # noqa: F401
    DATA_AXIS,
    MODEL_AXIS,
    data_sharding,
    make_mesh,
    model_sharding,
    pad_batch_to_multiple,
    replicated,
    shard_reads,
)
from .train_step import TrainBatch, TrainStepResult, make_train_step  # noqa: F401
