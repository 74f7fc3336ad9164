from .mesh import (  # noqa: F401
    create_mesh, data_sharding, replicate_sharding, shard_batch)
from .train_step import TrainState, make_train_step, make_eval_step  # noqa: F401
