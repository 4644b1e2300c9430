from keras_rs_tpu.parallel import multihost
from keras_rs_tpu.parallel.sharded_retrieval import (
    ShardedBruteForceRetrieval,
)
from keras_rs_tpu.parallel.mesh import (
    DATA_AXIS,
    batch_sharding,
    create_mesh,
    put_batch,
    replicate,
    replicated,
    table_sharding,
)

__all__ = [
    "DATA_AXIS",
    "ShardedBruteForceRetrieval",
    "batch_sharding",
    "create_mesh",
    "multihost",
    "put_batch",
    "replicate",
    "replicated",
    "table_sharding",
]
