from lako_tpu.parallel.sharding import (
    t5_partition_spec,
    make_param_shardings,
    shard_params,
)

__all__ = ["t5_partition_spec", "make_param_shardings", "shard_params"]
