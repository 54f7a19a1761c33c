from lako_tpu.core.config import (
    T5Config,
    BertConfig,
    RetrieverConfig,
    ReaderDataConfig,
    OptimConfig,
    ReaderTrainConfig,
    RetrieverTrainConfig,
    MeshConfig,
    AttentionSignalConfig,
)
from lako_tpu.core.logging import init_logger
from lako_tpu.core.mesh import make_mesh, batch_sharding, replicated

__all__ = [
    "T5Config",
    "BertConfig",
    "RetrieverConfig",
    "ReaderDataConfig",
    "OptimConfig",
    "ReaderTrainConfig",
    "RetrieverTrainConfig",
    "MeshConfig",
    "AttentionSignalConfig",
    "init_logger",
    "make_mesh",
    "batch_sharding",
    "replicated",
]
