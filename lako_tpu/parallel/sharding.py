"""Parameter partitioning rules for tensor parallelism over the mesh `model` axis.

This is the TPU-native answer to the reference's absent TP (SURVEY.md §2.7): a
Megatron-style sharding of T5 — QKV and MLP-in kernels column-sharded over heads /
d_ff, O and MLP-out kernels row-sharded, embedding vocab-sharded — expressed as
`PartitionSpec` rules. XLA GSPMD inserts the all-reduces on ICI.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def t5_partition_spec(path, model_axis: str = "model") -> P:
    """Map a param path (tuple of str keys) to a PartitionSpec."""
    keys = [str(getattr(k, "key", k)) for k in path]
    name = keys[-1]
    parent = keys[-2] if len(keys) >= 2 else ""

    if name == "kernel":
        if parent in ("q", "k", "v", "wi", "wi_0", "wi_1"):
            return P(None, model_axis)  # column parallel
        if parent in ("o", "wo"):
            return P(model_axis, None)  # row parallel
        if parent == "lm_head":
            return P(None, model_axis)
        # retriever projection heads etc.: replicate
        return P()
    if name == "embedding":
        return P(model_axis, None)  # vocab-sharded; logits gather over model axis
    if name == "rel_embedding":
        return P(None, model_axis)  # per-head bias shards with the heads
    return P()  # layer norms, biases


def make_param_shardings(mesh: Mesh, params: Any, rule=t5_partition_spec):
    def to_sharding(path, _):
        return NamedSharding(mesh, rule(path))

    return jax.tree_util.tree_map_with_path(to_sharding, params)


def shard_params(mesh: Mesh, params: Any, rule=t5_partition_spec):
    shardings = make_param_shardings(mesh, params, rule)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
