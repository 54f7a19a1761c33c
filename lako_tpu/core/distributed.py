"""Multi-host initialization and cross-process metric aggregation.

TPU-native replacement for the reference's SLURM/NCCL plumbing
(src/slurm.py:44-160) and rank-0 reductions (src/util.py:248-273):

- :func:`initialize` wraps ``jax.distributed.initialize`` (coordinator discovery
  from env — JAX handles TPU pods natively; SLURM/torchrun-style env vars are
  honored when present).
- :func:`average_main` / :func:`weighted_average` aggregate host-side Python
  scalars across processes with a tiny jitted psum over one device per process —
  the moral equivalent of ``dist.reduce(SUM)`` to rank 0, except every process
  gets the result (rank-0-only logic is handled by ``is_main``).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialize multi-host JAX. Safe no-op for single-process runs."""
    if num_processes is None:
        num_processes = int(os.environ.get("WORLD_SIZE",
                            os.environ.get("SLURM_NTASKS", "1")))
    if num_processes <= 1:
        return
    if process_id is None:
        process_id = int(os.environ.get("RANK", os.environ.get("SLURM_PROCID", "0")))
    if coordinator_address is None:
        host = os.environ.get("MASTER_ADDR", "127.0.0.1")
        port = os.environ.get("MASTER_PORT", "12355")
        coordinator_address = f"{host}:{port}"
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def is_main() -> bool:
    return jax.process_index() == 0


def is_distributed() -> bool:
    return jax.process_count() > 1


def _psum_scalars(values: np.ndarray) -> np.ndarray:
    """Sum a small vector of scalars across processes via one global device op."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = np.asarray(jax.devices()).reshape(jax.process_count(), -1)[:, :1].ravel()
    mesh = Mesh(devs, ("p",))
    x = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("p")), values[None, :],
    )
    summed = jax.jit(
        lambda a: jax.numpy.sum(a, axis=0),
        out_shardings=NamedSharding(mesh, P()),
    )(x)
    return np.asarray(summed)


def average_main(x: float) -> float:
    """Mean of a scalar across processes (loss logging)."""
    if not is_distributed():
        return float(x)
    total = _psum_scalars(np.asarray([float(x)], np.float32))
    return float(total[0]) / jax.process_count()


def weighted_average(x: float, count: int) -> Tuple[float, int]:
    """Count-weighted mean across processes (metric aggregation,
    reference src/util.py:266-273)."""
    if not is_distributed():
        return float(x), int(count)
    vec = np.asarray([float(x) * count, float(count)], np.float32)
    total = _psum_scalars(vec)
    tot_count = max(total[1], 1.0)
    return float(total[0] / tot_count), int(total[1])
