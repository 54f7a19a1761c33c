"""Child process for the true multi-process distributed test.

Run by tests/test_multiprocess.py with env:
  LAKO_MP_RANK, LAKO_MP_WORLD, LAKO_MP_PORT, LAKO_MP_OUT, LAKO_MP_DATA
Exercises jax.distributed.initialize across real OS processes (the reference's
NCCL init + dist.reduce path, src/slurm.py:44-160, src/util.py:248-273):
cross-process weighted_average / average_main, per-process data sharding, and
checkpoint save (rank 0) / restore (all ranks).
"""

import json
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    rank = int(os.environ["LAKO_MP_RANK"])
    world = int(os.environ["LAKO_MP_WORLD"])
    port = os.environ["LAKO_MP_PORT"]
    out_path = os.environ["LAKO_MP_OUT"]
    data_path = os.environ["LAKO_MP_DATA"]
    ckpt_dir = os.environ["LAKO_MP_CKPT"]

    from lako_tpu.core.distributed import (
        average_main,
        initialize,
        is_main,
        weighted_average,
    )

    initialize(coordinator_address=f"127.0.0.1:{port}",
               num_processes=world, process_id=rank)
    assert jax.process_count() == world, jax.process_count()
    assert jax.process_index() == rank

    # --- cross-process reductions (reference src/util.py:248-273)
    loss = 1.0 if rank == 0 else 0.5
    avg = average_main(loss)
    em, count = weighted_average(1.0 if rank == 0 else 0.5,
                                 3 if rank == 0 else 1)

    # --- per-process data sharding (reference src/data.py:151-160)
    from lako_tpu.data.loader import load_reader_data

    shard = load_reader_data(data_path, global_rank=rank, world_size=world)
    shard_ids = [ex["id"] for ex in shard]

    # --- checkpoint: rank 0 saves, everyone restores the same params
    from lako_tpu.core.checkpoint import load_checkpoint, save_checkpoint

    params = {"w": np.full((4,), 7.25, np.float32),
              "b": np.arange(3, dtype=np.float32)}
    if is_main():
        save_checkpoint(ckpt_dir, "mp_test", params, opt_state=None,
                        step=11, best_eval_metric=0.5)
    # barrier: a collective both processes must reach ensures the file exists
    weighted_average(0.0, 1)
    restored, _, meta = load_checkpoint(
        f"{ckpt_dir}/checkpoint/mp_test", params)

    result = {
        "rank": rank,
        "process_count": jax.process_count(),
        "avg_loss": avg,
        "weighted_em": em,
        "weighted_count": count,
        "shard_ids": shard_ids,
        "restored_step": int(meta["step"]),
        "restored_best": float(meta["best_eval_metric"]),
        "restored_w0": float(np.asarray(restored["w"])[0]),
    }
    pathlib.Path(out_path).write_text(json.dumps(result))


if __name__ == "__main__":
    main()
